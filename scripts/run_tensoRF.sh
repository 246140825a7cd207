#!/bin/bash
set -e
SCENE=${1:-data/nerf_synthetic/lego}
python main_tensoRF.py "$SCENE" -O --bound 1.0 --scale 0.8 --dt_gamma 0 --workspace ws_tensoRF
# CP decomposition variant:
# python main_tensoRF.py "$SCENE" -O --cp --resolution1 500 --bound 1.0 --scale 0.8 --dt_gamma 0
