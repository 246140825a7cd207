#!/bin/bash
set -e
SCENE=${1:-data/dnerf/bouncingballs}
python main_dnerf.py "$SCENE" -O --bound 1.0 --scale 0.8 --dt_gamma 0 --workspace ws_dnerf
