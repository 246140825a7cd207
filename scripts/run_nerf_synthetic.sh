#!/bin/bash
# Canonical invocations for blender (nerf_synthetic) scenes, mirroring the
# reference's scripts/run_nerf.sh hyperparameters. $1 = scene dir.
set -e
SCENE=${1:-data/nerf_synthetic/lego}
# reference-parity config (exact hash encoding)
python main_nerf.py "$SCENE" -O --bound 1.0 --scale 0.8 --dt_gamma 0 --workspace ws_$(basename "$SCENE")
# TPU-tuned config (brick encoding, ~6x faster steps)
# python main_nerf.py "$SCENE" --preset tpu --bound 1.0 --scale 0.8 --dt_gamma 0 --num_rays 16384 --workspace ws_$(basename "$SCENE")_tpu
