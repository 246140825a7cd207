#!/bin/bash
# Real (colmap) scenes, e.g. the fox capture. $1 = scene dir with transforms.json.
set -e
SCENE=${1:-data/fox}
python main_nerf.py "$SCENE" -O --bound 2.0 --scale 0.33 --dt_gamma 0.0078125 --workspace ws_$(basename "$SCENE")
