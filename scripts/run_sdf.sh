#!/bin/bash
set -e
MESH=${1:-data/armadillo.obj}
python main_sdf.py "$MESH" --workspace ws_sdf
