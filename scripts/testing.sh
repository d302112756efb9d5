#!/bin/bash
# TPU evaluation launcher (the reference's SLURM testing.sh equivalent,
# reference testing.sh:48-55): long-gap inpainting with a chosen checkpoint.
set -euo pipefail
cd "$(dirname "$0")/.."

MODEL_DIR=${MODEL_DIR:-experiments/cqt}
CKPT=${CKPT:-}   # path to .ckpt dir or reference .pt; empty = latest in MODEL_DIR

python test.py \
  model_dir="$MODEL_DIR" \
  dset=maestro_allyears \
  exp=maestro22k_8s \
  network=cqtdiff_plus_22k \
  tester=inpainting_tester \
  tester.checkpoint="$CKPT" \
  "$@"
