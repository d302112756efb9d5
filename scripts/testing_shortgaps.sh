#!/bin/bash
# Short-gap evaluation suite (the reference's testing_shortgaps.sh:36-77:
# T=70, hann 100, mask-providing dataset).
set -euo pipefail
cd "$(dirname "$0")/.."

MODEL_DIR=${MODEL_DIR:-experiments/cqt}
CKPT=${CKPT:-}

python test.py \
  model_dir="$MODEL_DIR" \
  dset=inpainting_mask_dataset \
  exp=musicnet44k_4s \
  network=cqtdiff_plus_44k \
  tester=inpainting_tester_shortgaps \
  tester.checkpoint="$CKPT" \
  "$@"
