#!/bin/bash
# TPU training launcher (the reference's SLURM training.sh equivalent,
# reference training.sh:37-47 — hydra overrides become plain CLI overrides).
#
# Single host drives all local TPU chips via the dp mesh; multi-host pods
# launch this same script once per host (jax.distributed initializes from the
# TPU runtime environment, no rendezvous flags needed).
set -euo pipefail
cd "$(dirname "$0")/.."

MODEL_DIR=${MODEL_DIR:-experiments/cqt}
mkdir -p "$MODEL_DIR"

python train.py \
  model_dir="$MODEL_DIR" \
  dset=maestro_allyears \
  exp=maestro22k_8s \
  network=cqtdiff_plus_22k \
  tester=inpainting_tester \
  logging=huge_model_logging \
  "$@"
