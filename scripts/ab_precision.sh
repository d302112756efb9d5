#!/bin/bash
# Round-5 precision A/B (VERDICT r4 next-round item #1): from the it-20000
# flagship checkpoint, continue training with network.compute_dtype=float32
# and compare against the existing bf16 continuation (20000 -> 30000 in
# runs/maestro22k_8s_r4, runs/train_r4.log) — same data, same seed family,
# same guardrail. Hypothesis: the gnorm drift 0.2 -> O(100) -> 1e10 spikes is
# bf16 quantization noise amplified by the EDM 1/c_out^2 weighting at small
# sigma; f32 should hold gnorm at the O(0.1-1) scale the first 5k its showed.
set -u
ARM=${ARM:-f32}
MODEL_DIR=${MODEL_DIR:-/root/repo/runs/ab_${ARM}}
LOG=${LOG:-/root/repo/runs/ab_${ARM}.log}
TOTAL_ITS=${TOTAL_ITS:-25000}
SRC=${SRC:-/root/repo/runs/maestro22k_8s_r4/22k_8s-20000.ckpt}
EXTRA=${EXTRA:-network.compute_dtype=float32}
cd /root/repo

mkdir -p "$MODEL_DIR"
if [ ! -d "$MODEL_DIR/$(basename "$SRC")" ]; then
  cp -al "$SRC" "$MODEL_DIR/" 2>/dev/null || cp -r "$SRC" "$MODEL_DIR/"
fi

# Relaunch-on-exit loop (remote compile can fail transiently with
# "response body closed" — the verify notes say retry; exp.resume=True makes
# every relaunch lossless up to checkpoint cadence). Never signals the
# trainer: the single-tenant tunnel wedges if a client dies mid-attach.
DONE_CKPT="$MODEL_DIR/22k_8s-$TOTAL_ITS.ckpt"
(
  while [ ! -d "$DONE_CKPT" ]; do
    python train.py exp=maestro22k_8s dset=maestro_allyears \
      dset.path=/root/repo/runs/corpus22k \
      model_dir="$MODEL_DIR" \
      exp.total_its=$TOTAL_ITS \
      logging.save_interval=2500 logging.remove_last_checkpoint=False \
      logging.heavy_log_interval=5000 logging.log_interval=100 \
      logging.print_model_summary=False $EXTRA >> "$LOG" 2>&1
    rc=$?
    echo "[ab] trainer exited rc=$rc $(date -u +%FT%TZ)" >> "$LOG"
    [ -d "$DONE_CKPT" ] && break
    sleep 20
  done
  echo "[ab] $ARM arm complete ($DONE_CKPT)" >> "$LOG"
) &
echo "$!" > /tmp/ab_${ARM}.pid
echo "[ab] supervisor pid=$(cat /tmp/ab_${ARM}.pid) total_its=$TOTAL_ITS extra='$EXTRA'" | tee -a "$LOG"
