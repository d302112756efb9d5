#!/bin/bash
# Patient supervisor for the round-4 flagship training run.
#
# Lesson from the first version: NEVER kill a client that is waiting on the
# axon tunnel. The relay is single-tenant; killing a client mid-attach can
# leave it holding a dead grant and re-wedge the tunnel for hours. This
# version never sends a signal to the trainer — it only relaunches when the
# client exits on its own (crash, OOM, completed horizon), and it stops once
# the final 20k-iteration checkpoint exists. exp.resume=True (the config
# default) makes every relaunch continue from the latest checkpoint in
# model_dir.
set -u
LOG=${LOG:-/root/repo/runs/train_r4.log}
MODEL_DIR=${MODEL_DIR:-/root/repo/runs/maestro22k_8s_r4}
TOTAL_ITS=${TOTAL_ITS:-20000}
# adaptive guardrail (exp.skip_grad_factor, config default) — the absolute
# exp.skip_grad_norm=10 froze the first 20k-it run (~99% of late steps
# reverted once the healthy gnorm scale drifted above 10)
EXTRA=${EXTRA:-}
DONE_CKPT="$MODEL_DIR/22k_8s-$TOTAL_ITS.ckpt"
cd /root/repo

launch() {
  python train.py exp=maestro22k_8s dset=maestro_allyears \
    dset.path=/root/repo/runs/corpus22k \
    model_dir="$MODEL_DIR" \
    exp.total_its=$TOTAL_ITS \
    logging.save_interval=2500 logging.remove_last_checkpoint=False \
    logging.heavy_log_interval=10000 logging.log_interval=100 \
    logging.print_model_summary=False $EXTRA >> "$LOG" 2>&1 &
  PID=$!
  echo "$PID" > /tmp/train_r4.pid
  echo "[watchdog] launched trainer pid=$PID $(date -u +%FT%TZ)" >> "$LOG"
}

PID=$(cat /tmp/train_r4.pid 2>/dev/null || echo 0)
while true; do
  if [ -d "$DONE_CKPT" ]; then
    echo "[watchdog] run complete ($DONE_CKPT exists); exiting" >> "$LOG"
    exit 0
  fi
  if [ "$PID" -gt 0 ] && kill -0 "$PID" 2>/dev/null; then
    sleep 60
    continue
  fi
  launch
  sleep 60
done
