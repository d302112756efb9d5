#!/bin/bash
# Relaunch the round-4 flagship training run as soon as the TPU tunnel
# recovers. The single-tenant axon tunnel can wedge for a while after a
# SIGTERM on an attached client; this loop starts train.py, waits for a
# successful device attach (the "devices:" banner), and if the attach
# blocks >10 min, hard-kills the never-attached client and retries.
set -u
LOG=/root/repo/runs/train_r4.log
cd /root/repo
while true; do
  : > "$LOG"
  python train.py exp=maestro22k_8s dset=maestro_allyears \
    dset.path=/root/repo/runs/corpus22k \
    model_dir=/root/repo/runs/maestro22k_8s_r4 \
    exp.total_its=20000 exp.skip_grad_norm=10 \
    logging.save_interval=2500 logging.remove_last_checkpoint=False \
    logging.heavy_log_interval=10000 logging.log_interval=100 \
    logging.print_model_summary=False >> "$LOG" 2>&1 &
  PID=$!
  echo "$PID" > /tmp/train_r4.pid
  attached=0
  for i in $(seq 1 20); do
    sleep 30
    if grep -q "devices:" "$LOG"; then attached=1; break; fi
    if ! kill -0 "$PID" 2>/dev/null; then break; fi
  done
  if [ "$attached" = "1" ]; then
    wait "$PID"
    echo "rc=$?" >> "$LOG"
    exit 0
  fi
  # never attached (tunnel wedged) or crashed pre-attach: clean up, retry
  kill -9 "$PID" 2>/dev/null
  sleep 240
done
