#!/bin/bash
# R1 gamma 3-point sweep at 256^2 (VERDICT r3 #2 prerequisite).
# Short 2k-step runs with EMA 0.999 + best-slot, one per gamma; the winner
# feeds the 12k stabilizer A/B. Runs sequentially (one TPU process at a time).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
for G in 0.1 1 10; do
  wd=/root/r4/sweep_r1_g${G}
  mkdir -p "$wd"
  echo "=== r1_gamma=${G} -> ${wd} ==="
  timeout 3600 python -m gan_inpainting_tpu train --config celebahq256_freeform \
    loss.r1_gamma=${G} train.g_ema_decay=0.999 \
    train.steps=2000 train.eval_every=500 train.checkpoint_every=1000 \
    train.workdir=${wd} > ${wd}/train.log 2>&1
  echo "exit=$? for gamma=${G}"
  tail -3 ${wd}/train.log
done
echo "SWEEP DONE"
