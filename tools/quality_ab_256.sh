#!/bin/bash
# The r4 stabilizer A/B (VERDICT r3 #2): celebahq256_freeform 12k steps,
# stabilized (EMA 0.999 + R1 gamma=0.1 from the 3-point sweep + best-slot)
# vs the r3 baseline recipe, sequentially (one TPU process at a time).
# SWD rides the eval (configs now enable it) so the curves carry it.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

echo "=== stabilized: EMA 0.999 + R1 0.1 ==="
mkdir -p /root/r4/qual256_stab
timeout 7200 python -m gan_inpainting_tpu train --config celebahq256_freeform \
  train.steps=12000 train.eval_every=500 train.checkpoint_every=1000 \
  train.g_ema_decay=0.999 loss.r1_gamma=0.1 \
  train.workdir=/root/r4/qual256_stab > /root/r4/qual256_stab/train.log 2>&1
echo "stabilized exit=$?"
tail -2 /root/r4/qual256_stab/train.log

echo "=== baseline: r3 recipe (no EMA, no R1) ==="
mkdir -p /root/r4/qual256_base
timeout 7200 python -m gan_inpainting_tpu train --config celebahq256_freeform \
  train.steps=12000 train.eval_every=500 train.checkpoint_every=1000 \
  train.workdir=/root/r4/qual256_base > /root/r4/qual256_base/train.log 2>&1
echo "baseline exit=$?"
tail -2 /root/r4/qual256_base/train.log
echo "AB DONE"
