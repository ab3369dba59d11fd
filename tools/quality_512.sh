#!/bin/bash
# 512^2 at-scale quality rerun (VERDICT r3 #3): places512_deepfill — EMA
# 0.999 baked into the named config — plus the round-4 A/B-winning R1
# stabilizer, applied lazily (StyleGAN2 lazy regularization: every 16th
# step at 16x gamma, ~1/16th of the grad-of-grad cost — negligible at
# 512^2). The 256^2 A/B showed EMA+R1 is the difference between a
# monotone run and best!=final drift; r3's EMA-only 512^2 run left a
# 0.25 dB gap off its step-7500 peak. Produces in-repo reproducible
# artifacts (curves + best-generator npz) via tools/pin_artifacts.py
# afterwards; bake r1 into the named config iff this run's evidence
# confirms it (same protocol as the 256^2 bake, commit 9fa39eb).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p /root/r4/qual512
timeout 10800 python -m gan_inpainting_tpu train --config places512_deepfill \
  train.steps=12000 train.eval_every=500 train.checkpoint_every=1000 \
  loss.r1_gamma=0.1 loss.r1_interval=16 \
  train.workdir=/root/r4/qual512 > /root/r4/qual512/train.log 2>&1
echo "exit=$?"
grep "eval@" /root/r4/qual512/train.log | tail -3
echo "QUAL512 DONE"
