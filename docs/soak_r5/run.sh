#!/bin/bash
# Round-5 soak protocol (VERDICT r4 next #2): >=500 flagship optimizer
# steps on the chip, mid-run checkpoint -> kill -> resume -> finish.
# Half selection via $1 (1|2); both halves run the SAME command.
set -u
cd /root/repo
mkdir -p .soak
half="$1"
exec python -m motiondiffusion_moe_tpu.tools.train \
  --name soak_r5 --dataset synthetic --synthetic_size 8192 \
  --checkpoint_dir .soak/ckpts \
  --batch_size 32 --num_epochs 2 --steps_per_call 32 \
  --ema_decay 0.9999 --log_every 32 --save_latest 512 --seed 0 \
  > .soak/soak${half}.log 2>&1
