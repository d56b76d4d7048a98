#!/bin/bash
# Short on-chip LR sweep for the from-scratch ViT-B FourDNet (VERDICT r3
# item 1). The r3 run (SGD 0.008, LoRA-only over random towers) and the
# first r4 run (AdamW 3e-4 full-train) both pinned to the uniform-loss
# floor; the CPU floor probe shows the stack learns at tiny scale, so the
# failure is optimization-scale. Each config runs N short epochs — enough
# to see whether id_loss breaks below ln(300)=5.70 — and the winner gets
# the 240-epoch schedule.
#
#   bash scripts/dator_lr_sweep.sh [epochs=12]
set -u
EPOCHS="${1:-12}"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run() {
  name="$1"; shift
  echo "=== sweep: $name ==="
  timeout 1500 python -m instance_based_loc_tpu.cli.dator_train \
    data.root=/tmp/reid300/train \
    output_dir=/tmp/dator_sweep_$name \
    train.epochs="$EPOCHS" train.optimizer=adamw \
    train.lora_only=false train.warmup_epochs=3 \
    train.steps_per_epoch=56 train.grad_clip=1.0 \
    eval.period=1000 eval.checkpoint_period=1000 \
    "$@" > "out/dator_sweep_$name.log" 2>&1
  echo "rc=$?" >> "out/dator_sweep_$name.log"
  tail -3 "out/dator_sweep_$name.log"
}

run lr1e3 train.base_lr=1e-3 train.weight_decay=0.05
run lr1e4 train.base_lr=1e-4 train.weight_decay=0.05
run lr3e5 train.base_lr=3e-5 train.weight_decay=0.05
