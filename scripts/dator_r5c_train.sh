#!/bin/bash
# The run that produced the committed checkpoint (out/dator_r5c_train.log,
# exported as out/dator_params_latest.npz). Differences vs
# dator_r5_train.sh (the 240-epoch launch): a 100-epoch horizon so the
# cosine COMPLETES inside the build round (the r4-vs-r4c A/B showed the
# completed short schedule succeeding where the same recipe on a longer
# horizon stayed floored), and a FULL warm start (no filter) from the
# 240-run's epoch-20 best — by then the fusion head had already left the
# collapsed solution, so re-initializing it would only discard progress.
#
#   bash scripts/dator_r5c_train.sh <warm_start.npz> [epochs=100]
set -u
INIT="${1:?path to warm-start npz (e.g. out/dator_params_latest.npz)}"
EPOCHS="${2:-100}"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

python -m instance_based_loc_tpu.cli.dator_train \
  --init-npz "$INIT" \
  data.root=/tmp/reid300/train data.val_root=/tmp/reid300/val \
  model.detach_fusion=true model.token_ce=true \
  train.epochs="$EPOCHS" train.optimizer=adamw \
  train.base_lr=6e-4 train.weight_decay=1e-4 \
  train.warmup_epochs=2 train.lora_only=false \
  train.triplet_feature=post_bn_norm train.augment=true \
  train.aux_tower_weight=0.5 train.token_ce_weight=0.5 \
  train.gate_epoch=20 \
  eval.period=10 eval.checkpoint_period=20 eval.train_split=false \
  output_dir=out/dator_r5c
