#!/bin/bash
# Round-5 production DATOR training run (VERDICT r4 items 1+2).
#
# Recipe — three coupled fixes over the r4 "aux-CE only" run, each with a
# recorded failure behind it:
#   * BNNeck on the fusion embedding (fourdnet.FourDNetConfig.bnneck):
#     the raw token-mean embedding is collapsed (DC norm 9.86 vs 4.4e-4
#     per-sample std on the r4 checkpoint) — CE/triplet floored for 150
#     epochs without it.
#   * model.detach_fusion=true: stop-gradient between towers and fusion
#     head. The BNNeck amplifies fusion gradients by 1/batch_std (~2500x
#     while collapsed); a full-train attempt destroyed warm-started tower
#     features inside one epoch (out/dator_r5_fulltrain_wrecked.log), and
#     a LoRA-only attempt starved the towers instead
#     (out/dator_r5_loraonly_floored.log). Decoupled: towers train purely
#     from the aux CE heads (the r4-proven recipe), the head trains on
#     stop_gradient(tokens).
#   * model.token_ce=true: per-token CE on the fused token map (BN'd,
#     shared classifier) — the served token-MEAN embedding becomes a mean
#     of per-token-discriminative features (the reference's multi-stream
#     local-CE pattern, loss/make_loss.py:41-93).
#
# Warm start: towers+aux heads only from the committed npz
# (--init-npz-filter; the npz's fusion head encodes the collapsed
# solution). NOTE the npz is r4c-quality (cls-concat val rank1 0.033, not
# the r4-reported 0.15 — the orbax dir was overwritten before export), so
# towers effectively retrain; the filter load is a minor head start.
# Kill-gate at epoch 30: towers need ~25 epochs of aux CE before their
# features carry signal (r4 curve), then the BN'd head must move id_loss
# off the ln(300)=5.70 floor.
#
#   bash scripts/dator_r5_train.sh [epochs=240]
set -u
EPOCHS="${1:-240}"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

python -m instance_based_loc_tpu.cli.dator_train \
  --init-npz out/dator_params_latest.npz --init-npz-filter towers,aux_ \
  data.root=/tmp/reid300/train data.val_root=/tmp/reid300/val \
  model.detach_fusion=true model.token_ce=true \
  train.epochs="$EPOCHS" train.optimizer=adamw \
  train.base_lr=1e-3 train.weight_decay=1e-4 \
  train.warmup_epochs=3 train.lora_only=false \
  train.aux_tower_weight=0.5 train.token_ce_weight=0.5 \
  train.gate_epoch=30 \
  eval.period=10 eval.checkpoint_period=20 \
  output_dir=out/dator_r5
