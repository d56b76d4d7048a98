#!/bin/bash
# Round-5 production DATOR training run (VERDICT r4 items 1+2), revised
# after the fixed-batch fit probes (perf/fusion_probe_r5.py, chip):
#
#   P1  CE-only head fit on warm towers: id_loss 6.15 -> 0.04, acc 1.0 in
#       175 steps (bf16, gamma stable) — the head and the bf16 path are
#       fine; out/dator_r5_train.log's 16 flat epochs were NOT a signal
#       problem.
#   The saboteur was the triplet's placement: on the raw post-BN feature
#   it can minimize softplus(d_ap - d_an) by shrinking the BNNeck scale
#   gamma -> 0, which zeroes the classifier logits (observed: triplet
#   11 -> ~0.9 while CE pinned at ln(300), acc 0). The reference avoids
#   this by keeping the triplet PRE-bottleneck (make_loss.py); our pre-BN
#   embedding starts DC-collapsed, so the scale-invariant variant is used:
#   triplet on the L2-NORMALIZED post-BN feature
#   (train.triplet_feature=post_bn_norm, the new default).
#
# Carried from the earlier r5 session (each with a recorded failure):
#   * detach_fusion=true — BNNeck amplifies head gradients by 1/batch_std;
#     full-train wrecked warm towers (out/dator_r5_fulltrain_wrecked.log),
#     LoRA-only starved them (out/dator_r5_loraonly_floored.log).
#   * token_ce=true — per-token CE makes the served token-mean embedding a
#     mean of discriminative features.
#   * warm start towers+aux only (--init-npz-filter): the npz's fusion
#     head weights encode the collapsed solution.
#
# New this run:
#   * train.augment=true — reference-strength flip/pad-crop/erasing (the
#     reference trains with INPUT.PROB/RE_PROB 0.5, PADDING 10; we had
#     none — 300 ids x 12 crops memorize without metric structure).
#   * base_lr 6e-4 (peak) with 5-epoch warmup and the cosine horizon on
#     the REAL steps/epoch: the r4-vs-r4c A/B showed sustained ~1e-3 is
#     bistable for the from-scratch towers (identical configs diverged;
#     r4's success rode its shorter decay horizon).
#   * eval.train_split=false — halves eval wall time; val is the signal.
#
# Kill-gate epoch 30: P1 fits a batch in ~3 epochs' worth of steps, so a
# flat epoch_id_loss at 30 means the recipe failed — abort, don't burn the
# schedule.
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
  train.base_lr=6e-4 train.weight_decay=1e-4 \
  train.warmup_epochs=5 train.lora_only=false \
  train.triplet_feature=post_bn_norm train.augment=true \
  train.aux_tower_weight=0.5 train.token_ce_weight=0.5 \
  train.gate_epoch=30 \
  eval.period=10 eval.checkpoint_period=40 eval.train_split=false \
  output_dir=out/dator_r5b
