"""Round-5 fusion-head collapse probes (VERDICT r4 item 1).

Short, decisive experiments on why the FourDNet fusion embedding's id_loss
stays pinned at the ln(300)=5.70 uniform floor (out/dator_r5_train.log:
16 epochs flat with BNNeck + detach_fusion) while the tiny-model smoke test
learns. Hypotheses under test:

  H1 (triplet collapse): with the BNNeck, BOTH the CE and the triplet read
     the post-BN feature; the triplet can minimize itself by driving the BN
     scale gamma -> 0 (observed signature: triplet 11 -> ~softplus(0), CE
     exactly at floor, acc 0). Probe: CE-only vs CE+triplet(post_bn) vs
     CE+triplet(post_bn_norm), watching ||gamma||.
  H2 (bf16 quantization): the sample-dependent signal of the fused
     embedding (~4.4e-4) rides a DC ~9.86 through a bf16 tower residual
     stream (rel. resolution ~4e-3) — the signal may be quantized away
     before the BNNeck can rescale it. Probe: --f32 flag runs the whole
     model in f32; compare pre-BN per-sample std and fit speed.
  H3 (dead towers): the committed npz towers are r4c-quality; if their
     CLS tokens are near input-independent no head can fit. Probe:
     per-sample std of tower tokens + aux-CE-only fit (--aux-only).

Usage (on the tunneled chip):
  PYTHONPATH=/root/repo:/root/.axon_site python perf/fusion_probe_r5.py \
      --steps 300 --triplet none --fixed-batch [--f32] [--fresh] [--aux-only]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="/tmp/reid300/train")
    p.add_argument("--npz", default="out/dator_params_latest.npz")
    p.add_argument("--fresh", action="store_true",
                   help="no warm start (fresh init everywhere)")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--triplet", default="none",
                   choices=["none", "post_bn", "post_bn_norm", "pre_bn"])
    p.add_argument("--aux-weight", type=float, default=0.0)
    p.add_argument("--aux-only", action="store_true",
                   help="aux CE only: id/triplet weights 0, aux weight 1")
    p.add_argument("--f32", action="store_true", help="model dtype float32")
    p.add_argument("--no-detach", action="store_true")
    p.add_argument("--modality-dropout", action="store_true",
                   help="keep train-time modality dropout on (default off "
                        "for clean fit probes)")
    p.add_argument("--fixed-batch", action="store_true",
                   help="overfit ONE 16x4 batch (memorization sanity); "
                        "default cycles batches from a 64-identity pool")
    p.add_argument("--log-every", type=int, default=25)
    args = p.parse_args()

    from instance_based_loc_tpu.models.dator.data import PKSampler, scan_instance_dirs
    from instance_based_loc_tpu.models.dator.fourdnet import FourDNetConfig
    from instance_based_loc_tpu.models.dator.transreid_vit import TransReIDConfig
    from instance_based_loc_tpu.models.dator.train import (
        TrainConfig, create_train_state, load_params_npz, train_step)

    samples = scan_instance_dirs(args.data)
    num_classes = max(s.pid for s in samples) + 1
    if not args.fixed_batch:
        pool = [s for s in samples if s.pid < 64]
        sampler = PKSampler(pool, batch_size=64, num_instances=4, seed=0)
    else:
        sampler = PKSampler(samples, batch_size=64, num_instances=4, seed=0)
    batches = sampler.epoch_batches(0)
    print(f"dataset: {len(samples)} samples / {num_classes} ids; "
          f"{len(batches)} pool batches; fixed={args.fixed_batch}")

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    mcfg = FourDNetConfig(
        backbone=TransReIDConfig(local_feature=True, dtype=dtype),
        num_classes=num_classes, bnneck=True,
        detach_fusion=not args.no_detach,
        modality_dropout=args.modality_dropout,
        token_ce=False, dtype=dtype)
    tcfg = TrainConfig(
        base_lr=args.lr, weight_decay=1e-4, optimizer="adamw",
        epochs=1, warmup_epochs=0,
        steps_per_epoch=max(args.steps * 10, 1000),  # ~constant LR
        lora_only=False,
        id_loss_weight=0.0 if args.aux_only else 1.0,
        triplet_weight=0.0 if args.triplet == "none" or args.aux_only else 1.0,
        triplet_feature=args.triplet if args.triplet != "none" else "post_bn",
        aux_tower_weight=1.0 if args.aux_only else args.aux_weight)

    state = create_train_state(mcfg, tcfg, jax.random.PRNGKey(0))
    if not args.fresh:
        state = state.replace(params=load_params_npz(
            state.params, args.npz, strict=False,
            key_filter=["towers", "aux_"]))
        print(f"warm-started towers+aux from {args.npz}")

    # --- diagnostics -------------------------------------------------- #
    @jax.jit
    def diag(params, rgb, depth):
        out, muts = state.apply_fn(params, rgb, depth, training=False,
                                   return_cls_tokens=True,
                                   mutable=["intermediates"])
        raw = muts["intermediates"]["embedding_raw"][0]
        rgb_cls, depth_cls = out[2]

        def stats(x):
            x = x.astype(jnp.float32)
            dc = jnp.linalg.norm(jnp.mean(x, axis=0))
            std = jnp.mean(jnp.std(x, axis=0))
            xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
            cos = xn @ xn.T
            off = (jnp.sum(cos) - x.shape[0]) / (x.shape[0] * (x.shape[0] - 1))
            return dc, std, off
        return {"raw_emb": stats(raw), "rgb_cls": stats(rgb_cls),
                "depth_cls": stats(depth_cls)}

    step_fn = jax.jit(lambda s, r, d, l, k: train_step(s, r, d, l, k, tcfg))

    loaded = {}

    def get_batch(i):
        bi = 0 if args.fixed_batch else i % len(batches)
        if bi not in loaded:
            loaded[bi] = sampler.load_batch(batches[bi])
        rgb, depth, pids = loaded[bi]
        return (jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(pids))

    rgb0, depth0, _ = get_batch(0)
    d = jax.device_get(diag(state.params, rgb0, depth0))
    for k, (dc, std, off) in d.items():
        print(f"init {k}: dc_norm={float(dc):.4g} sample_std={float(std):.4g} "
              f"offdiag_cos={float(off):.6f}")

    t0 = time.time()
    for i in range(args.steps):
        rgb, depth, pids = get_batch(i)
        state, m = step_fn(state, rgb, depth, pids, jax.random.PRNGKey(i))
        if i % args.log_every == 0 or i == args.steps - 1:
            m = jax.device_get(m)
            gamma = state.params["params"].get("bottleneck", {}).get("scale")
            gnorm = float(jnp.linalg.norm(gamma)) if gamma is not None else -1
            extra = " ".join(f"{k}={float(v):.4f}" for k, v in sorted(m.items()))
            print(f"step {i:4d} [{time.time()-t0:6.1f}s] {extra} "
                  f"gamma_norm={gnorm:.4f}", flush=True)

    d = jax.device_get(diag(state.params, rgb0, depth0))
    for k, (dc, std, off) in d.items():
        print(f"final {k}: dc_norm={float(dc):.4g} sample_std={float(std):.4g} "
              f"offdiag_cos={float(off):.6f}")


if __name__ == "__main__":
    main()
