"""Diagnose the 300-class loss floor (VERDICT r3 Missing #3) on CPU with a
tiny-geometry FourDNet: if a 2-layer, 32-wide model also stalls at
ln(C) + softplus(0) on trivially separable data, the floor is a training-
stack bug; if it cracks, the full-scale floor is an optimization-scale
problem (LR / schedule / epochs), not a code bug.

Synthetic data: class k's images are a fixed random template + small noise
— identity is linearly decodable from pixels, so any functioning stack
must overfit quickly.

    python perf/dator_floor_probe.py [--classes 300] [--epochs 30]
"""

from __future__ import annotations

import argparse
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--classes", type=int, default=300)
    p.add_argument("--per-class", type=int, default=4)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--optimizer", type=str, default="adamw")
    p.add_argument("--triplet-weight", type=float, default=1.0)
    p.add_argument("--lora-only", action="store_true")
    p.add_argument("--modality-dropout", action="store_true", default=False)
    p.add_argument("--bf16", action="store_true",
                   help="compute dtype bf16 (the full-scale default) instead "
                        "of the probe's f32")
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--img", type=str, default="32x16",
                   help="HxW, patch/stride scale with it (32x16 -> patch 8; "
                        "256x128 -> patch 16 = the full geometry)")
    p.add_argument("--data", type=str, default=None,
                   help="real dir-per-instance ReID root instead of the "
                        "synthetic templates (e.g. /tmp/reid300/train)")
    p.add_argument("--reduced-dim", type=int, default=32)
    p.add_argument("--tpu", action="store_true",
                   help="run on the default (axon/TPU) platform instead of "
                        "forcing cpu")
    args = p.parse_args()

    import jax
    if not args.tpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from instance_based_loc_tpu.models.dator.fourdnet import FourDNetConfig
    from instance_based_loc_tpu.models.dator.transreid_vit import (
        TransReIDConfig)
    from instance_based_loc_tpu.models.dator.train import (TrainConfig,
                                                           create_train_state,
                                                           train_step)

    h, w = (int(x) for x in args.img.split("x"))
    patch = 8 if h <= 64 else 16
    dt = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg = FourDNetConfig(
        backbone=TransReIDConfig(img_height=h, img_width=w, patch_size=patch,
                                 stride_size=patch, hidden_size=args.hidden,
                                 num_layers=args.layers,
                                 num_heads=args.heads, local_feature=True,
                                 dtype=dt),
        reduced_dim=args.reduced_dim, num_classes=args.classes,
        modality_dropout=args.modality_dropout, dtype=dt)

    if args.data:
        from instance_based_loc_tpu.models.dator.data import (
            PKSampler, scan_instance_dirs)
        samples = scan_instance_dirs(args.data)
        args.classes = len({s.pid for s in samples})
        cfg = FourDNetConfig(
            backbone=cfg.backbone, reduced_dim=args.reduced_dim,
            num_classes=args.classes,
            modality_dropout=args.modality_dropout, dtype=dt)
        sampler = PKSampler(samples, args.batch, 4, seed=0)
        rgb_all, depth_all, labels_all = sampler.load_batch(
            list(range(len(samples))), h, w)   # f32, normalized, 3-channel
        n = len(samples)
        print(f"real data: {n} samples / {args.classes} ids @ {h}x{w}")
    else:
        n = args.classes * args.per_class
        rng0 = np.random.default_rng(0)
        templates = rng0.normal(0, 1, (args.classes, h, w, 3)).astype(np.float32)
        labels_all = np.repeat(np.arange(args.classes), args.per_class)
        rgb_all = (templates[labels_all]
                   + rng0.normal(0, 0.1, (n, h, w, 3))).astype(np.float32)
        depth_all = rgb_all[..., :1].repeat(3, axis=-1)
    rng = np.random.default_rng(1)

    tc = TrainConfig(base_lr=args.lr, optimizer=args.optimizer,
                     epochs=args.epochs,
                     steps_per_epoch=max(1, n // args.batch),
                     warmup_epochs=1, lora_only=args.lora_only,
                     triplet_weight=args.triplet_weight)
    state = create_train_state(cfg, tc, jax.random.PRNGKey(0), h, w)

    import functools
    step = jax.jit(functools.partial(train_step, train_cfg=tc))
    floor = np.log(args.classes) + np.log(2.0) * args.triplet_weight
    print(f"uniform floor ~= {floor:.3f} "
          f"(ln({args.classes}) + {args.triplet_weight}*softplus(0))")
    order = np.arange(n)
    key = jax.random.PRNGKey(1)
    for epoch in range(args.epochs):
        rng.shuffle(order)
        t0 = time.time()
        logs = []
        for s in range(tc.steps_per_epoch):
            idx = order[s * args.batch:(s + 1) * args.batch]
            if len(idx) < args.batch:
                continue
            key, k = jax.random.split(key)
            state, m = step(state, jnp.asarray(rgb_all[idx]),
                            jnp.asarray(depth_all[idx]),
                            jnp.asarray(labels_all[idx]), k)
            logs.append({kk: float(vv) for kk, vv in m.items()})
        agg = {k: np.mean([l[k] for l in logs]) for k in logs[0]}
        print(f"epoch {epoch}: " +
              " ".join(f"{k}={v:.3f}" for k, v in sorted(agg.items())) +
              f" ({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    main()
