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
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from instance_based_loc_tpu.models.dator.fourdnet import FourDNetConfig
    from instance_based_loc_tpu.models.dator.transreid_vit import (
        TransReIDConfig)
    from instance_based_loc_tpu.models.dator.train import (TrainConfig,
                                                           create_train_state,
                                                           train_step)

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
    args = p.parse_args()

    h, w = 32, 16
    cfg = FourDNetConfig(
        backbone=TransReIDConfig(img_height=h, img_width=w, patch_size=8,
                                 stride_size=8, hidden_size=32, num_layers=2,
                                 num_heads=4, local_feature=True,
                                 dtype=jnp.float32),
        reduced_dim=32, num_classes=args.classes,
        modality_dropout=args.modality_dropout, dtype=jnp.float32)

    n = args.classes * args.per_class
    rng = np.random.default_rng(0)
    templates = rng.normal(0, 1, (args.classes, h, w, 3)).astype(np.float32)
    labels_all = np.repeat(np.arange(args.classes), args.per_class)
    rgb_all = (templates[labels_all]
               + rng.normal(0, 0.1, (n, h, w, 3))).astype(np.float32)
    depth_all = rgb_all[..., :1].repeat(3, axis=-1)

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
