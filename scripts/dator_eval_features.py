"""Evaluate a trained FourDNet checkpoint's two candidate re-ID features
on the held-out val split: the reference's 128-d fusion embedding vs the
aux-supervised tower-CLS concat (embedder feature="cls" opt-in).

    python scripts/dator_eval_features.py /tmp/dator_r4/step_50 \
        [--val /tmp/reid300/val] [--train /tmp/reid300/train]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("--val", default="/tmp/reid300/val")
    p.add_argument("--batch", type=int, default=64)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from instance_based_loc_tpu.models.dator.fourdnet import (FourDNet,
                                                              FourDNetConfig)
    from instance_based_loc_tpu.models.dator.data import (PKSampler,
                                                          scan_instance_dirs)
    from instance_based_loc_tpu.models.dator.metrics import (cosine_distmat,
                                                             cmc_map)

    if args.checkpoint.endswith(".npz"):
        from instance_based_loc_tpu.models.dator.train import flat_npz_to_tree
        params = flat_npz_to_tree(args.checkpoint)
    else:
        with ocp.StandardCheckpointer() as ckptr:
            raw = ckptr.restore(os.path.abspath(args.checkpoint))
        params = raw["params"] if "params" in raw else raw
    n_cls = int(np.asarray(
        params["params"]["classifier"]["kernel"]).shape[-1])
    import dataclasses
    # pre-BNNeck checkpoints have no bottleneck params: evaluate them under
    # the architecture they were trained as (bnneck=False)
    has_neck = "bottleneck" in params.get("params", {})
    cfg = dataclasses.replace(FourDNetConfig(), num_classes=n_cls,
                              bnneck=has_neck)
    if not has_neck:
        print("(pre-BNNeck checkpoint: evaluating with bnneck=False)")
    model = FourDNet(cfg)
    params = jax.device_put(params)

    @jax.jit
    def apply(p, rgb, depth):
        _, emb, (rc, dc) = model.apply(p, rgb, depth, training=False,
                                       return_cls_tokens=True)
        rc = rc / (jnp.linalg.norm(rc, axis=-1, keepdims=True) + 1e-8)
        dc = dc / (jnp.linalg.norm(dc, axis=-1, keepdims=True) + 1e-8)
        return emb, jnp.concatenate([rc, dc], axis=-1)

    samples = scan_instance_dirs(args.val)
    sampler = PKSampler(samples, args.batch, 4, seed=0)
    embs, clss, pids = [], [], []
    idxs = list(range(len(samples)))
    for start in range(0, len(idxs), args.batch):
        chunk = idxs[start:start + args.batch]
        n_real = len(chunk)
        if n_real < args.batch:
            chunk = chunk + [chunk[-1]] * (args.batch - n_real)
        rgb, depth, pid = sampler.load_batch(chunk, 256, 128)
        e, c = apply(params, jnp.asarray(rgb), jnp.asarray(depth))
        embs.append(np.asarray(e)[:n_real])
        clss.append(np.asarray(c)[:n_real])
        pids.append(pid[:n_real])
    embs, clss = np.concatenate(embs), np.concatenate(clss)
    pids = np.concatenate(pids)

    q_idx, g_idx, seen = [], [], set()
    for i, pp in enumerate(pids):
        (q_idx if pp not in seen else g_idx).append(i)
        seen.add(int(pp))
    for name, feats in (("embedding(128d)", embs), ("cls-concat", clss)):
        dist = cosine_distmat(feats[q_idx], feats[g_idx])
        cmc, mAP = cmc_map(dist, pids[q_idx], pids[g_idx], max_rank=10)
        print(f"{name}: rank1={cmc[0]:.4f} rank5={cmc[min(4, len(cmc)-1)]:.4f} "
              f"mAP={mAP:.4f}  (val {len(q_idx)} queries / {len(g_idx)} gallery)")


if __name__ == "__main__":
    main()
