"""DATOR evaluation / embedding extraction (reference `dator/test.py` +
`dator/get_embeds.py:35-220`): load a trained checkpoint, embed a
dir-per-instance dataset, report CMC R1/5/10 + mAP (optionally re-ranked),
and write the pairwise cosine-similarity heatmap with class-boundary lines.

    python -m instance_based_loc_tpu.cli.dator_test --config cfg.yml \
        --checkpoint out/dator/step_240 data.root=./data/reid
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def cosine_heatmap(feats: np.ndarray, pids: np.ndarray, out_path: str):
    """Pairwise cosine heatmap with class boundaries (get_embeds.py:165-220)."""
    order = np.argsort(pids, kind="stable")
    f = feats[order]
    p = pids[order]
    f = f / np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-12)
    sim = f @ f.T

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 8))
    im = ax.imshow(sim, vmin=-1, vmax=1, cmap="viridis")
    bounds = np.nonzero(np.diff(p))[0] + 0.5
    for b in bounds:
        ax.axhline(b, color="red", linewidth=0.6)
        ax.axvline(b, color="red", linewidth=0.6)
    fig.colorbar(im)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="orbax checkpoint dir (step_N)")
    parser.add_argument("--heatmap", type=str, default=None,
                        help="write the cosine heatmap png here")
    parser.add_argument("opts", nargs="*")
    args = parser.parse_args(argv)

    import dataclasses
    import jax
    import jax.numpy as jnp
    from ..config import load_config
    from ..models.dator.data import PKSampler, scan_instance_dirs
    from ..models.dator.train import create_train_state, restore_checkpoint
    from ..models.dator.metrics import cosine_distmat, cmc_map, k_reciprocal_rerank

    cfg = load_config(args.config, args.opts)
    samples = scan_instance_dirs(cfg.data.root)
    num_classes = len({s.pid for s in samples})
    model_cfg = dataclasses.replace(cfg.model, num_classes=num_classes)
    state = create_train_state(model_cfg, cfg.train, jax.random.PRNGKey(0),
                               cfg.data.height, cfg.data.width)
    if args.checkpoint:
        path = os.path.abspath(args.checkpoint)
        base = os.path.basename(path)
        if base.split("_")[-1].isdigit():
            step = int(base.split("_")[-1])
            root = os.path.dirname(path)
        else:   # a checkpoint ROOT directory: pick the latest step
            steps = [int(d.split("_")[-1]) for d in os.listdir(path)
                     if d.split("_")[-1].isdigit()]
            if not steps:
                raise SystemExit(f"no checkpoints under {path}")
            step, root = max(steps), path
        state = restore_checkpoint(state, root, step)

    sampler = PKSampler(samples, cfg.data.batch_size, cfg.data.num_instances)
    feats, pids = [], []
    idxs = list(range(len(samples)))
    for start in range(0, len(idxs), cfg.data.batch_size):
        chunk = idxs[start:start + cfg.data.batch_size]
        rgb, depth, pid = sampler.load_batch(chunk, cfg.data.height,
                                             cfg.data.width)
        _, feat = state.apply_fn(state.params, jnp.asarray(rgb),
                                 jnp.asarray(depth), training=False)
        feats.append(np.asarray(feat))
        pids.append(pid)
    feats = np.concatenate(feats)
    pids = np.concatenate(pids)

    seen = set()
    q_idx, g_idx = [], []
    for i, p in enumerate(pids):
        (q_idx if p not in seen else g_idx).append(i)
        seen.add(int(p))
    if cfg.eval.re_ranking:
        dist = k_reciprocal_rerank(feats[q_idx], feats[g_idx])
    else:
        dist = cosine_distmat(feats[q_idx], feats[g_idx])
    cmc, mAP = cmc_map(dist, pids[q_idx], pids[g_idx],
                       max_rank=min(cfg.eval.max_rank, len(g_idx)))
    print(f"Rank-1: {cmc[0]:.4f}  Rank-5: {cmc[min(4, len(cmc)-1)]:.4f}  "
          f"Rank-10: {cmc[min(9, len(cmc)-1)]:.4f}  mAP: {mAP:.4f}")

    if args.heatmap:
        cosine_heatmap(feats, pids, args.heatmap)
        print(f"heatmap -> {args.heatmap}")
    return cmc, mAP


if __name__ == "__main__":
    main()
