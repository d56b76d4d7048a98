"""DATOR training entry point (reference `dator/train.py` +
`processor/processor_depth.py:do_train_4DNet`).

    python -m instance_based_loc_tpu.cli.dator_train \
        --config cfg.yml data.root=/path/to/reid train.epochs=240

The reference's DDP init (train.py:64-66) becomes one jax mesh; its manual
2-GPU tower split becomes the mesh "model" axis (n_model_shards=2). Eval every
`eval.period` epochs runs the reference's three ablations — zero-RGB,
zero-depth, combined — each reporting CMC Rank-1/5/10 + mAP
(processor_depth.py:132-250). Checkpoints (params AND optimizer state) go to
orbax every `eval.checkpoint_period` epochs.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


_EVAL_APPLY_CACHE: dict = {}


def evaluate(state, sampler, samples, cfg, ablation: str = "both"):
    """R1/mAP eval with modality ablations (processor_depth.py:132-250)."""
    import jax
    import jax.numpy as jnp
    from ..models.dator.metrics import cosine_distmat, cmc_map, k_reciprocal_rerank

    # jit once PER RUN, not per evaluate() call: the raw apply_fn dispatches
    # op-by-op (measured ~10 min/ablation over the tunnel; ~20 s jitted),
    # and a fresh lambda per call would re-trace + remote-recompile at
    # every eval point
    apply = _EVAL_APPLY_CACHE.get(id(state.apply_fn))
    if apply is None:
        fn = state.apply_fn
        apply = jax.jit(lambda p, r, d: fn(p, r, d, training=False))
        _EVAL_APPLY_CACHE[id(state.apply_fn)] = apply
    feats, pids = [], []
    bs = cfg.data.batch_size
    idxs = list(range(len(samples)))
    for start in range(0, len(idxs), bs):
        chunk = idxs[start:start + bs]
        n_real = len(chunk)
        if n_real < bs:
            # pad the tail chunk to the full batch shape: a ragged last
            # batch is a fresh jit specialization = minutes of remote
            # compile per ablation over the tunnel
            chunk = chunk + [chunk[-1]] * (bs - n_real)
        rgb, depth, pid = sampler.load_batch(chunk, cfg.data.height, cfg.data.width)
        if ablation == "zero_rgb":
            rgb = np.zeros_like(rgb)
        elif ablation == "zero_depth":
            depth = np.zeros_like(depth)
        _, feat = apply(state.params, jnp.asarray(rgb), jnp.asarray(depth))
        feats.append(np.asarray(feat)[:n_real])
        pids.append(pid[:n_real])
    feats = np.concatenate(feats)
    pids = np.concatenate(pids)
    # query = first sample of each pid; gallery = the rest
    q_idx, g_idx = [], []
    seen = set()
    for i, p in enumerate(pids):
        (q_idx if p not in seen else g_idx).append(i)
        seen.add(int(p))
    if not g_idx:
        return {}
    if cfg.eval.re_ranking:
        dist = k_reciprocal_rerank(feats[q_idx], feats[g_idx])
    else:
        dist = cosine_distmat(feats[q_idx], feats[g_idx])
    cmc, mAP = cmc_map(dist, pids[q_idx], pids[g_idx],
                       max_rank=min(cfg.eval.max_rank, len(g_idx)))
    return {"rank1": float(cmc[0]),
            "rank5": float(cmc[min(4, len(cmc) - 1)]),
            "rank10": float(cmc[min(9, len(cmc) - 1)]),
            "mAP": mAP}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--pretrained", type=str, default=None,
                        help="HF ViTModel .bin/.pth to init both towers "
                             "(reference loads ImageNet weights then freezes "
                             "all but LoRA)")
    parser.add_argument("--resume", type=int, default=None, metavar="EPOCH",
                        help="restore params+optimizer from "
                             "output_dir/step_EPOCH and continue (the "
                             "reference cannot resume optimizer state — "
                             "SURVEY.md §5; orbax makes it free here)")
    parser.add_argument("--init-npz", type=str, default=None,
                        help="warm-start params from a flat .npz written by "
                             "save_params_npz (cross-round resume: orbax "
                             "dirs don't survive the build container, git "
                             "does). Optimizer state starts fresh; combine "
                             "with --resume-epoch to continue the LR "
                             "schedule from where the npz left off")
    parser.add_argument("--resume-epoch", type=int, default=0,
                        help="with --init-npz: epoch to continue from "
                             "(advances the cosine schedule by fast-running "
                             "the step counter)")
    parser.add_argument("--init-npz-filter", type=str, default=None,
                        help="comma-separated substrings; with --init-npz, "
                             "load ONLY params whose path contains one of "
                             "them (e.g. 'towers,aux_' = warm-start the "
                             "backbones + aux heads, re-init the fusion "
                             "head fresh). Others keep their fresh init")
    parser.add_argument("opts", nargs="*", help="dotted overrides a.b=c")
    args = parser.parse_args(argv)

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..config import load_config
    from ..parallel.mesh import make_mesh, shard_batch
    from ..models.dator.data import PKSampler, scan_instance_dirs
    from ..models.dator.train import (create_train_state,
                                      make_pjit_dataset_train_step,
                                      make_pjit_train_step, save_checkpoint)

    cfg = load_config(args.config, args.opts)
    os.makedirs(cfg.output_dir, exist_ok=True)

    samples = scan_instance_dirs(cfg.data.root)
    num_classes = len({s.pid for s in samples})
    print(f"ReID dataset: {len(samples)} samples / {num_classes} identities")
    import dataclasses
    model_cfg = dataclasses.replace(cfg.model, num_classes=num_classes)
    if os.environ.get("IBL_DATOR_F32"):
        # dotted overrides can't express a jnp dtype (type(current)(value)
        # mangles the class); env escape hatch for f32-compute probes
        import jax.numpy as jnp
        model_cfg = dataclasses.replace(
            model_cfg, dtype=jnp.float32,
            backbone=dataclasses.replace(model_cfg.backbone,
                                         dtype=jnp.float32))
        print("IBL_DATOR_F32: compute dtype forced to float32")

    sampler = PKSampler(samples, cfg.data.batch_size, cfg.data.num_instances,
                        seed=cfg.data.seed)

    # steps/epoch is data-driven (PKSampler drops ragged P×K remainders) —
    # the cosine horizon and any warm-start offset must use the REAL count,
    # not the config default, or the LR decays on the wrong clock
    # (ADVICE r4 #1: silent LR discontinuity on resume)
    actual_spe = len(sampler.epoch_batches(0))
    if actual_spe != cfg.train.steps_per_epoch:
        print(f"steps_per_epoch: config {cfg.train.steps_per_epoch} -> "
              f"actual {actual_spe} (cosine horizon follows the data)")
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, steps_per_epoch=actual_spe))
    if args.init_npz and args.resume_epoch:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train,
            schedule_offset_steps=args.resume_epoch
            * cfg.train.steps_per_epoch))

    # held-out eval split (VERDICT r3 item 1: rank1 must be measured on
    # identities' UNSEEN samples, not the training set)
    eval_sets = [("train", sampler, samples)]
    if cfg.data.val_root:
        val_samples = scan_instance_dirs(cfg.data.val_root)
        val_sampler = PKSampler(val_samples, cfg.data.batch_size,
                                cfg.data.num_instances, seed=cfg.data.seed)
        print(f"val split: {len(val_samples)} samples / "
              f"{len({s.pid for s in val_samples})} identities")
        eval_sets = [("val", val_sampler, val_samples)]
        if cfg.eval.train_split:
            eval_sets.append(("train", sampler, samples))

    mesh = make_mesh(n_model=cfg.n_model_shards)
    print(f"mesh: {mesh.shape}")

    state = create_train_state(model_cfg, cfg.train, jax.random.PRNGKey(0),
                               cfg.data.height, cfg.data.width,
                               pretrained_path=args.pretrained)
    start_epoch = 0
    if args.resume is not None:
        from ..models.dator.train import restore_checkpoint
        state = restore_checkpoint(
            state, os.path.abspath(cfg.output_dir), args.resume)
        start_epoch = args.resume
        print(f"resumed from {cfg.output_dir}/step_{args.resume} "
              f"(step={int(state.step)})")
    elif args.init_npz:
        from ..models.dator.train import load_params_npz
        # strict=False: params the current model grew since the npz was
        # written (e.g. the BNNeck bottleneck) keep their fresh init
        filt = (args.init_npz_filter.split(",")
                if args.init_npz_filter else None)
        state = state.replace(
            params=load_params_npz(state.params, args.init_npz,
                                   strict=False, key_filter=filt))
        start_epoch = args.resume_epoch
        print(f"warm-started params from {args.init_npz}; continuing at "
              f"epoch {start_epoch} (schedule offset "
              f"{cfg.train.schedule_offset_steps} steps, fresh optimizer)")

    # device-resident dataset: keep the whole quantized dataset in HBM and
    # upload only a (B,) index array per step (tens of bytes vs the batch
    # tensors — the tunnel-bound upload was the steady-state constraint)
    ds_mb = (len(samples) * cfg.data.height * cfg.data.width * 5) / 2**20
    use_device_ds = (ds_mb <= cfg.data.device_dataset_max_mb
                     if cfg.data.device_dataset == "auto"
                     else bool(cfg.data.device_dataset))
    if use_device_ds:
        print(f"device-resident dataset: {ds_mb:.1f} MB quantized")
        rep = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P("data"))
        ds_rgb, ds_depth, ds_pids = (
            jax.device_put(a, rep)
            for a in sampler.load_all(cfg.data.height, cfg.data.width))
        step_fn = make_pjit_dataset_train_step(mesh, state, cfg.train)
    else:
        step_fn = make_pjit_train_step(mesh, state, cfg.train,
                                       (cfg.data.batch_size, cfg.data.height,
                                        cfg.data.width))

    from ..models.dator.train import save_params_npz
    best_rank1 = -1.0
    with mesh:
        for epoch in range(start_epoch, cfg.train.epochs):
            t0 = time.time()
            batches = sampler.epoch_batches(epoch)
            losses = []
            id_losses = []
            # Pipelined stepping: fetching the loss synchronously every step
            # serializes host batch prep against device execution (and pays
            # the tunnel round-trip per step). Keep a small window of
            # in-flight steps and only materialize the oldest one's loss —
            # batch i+1 loads/uploads while steps i-3..i execute.
            aux_last = None
            pending = []
            for bi, batch_idxs in enumerate(batches):
                rng = jax.random.fold_in(jax.random.PRNGKey(1),
                                         epoch * 10000 + bi)
                if use_device_ds:
                    idxs = jax.device_put(
                        np.asarray(batch_idxs, np.int32), data_sh)
                    state, metrics = step_fn(state, ds_rgb, ds_depth,
                                             ds_pids, idxs, rng)
                else:
                    rgb, depth, pids = sampler.load_batch(
                        batch_idxs, cfg.data.height, cfg.data.width,
                        quantize=cfg.data.quantize_upload)
                    # numpy straight into device_put: one host->device
                    # transfer with the target sharding (jnp.asarray first
                    # would upload to the default device and then re-place)
                    rgb_s, depth_s, pids_s = shard_batch(mesh,
                                                         (rgb, depth, pids))
                    state, metrics = step_fn(state, rgb_s, depth_s, pids_s,
                                             rng)
                pending.append((metrics["loss"], metrics["id_loss"]))
                aux_last = metrics
                if len(pending) > 4:
                    l, il = pending.pop(0)
                    losses.append(float(l))
                    id_losses.append(float(il))
            for l, il in pending:
                losses.append(float(l))
                id_losses.append(float(il))
            dt = time.time() - t0
            sps = len(batches) * cfg.data.batch_size / max(dt, 1e-9)
            # last-batch loss components: is CE or triplet stuck at its
            # uniform floor? (ln(C) resp. softplus(0) — VERDICT r3 item 1)
            aux = ""
            if aux_last is not None:
                aux = " ".join(
                    f"{k}={float(v):.3f}" for k, v in sorted(aux_last.items())
                    if k != "loss")
            mean_id = float(np.mean(id_losses)) if id_losses else float("nan")
            print(f"epoch {epoch}: loss={np.mean(losses):.4f} "
                  f"epoch_id_loss={mean_id:.4f} "
                  f"({dt:.1f}s, {sps:.1f} samples/s) {aux}")

            # kill-gate (VERDICT r4 item 2): a flat id_loss at gate_epoch
            # means the fusion embedding is dead — burn no more chip time
            if (cfg.train.gate_epoch and epoch + 1 == cfg.train.gate_epoch
                    and mean_id > cfg.train.gate_id_loss):
                save_checkpoint(state, os.path.abspath(cfg.output_dir),
                                epoch + 1)
                print(f"KILL-GATE: epoch_id_loss={mean_id:.4f} > "
                      f"{cfg.train.gate_id_loss} at epoch {epoch + 1} "
                      f"(uniform floor ln(C)={np.log(num_classes):.3f}). "
                      f"The fusion head is not learning — aborting the "
                      f"schedule; checkpoint saved for diagnosis.")
                import sys
                sys.exit(3)

            if (epoch + 1) % cfg.eval.period == 0:
                for split, e_sampler, e_samples in eval_sets:
                    for ablation in ("zero_rgb", "zero_depth", "both"):
                        m = evaluate(state, e_sampler, e_samples, cfg,
                                     ablation)
                        print(f"  eval[{split}/{ablation}]: " +
                              " ".join(f"{k}={v:.4f}" for k, v in m.items()))
                        if (split == "val" and ablation == "both"
                                and m.get("rank1", -1) > best_rank1):
                            best_rank1 = m["rank1"]
                            path = os.path.join(cfg.output_dir,
                                                "best_params.npz")
                            save_params_npz(state.params, path)
                            print(f"  best val rank1={best_rank1:.4f} -> "
                                  f"{path} (epoch {epoch + 1})")
            if (epoch + 1) % cfg.eval.checkpoint_period == 0:
                save_checkpoint(state, os.path.abspath(cfg.output_dir), epoch + 1)
                save_params_npz(state.params,
                                os.path.join(cfg.output_dir,
                                             "params_latest.npz"))
                print(f"  checkpoint @ epoch {epoch + 1}")
    save_checkpoint(state, os.path.abspath(cfg.output_dir), cfg.train.epochs)
    return state


if __name__ == "__main__":
    main()
