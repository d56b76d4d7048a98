"""DATOR training: pjit data-parallel (+ tower-model-parallel) train step,
cosine LR with warmup, LoRA-only fine-tuning masks, orbax checkpointing.

Reference: `dator/processor/processor_depth.py:23-284` (240 epochs, amp
autocast, grad-clip 1000, ckpt every 20 epochs, eval every 5 epochs with
zero-RGB / zero-depth / combined ablations), `dator/solver/` (SGD/Adam/AdamW,
cosine schedule with warmup), `dator/train.py` (DDP init -> here one mesh).

Improvements over the reference: optimizer state is checkpointed too (the
reference only saves weights — SURVEY.md §5 'no optimizer-state resume'),
and mixed precision is native bf16 rather than torch amp.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from .fourdnet import FourDNet, FourDNetConfig
from .losses import center_loss, margin_logits, reid_loss


@dataclasses.dataclass
class TrainConfig:
    base_lr: float = 0.008          # config.yml SOLVER.BASE_LR
    weight_decay: float = 1e-4
    optimizer: str = "sgd"          # sgd | adam | adamw (solver/make_optimizer.py)
    momentum: float = 0.9
    epochs: int = 240               # scheduler_factory.py hard-codes 240
    warmup_epochs: int = 5
    steps_per_epoch: int = 100
    grad_clip: float = 1000.0       # processor_depth.py:96
    id_loss_weight: float = 1.0
    triplet_weight: float = 1.0
    label_smoothing: float = 0.0
    # margin-classifier ID loss (defaults.py MODEL.ID_LOSS_TYPE 'softmax';
    # options arcface|cosface|amsoftmax|circle reuse the classifier kernel
    # as the cosine prototype matrix)
    id_loss_type: str = "softmax"
    margin_scale: float = 30.0      # defaults.py SOLVER.COSINE_SCALE
    margin: float = 0.5             # defaults.py SOLVER.COSINE_MARGIN
    # center loss (defaults.py SOLVER.CENTER_LOSS_WEIGHT 0.0005 when
    # MODEL.IF_WITH_CENTER 'yes'; 0 disables). Centers live as an extra
    # trainable leaf under params and follow the main schedule (the
    # reference gives them their own SGD at CENTER_LR).
    center_loss_weight: float = 0.0
    lora_only: bool = True          # freeze towers except LoRA (make_model.py:466-477)
    # train-time auxiliary CE on the tower CLS tokens (FourDNet returns
    # them when training=True). Needed for from-scratch training at the
    # full 129-token geometry — see the rationale in fourdnet.py; mirrors
    # the reference's multi-stream CE weighting (make_loss.py:41-93).
    aux_tower_weight: float = 0.5
    # weight of the per-token CE on the fused token map (active when the
    # model is built with token_ce=True; see fourdnet.FourDNetConfig)
    token_ce_weight: float = 0.5
    # which feature the batch-hard triplet sees:
    #   post_bn      — the served post-BNNeck embedding, raw euclidean.
    #                  UNSAFE with bnneck: the triplet can minimize itself
    #                  by driving the BN scale gamma -> 0, which zeroes the
    #                  classifier logits too (the r5 flat-id_loss signature:
    #                  triplet 11 -> softplus(0) while CE pinned at ln(C)).
    #   pre_bn       — the reference's placement (make_loss.py:41-93 uses
    #                  the pre-bottleneck global_feat).
    #   post_bn_norm — L2-normalized post-BN feature: scale-invariant, the
    #                  collapse channel is closed by construction.
    triplet_feature: str = "post_bn_norm"
    # device-side flip/crop/erase augmentation (reference INPUT config);
    # off by default so fit-probe/smoke paths stay deterministic
    augment: bool = False
    # cross-round resume: shift the cosine schedule by this many steps when
    # warm-starting from a params-only npz (fresh optimizer state cannot
    # carry optax's internal step count)
    schedule_offset_steps: int = 0
    # kill-gate (VERDICT r4 item 2): abort the run with a diagnosis if the
    # fusion head's CE is still pinned near the ln(C) uniform floor at
    # `gate_epoch` — flat id_loss means the embedding is dead and the rest
    # of the schedule is wasted chip time. gate_epoch=0 disables.
    gate_epoch: int = 20
    gate_id_loss: float = 5.5


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)


def cosine_schedule(cfg: TrainConfig) -> optax.Schedule:
    total = cfg.epochs * cfg.steps_per_epoch
    warmup = min(cfg.warmup_epochs * cfg.steps_per_epoch, max(total - 1, 0))
    base = optax.warmup_cosine_decay_schedule(
        init_value=cfg.base_lr * 0.01, peak_value=cfg.base_lr,
        warmup_steps=max(warmup, 1), decay_steps=max(total, 2))
    if cfg.schedule_offset_steps:
        return lambda count: base(count + cfg.schedule_offset_steps)
    return base


def _trainable_mask(params, lora_only: bool):
    """True = trainable. When lora_only, only LoRA matrices inside the towers
    train; the fusion/projection/classifier heads always train (they have no
    pretrained weights — make_model.py freezes only the backbones)."""
    def decide(path, _leaf):
        names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        if any(n == "batch_stats" for n in names):
            # BN running stats: updated by the forward pass's mutable
            # collection, never by the optimizer (adamw's weight decay on
            # zero-grad leaves would otherwise decay them)
            return False
        in_towers = any("towers" in n for n in names)
        is_lora = any("lora" in n for n in names)
        if not in_towers:
            return True
        return (not lora_only) or is_lora
    return jax.tree_util.tree_map_with_path(decide, params)


def make_optimizer(cfg: TrainConfig, params) -> optax.GradientTransformation:
    sched = cosine_schedule(cfg)
    if cfg.optimizer == "sgd":
        opt = optax.chain(optax.add_decayed_weights(cfg.weight_decay),
                          optax.sgd(sched, momentum=cfg.momentum))
    elif cfg.optimizer == "adam":
        opt = optax.adam(sched)
    elif cfg.optimizer == "adamw":
        opt = optax.adamw(sched, weight_decay=cfg.weight_decay)
    else:
        raise ValueError(cfg.optimizer)
    mask = _trainable_mask(params, cfg.lora_only)
    labels = jax.tree_util.tree_map(lambda m: "train" if m else "freeze", mask)
    # NOTE: optax.masked would pass frozen-leaf updates through unchanged;
    # multi_transform with set_to_zero actually freezes them.
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.multi_transform({"train": opt, "freeze": optax.set_to_zero()},
                              labels),
    )


def load_pretrained_towers(params, hf_state_dict, backbone_cfg):
    """Load pretrained ViT weights (HF ViTModel layout) into BOTH stacked
    FourDNet towers — the reference's ImageNet init before the LoRA-only
    freeze (make_model.py:466-477; pos-embed resize vit_pytorch.py:484-499).
    Returns a new full params tree."""
    import flax
    from .transreid_vit import port_hf_vit_to_transreid
    p = flax.core.unfreeze(params)
    towers = p["params"]["towers"]
    single = jax.tree.map(lambda x: np.asarray(x)[0], towers)
    ported = port_hf_vit_to_transreid(hf_state_dict, backbone_cfg,
                                      {"params": single})["params"]
    p["params"]["towers"] = jax.tree.map(
        lambda x: np.broadcast_to(
            np.asarray(x, np.float32)[None],
            (2,) + np.asarray(x).shape).copy(), ported)
    return flax.core.freeze(p) if isinstance(params, flax.core.FrozenDict) \
        else p


def create_train_state(model_cfg: FourDNetConfig, train_cfg: TrainConfig,
                       rng: jax.Array, height: int = 256, width: int = 128,
                       pretrained_path: str | None = None,
                       host_init: bool = True) -> TrainState:
    model = FourDNet(model_cfg)
    dummy_rgb = jnp.zeros((2, height, width, 3), jnp.float32)
    dummy_depth = jnp.zeros((2, height, width, 3), jnp.float32)
    # training=True so the train-only aux tower heads get params (flax
    # only creates params for executed branches); inference-time apply
    # simply never reads them
    if host_init:
        # model.init is a fresh remote compile over the axon tunnel
        # (minutes for the dual-ViT graph); host_train_init reproduces the
        # declared initializer distributions from eval_shape alone
        from ..init_utils import host_train_init
        seed = int(np.asarray(
            jax.random.randint(rng, (), 0, 2**31 - 1)))
        params = host_train_init(model, seed, dummy_rgb, dummy_depth,
                                 training=True,
                                 rngs={"params": rng, "dropout": rng})
    else:
        params = model.init({"params": rng, "dropout": rng},
                            dummy_rgb, dummy_depth, training=True)
    if train_cfg.center_loss_weight > 0:
        import flax
        feat_dim = params["params"]["classifier"]["kernel"].shape[0]
        p = flax.core.unfreeze(params)
        p["params"]["center_centers"] = jax.random.normal(
            jax.random.fold_in(rng, 7),
            (model_cfg.num_classes, feat_dim), jnp.float32)
        params = (flax.core.freeze(p)
                  if isinstance(params, flax.core.FrozenDict) else p)
    if pretrained_path:
        import torch
        sd = torch.load(pretrained_path, map_location="cpu",
                        weights_only=True)
        sd = {k.removeprefix("vit."): v.numpy() for k, v in sd.items()}
        params = load_pretrained_towers(params, sd, model_cfg.backbone)
    tx = make_optimizer(train_cfg, params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), tx=tx, apply_fn=model.apply)


def dequantize_batch(rgb, depth):
    """Device-side inverse of `data.PKSampler.load_batch(quantize=True)`:
    u8 rgb and single-channel u16 depth -> the normalized f32 tensors the
    model expects. rgb: u8*(2/255)-1 == ((u8/255)-.5)/.5 exactly; depth:
    u16*(2/65535)-1 matches the f32 clip[0,50]->[-1,1] recipe within the
    0.76 mm input quantization. f32 inputs pass through unchanged."""
    if rgb.dtype == jnp.uint8:
        rgb = rgb.astype(jnp.float32) * (2.0 / 255.0) - 1.0
    if depth.dtype == jnp.uint16:
        d = depth.astype(jnp.float32) * (2.0 / 65535.0) - 1.0
        depth = jnp.repeat(d[..., None], 3, axis=-1)
    return rgb, depth


def augment_batch(rgb, depth, key):
    """Device-side train augmentation at reference strength
    (dator/config/defaults.py INPUT: flip PROB 0.5, PADDING 10 + random
    crop, random-erasing RE_PROB 0.5). Runs inside the jitted train step on
    the dequantized f32 batch — the host pipeline stays quantized/static.
    Unlike the reference (which draws separate torchvision transforms for
    the rgb and depth images), flip/crop parameters are SHARED across
    modalities so the spatial correspondence the fusion blocks sample over
    survives augmentation; erasing is rgb-only, matching the reference's
    depth transform (bases.py depth path has no RandomErasing)."""
    b, h, w, _ = rgb.shape
    pad = 10
    k_flip, k_dx, k_dy, k_re, k_rx, k_ry, k_rw, k_rh = jax.random.split(key, 8)

    flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    rgb = jnp.where(flip[:, None, None, None], rgb[:, :, ::-1, :], rgb)
    depth = jnp.where(flip[:, None, None, None], depth[:, :, ::-1, :], depth)

    # pad + random crop == per-sample translation by (dy, dx) in [-10, 10];
    # zero padding matches torchvision Pad(fill=0) on the normalized tensors
    dy = jax.random.randint(k_dy, (b,), -pad, pad + 1)
    dx = jax.random.randint(k_dx, (b,), -pad, pad + 1)

    def translate(img, dy, dx):
        padded = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)))
        return jax.lax.dynamic_slice(padded, (pad + dy, pad + dx, 0),
                                     img.shape)
    rgb = jax.vmap(translate)(rgb, dy, dx)
    depth = jax.vmap(translate)(depth, dy, dx)

    # random erasing (rgb only): p=0.5, area in [0.02, 0.4] of the image,
    # aspect in [0.3, 3.3] (torchvision defaults used by the reference),
    # filled with the batch mean color
    re_on = jax.random.bernoulli(k_re, 0.5, (b,))
    area = jax.random.uniform(k_rw, (b,), minval=0.02, maxval=0.4) * (h * w)
    aspect = jnp.exp(jax.random.uniform(
        k_rh, (b,), minval=jnp.log(0.3), maxval=jnp.log(3.3)))
    eh = jnp.clip(jnp.sqrt(area * aspect), 1, h - 1).astype(jnp.int32)
    ew = jnp.clip(jnp.sqrt(area / aspect), 1, w - 1).astype(jnp.int32)
    y0 = (jax.random.uniform(k_ry, (b,)) * (h - eh)).astype(jnp.int32)
    x0 = (jax.random.uniform(k_rx, (b,)) * (w - ew)).astype(jnp.int32)
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    inside = ((yy >= y0[:, None, None]) & (yy < (y0 + eh)[:, None, None])
              & (xx >= x0[:, None, None]) & (xx < (x0 + ew)[:, None, None]))
    mask = (inside & re_on[:, None, None])[..., None]
    fill = jnp.mean(rgb, axis=(1, 2), keepdims=True)
    rgb = jnp.where(mask, fill, rgb)
    return rgb, depth


def train_step(state: TrainState, rgb, depth, labels, rng,
               train_cfg: TrainConfig):
    """One CE+triplet step. Pure function of (state, batch, rng) — jit/pjit it
    with the shardings from `parallel.sharding.dator_shardings`. Accepts
    quantized (u8 rgb / u16 depth) batches and dequantizes on device."""
    rgb, depth = dequantize_batch(rgb, depth)
    if train_cfg.augment:
        aug_rng, rng = jax.random.split(jax.random.fold_in(rng, 17))
        rgb, depth = augment_batch(rgb, depth, aug_rng)

    def loss_fn(params):
        out, mutated = state.apply_fn(
            params, rgb, depth, training=True, rngs={"dropout": rng},
            mutable=["batch_stats", "intermediates"])
        cls_score, feat = out[0], out[1]
        aux_scores = out[2] if len(out) > 2 else ()
        if train_cfg.triplet_feature == "pre_bn":
            tri_feat = mutated["intermediates"]["embedding_raw"][0]
        elif train_cfg.triplet_feature == "post_bn_norm":
            tri_feat = feat / (jnp.linalg.norm(feat, axis=-1,
                                               keepdims=True) + 1e-12)
        elif train_cfg.triplet_feature == "post_bn":
            tri_feat = feat
        else:
            raise ValueError(train_cfg.triplet_feature)
        mutated = {k: v for k, v in mutated.items() if k != "intermediates"}
        id_score = cls_score
        if train_cfg.id_loss_type != "softmax":
            # margin head: the classifier kernel doubles as the cosine
            # prototype matrix ((feat, C) -> (C, feat)); bias is unused,
            # matching the bias-free Parameters in metric_learning.py
            w = params["params"]["classifier"]["kernel"].T
            id_score = margin_logits(
                train_cfg.id_loss_type, feat, w, labels,
                s=train_cfg.margin_scale, m=train_cfg.margin)
        total, aux = reid_loss(
            id_score, tri_feat, labels,
            id_weight=train_cfg.id_loss_weight,
            triplet_weight=train_cfg.triplet_weight,
            label_smoothing=train_cfg.label_smoothing)
        if aux_scores and train_cfg.aux_tower_weight > 0:
            from .losses import cross_entropy
            aux_ce = sum(cross_entropy(s, labels,
                                       train_cfg.label_smoothing)
                         for s in aux_scores) / len(aux_scores)
            total = total + train_cfg.aux_tower_weight * aux_ce
            aux["aux_tower_loss"] = aux_ce
        if len(out) > 3 and train_cfg.token_ce_weight > 0:
            from .losses import cross_entropy
            tok_scores = out[3]                      # (B, N, C)
            bsz, ntok, ncls = tok_scores.shape
            tok_ce = cross_entropy(
                tok_scores.reshape(bsz * ntok, ncls),
                jnp.repeat(labels, ntok), train_cfg.label_smoothing)
            total = total + train_cfg.token_ce_weight * tok_ce
            aux["token_ce"] = tok_ce
        if train_cfg.center_loss_weight > 0:
            c_loss = center_loss(feat, labels,
                                 params["params"]["center_centers"])
            total = total + train_cfg.center_loss_weight * c_loss
            aux["center_loss"] = c_loss
        acc = jnp.mean((jnp.argmax(cls_score, -1) == labels).astype(jnp.float32))
        aux["acc"] = acc
        return total, (aux, mutated)

    (loss, (aux, mutated)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    if "batch_stats" in mutated:
        # carry the BNNeck running stats forward (the optimizer freezes them)
        if hasattr(new_params, "copy") and not isinstance(new_params, dict):
            new_params = new_params.copy(
                {"batch_stats": mutated["batch_stats"]})
        else:
            new_params = {**new_params,
                          "batch_stats": mutated["batch_stats"]}
    new_state = state.replace(step=state.step + 1, params=new_params,
                              opt_state=new_opt)
    metrics = dict(loss=loss, **aux)
    return new_state, metrics


def dator_param_pspec(params) -> Any:
    """PartitionSpecs: the stacked tower axis shards over "model"
    (the reference's 2-GPU model parallelism — make_model.py:460-463);
    everything else replicates."""
    def spec(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        if any("towers" in n for n in names) and leaf.ndim >= 1 and leaf.shape[0] == 2:
            return P("model", *([None] * (leaf.ndim - 1)))
        return P()
    return jax.tree_util.tree_map_with_path(spec, params)


def _state_sharding(mesh, state: TrainState) -> TrainState:
    param_spec = dator_param_pspec(state.params)
    param_sh = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s),
                                      param_spec)
    rep = NamedSharding(mesh, P())
    return TrainState(
        step=rep, params=param_sh,
        opt_state=jax.tree_util.tree_map(
            lambda _: rep, state.opt_state,
            is_leaf=lambda x: isinstance(x, jnp.ndarray) or not isinstance(x, (tuple, list, dict))),
        tx=state.tx, apply_fn=state.apply_fn)


def make_pjit_train_step(mesh, state: TrainState, train_cfg: TrainConfig,
                         batch_shape: tuple[int, int, int]):
    """Compile the train step over the mesh: batch sharded on "data", tower
    params sharded on "model"."""
    state_sh = _state_sharding(mesh, state)
    data_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    step_fn = partial(train_step, train_cfg=train_cfg)
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, data_sh, data_sh, data_sh, rep),
        out_shardings=(state_sh, rep),
        donate_argnums=(0,),
    )


def make_pjit_dataset_train_step(mesh, state: TrainState,
                                 train_cfg: TrainConfig):
    """Device-resident-dataset variant of `make_pjit_train_step`: the whole
    quantized ReID dataset (u8 rgb, u16 depth, i32 pids from
    `PKSampler.load_all`) stays replicated in HBM and each step receives a
    "data"-sharded (B,) index array — per-step host->device upload drops
    from the batch tensors (~2.6 MB quantized at batch 16) to tens of
    bytes, which is the binding constraint for tunneled on-chip training
    (PERF.md). The gather + dequantize run inside the train program; with
    sharded indices against the replicated dataset each device gathers only
    its own batch shard."""
    state_sh = _state_sharding(mesh, state)
    data_sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def step(state, ds_rgb, ds_depth, ds_pids, idxs, rng):
        rgb = jnp.take(ds_rgb, idxs, axis=0)
        depth = jnp.take(ds_depth, idxs, axis=0)
        labels = jnp.take(ds_pids, idxs, axis=0)
        return train_step(state, rgb, depth, labels, rng, train_cfg)

    return jax.jit(
        step,
        in_shardings=(state_sh, rep, rep, rep, data_sh, rep),
        out_shardings=(state_sh, rep),
        donate_argnums=(0,),
    )


# ----------------------------------------------------------------------- #
# checkpointing (orbax) — covers weights AND optimizer state
# ----------------------------------------------------------------------- #
def save_checkpoint(state: TrainState, ckpt_dir: str, step: int):
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(f"{ckpt_dir}/step_{step}",
                   {"params": state.params, "opt_state": state.opt_state,
                    "step": state.step}, force=True)


def restore_checkpoint(state: TrainState, ckpt_dir: str, step: int) -> TrainState:
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        target = {"params": state.params, "opt_state": state.opt_state,
                  "step": state.step}
        restored = ckptr.restore(f"{ckpt_dir}/step_{step}", target)
    return state.replace(params=restored["params"],
                         opt_state=restored["opt_state"],
                         step=restored["step"])


def save_params_npz(params, path: str):
    """Portable params-only checkpoint: one flat .npz, f32 leaves stored as
    f16 (~2.4x smaller than orbax f32; weight-rounding only — optimizer
    state is intentionally dropped). Exists because orbax step dirs are too
    heavy to commit, and git is the only state that survives between build
    rounds — the reference has no cross-machine checkpoint format either
    (it torch.save's raw state_dicts, processor_depth.py:119)."""
    from jax.tree_util import tree_flatten_with_path, keystr
    flat = {}
    for kp, leaf in tree_flatten_with_path(params)[0]:
        arr = np.asarray(leaf)
        if arr.dtype == np.float32:
            arr = arr.astype(np.float16)
            if not np.isfinite(arr).all():
                # |w| > 65504 becomes inf in f16 — fail at save time, not
                # as a silent poison for the next round's warm start
                raise ValueError(
                    f"save_params_npz: non-finite values after f16 cast in "
                    f"{keystr(kp)} (f32 max abs "
                    f"{np.abs(np.asarray(leaf)).max():.3e})")
        flat[keystr(kp)] = arr
    np.savez_compressed(path, **flat)


def load_params_npz(template, path: str, strict: bool = True,
                    key_filter: list[str] | None = None):
    """Inverse of save_params_npz: rebuild `template`'s tree/dtypes from the
    flat npz. Keys are jax keystr paths of the template — the npz must come
    from the same model geometry (head size adoption is the caller's job).

    strict=False keeps the template's (freshly initialized) leaf for any key
    the npz is missing — the cross-round warm-start path, where the current
    model may have grown new head params (e.g. the BNNeck) since the npz was
    written. Shape mismatches always raise with both shapes named.

    key_filter: when given, ONLY keys containing one of these substrings
    are loaded (others keep their template init) — selective warm-start,
    e.g. ["towers", "aux_"] to take the trained backbones but re-init a
    head whose npz weights encode a degenerate solution."""
    from jax.tree_util import (tree_flatten_with_path, tree_unflatten,
                               keystr)
    data = np.load(path)
    pairs, treedef = tree_flatten_with_path(template)
    leaves = []
    missing = []
    skipped = 0
    for kp, leaf in pairs:
        key = keystr(kp)
        tleaf = np.asarray(leaf)
        if key_filter is not None and not any(f in key for f in key_filter):
            skipped += 1
            leaves.append(jnp.asarray(tleaf))
            continue
        if key not in data:
            if strict:
                raise KeyError(f"npz checkpoint missing param {key}")
            missing.append(key)
            leaves.append(jnp.asarray(tleaf))
            continue
        arr = data[key]
        if tuple(arr.shape) != tuple(tleaf.shape):
            raise ValueError(
                f"npz checkpoint shape mismatch at {key}: checkpoint "
                f"{tuple(arr.shape)} vs model {tuple(tleaf.shape)} — "
                f"geometry drifted since the npz was written")
        leaves.append(jnp.asarray(arr.astype(tleaf.dtype)))
    if missing:
        print(f"load_params_npz: {len(missing)} params not in {path}, "
              f"kept fresh init: {missing[:6]}"
              + (" ..." if len(missing) > 6 else ""))
    if skipped:
        print(f"load_params_npz: key_filter={key_filter} kept fresh init "
              f"for {skipped} non-matching params")
    return tree_unflatten(treedef, leaves)


def flat_npz_to_tree(path: str) -> dict:
    """Template-free load: rebuild the nested params dict straight from the
    npz's keystr keys ("['params']['towers']['...']"). For consumers that
    have no init-time template (eval scripts); f16 leaves come back f32."""
    import re
    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        parts = re.findall(r"\['([^']+)'\]", key)
        if not parts:
            raise ValueError(f"unparseable npz key {key!r}")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = data[key]
        if arr.dtype == np.float16:
            arr = arr.astype(np.float32)
        node[parts[-1]] = arr
    return tree
