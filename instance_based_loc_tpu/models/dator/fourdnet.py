"""FourDNet — the DATOR dual-tower RGB-D fusion ReID model, in flax
(reference `dator/model/make_model.py:424-843`).

Architecture (kept behaviorally equivalent):

* two TransReID ViT towers in `local_feature` mode (RGB + depth), imagenet
  weights frozen except the LoRA adapters (make_model.py:466-477);
* global (cls) and local tokens projected 768 -> 128 and merged (:480-492);
* four deformable-sampling fusion blocks r2r / d2d (self) and d2r / r2d
  (cross): a sigmoid "selector" proposes m*k = 24 normalized sample
  locations per token, a softmax head weights them, values are bilinearly
  sampled from the 16x8 token map and summed, then FFN + residual + LayerNorm
  (:503-567, forward :724-821);
* a conv "hypernet" produces a per-patch 2-way softmax gate over modalities
  (:583-593,703-714); cross contributions and the final sum are gated by it;
* gated sum -> token mean -> 128-d embedding (+ linear classifier when
  training) (:824-843);
* random modality dropout p ~ U{0..4}: p in {0,2} zeroes RGB, p in {1,3}
  zeroes depth, per sample, during training (:636-643).

TPU-first: instead of the reference's manual 2-GPU model parallelism with
explicit `.to()` hops (make_model.py:460-463), the two towers are STACKED
along a leading tower axis and vmapped; sharding that axis over the mesh's
"model" axis gives the same parallelism with zero code in the model (see
parallel/mesh.py and parallel/serving.py). grid_sample becomes a vectorized gather
(`bilinear_sample`, align_corners=True semantics).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from .transreid_vit import TransReIDViT, TransReIDConfig


@dataclasses.dataclass(frozen=True)
class FourDNetConfig:
    backbone: TransReIDConfig = dataclasses.field(
        default_factory=lambda: TransReIDConfig(local_feature=True))
    reduced_dim: int = 128
    num_classes: int = 100
    deform_m: int = 8
    deform_k: int = 3
    modality_dropout: bool = True
    # BNNeck bottleneck before the classifier (the reference repo's own
    # TransReID head pattern — make_model.py:165-171 build_transformer:
    # BatchNorm1d with frozen bias + bias-free classifier — which FourDNet
    # omits at :824-843). Required for from-scratch training: the raw
    # token-mean embedding carries a constant DC component ~4 orders of
    # magnitude larger than its sample-dependent variation (measured on the
    # r4 checkpoint: mean-norm 9.86, per-sample std 4.4e-4, pairwise raw
    # cosines 0.9999998), so CE floors at ln(C) and triplet at softplus(0).
    # Batch-centering per feature removes the DC and rescales to unit SNR.
    bnneck: bool = True
    # train-time decoupling: stop-gradient between the towers and the
    # fusion head. The BNNeck multiplies fusion-head gradients by
    # 1/batch_std (~2500x while the embedding is still collapsed); that
    # amplified noise flowing into the towers destroyed warm-started tower
    # features within one epoch (out/dator_r5_fulltrain_wrecked.log). With
    # detach_fusion the towers train purely from the aux CE heads (the
    # r4-proven recipe) and the fusion head trains on whatever the towers
    # currently provide — neither path can hurt the other. Inference graph
    # unchanged.
    detach_fusion: bool = False
    # train-time per-token CE on the fused token map (BN'd, shared
    # classifier): makes the served token-MEAN embedding a mean of
    # per-token-discriminative features — the reference's own multi-stream
    # local-CE pattern (loss/make_loss.py:41-93 averages CE over local
    # branches)
    token_ce: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def grid_hw(self) -> tuple[int, int]:
        return self.backbone.num_y, self.backbone.num_x  # (16, 8) at 256x128/16


def bilinear_sample(value_map: jax.Array, gx: jax.Array, gy: jax.Array) -> jax.Array:
    """torch.F.grid_sample(align_corners=True, padding_mode='zeros')
    equivalent. value_map: (H, W, C); gx, gy in [-1, 1] of shape S...;
    returns (S..., C). gx indexes width, gy height."""
    h, w, _ = value_map.shape
    x = (gx + 1.0) * 0.5 * (w - 1)
    y = (gy + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1, y1 = x0 + 1, y0 + 1

    def gather(yy, xx):
        inside = (xx >= 0) & (xx <= w - 1) & (yy >= 0) & (yy <= h - 1)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        vals = value_map[yi, xi]
        return vals * inside[..., None]

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    out = (gather(y0, x0) * (wx0 * wy0)[..., None]
           + gather(y0, x1) * (wx1 * wy0)[..., None]
           + gather(y1, x0) * (wx0 * wy1)[..., None]
           + gather(y1, x1) * (wx1 * wy1)[..., None])
    return out


class DeformableFusionBlock(nn.Module):
    """One selector/attention/sample/FFN unit (make_model.py:509-567)."""
    cfg: FourDNetConfig

    @nn.compact
    def __call__(self, queries, value_tokens):
        c = self.cfg
        mk = c.deform_m * c.deform_k
        sel = nn.Dense(2 * mk, dtype=c.dtype, name="selector")(queries)
        sel = jax.nn.sigmoid(sel.astype(jnp.float32))
        weights = nn.Dense(mk, dtype=c.dtype, name="attn_weights")(queries)
        weights = jax.nn.softmax(weights.astype(jnp.float32), axis=-1)
        gx = sel[..., :mk] * 2.0 - 1.0          # (B, N, mk)
        gy = sel[..., mk:] * 2.0 - 1.0

        h, w = c.grid_hw
        b, n, d = value_tokens.shape
        vmap_hw = value_tokens.reshape(b, h, w, d)
        sampled = jax.vmap(bilinear_sample)(vmap_hw, gx, gy)   # (B, N, mk, D)
        feat = jnp.sum(sampled * weights[..., None], axis=-2)  # (B, N, D)
        return nn.Dense(c.reduced_dim, dtype=c.dtype, name="ffn")(
            feat.astype(c.dtype)).astype(jnp.float32)


class FourDNet(nn.Module):
    cfg: FourDNetConfig

    @nn.compact
    def __call__(self, rgb, depth, cam_ids=None, view_ids=None,
                 training: bool = False, return_cls_tokens: bool = False):
        """rgb/depth: (B, H, W, 3) preprocessed. Returns
        (cls_scores (B, num_classes), embedding (B, reduced_dim));
        with return_cls_tokens also the raw (rgb_cls, depth_cls) tower
        tokens (B, hidden) — the features the train-time aux heads
        supervise, used by the embedder's opt-in "cls" feature mode."""
        c = self.cfg
        b = rgb.shape[0]

        if c.modality_dropout and training:
            p = jax.random.randint(self.make_rng("dropout"), (b,), 0, 5)
            rgb = jnp.where(((p == 0) | (p == 2))[:, None, None, None],
                            jnp.zeros_like(rgb), rgb)
            depth = jnp.where(((p == 1) | (p == 3))[:, None, None, None],
                              jnp.zeros_like(depth), depth)

        # the two towers, stacked on a leading "tower" axis for model-axis
        # sharding (see module docstring)
        tower = nn.vmap(
            TransReIDViT,
            in_axes=0, out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True},
        )(c.backbone, name="towers")
        stacked_in = jnp.stack([rgb, depth], axis=0)  # (2, B, H, W, 3)
        cam = None if cam_ids is None else jnp.stack([cam_ids, cam_ids])
        view = None if view_ids is None else jnp.stack([view_ids, view_ids])
        tokens = tower(stacked_in, cam, view)         # (2, B, 1+N, 768)
        rgb_tokens, depth_tokens = tokens[0], tokens[1]

        # fusion-head input (see FourDNetConfig.detach_fusion); the aux
        # heads below always read the raw, gradient-carrying tokens
        if c.detach_fusion and training:
            fus_rgb = jax.lax.stop_gradient(rgb_tokens)
            fus_depth = jax.lax.stop_gradient(depth_tokens)
        else:
            fus_rgb, fus_depth = rgb_tokens, depth_tokens

        def project(tokens_, prefix):
            glob = nn.Dense(c.reduced_dim, name=f"project_global_{prefix}")(tokens_[:, 0])
            loc = nn.Dense(c.reduced_dim, name=f"project_local_{prefix}")(tokens_[:, 1:])
            n = loc.shape[1]
            merged = jnp.concatenate(
                [jnp.broadcast_to(glob[:, None], (b, n, c.reduced_dim)), loc], axis=-1)
            return nn.Dense(c.reduced_dim, name=f"merge_local_global_{prefix}")(merged)

        rgb_path = project(fus_rgb, "rgb")           # (B, N, 128)
        depth_path = project(fus_depth, "depth")

        # hypernet gate (make_model.py:583-593,703-714)
        h, w = c.grid_hw
        spatial = jnp.concatenate(
            [depth_path.reshape(b, h, w, c.reduced_dim),
             rgb_path.reshape(b, h, w, c.reduced_dim)], axis=-1)
        g = spatial
        for width, name in [(128, "hyper1"), (32, "hyper2"), (8, "hyper3")]:
            g = nn.Conv(width, (3, 3), padding="SAME", name=name)(g)
            g = jax.nn.relu(g)
        g = nn.Conv(2, (3, 3), padding="SAME", name="hyper4")(g)
        filters = jax.nn.softmax(g, axis=-1)          # (B, 16, 8, 2)
        rgb_filter = filters[..., 0].reshape(b, h * w)
        depth_filter = filters[..., 1].reshape(b, h * w)

        q_r = nn.Dense(c.reduced_dim, name="Q_r")(rgb_path)
        v_r = nn.Dense(c.reduced_dim, name="V_r")(rgb_path)
        q_d = nn.Dense(c.reduced_dim, name="Q_d")(depth_path)
        v_d = nn.Dense(c.reduced_dim, name="V_d")(depth_path)

        # self attention paths
        r2r = DeformableFusionBlock(c, name="r2r")(q_r, v_r)
        rgb_path = nn.LayerNorm(name="r2r_norm")(rgb_path + r2r)
        d2d = DeformableFusionBlock(c, name="d2d")(q_d, v_d)
        depth_path = nn.LayerNorm(name="d2d_norm")(depth_path + d2d)

        # cross paths, gated by the hypernet filters (make_model.py:789-821)
        d2r = DeformableFusionBlock(c, name="d2r")(q_d, v_r)
        rgb_path = nn.LayerNorm(name="d2r_norm")(
            rgb_path + d2r * rgb_filter[..., None])
        r2d = DeformableFusionBlock(c, name="r2d")(q_r, v_d)
        depth_path = nn.LayerNorm(name="r2d_norm")(
            depth_path + r2d * depth_filter[..., None])

        final = (depth_path * depth_filter[..., None]
                 + rgb_path * rgb_filter[..., None])
        embedding = jnp.mean(final, axis=-2)          # (B, 128)
        # raw pre-BNNeck embedding, exposed as an intermediate for (a) the
        # reference triplet placement (make_loss.py computes triplet on the
        # pre-bottleneck global_feat) and (b) collapse diagnostics; costs
        # nothing unless applied with mutable=["intermediates"]
        self.sow("intermediates", "embedding_raw", embedding)

        if c.bnneck:
            # BNNeck (see FourDNetConfig.bnneck): batch-centered feature is
            # both the classifier input and the served re-ID feature
            # (inference uses running stats). beta frozen at 0 and bias-free
            # classifier, matching the reference's build_transformer neck.
            embedding = nn.BatchNorm(
                use_running_average=not training, momentum=0.9,
                epsilon=1e-5, use_bias=False, use_scale=True,
                dtype=jnp.float32, name="bottleneck")(embedding)
            cls_score = nn.Dense(c.num_classes, use_bias=False,
                                 name="classifier")(embedding)
        else:
            cls_score = nn.Dense(c.num_classes, name="classifier")(embedding)
        if training:
            # Train-time auxiliary CE heads on the two towers' CLS tokens.
            # From-scratch training (this environment has no ImageNet
            # checkpoint — the reference inits from one and freezes,
            # make_model.py:466-477) floors at the uniform CE loss at the
            # full 129-token geometry: the only gradient path to the towers
            # runs through LN'd gated token-means whose per-sample signal
            # washes out (bisect series in out/dator_r4_floor_bisect.md).
            # Direct CLS supervision recreates the reference's working
            # regime (discriminative towers + combiner head) and mirrors
            # its own multi-stream CE (0.5*global + 0.5*locals,
            # dator/loss/make_loss.py:41-93). Inference path unchanged.
            # LN before each head: the pre-norm residual stream's CLS
            # magnitude is unbounded (the towers' final LN is skipped in
            # local_feature mode) — raw logits diverged (CE 28 -> 50 within
            # 2 epochs) until normalized
            aux_r = nn.Dense(c.num_classes, name="aux_classifier_rgb")(
                nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                             name="aux_norm_rgb")(rgb_tokens[:, 0]))
            aux_d = nn.Dense(c.num_classes, name="aux_classifier_depth")(
                nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                             name="aux_norm_depth")(depth_tokens[:, 0]))
            if c.token_ce:
                tok_bn = nn.BatchNorm(
                    use_running_average=not training, momentum=0.9,
                    epsilon=1e-5, use_bias=False, use_scale=True,
                    dtype=jnp.float32, name="token_bottleneck")(final)
                tok_scores = nn.Dense(c.num_classes, use_bias=False,
                                      name="token_classifier")(tok_bn)
                return cls_score, embedding, (aux_r, aux_d), tok_scores
            return cls_score, embedding, (aux_r, aux_d)
        if return_cls_tokens:
            return cls_score, embedding, (rgb_tokens[:, 0].astype(jnp.float32),
                                          depth_tokens[:, 0].astype(jnp.float32))
        return cls_score, embedding
