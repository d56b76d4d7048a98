"""Row-tiled fused attention with decomposed relative-position bias for the
SAM image encoder's GLOBAL blocks (models/sam.py SamAttention; reference
checkpoint `sam_vit_h_4b8939.pth` / SAM-B, segment-anything
image_encoder.py add_decomposed_rel_pos).

Why a kernel here and not for the ViT embedders (see attention.py): at the
global-block shape (S = 64*64 = 4096 tokens, D = 64) the unfused XLA program
materializes BOTH the (heads, S, S) score matrix AND the broadcast rel-pos
bias (bias_h[..., :, None] + bias_w[..., None, :] -> (1, heads, 4096, 4096))
in HBM — ~800 MB of f32 traffic per block, four blocks per SAM-B forward.
K and V for one (batch, head) are only S*D*4 = 1 MB, so the whole KV set is
VMEM-resident: the kernel tiles QUERY rows, recomputes the (tq, S) bias tile
in VMEM from the small per-axis factors (tq x HK and tq x WK), does the
numerically-stable softmax over the full row (no running accumulators
needed), and writes only the (tq, D) outputs. The (S, S) score matrix and
the (S, S) bias never exist in HBM.

The per-axis bias factors bias_h = einsum(q, rel_h) (B, H, S, HK) and
bias_w (B, H, S, WK) are computed OUTSIDE the kernel (they are small:
~12 MB each at SAM-B global shape) — the kernel fuses their broadcast-sum,
the score matmul, softmax and PV.

Measured on the tunneled v5e at SAM-B global shape (1, 12, 4096, 64),
perf/sam_attn_probe.py: **3.45 ms vs XLA 7.27 ms (2.1x)** f32 inputs,
4.09 ms vs 7.32 ms (1.8x) bf16. All dots contract at DEFAULT precision
(bf16 MXU passes) with f32 accumulation — consistent with the bf16
model-inference policy (README), max |diff| vs the f32-highest XLA program
~2e-3. Not for callers that need f32-exact attention. (History: f32-upcast
dots measured 0.9x — slower than XLA — because the package pins
jax_default_matmul_precision="highest", putting every dot on the 1/8-rate
fp32 MXU path; Mosaic also rejects fp32-contract bf16 matmuls outright.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sam_attn_kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, eh_ref, ew_ref,
                     o_ref, *, scale: float):
    # All dot_generals run in the INPUT dtype with f32 accumulation — on the
    # bf16 inference path this is the difference between full-rate and
    # 1/8-rate MXU issue (f32-upcast dots measured 8.1 ms vs XLA's 7.3;
    # bf16 dots are the point of the kernel).
    q = q_ref[0]                                 # (tq, D)
    k = k_ref[0]                                 # (S, D)
    v = v_ref[0]                                 # (S, D)
    bh = bh_ref[0]                               # (tq, HK)
    bw = bw_ref[0]                               # (tq, WK)

    # explicit DEFAULT precision: the package pins
    # jax_default_matmul_precision="highest" for the geometry numerics,
    # which would force fp32 contraction here (Mosaic rejects fp32-contract
    # bf16 matmuls, and it defeats the bf16 MXU rate this kernel exists for)
    prec = jax.lax.Precision.DEFAULT
    scores = jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype), k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # (tq, S) f32
    # decomposed rel-pos: scores[i, ky*WK + kx] += bh[i, ky] + bw[i, kx].
    # Expanded via two tiny MXU matmuls against 0/1 expansion matrices —
    # Mosaic cannot lower a (tq, HK, WK) -> (tq, S) vector reshape, and a
    # broadcast+reshape would cost more VMEM anyway.
    scores = scores + jax.lax.dot_general(
        bh, eh_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    scores = scores + jax.lax.dot_general(
        bw, ew_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)

    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("q_tile", "interpret"))
def sam_flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                        bias_h: jax.Array, bias_w: jax.Array,
                        q_tile: int = 128, interpret: bool = False) -> jax.Array:
    """Fused attention for scores = (q @ k^T) / sqrt(D) + rel-pos bias.

    q, k, v:  (B, H, S, D) with S = HK * WK (the flattened token grid)
    bias_h:   (B, H, S, HK) — per-query bias against each key ROW
    bias_w:   (B, H, S, WK) — per-query bias against each key COLUMN
    Returns (B, H, S, D). S must be divisible by q_tile (the SAM grid sizes
    4096 = 64*64 are; callers with odd shapes pad).
    """
    b, h, s, d = q.shape
    hk = bias_h.shape[-1]
    wk = bias_w.shape[-1]
    if hk * wk != s:
        raise ValueError(f"bias grid {hk}x{wk} != sequence length {s}")
    if s % q_tile:
        raise ValueError(f"S={s} not divisible by q_tile={q_tile}")
    scale = 1.0 / (d ** 0.5)

    qf = q.reshape(b * h, s, d)
    kf = k.reshape(b * h, s, d)
    vf = v.reshape(b * h, s, d)
    bhf = bias_h.reshape(b * h, s, hk)
    bwf = bias_w.reshape(b * h, s, wk)
    # 0/1 expansion matrices: eh[j, ky*WK + kx] = (ky == j),
    # ew[j, ky*WK + kx] = (kx == j); shared across the grid
    key_ids = jnp.arange(s, dtype=jnp.int32)
    eh = (key_ids[None, :] // wk == jnp.arange(hk)[:, None]).astype(q.dtype)
    ew = (key_ids[None, :] % wk == jnp.arange(wk)[:, None]).astype(q.dtype)

    out = pl.pallas_call(
        partial(_sam_attn_kernel, scale=scale),
        grid=(b * h, s // q_tile),
        in_specs=[
            pl.BlockSpec((1, q_tile, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile, hk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_tile, wk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hk, s), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wk, s), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, bhf, bwf, eh, ew)
    return out.reshape(b, h, s, d)


def reference_sam_attention(q, k, v, bias_h, bias_w):
    """Plain jnp mirror of the unfused program (the parity oracle; this IS
    the materialize-everything form the kernel replaces)."""
    b, h, s, d = q.shape
    hk, wk = bias_h.shape[-1], bias_w.shape[-1]
    scale = 1.0 / (d ** 0.5)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
    bias = (bias_h.astype(jnp.float32)[..., :, None]
            + bias_w.astype(jnp.float32)[..., None, :])
    scores = scores + bias.reshape(b, h, s, s)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)
