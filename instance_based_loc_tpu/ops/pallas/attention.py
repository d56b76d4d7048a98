"""Fused multi-head attention Pallas kernel for the ViT towers.

The embedder/DATOR sequences are short (<= 257 tokens: ViT-B/16 at 224^2 or
TransReID at 256x128), so one (batch, head) grid cell holds the ENTIRE
attention problem in VMEM: QK^T, the numerically-stable softmax, and PV fuse
into a single kernel with no HBM round-trips for the (S, S) score matrix —
the main win over unfused XLA at larger batch*heads (DATOR trains two towers
of 12 heads each).

Shapes: q, k, v (B, H, S, D). S is padded to a multiple of 8 and keys beyond
`valid_len` are masked. f32 accumulation regardless of input dtype.

Hardware status (v5e, measured): lowers and matches XLA to ~2e-6, but at the
embedder shapes (B*H <= 96, S <= 257) plain XLA attention is ~1.5x FASTER —
the fusion is already memory-resident at this size and Mosaic adds launch
overhead. The kernel therefore stays opt-in (ViTConfig.use_pallas_attention)
until a workload with longer sequences or larger head counts earns it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(len_ref, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0].astype(jnp.float32)          # (S, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s_len = q.shape[0]

    scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)     # (S, S)

    valid = len_ref[pl.program_id(0)]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col_ids < valid, scores, -1e30)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.maximum(denom, 1e-30)

    out = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    valid_len: jax.Array | None = None,
                    interpret: bool = False) -> jax.Array:
    """q, k, v: (B, H, S, D) -> (B, H, S, D). `valid_len` masks padded keys
    (default: all S valid). Padded QUERY rows produce garbage rows the caller
    discards (their keys never attend back thanks to the key mask)."""
    b, h, s, d = q.shape
    if valid_len is None:
        valid_len = jnp.full((), s, jnp.int32)
    lens = jnp.broadcast_to(jnp.asarray(valid_len, jnp.int32), (b * h,))

    qf = q.reshape(b * h, s, d)
    kf = k.reshape(b * h, s, d)
    vf = v.reshape(b * h, s, d)

    out = pl.pallas_call(
        _attn_kernel,
        grid=(b * h,),
        in_specs=[
            # whole lens vector in SMEM (rank-1 SMEM blocks must cover the
            # full dimension on real TPUs); indexed by program_id in-kernel
            pl.BlockSpec((b * h,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
        interpret=interpret,
    )(lens, qf, kf, vf)
    return out.reshape(b, h, s, d)


def reference_attention(q, k, v, valid_len=None):
    """Plain jnp reference used by the parity tests."""
    b, h, s, d = q.shape
    scale = 1.0 / (d ** 0.5)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
    if valid_len is not None:
        mask = jnp.arange(s)[None, None, None, :] < valid_len
        scores = jnp.where(mask, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)
