"""Multi-scale deformable attention (MSDA) — GroundingDINO's custom CUDA op
(the reference builds it with BUILD_WITH_CUDA; SURVEY.md §2.9 row
'MultiScaleDeformableAttention').

Semantics (Deformable DETR, Zhu et al.): for each query, head and scale,
sample K bilinear points from that scale's value map at
`sampling_locations` (normalized [0, 1], align_corners=False convention) and
reduce with softmax `attention_weights`:

    out[q, h] = sum_{l, k} w[q, h, l, k] * bilinear(value_l[..., h], loc[q, h, l, k])

TPU-native design: the gather-heavy sampling vectorizes cleanly as jnp
gathers (XLA fuses the 4-tap bilinear blend); sequence/query/head/level/point
axes are all batched in ONE einsum-shaped program — no per-level Python loop
at runtime. Verified against the standard pure-torch reference
implementation in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("spatial_shapes",))
def multi_scale_deformable_attention(value: jax.Array,
                                     spatial_shapes: tuple[tuple[int, int], ...],
                                     sampling_locations: jax.Array,
                                     attention_weights: jax.Array) -> jax.Array:
    """
    Args:
      value: (B, S, H, D) — flattened multi-scale value maps, S = sum(h*w).
      spatial_shapes: static ((h1, w1), (h2, w2), ...) per level.
      sampling_locations: (B, Q, H, L, K, 2) in [0, 1] (x, y).
      attention_weights: (B, Q, H, L, K), softmaxed over (L, K).

    Returns (B, Q, H * D).
    """
    b, s, h, d = value.shape
    _, q, _, l, k, _ = sampling_locations.shape
    assert l == len(spatial_shapes)

    starts = []
    acc = 0
    for (hh, ww) in spatial_shapes:
        starts.append(acc)
        acc += hh * ww
    assert acc == s, (acc, s)

    out = jnp.zeros((b, q, h, d), jnp.float32)
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        vmap_l = jax.lax.dynamic_slice_in_dim(value, starts[lvl], hh * ww, axis=1)
        vmap_l = vmap_l.reshape(b, hh, ww, h, d)

        loc = sampling_locations[:, :, :, lvl]          # (B, Q, H, K, 2)
        # grid_sample(align_corners=False) convention: pixel centers at
        # (i + 0.5) / size; loc in [0,1] maps to x = loc * W - 0.5
        x = loc[..., 0] * ww - 0.5
        y = loc[..., 1] * hh - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wy1 = y - y0

        def tap(yy, xx, wgt):
            inside = (xx >= 0) & (xx <= ww - 1) & (yy >= 0) & (yy <= hh - 1)
            xi = jnp.clip(xx, 0, ww - 1).astype(jnp.int32)
            yi = jnp.clip(yy, 0, hh - 1).astype(jnp.int32)
            # gather per (b, q, h, k): value at (b, yi, xi, h, :)
            bidx = jnp.arange(b)[:, None, None, None]
            hidx = jnp.arange(h)[None, None, :, None]
            vals = vmap_l[bidx, yi, xi, hidx]            # (B, Q, H, K, D)
            return vals * (wgt * inside)[..., None]

        sampled = (tap(y0, x0, (1 - wx1) * (1 - wy1))
                   + tap(y0, x0 + 1, wx1 * (1 - wy1))
                   + tap(y0 + 1, x0, (1 - wx1) * wy1)
                   + tap(y0 + 1, x0 + 1, wx1 * wy1))     # (B, Q, H, K, D)

        w_l = attention_weights[:, :, :, lvl]            # (B, Q, H, K)
        out = out + jnp.sum(sampled * w_l[..., None], axis=-2)

    return out.reshape(b, q, h * d)
