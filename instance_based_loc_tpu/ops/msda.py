"""Multi-scale deformable attention (MSDA) — GroundingDINO's custom CUDA op
(the reference builds it with BUILD_WITH_CUDA; SURVEY.md §2.9 row
'MultiScaleDeformableAttention').

Semantics (Deformable DETR, Zhu et al.): for each query, head and scale,
sample K bilinear points from that scale's value map at
`sampling_locations` (normalized [0, 1], align_corners=False convention) and
reduce with softmax `attention_weights`:

    out[q, h] = sum_{l, k} w[q, h, l, k] * bilinear(value_l[..., h], loc[q, h, l, k])

TPU-native design (chosen by measurement — perf/msda_probe.py on a v5e):
the naive 4-taps x L-levels advanced-indexing form lowers to 16 XLA gathers
of ~Q*H*K 32-wide slices per call and is gather-unit bound (~73% of a
GroundingDINO@800 forward; perf/gdino_trace.py). Two faster lowerings,
selected per level:

* big levels — ONE flat gather per level: the 4 bilinear taps and the head
  axis fold into a single linear index space over (S_l * H) rows, so XLA
  emits one large gather instead of four, reading the value rows at their
  native dtype (bf16 in deployment) and only upcasting after the gather.
* small levels (S_l <= MATMUL_MAX_S) — zero gathers: the 4 taps x K points
  and their attention weights fold into one sparse-as-dense matrix
  W (Q, S_l) built by iota-compare accumulation, and sampling+reduction
  becomes W @ V_l on the MXU (the classic one-hot-matmul lookup trick).

Probe numbers at the @800 encoder shape (Q = S = 13294, H8 L4 K4 D32,
tunnel residual ~30 ms included in all): naive 95 ms, flat-gather 54 ms,
all-matmul 41 ms, this hybrid 37 ms — ~10x less device time than naive
after subtracting the residual. Verified against the standard pure-torch
reference implementation in tests/test_cascade.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# levels at least this big use the flat-gather lowering; smaller ones use
# the MXU matmul lowering. At the GroundingDINO@800 pyramid
# (100^2, 50^2, 25^2, 13^2) only the 100^2 level gathers — the measured
# fastest split (perf/msda_probe.py v3).
MATMUL_MAX_S = 4096


def _tap_index_weights(loc, hh: int, ww: int):
    """Bilinear taps for one level: loc (..., 2) in [0, 1] ->
    [(yi, xi, w)] x 4 with out-of-range taps weighted 0 (grid_sample
    zero-padding, align_corners=False: pixel centers at (i + 0.5) / size)."""
    x = loc[..., 0] * ww - 0.5
    y = loc[..., 1] * hh - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    taps = []
    for dy, dx, wgt in ((0, 0, (1 - wx1) * (1 - wy1)),
                        (0, 1, wx1 * (1 - wy1)),
                        (1, 0, (1 - wx1) * wy1),
                        (1, 1, wx1 * wy1)):
        yy = y0 + dy
        xx = x0 + dx
        inside = (xx >= 0) & (xx <= ww - 1) & (yy >= 0) & (yy <= hh - 1)
        yi = jnp.clip(yy, 0, hh - 1).astype(jnp.int32)
        xi = jnp.clip(xx, 0, ww - 1).astype(jnp.int32)
        taps.append((yi, xi, wgt * inside))
    return taps


def _tap_index_weights_bcast(loc, hh: int, ww: int):
    """Bilinear taps as ONE broadcasted (..., 4) expression — tap id
    t ∈ {0..3} maps to (dy, dx) = (t>>1, t&1). Same math as
    _tap_index_weights but with no jnp.stack(axis=-1): the stacked form
    forced XLA layout copies of every (Q, H, K, 4) index/weight tensor
    (~13 ms/forward of s32/pred/bf16 copies at GDINO@800 in
    perf/gdino_trace.py); the iota form fuses into the index computation."""
    x = loc[..., 0] * ww - 0.5
    y = loc[..., 1] * hh - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = (x - x0)[..., None]
    wy1 = (y - y0)[..., None]
    t = jnp.arange(4, dtype=jnp.int32)                           # (4,)
    is_x1 = (t & 1) == 1
    is_y1 = (t >> 1) == 1
    yy = y0[..., None] + is_y1.astype(y0.dtype)
    xx = x0[..., None] + is_x1.astype(x0.dtype)
    inside = (xx >= 0) & (xx <= ww - 1) & (yy >= 0) & (yy <= hh - 1)
    wgt = (jnp.where(is_x1, wx1, 1.0 - wx1)
           * jnp.where(is_y1, wy1, 1.0 - wy1)) * inside
    yi = jnp.clip(yy, 0, hh - 1).astype(jnp.int32)
    xi = jnp.clip(xx, 0, ww - 1).astype(jnp.int32)
    return yi, xi, wgt                                           # (...,4) each


def _level_gather_perhead(vmap_l, loc, attn_w, hh: int, ww: int):
    """Per-head gather lowering for one level: one `jnp.take` per head from
    that head's CONTIGUOUS (S_l, D) table (640 KB bf16 at GDINO@800 level 0
    vs the flat form's 5.1 MB (S_l*H, D) table).

    MEASURED SLOWER than the flat single gather and kept only as a probe
    variant (IBL_MSDA_GATHER=perhead): 5.30 vs 4.46 ms/iter at the @800
    level-0 shape under the honest device-side lax.scan harness
    (perf/msda_pallas_probe.py r4). An earlier wall-clock probe reading
    0.03 ms for this form was the tunnel's block_until_ready returning
    before execution — the documented axon hazard — not a real VMEM-cached
    fast path.
    """
    s_l, h, d = vmap_l.shape
    q, _, k, _ = loc.shape
    yi, xi, wts = _tap_index_weights_bcast(loc, hh, ww)
    lin = yi * ww + xi                                           # (Q,H,K,4)
    coeff = (wts * attn_w.astype(wts.dtype)[..., None]).astype(
        vmap_l.dtype)                                            # (Q,H,K,4)
    vmap_t = jnp.swapaxes(vmap_l, 0, 1)                          # (H,S,D)
    outs = []
    for head in range(h):
        rows = jnp.take(vmap_t[head], lin[:, head].reshape(-1), axis=0)
        rows = rows.reshape(q, k * 4, d)
        prod = rows * coeff[:, head].reshape(q, k * 4, 1)
        outs.append(jnp.sum(prod.astype(jnp.float32), axis=1))   # (Q,D)
    return jnp.stack(outs, axis=1)                               # (Q,H,D)


def _level_gather(vmap_l, loc, attn_w, hh: int, ww: int):
    """Flat-gather lowering for one level.

    vmap_l (S_l, H, D); loc (Q, H, K, 2); attn_w (Q, H, K) -> (Q, H, D) f32.
    """
    import os
    if os.environ.get("IBL_MSDA_GATHER", "flat") == "perhead":
        return _level_gather_perhead(vmap_l, loc, attn_w, hh, ww)
    s_l, h, d = vmap_l.shape
    q, _, k, _ = loc.shape
    flat = vmap_l.reshape(s_l * h, d)
    yi, xi, wts = _tap_index_weights_bcast(loc, hh, ww)
    hidx = jnp.arange(h, dtype=jnp.int32)[None, :, None, None]   # (1,H,1,1)
    lin = (yi * ww + xi) * h + hidx                              # (Q,H,K,4)
    # NOTE (r5 negative result): materializing `lin` with an
    # optimization_barrier before the gather — on the theory that the
    # fused tap arithmetic was halving the gather's issue rate vs the
    # 4.46 ms standalone probe — left the 9.14 ms/layer gather fusion
    # byte-identical in the trace and added a 2 ms reshape
    # (perf/gdino_trace.py r5, /tmp/trace_gdino_r5b). The in-model gather
    # IS at its floor; the probe's lower number comes from its scan
    # harness overlapping iterations, not from index precomputation.
    gathered = jnp.take(flat, lin.reshape(-1), axis=0)
    gathered = gathered.reshape(q, h, k, 4, d)
    # ONE fused pass: fold the bilinear tap weights and the attention
    # weights into a single per-term coefficient and reduce over all
    # (K, 4) terms at once with f32 register accumulation. The previous
    # two-stage form (tap-lerp in the value dtype, then K-reduce via an
    # f32 intermediate) cost ~35 ms/forward of VPU f32 elementwise at
    # GDINO@800 (perf/gdino_trace.py buckets f32[1,13294,8,32] + bare
    # multiplies). bf16-deployment tradeoff vs that form: per-term
    # products round to bf16 before the f32 sum (the old form multiplied
    # the K-stage in f32), but all 16 terms now accumulate in f32 instead
    # of 4-term bf16 partial sums; parity suites and quality gates were
    # re-run green at both precisions.
    coeff = (wts * attn_w.astype(wts.dtype)[..., None]).astype(
        vmap_l.dtype)                                            # (Q,H,K,4)
    prod = gathered * coeff[..., None]                           # bf16
    return jnp.sum(prod.astype(jnp.float32), axis=(2, 3))        # (Q,H,D)


def _level_matmul(vmap_l, loc, attn_w, hh: int, ww: int):
    """MXU lowering for one small level: per head, fold the 4 taps x K
    points and attention weights into W (Q, S_l) and contract W @ V_l."""
    s_l, h, d = vmap_l.shape
    q, _, k, _ = loc.shape
    taps = _tap_index_weights(loc, hh, ww)
    iota = jnp.arange(s_l, dtype=jnp.int32)

    vdt = vmap_l.dtype   # keep W and the contraction in the value dtype
                         # (bf16 MXU in deployment; f32 accumulate below)

    def one_head(head):
        # 4 taps x K points = fused elementwise (Q, S_l) accumulations;
        # never materializes a (Q, K, S_l) intermediate
        w_rows = jnp.zeros((q, s_l), vdt)
        for (yi, xi, wgt) in taps:
            lin = (yi[:, head] * ww + xi[:, head]).astype(jnp.int32)
            coeff = (wgt[:, head] * attn_w[:, head]
                     .astype(jnp.float32)).astype(vdt)           # (Q,K)
            for kk in range(k):
                w_rows = w_rows + jnp.where(
                    lin[:, kk:kk + 1] == iota[None, :],
                    coeff[:, kk:kk + 1], jnp.zeros((), vdt))
        return jax.lax.dot(w_rows, vmap_l[:, head],
                           preferred_element_type=jnp.float32)   # (Q,D)

    return jnp.stack([one_head(i) for i in range(h)], axis=1)


def _msda_one(value, spatial_shapes, sampling_locations, attention_weights):
    """Single-batch MSDA: value (S, H, D), loc (Q, H, L, K, 2),
    weights (Q, H, L, K) -> (Q, H*D) f32."""
    s, h, d = value.shape
    q, _, l, k, _ = sampling_locations.shape

    starts, acc = [], 0
    for (hh, ww) in spatial_shapes:
        starts.append(acc)
        acc += hh * ww
    assert acc == s, (acc, s)

    out = jnp.zeros((q, h, d), jnp.float32)
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        vmap_l = jax.lax.dynamic_slice_in_dim(value, starts[lvl], hh * ww,
                                              axis=0)
        loc = sampling_locations[:, :, lvl]                      # (Q,H,K,2)
        w_l = attention_weights[:, :, lvl]                       # (Q,H,K)
        level_fn = (_level_matmul if hh * ww <= MATMUL_MAX_S
                    else _level_gather)
        out = out + level_fn(vmap_l, loc, w_l, hh, ww)
    return out.reshape(q, h * d)


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
    assert len(spatial_shapes) == sampling_locations.shape[3]
    fn = partial(_msda_one, spatial_shapes=spatial_shapes)
    return jax.vmap(lambda v, sl, aw: fn(v, sampling_locations=sl,
                                         attention_weights=aw))(
        value, sampling_locations, attention_weights)
