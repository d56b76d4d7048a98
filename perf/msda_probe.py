"""MSDA reformulation probe — same math, TPU-friendlier lowerings.

perf/cascade_stages.py measures gdino@800 at 417 ms/frame while RAM's
Swin-L@384 (more matmul FLOPs) takes 38 ms: the deformable encoder's
sampling dominates. ops/msda.py lowers to 16 gathers/layer of ~425k
32-wide slices each (slice_sizes (1,1,1,1,32)) — gather-unit bound, the
MXU idles. Variants probed here:

  v0  current ops/msda.py (4 advanced-indexing taps x 4 levels)
  v1  one flat jnp.take per level: taps and heads folded into a single
      linear index space over (hh*ww*H) rows — 4 gather ops instead of 16,
      same slice count
  v2  zero gathers: per (level, head), fold the 4 bilinear taps x K points
      and their attention weights into one sparse-as-dense matrix
      W (Q, S_l) built by iota-compare accumulation, then sample+reduce as
      W @ V_l on the MXU (the one-hot-matmul embedding-lookup trick)
  v3  hybrid: v1 for the big level 0, v2 for levels 1..3

Run on the chip: python perf/msda_probe.py   (ONE tunnel client at a time)
Parity asserted against v0 on random inputs before timing.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from instance_based_loc_tpu.ops.msda import multi_scale_deformable_attention


def _tap_index_weights(loc, hh, ww):
    """Shared host-free index/weight math for one level.

    loc (..., 2) in [0,1] -> 4 taps: (yi, xi, w) each (..., 4) with
    out-of-bounds taps weighted 0 (grid_sample zero padding,
    align_corners=False)."""
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


@partial(jax.jit, static_argnames=("spatial_shapes",))
def msda_v1(value, spatial_shapes, sampling_locations, attention_weights):
    """One flat take per level; taps+heads live in the index space."""
    b, s, h, d = value.shape
    _, q, _, l, k, _ = sampling_locations.shape
    starts, acc = [], 0
    for (hh, ww) in spatial_shapes:
        starts.append(acc)
        acc += hh * ww

    out = jnp.zeros((b, q, h, d), jnp.float32)
    hidx = jnp.arange(h)[None, None, :, None, None]            # (1,1,H,1,1)
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        vmap_l = jax.lax.dynamic_slice_in_dim(value, starts[lvl], hh * ww,
                                              axis=1)
        flat = vmap_l.reshape(b, hh * ww * h, d)
        loc = sampling_locations[:, :, :, lvl]                 # (B,Q,H,K,2)
        taps = _tap_index_weights(loc, hh, ww)
        lin = jnp.stack([(yi * ww + xi) * h for (yi, xi, _) in taps],
                        axis=-1) + hidx                        # (B,Q,H,K,4)
        wts = jnp.stack([w for (_, _, w) in taps], axis=-1)    # (B,Q,H,K,4)
        gathered = jnp.take(flat[0], lin[0].reshape(-1), axis=0)
        gathered = gathered.reshape(q, h, k, 4, d)
        sampled = jnp.sum(gathered * wts[0][..., None], axis=-2)  # (Q,H,K,D)
        w_l = attention_weights[0, :, :, lvl]                  # (Q,H,K)
        out = out.at[0].add(jnp.sum(sampled * w_l[..., None], axis=-2))
    return out.reshape(b, q, h * d)


def _level_matmul(vmap_l, loc, attn_w, hh, ww, h):
    """v2 core for one level: per-head sparse-as-dense W @ V on the MXU.

    vmap_l (S_l, H, D); loc (Q, H, K, 2); attn_w (Q, H, K).
    Returns (Q, H, D) f32."""
    s_l = hh * ww
    taps = _tap_index_weights(loc, hh, ww)                     # each (Q,H,K)
    iota = jnp.arange(s_l, dtype=jnp.int32)                    # (S_l,)

    k = loc.shape[-2]

    def one_head(head):
        # 4 taps x K points = 16 fused elementwise (Q, S_l) accumulations;
        # never materializes a (Q, K, S_l) intermediate
        w_rows = jnp.zeros((loc.shape[0], s_l), jnp.float32)
        for (yi, xi, wgt) in taps:
            lin = (yi[:, head] * ww + xi[:, head]).astype(jnp.int32)  # (Q,K)
            coeff = wgt[:, head] * attn_w[:, head]             # (Q,K)
            for kk in range(k):
                w_rows = w_rows + jnp.where(
                    lin[:, kk:kk + 1] == iota[None, :],
                    coeff[:, kk:kk + 1], 0.0)
        return w_rows @ vmap_l[:, head].astype(jnp.float32)    # (Q,D)

    return jnp.stack([one_head(i) for i in range(h)], axis=1)


@partial(jax.jit, static_argnames=("spatial_shapes",))
def msda_v2(value, spatial_shapes, sampling_locations, attention_weights):
    b, s, h, d = value.shape
    _, q, _, l, k, _ = sampling_locations.shape
    starts, acc = [], 0
    for (hh, ww) in spatial_shapes:
        starts.append(acc)
        acc += hh * ww
    out = jnp.zeros((q, h, d), jnp.float32)
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        vmap_l = jax.lax.dynamic_slice_in_dim(value, starts[lvl], hh * ww,
                                              axis=1)[0]
        out = out + _level_matmul(vmap_l, sampling_locations[0, :, :, lvl],
                                  attention_weights[0, :, :, lvl], hh, ww, h)
    return out.reshape(b, q, h * d)


@partial(jax.jit, static_argnames=("spatial_shapes",))
def msda_v3(value, spatial_shapes, sampling_locations, attention_weights):
    """Gather (v1 form) for level 0, matmul (v2 form) for the rest."""
    b, s, h, d = value.shape
    _, q, _, l, k, _ = sampling_locations.shape
    starts, acc = [], 0
    for (hh, ww) in spatial_shapes:
        starts.append(acc)
        acc += hh * ww
    out = jnp.zeros((q, h, d), jnp.float32)
    hidx = jnp.arange(h)[None, :, None, None]                  # (1,H,1,1)
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        vmap_l = jax.lax.dynamic_slice_in_dim(value, starts[lvl], hh * ww,
                                              axis=1)[0]      # (S_l,H,D)
        loc = sampling_locations[0, :, :, lvl]
        attn_w = attention_weights[0, :, :, lvl]
        if lvl == 0:
            flat = vmap_l.reshape(hh * ww * h, d)
            taps = _tap_index_weights(loc, hh, ww)
            lin = jnp.stack([(yi * ww + xi) * h for (yi, xi, _) in taps],
                            axis=-1) + hidx                    # (Q,H,K,4)
            wts = jnp.stack([w for (_, _, w) in taps], axis=-1)
            gathered = jnp.take(flat, lin.reshape(-1), axis=0)
            gathered = gathered.reshape(q, h, k, 4, d)
            sampled = jnp.sum(gathered * wts[..., None], axis=-2)
            out = out + jnp.sum(sampled * attn_w[..., None], axis=-2)
        else:
            out = out + _level_matmul(vmap_l, loc, attn_w, hh, ww, h)
    return out.reshape(b, q, h * d)


@partial(jax.jit, static_argnames=("spatial_shapes",))
def msda_v5(value, spatial_shapes, sampling_locations, attention_weights):
    """One lax.gather of (2,2,D) blocks per level: the 4 bilinear taps ride
    one slice, cutting gather-op count 4x. Edge handling: the block start is
    clamped to stay in-bounds and per-fetched-corner weights are recomputed
    so out-of-range taps weigh 0 (zero-padding grid_sample semantics)."""
    b, s, h, d = value.shape
    _, q, _, l, k, _ = sampling_locations.shape
    starts, acc = [], 0
    for (hh, ww) in spatial_shapes:
        starts.append(acc)
        acc += hh * ww

    out = jnp.zeros((q, h, d), jnp.float32)
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        vmap_l = jax.lax.dynamic_slice_in_dim(
            value, starts[lvl], hh * ww, axis=1)[0].reshape(hh, ww, h, d)
        loc = sampling_locations[0, :, :, lvl]                 # (Q,H,K,2)
        x = loc[..., 0] * ww - 0.5
        y = loc[..., 1] * hh - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wy1 = y - y0
        y0c = jnp.clip(y0, 0, hh - 2).astype(jnp.int32)
        x0c = jnp.clip(x0, 0, ww - 2).astype(jnp.int32)

        hgrid = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[None, :, None],
                                 (q, h, k))
        idx = jnp.stack([y0c, x0c, hgrid], axis=-1).reshape(-1, 3)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(2,),
            start_index_map=(0, 1, 2))
        blocks = jax.lax.gather(
            vmap_l, idx, dn, slice_sizes=(2, 2, 1, d),
            mode=jax.lax.GatherScatterMode.CLIP)
        blocks = blocks.reshape(q, h, k, 2, 2, d)

        # per-fetched-corner weights: desired tap rows are y0, y0+1 with
        # weights (1-wy1), wy1, zeroed when out of range; a fetched row
        # y0c + a' collects the weight of whichever desired row equals it
        wy = [(1 - wy1) * ((y0 >= 0) & (y0 <= hh - 1)),
              wy1 * ((y0 + 1 >= 0) & (y0 + 1 <= hh - 1))]
        wx = [(1 - wx1) * ((x0 >= 0) & (x0 <= ww - 1)),
              wx1 * ((x0 + 1 >= 0) & (x0 + 1 <= ww - 1))]
        sampled = jnp.zeros((q, h, k, d), jnp.float32)
        for ap in (0, 1):
            row_w = sum(wy[a] * (y0 + a == y0c + ap) for a in (0, 1))
            for bp in (0, 1):
                col_w = sum(wx[bb] * (x0 + bb == x0c + bp) for bb in (0, 1))
                sampled = sampled + (blocks[:, :, :, ap, bp].astype(jnp.float32)
                                     * (row_w * col_w)[..., None])
        w_l = attention_weights[0, :, :, lvl]                  # (Q,H,K)
        out = out + jnp.sum(sampled * w_l[..., None], axis=-2)
    return out.reshape(b, q, h * d)


@partial(jax.jit, static_argnames=("spatial_shapes",))
def msda_v6(value, spatial_shapes, sampling_locations, attention_weights):
    """Head-major x-pair gather: per level the table is reorganized to
    (H, S_l, D) so the two x-adjacent bilinear taps of one row are adjacent
    table rows and ride ONE (1, 2, D) slice — half the gathered slices of
    the flat form at double the width. Two slice sets (y0 row, y1 row)."""
    b, s, h, d = value.shape
    _, q, _, l, k, _ = sampling_locations.shape
    starts, acc = [], 0
    for (hh, ww) in spatial_shapes:
        starts.append(acc)
        acc += hh * ww

    out = jnp.zeros((q, h, d), jnp.float32)
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        vmap_l = jax.lax.dynamic_slice_in_dim(
            value, starts[lvl], hh * ww, axis=1)[0]            # (S,H,D)
        vhm = vmap_l.swapaxes(0, 1)                            # (H,S,D)
        loc = sampling_locations[0, :, :, lvl]                 # (Q,H,K,2)
        x = loc[..., 0] * ww - 0.5
        y = loc[..., 1] * hh - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wy1 = y - y0
        x0c = jnp.clip(x0, 0, ww - 2).astype(jnp.int32)
        hgrid = jnp.broadcast_to(
            jnp.arange(h, dtype=jnp.int32)[None, :, None], (q, h, k))
        wx = [(1 - wx1) * ((x0 >= 0) & (x0 <= ww - 1)),
              wx1 * ((x0 + 1 >= 0) & (x0 + 1 <= ww - 1))]
        colw = [sum(wx[bb] * (x0 + bb == x0c + bp) for bb in (0, 1))
                for bp in (0, 1)]                              # 2x (Q,H,K)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(0,),
            start_index_map=(0, 1))
        sampled = jnp.zeros((q, h, k, d), jnp.float32)
        for a, wrow in ((0, (1 - wy1) * ((y0 >= 0) & (y0 <= hh - 1))),
                        (1, wy1 * ((y0 + 1 >= 0) & (y0 + 1 <= hh - 1)))):
            yi = jnp.clip(y0 + a, 0, hh - 1).astype(jnp.int32)
            idx = jnp.stack([hgrid, yi * ww + x0c], axis=-1).reshape(-1, 2)
            pairs = jax.lax.gather(
                vhm, idx, dn, slice_sizes=(1, 2, d),
                mode=jax.lax.GatherScatterMode.CLIP)
            pairs = pairs.reshape(q, h, k, 2, d).astype(jnp.float32)
            sampled = sampled + wrow[..., None] * (
                pairs[:, :, :, 0] * colw[0][..., None]
                + pairs[:, :, :, 1] * colw[1][..., None])
        w_l = attention_weights[0, :, :, lvl]                  # (Q,H,K)
        out = out + jnp.sum(sampled * w_l[..., None], axis=-2)
    return out.reshape(b, q, h * d)


VARIANTS = {"v0": multi_scale_deformable_attention,
            "v1": msda_v1, "v2": msda_v2, "v3": msda_v3, "v5": msda_v5,
            "v6": msda_v6}


def make_inputs(rng, shapes, q, h=8, k=4, d=32, dtype=jnp.bfloat16):
    s = sum(hh * ww for hh, ww in shapes)
    l = len(shapes)
    k1, k2, k3 = jax.random.split(rng, 3)
    value = jax.random.normal(k1, (1, s, h, d), dtype)
    loc = jax.random.uniform(k2, (1, q, h, l, k, 2), jnp.float32,
                             minval=-0.05, maxval=1.05)
    w = jax.nn.softmax(
        jax.random.normal(k3, (1, q, h, l * k)), axis=-1).reshape(
        1, q, h, l, k)
    return value, loc, w


def parity(names=("v1", "v2", "v3", "v5", "v6")):
    shapes = ((10, 12), (5, 6), (3, 3))
    value, loc, w = make_inputs(jax.random.PRNGKey(0), shapes, q=40,
                                dtype=jnp.float32)
    ref = np.asarray(VARIANTS["v0"](value, shapes, loc, w))
    for name in names:
        got = np.asarray(VARIANTS[name](value, shapes, loc, w))
        err = np.abs(got - ref).max()
        print(f"parity {name}: max|diff|={err:.2e}", flush=True)
        assert err < 1e-4, (name, err)


def timeit(name, fn, args, n=8):
    out = fn(*args)
    np.asarray(out.ravel()[0])                    # force execution (tunnel)
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(fn(*args).ravel()[0])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:24s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else list(VARIANTS)
    parity([n for n in only if n != "v0"])
    enc_shapes = ((100, 100), (50, 50), (25, 25), (13, 13))
    s = sum(hh * ww for hh, ww in enc_shapes)
    for tag, q in (("encoder q=S", s), ("decoder q=900", 900)):
        value, loc, w = make_inputs(jax.random.PRNGKey(1), enc_shapes, q)
        print(f"-- {tag} --", flush=True)
        for name in only:
            timeit(f"{name} {tag}", VARIANTS[name],
                   (value, enc_shapes, loc, w))


if __name__ == "__main__":
    main()
