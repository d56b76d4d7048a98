"""SAM windowed-block layout probe: where do the ~50 ms of non-matmul time
in a SAM-H forward go, and can the window partition transposes be avoided?

The SAM-H trace (perf/sam_trace.py h + the category aggregation in PERF.md)
shows per forward: matmul fusions+convs ~40 ms, layernorm/softmax converts
~27 ms, layout copies ~20 ms, reshapes ~8 ms — the 28 windowed blocks'
partition/unpartition transposes and 196-token softmaxes are the prime
suspects. This probe times a stack of windowed SamBlocks (28, the SAM-H
count) three ways:

  v0  shipping: pad -> 6D transpose partition -> einsum attention ->
      unpartition (models/sam.py)
  v1  blocked einsum: pad once, reshape (5,14,5,14,C) WITHOUT transposing,
      and run attention as einsums with two batch dims — the window
      transpose rides inside the dot_general instead of a standalone copy
  v2  v0 with bf16 scores softmax (no f32 convert round-trip)

All three must agree (parity asserted at bf16 tolerance) — v1/v2 are pure
relowerings of the same math.

Run on the tunneled chip: python perf/sam_window_probe.py
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

GRID = int(os.environ.get("PROBE_GRID", 64))     # SAM @1024/16
WIN = 14
DIM = int(os.environ.get("PROBE_DIM", 1280))     # ViT-H
HEADS = int(os.environ.get("PROBE_HEADS", 16))
DEPTH = int(os.environ.get("PROBE_DEPTH", 28))   # windowed blocks in SAM-H
PAD = -(-GRID // WIN) * WIN


def make_params(rng, n):
    ks = jax.random.split(rng, 5 * n)
    ps = []
    scale = 0.02
    for i in range(n):
        ps.append(dict(
            qkv_w=jax.random.normal(ks[5 * i], (DIM, 3 * DIM), jnp.bfloat16) * scale,
            qkv_b=jnp.zeros((3 * DIM,), jnp.bfloat16),
            proj_w=jax.random.normal(ks[5 * i + 1], (DIM, DIM), jnp.bfloat16) * scale,
            proj_b=jnp.zeros((DIM,), jnp.bfloat16),
            rel_h=jax.random.normal(ks[5 * i + 2], (2 * WIN - 1, DIM // HEADS),
                                    jnp.bfloat16) * scale,
            rel_w=jax.random.normal(ks[5 * i + 3], (2 * WIN - 1, DIM // HEADS),
                                    jnp.bfloat16) * scale,
        ))
    return ps


def rel_bias_lookup(rel_pos):
    # window q_size == k_size == WIN: rel index = (i - j) + WIN - 1
    idx = (np.arange(WIN)[:, None] - np.arange(WIN)[None, :]) + WIN - 1
    return rel_pos[jnp.asarray(idx)]          # (WIN, WIN, d_head)


def attn_v0(p, x):
    """Shipping path: partition (6D transpose) -> attention -> unpartition."""
    b, h, w, _ = x.shape
    pad = PAD - GRID
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
    n = PAD // WIN
    xw = xp.reshape(b, n, WIN, n, WIN, DIM).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(b * n * n, WIN, WIN, DIM)

    bw_, d_head = xw.shape[0], DIM // HEADS
    qkv = (xw @ p["qkv_w"] + p["qkv_b"]).reshape(bw_, WIN * WIN, 3, HEADS, d_head)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    rh = rel_bias_lookup(p["rel_h"])
    rw = rel_bias_lookup(p["rel_w"])
    q_sp = q.reshape(bw_, WIN, WIN, HEADS, d_head)
    bias_h = jnp.einsum("bhwnd,hkd->bnhwk", q_sp, rh)
    bias_w = jnp.einsum("bhwnd,wkd->bnhwk", q_sp, rw)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * (d_head ** -0.5), k)
    bias = bias_h[..., :, None] + bias_w[..., None, :]
    attn = attn + bias.reshape(bw_, HEADS, WIN * WIN, WIN * WIN)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(bw_, WIN, WIN, DIM)
    out = out @ p["proj_w"] + p["proj_b"]

    out = out.reshape(b, n, n, WIN, WIN, DIM).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(b, PAD, PAD, DIM)
    return out[:, :GRID, :GRID]


def attn_v1(p, x):
    """Blocked einsum: reshape (free) to (A,WIN,B,WIN,C); the window grouping
    rides inside the dot_generals as batch/free dims — no standalone 6D
    transpose of the activations in either direction."""
    b, h, w, _ = x.shape
    pad = PAD - GRID
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
    n = PAD // WIN
    d_head = DIM // HEADS
    xb = xp.reshape(b, n, WIN, n, WIN, DIM)          # view, no copy

    qkv = xb @ p["qkv_w"] + p["qkv_b"]               # (b,A,i,B,j,3DIM)
    qkv = qkv.reshape(b, n, WIN, n, WIN, 3, HEADS, d_head)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    # q,k,v: (b, A, i, B, j, H, d)
    rh = rel_bias_lookup(p["rel_h"])                 # (i, k, d)
    rw = rel_bias_lookup(p["rel_w"])
    bias_h = jnp.einsum("zaibjhd,ikd->zabhijk", q, rh)   # (z,A,B,H,i,j,k_row)
    bias_w = jnp.einsum("zaibjhd,jld->zabhijl", q, rw)   # (z,A,B,H,i,j,k_col)
    scores = jnp.einsum("zaibjhd,zakblhd->zabhijkl",
                        q * (d_head ** -0.5), k)     # (z,A,B,H,i,j,k,l)
    scores = scores + bias_h[..., :, None] + bias_w[..., None, :]
    sh = scores.shape
    scores = scores.reshape(*sh[:6], WIN * WIN)
    probs = jax.nn.softmax(scores, axis=-1).reshape(sh)
    out = jnp.einsum("zabhijkl,zakblhd->zaibjhd", probs, v)
    out = out.reshape(b, n, WIN, n, WIN, DIM)
    out = out @ p["proj_w"] + p["proj_b"]
    out = out.reshape(b, PAD, PAD, DIM)
    return out[:, :GRID, :GRID]


def attn_v2(p, x):
    """v0 but softmax on bf16 scores (f32 max/sum reductions only) — probes
    the f32 convert round-trip share."""
    b, h, w, _ = x.shape
    pad = PAD - GRID
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
    n = PAD // WIN
    xw = xp.reshape(b, n, WIN, n, WIN, DIM).transpose(0, 1, 3, 2, 4, 5)
    xw = xw.reshape(b * n * n, WIN, WIN, DIM)

    bw_, d_head = xw.shape[0], DIM // HEADS
    qkv = (xw @ p["qkv_w"] + p["qkv_b"]).reshape(bw_, WIN * WIN, 3, HEADS, d_head)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    rh = rel_bias_lookup(p["rel_h"])
    rw = rel_bias_lookup(p["rel_w"])
    q_sp = q.reshape(bw_, WIN, WIN, HEADS, d_head)
    bias_h = jnp.einsum("bhwnd,hkd->bnhwk", q_sp, rh)
    bias_w = jnp.einsum("bhwnd,wkd->bnhwk", q_sp, rw)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * (d_head ** -0.5), k)
    bias = bias_h[..., :, None] + bias_w[..., None, :]
    attn = (attn + bias.reshape(bw_, HEADS, WIN * WIN, WIN * WIN))
    m = jnp.max(attn, axis=-1, keepdims=True)
    e = jnp.exp((attn - m))
    attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(bw_, WIN, WIN, DIM)
    out = out @ p["proj_w"] + p["proj_b"]

    out = out.reshape(b, n, n, WIN, WIN, DIM).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(b, PAD, PAD, DIM)
    return out[:, :GRID, :GRID]


def stack(fn, params, x):
    for p in params:
        x = x + fn(p, x)      # residual so the stack doesn't collapse
    return x


def main():
    rng = jax.random.PRNGKey(0)
    params = make_params(rng, DEPTH)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, GRID, GRID, DIM),
                          jnp.bfloat16) * 0.1

    fns = {}
    for name, fn in (("v0_shipping", attn_v0), ("v1_blocked", attn_v1),
                     ("v2_bf16sm", attn_v2)):
        # params as jit ARGUMENTS: baked-in constants make a ~500 MB HLO the
        # remote compile service rejects (HTTP 413)
        fns[name] = jax.jit(functools.partial(stack, fn))

    # parity first (single block on CPU-sized input is still the same math)
    outs = {}
    for name, fn in fns.items():
        outs[name] = np.asarray(fn(params, x), np.float32)
    for name in ("v1_blocked", "v2_bf16sm"):
        diff = np.max(np.abs(outs[name] - outs["v0_shipping"]))
        print(f"max|{name} - v0| = {diff:.4f}", flush=True)

    for name, fn in fns.items():          # compile everything first
        np.asarray(fn(params, x).ravel()[0])
    best = {name: float("inf") for name in fns}
    for _ in range(3):                    # interleave passes: order effects
        for name, fn in fns.items():      # and tunnel noise hit all equally
            t0 = time.perf_counter()
            n = 6
            out = None
            for i in range(n):
                out = fn(params, x + i)
            np.asarray(out.ravel()[0])
            dt = (time.perf_counter() - t0) / n * 1000
            best[name] = min(best[name], dt)
    for name, dt in best.items():
        print(f"{name:14s} {dt:8.1f} ms / {DEPTH}-block stack", flush=True)


if __name__ == "__main__":
    main()
