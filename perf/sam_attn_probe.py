"""Measure the SAM global-block attention: XLA unfused vs the Pallas
fused kernel (ops/pallas/sam_attention.py), at SAM-B encoder shape
(S = 64*64 tokens, 12 heads, d_head 64), f32 and bf16.

Run on the tunneled chip: python perf/sam_attn_probe.py
(one TPU job at a time — see .claude/skills/verify/SKILL.md)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from instance_based_loc_tpu.ops.pallas.sam_attention import (
    sam_flash_attention, reference_sam_attention)


def bench(fn, args, n=20):
    np.asarray(fn(*args).ravel()[0])          # compile + sync
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / n * 1000


def main():
    rng = np.random.default_rng(0)
    hk = wk = 64
    b, h, s, d = 1, 12, hk * wk, 64
    for dtype in (jnp.float32, jnp.bfloat16):
        q = jnp.asarray(rng.normal(size=(b, h, s, d)), dtype)
        k = jnp.asarray(rng.normal(size=(b, h, s, d)), dtype)
        v = jnp.asarray(rng.normal(size=(b, h, s, d)), dtype)
        bh = jnp.asarray(0.2 * rng.normal(size=(b, h, s, hk)), dtype)
        bw = jnp.asarray(0.2 * rng.normal(size=(b, h, s, wk)), dtype)

        xla = jax.jit(reference_sam_attention)
        t_xla = bench(xla, (q, k, v, bh, bw))
        t_pal = bench(sam_flash_attention, (q, k, v, bh, bw))
        name = np.dtype(dtype).name
        print(f"{name:9s} xla {t_xla:7.2f} ms   pallas {t_pal:7.2f} ms   "
              f"speedup {t_xla / t_pal:4.2f}x", flush=True)

        out_p = np.asarray(sam_flash_attention(q, k, v, bh, bw), np.float32)
        out_x = np.asarray(xla(q, k, v, bh, bw), np.float32)
        err = np.max(np.abs(out_p - out_x))
        print(f"{name:9s} max |pallas - xla| = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
