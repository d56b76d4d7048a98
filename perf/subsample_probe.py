"""Measure top_k-sort vs linear-compaction masked subsample inside the
fused localise program at reference scale (640x480, d_pad lanes). The
subsample is the only h*w-scaling non-elementwise term of the prepare
stage, so this isolates the suspect for the 10x device-time blowup from
toy (160x220) to reference scale (VERDICT r4 item 3 / Weak #2).

    JAX_PLATFORMS=cpu python perf/subsample_probe.py     # CPU asymptotics
    python perf/subsample_probe.py                        # on-chip numbers
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from instance_based_loc_tpu.ops import localise_kernels as lk


def bench(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    h, w, lanes, cap = 480, 640, 7, 1024
    P = h * w
    rng = np.random.default_rng(0)
    valid = jnp.asarray(rng.random((lanes, P)) < 0.1)
    points = jnp.asarray(rng.random((P, 3), np.float32))
    keys = jax.random.split(jax.random.PRNGKey(0), lanes)

    @jax.jit
    def topk_path(valid, keys):
        def one(v, k):
            scores = jnp.where(v, jax.random.uniform(k, v.shape), -jnp.inf)
            top, idx = jax.lax.top_k(scores, cap)
            return points[idx], jnp.isfinite(top)
        return jax.vmap(one)(valid, keys)

    @jax.jit
    def linear_path(valid, keys):
        def one(v, k):
            idx, keep = lk._masked_subsample_linear(v, cap, k)
            return points[idx], keep
        return jax.vmap(one)(valid, keys)

    t_top = bench(topk_path, valid, keys)
    t_lin = bench(linear_path, valid, keys)
    print(f"{lanes} lanes x top_k({P} -> {cap}):  {t_top:8.2f} ms")
    print(f"{lanes} lanes x linear({P} -> {cap}): {t_lin:8.2f} ms "
          f"({t_top / max(t_lin, 1e-9):.1f}x)")


if __name__ == "__main__":
    main()
