"""Measure the Pallas MSDA level-0 gather attempt against the shipping XLA
hybrid lowering (VERDICT r3 next-round item 3a: "even a refuted kernel with
numbers beats the current prose claim").

Shapes are GroundingDINO@800's encoder level 0 — the wall itself:
S = 100*100, H = 8, D = 32, Q = 13294 (all pyramid queries sample level 0),
K*4 = 16 taps per (query, head). One encoder layer runs this once; the
forward runs 6. XLA's flat gather measures ~9 ms/layer on a v5e through the
axon tunnel (PERF.md).

Run ON TPU (the axon tunnel):  python perf/msda_pallas_probe.py
Outcomes land in the printed table; paste into PERF.md either way.
"""

from __future__ import annotations

import time
import traceback

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from instance_based_loc_tpu.ops.pallas.msda_gather import (
        msda_level_gather_pallas, msda_level_gather_reference)

    S, H, D, Q = 100 * 100, 8, 32, 13294
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(S, H, D)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    lin = jnp.asarray(rng.integers(0, S, size=(Q, H, 16)).astype(np.int32))
    coeff = jnp.asarray(rng.normal(size=(Q, H, 16)).astype(np.float32))

    def bench(fn, label, n=20):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n * 1000
        print(f"{label}: {dt:.2f} ms/call")
        return out, dt

    ref_jit = jax.jit(msda_level_gather_reference)
    ref_out, ref_ms = bench(lambda: ref_jit(v, lin, coeff),
                            "XLA flat-gather (shipping)")

    try:
        pal_out, pal_ms = bench(
            lambda: msda_level_gather_pallas(v, lin, coeff),
            "Pallas VMEM-resident gather")
        err = np.abs(np.asarray(pal_out) - np.asarray(ref_out)).max()
        print(f"parity max|diff| = {err:.2e}")
        print(f"verdict: pallas {'WINS' if pal_ms < ref_ms else 'LOSES'} "
              f"({pal_ms:.2f} vs {ref_ms:.2f} ms)")
    except Exception:
        print("Pallas kernel FAILED to compile/run on this backend:")
        traceback.print_exc()
        print("verdict: refuted — Mosaic cannot express this gather "
              "(the r2/r3 prose claim, now with a committed artifact)")


if __name__ == "__main__":
    main()
