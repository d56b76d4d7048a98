"""Measure MSDA level-0 gather lowerings against each other (VERDICT r3
next-round item 3a). Timing happens inside ONE jitted lax.scan: a first
version of this probe timed dispatch wall-clock and read 0.03 ms for a
5.3 ms gather — the tunnel's block_until_ready hazard; scan-carry timing
is immune. Result (r4, v5e): flat 4.46 ms/iter beats per-head 5.30; the
Pallas kernel fails Mosaic's gather lowering rule (see PERF.md).

Shapes are GroundingDINO@800's encoder level 0 — the wall itself:
S = 100*100, H = 8, D = 32, Q = 13294 (all pyramid queries sample level 0),
K*4 = 16 taps per (query, head). One encoder layer runs this once; the
forward runs 6.

Variants:
  flat    — the r2/r3 shipping form: ONE gather from the (S*H, D) table
            (5.1 MB bf16; ops.msda._level_gather IBL_MSDA_GATHER=flat)
  perhead — 8 gathers, one per head, each from a CONTIGUOUS (S, D) table
            (640 KB bf16 — small enough to stay VMEM-resident;
            ops.msda._level_gather_perhead)
  pallas  — VMEM-resident jnp.take inside a Pallas kernel
            (ops.pallas.msda_gather)

Timing: each variant runs R iterations inside ONE jitted lax.scan whose
carry feeds the next iteration (no CSE, no dispatch overhead, one tunnel
round-trip), so per-iteration time is honest device time.

Run ON TPU (the axon tunnel):  python perf/msda_pallas_probe.py
Outcomes land in the printed table; paste into PERF.md either way.
"""

from __future__ import annotations

import time
import traceback

import numpy as np

R = 50  # scan iterations per timing


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

    def flat(v_, lin_, coeff_):
        # the r2/r3 shipping form: fold head into the row index, one gather
        flat_v = v_.reshape(S * H, D)
        hidx = jnp.arange(H, dtype=jnp.int32)[None, :, None]
        lin_f = lin_ * H + hidx                          # (Q, H, 16)
        rows = jnp.take(flat_v, lin_f.reshape(-1), axis=0)
        rows = rows.reshape(Q, H, 16, D).astype(jnp.float32)
        return jnp.sum(rows * coeff_[..., None], axis=2)

    def perhead(v_, lin_, coeff_):
        return msda_level_gather_reference(v_, lin_, coeff_)

    def pallas(v_, lin_, coeff_):
        return msda_level_gather_pallas(v_, lin_, coeff_)

    def scan_bench(fn, label):
        @jax.jit
        def run(v_, lin_, coeff_):
            def body(carry, _):
                out = fn(v_, lin_, coeff_ + carry)       # data-dep: no CSE
                return jnp.max(out) * 1e-12, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=R)
            return c

        c = run(v, lin, coeff)                           # compile + warm
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        c = run(v, lin, coeff)
        jax.block_until_ready(c)
        dt = (time.perf_counter() - t0) / R * 1000
        print(f"{label}: {dt:.3f} ms/iter ({R} iters in one device scan)")
        return dt

    ref_out = jax.jit(perhead)(v, lin, coeff)
    flat_out = jax.jit(flat)(v, lin, coeff)
    err = np.abs(np.asarray(flat_out) - np.asarray(ref_out)).max()
    print(f"flat vs perhead parity max|diff| = {err:.2e}")

    t_flat = scan_bench(flat, "flat (S*H,D) single gather [r2/r3 shipping]")
    t_ph = scan_bench(perhead, "per-head (S,D) gathers [r4]")
    print(f"per-head speedup over flat: {t_flat / t_ph:.1f}x")

    try:
        pal_out = pallas(v, lin, coeff)
        err = np.abs(np.asarray(pal_out) - np.asarray(ref_out)).max()
        print(f"pallas parity max|diff| = {err:.2e}")
        t_pal = scan_bench(pallas, "Pallas VMEM-resident gather")
        best = min(t_flat, t_ph)
        print(f"verdict: pallas {'WINS' if t_pal < best else 'LOSES'} "
              f"({t_pal:.3f} vs best XLA {best:.3f} ms)")
    except Exception:
        print("Pallas kernel FAILED to compile/run on this backend:")
        traceback.print_exc()
        print("verdict: pallas gather not lowerable at this shape; "
              "per-head XLA form stands as the measured floor")


if __name__ == "__main__":
    main()
