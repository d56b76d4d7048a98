"""Pallas attempt at the MSDA big-level gather (VERDICT r3 Weak #3).

The wall: GroundingDINO@800's level-0 (100x100) deformable-attention taps
are a random-access gather of ~1.7M 64-byte rows per encoder layer, and the
XLA flat-gather lowering sits at ~9 ms/layer — gather-issue-rate bound at
~190M rows/s, ~12 GB/s effective (PERF.md "MSDA big gather"). Round 2/3
measured five XLA-level lowerings (naive, flat, all-matmul, (2,2,D)-block,
head-major x-pair) and left "a per-lane Pallas gather is not expressible on
TPU" as prose. This module is the committed artifact behind that sentence:
an actual kernel, runnable, with measured numbers either way
(perf/msda_pallas_probe.py).

Design (attempt 1 — VMEM-resident value, in-kernel vector gather):
the whole level-0 value map for one head is (10000, 32) bf16 = 640 KB —
small enough that ALL heads (5.1 MB) sit in VMEM at once. The kernel tiles
queries on the grid, keeps the value map resident across the grid
(constant index_map), and issues `jnp.take` row gathers from VMEM instead
of HBM. If Mosaic can vectorize a VMEM row gather at all, this removes the
HBM gather-issue bottleneck; if it cannot (scalarizes or rejects), the
probe records that number/error as the floor evidence.

Reference being replaced: the CUDA MultiScaleDeformableAttention op
(reference README.md:63-69, used via object_memory/object_finder.py's
GroundingDINO predict).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(v_ref, lin_ref, coeff_ref, out_ref):
    """One query tile for one head (head-major layout).

    v_ref:     (1, S, D) value map, whole level, one head (VMEM, resident)
    lin_ref:   (1, TQ, 16) i32 row indices (K=4 points x 4 bilinear taps)
    coeff_ref: (1, TQ, 16) f32 folded tap x attention weights
    out_ref:   (1, TQ, D) f32
    """
    _, s, d = v_ref.shape
    tq = lin_ref.shape[1]
    lin = lin_ref[0]                                    # (TQ, 16)
    coeff = coeff_ref[0]
    # the vector gather under test: 16*TQ dynamic rows from a VMEM ref
    rows = jnp.take(v_ref[0], lin.reshape(-1), axis=0)
    rows = rows.reshape(tq, 16, d).astype(jnp.float32)
    out_ref[0] = jnp.sum(rows * coeff[:, :, None], axis=1)


@partial(jax.jit, static_argnames=("interpret",))
def msda_level_gather_pallas(vmap_l: jax.Array, lin: jax.Array,
                             coeff: jax.Array, interpret: bool = False
                             ) -> jax.Array:
    """Pallas lowering of one MSDA level's sample-and-reduce.

    vmap_l: (S, H, D) value map (any float dtype)
    lin:    (Q, H, 16) i32 spatial row index per (query, head, tap)
    coeff:  (Q, H, 16) f32 folded bilinear x attention weight per tap
    returns (Q, H, D) f32 — same contraction as ops.msda._level_gather.

    Block-shape rules (Mosaic): the last two dims of every block must be
    divisible by (8, 128) or equal the overall array dims — hence the
    head-major (H, ...) layouts where the per-head (S, D) / (TQ, 16) /
    (TQ, D) planes ARE the trailing dims.
    """
    s, h, d = vmap_l.shape
    q = lin.shape[0]
    tq = 512
    q_pad = (-q) % tq
    if q_pad:
        lin = jnp.pad(lin, ((0, q_pad), (0, 0), (0, 0)))
        coeff = jnp.pad(coeff, ((0, q_pad), (0, 0), (0, 0)))
    qp = q + q_pad

    v_hm = jnp.swapaxes(vmap_l, 0, 1)          # (H, S, D) head-major
    lin_hm = jnp.swapaxes(lin, 0, 1)           # (H, Q, 16)
    coeff_hm = jnp.swapaxes(coeff, 0, 1)       # (H, Q, 16)

    grid = (qp // tq, h)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((h, qp, d), jnp.float32),
        grid=grid,
        in_specs=[
            # value map: whole level for head j, resident across i
            pl.BlockSpec((1, s, d), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 16), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 16), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, d), lambda i, j: (j, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(v_hm, lin_hm, coeff_hm)
    return jnp.swapaxes(out, 0, 1)[:q]


def msda_level_gather_reference(vmap_l, lin, coeff):
    """XLA equivalent of the kernel for parity checks: same (Q, H, 16)
    folded-coefficient contract as ops.msda._level_gather."""
    s, h, d = vmap_l.shape
    q = lin.shape[0]
    per_head = []
    for head in range(h):
        rows = jnp.take(vmap_l[:, head], lin[:, head].reshape(-1), axis=0)
        rows = rows.reshape(q, 16, d).astype(jnp.float32)
        per_head.append(jnp.sum(rows * coeff[:, head, :, None], axis=1))
    return jnp.stack(per_head, axis=1)
