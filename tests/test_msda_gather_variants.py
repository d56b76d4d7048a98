"""Parity between the MSDA level-gather lowerings (ops/msda.py) and the
Pallas VMEM-resident gather kernel (ops/pallas/msda_gather.py, interpret
mode here — the compiled path is measured on TPU by
perf/msda_pallas_probe.py).

The r4 per-head lowering replaced the r2/r3 flat (S*H, D) single gather
after the probe showed per-head contiguous (S, D) tables run ~VMEM-resident
on a v5e while the flat table's random HBM rows were the documented
"MSDA big gather" wall (PERF.md). Reference being replaced: the CUDA
MultiScaleDeformableAttention op (reference README.md:63-69).
"""

import numpy as np
import pytest


@pytest.fixture
def level_inputs():
    rng = np.random.default_rng(7)
    s, h, d, q, k = 25 * 16, 4, 32, 333, 4
    vmap_l = rng.normal(size=(s, h, d)).astype(np.float32)
    loc = rng.uniform(-0.05, 1.05, size=(q, h, k, 2)).astype(np.float32)
    attn = rng.uniform(0, 1, size=(q, h, k)).astype(np.float32)
    return vmap_l, loc, attn, (16, 25)


def test_perhead_matches_flat(level_inputs, monkeypatch):
    import jax.numpy as jnp
    from instance_based_loc_tpu.ops import msda

    vmap_l, loc, attn, (hh, ww) = level_inputs
    monkeypatch.setenv("IBL_MSDA_GATHER", "flat")
    flat = np.asarray(msda._level_gather(jnp.asarray(vmap_l),
                                         jnp.asarray(loc),
                                         jnp.asarray(attn), hh, ww))
    perhead = np.asarray(msda._level_gather_perhead(
        jnp.asarray(vmap_l), jnp.asarray(loc), jnp.asarray(attn), hh, ww))
    np.testing.assert_allclose(perhead, flat, rtol=0, atol=2e-5)


def test_pallas_gather_interpret_matches_reference():
    import jax.numpy as jnp
    from instance_based_loc_tpu.ops.pallas.msda_gather import (
        msda_level_gather_pallas, msda_level_gather_reference)

    rng = np.random.default_rng(0)
    s, h, d, q = 128, 2, 32, 300   # one 512-query tile x 2 heads: interpret
    v = jnp.asarray(rng.normal(size=(s, h, d)).astype(np.float32))
    lin = jnp.asarray(rng.integers(0, s, size=(q, h, 16)).astype(np.int32))
    coeff = jnp.asarray(rng.normal(size=(q, h, 16)).astype(np.float32))
    ref = np.asarray(msda_level_gather_reference(v, lin, coeff))
    pal = np.asarray(msda_level_gather_pallas(v, lin, coeff, interpret=True))
    np.testing.assert_allclose(pal, ref, rtol=0, atol=1e-5)
