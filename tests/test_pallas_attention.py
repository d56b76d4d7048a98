"""Pallas fused attention vs the jnp reference (interpret mode on CPU;
the same kernel compiles natively on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from instance_based_loc_tpu.ops.pallas.attention import (
    fused_attention, reference_attention)


@pytest.mark.parametrize("shape", [(2, 4, 128, 64), (1, 12, 256, 64)])
def test_fused_attention_matches_reference(rng, shape):
    b, h, s, d = shape
    q = rng.normal(size=shape).astype(np.float32)
    k = rng.normal(size=shape).astype(np.float32)
    v = rng.normal(size=shape).astype(np.float32)
    out = fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          interpret=True)
    ref = reference_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_key_masking(rng):
    b, h, s, d = 1, 2, 128, 32
    q = rng.normal(size=(b, h, s, d)).astype(np.float32)
    k = rng.normal(size=(b, h, s, d)).astype(np.float32)
    v = rng.normal(size=(b, h, s, d)).astype(np.float32)
    valid = 77
    out = fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          valid_len=jnp.int32(valid), interpret=True)
    ref = reference_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              valid_len=jnp.int32(valid))
    # valid QUERY rows must match (padded query rows are unspecified)
    np.testing.assert_allclose(np.asarray(out)[:, :, :valid],
                               np.asarray(ref)[:, :, :valid], atol=2e-5)
