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


# --- SAM global-block kernel (rel-pos bias fused tile-wise) ---

from instance_based_loc_tpu.ops.pallas.sam_attention import (   # noqa: E402
    sam_flash_attention, reference_sam_attention)


@pytest.mark.parametrize("grid_hw", [(16, 16), (16, 8)])
def test_sam_flash_attention_matches_reference(rng, grid_hw):
    hk, wk = grid_hw
    b, h, d = 1, 3, 32
    s = hk * wk
    q = rng.normal(size=(b, h, s, d)).astype(np.float32)
    k = rng.normal(size=(b, h, s, d)).astype(np.float32)
    v = rng.normal(size=(b, h, s, d)).astype(np.float32)
    bh = (0.3 * rng.normal(size=(b, h, s, hk))).astype(np.float32)
    bw = (0.3 * rng.normal(size=(b, h, s, wk))).astype(np.float32)
    out = sam_flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              jnp.asarray(bh), jnp.asarray(bw),
                              q_tile=64, interpret=True)
    ref = reference_sam_attention(jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), jnp.asarray(bh),
                                  jnp.asarray(bw))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sam_encoder_pallas_flag_matches_xla(rng):
    """The full SamAttention module with use_pallas_attention=True must
    reproduce the XLA path bit-for-bit-ish on a global-shaped block.
    (On CPU the flag is inert — backend gate — so drive the kernel in
    interpret mode through the same bias layout the module uses.)"""
    from instance_based_loc_tpu.models.sam import _rel_pos_bias

    hk = wk = 16
    s, heads, d_head = hk * wk, 2, 32
    q = rng.normal(size=(1, s, heads, d_head)).astype(np.float32)
    k = rng.normal(size=(1, s, heads, d_head)).astype(np.float32)
    v = rng.normal(size=(1, s, heads, d_head)).astype(np.float32)
    rel_h = (0.2 * rng.normal(size=(2 * hk - 1, d_head))).astype(np.float32)
    rel_w = (0.2 * rng.normal(size=(2 * wk - 1, d_head))).astype(np.float32)
    rh = _rel_pos_bias(hk, hk, jnp.asarray(rel_h))
    rw = _rel_pos_bias(wk, wk, jnp.asarray(rel_w))
    q_sp = jnp.asarray(q).reshape(1, hk, wk, heads, d_head)
    bias_h = jnp.einsum("bhwnd,hkd->bnhwk", q_sp, rh).reshape(1, heads, s, hk)
    bias_w = jnp.einsum("bhwnd,wkd->bnhwk", q_sp, rw).reshape(1, heads, s, wk)

    qt = jnp.asarray(q).transpose(0, 2, 1, 3)
    kt = jnp.asarray(k).transpose(0, 2, 1, 3)
    vt = jnp.asarray(v).transpose(0, 2, 1, 3)
    out = sam_flash_attention(qt, kt, vt, bias_h, bias_w, q_tile=64,
                              interpret=True)

    # XLA-path mirror: scores + broadcast bias + softmax + PV
    scale = d_head ** -0.5
    attn = jnp.einsum("bqhd,bkhd->bhqk", jnp.asarray(q) * scale,
                      jnp.asarray(k))
    bias = bias_h.reshape(1, heads, hk, wk, hk)[..., :, None] + \
        bias_w.reshape(1, heads, hk, wk, wk)[..., None, :]
    attn = attn + bias.reshape(1, heads, s, s)
    attn = jax.nn.softmax(attn, axis=-1)
    ref = jnp.einsum("bhqk,bkhd->bhqd", attn, jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
