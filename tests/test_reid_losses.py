"""Margin-classifier family + center loss (reference `dator/loss/
metric_learning.py`, `center_loss.py`, defaults `config/defaults.py:36-152`):
numpy mirrors of the reference formulas, margin-geometry invariants, and the
trainer wiring (id_loss_type / center_loss_weight in TrainConfig)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from instance_based_loc_tpu.models.dator.losses import (
    arcface_logits, am_softmax_logits, center_loss, circle_logits,
    cosface_logits, margin_logits)


def _cos(f, w):
    f = f / np.linalg.norm(f, axis=-1, keepdims=True)
    w = w / np.linalg.norm(w, axis=-1, keepdims=True)
    return f @ w.T


@pytest.fixture
def batch(rng):
    feats = rng.normal(size=(12, 16)).astype(np.float32)
    weight = rng.normal(size=(7, 16)).astype(np.float32)
    labels = rng.integers(0, 7, size=12)
    return feats, weight, labels


def test_arcface_matches_reference_formula(batch):
    feats, weight, labels = batch
    s, m = 30.0, 0.5
    out = np.asarray(arcface_logits(jnp.asarray(feats), jnp.asarray(weight),
                                    jnp.asarray(labels), s=s, m=m))
    cos = _cos(feats, weight)
    sin = np.sqrt(np.clip(1 - cos ** 2, 0, 1))
    phi = cos * math.cos(m) - sin * math.sin(m)     # = cos(theta + m)
    th = math.cos(math.pi - m)
    mm = math.sin(math.pi - m) * m
    phi = np.where(cos > th, phi, cos - mm)
    onehot = np.eye(7)[labels]
    expected = s * (onehot * phi + (1 - onehot) * cos)
    np.testing.assert_allclose(out, expected, atol=1e-5)
    # non-target logits are the plain scaled cosine; target logits shrink
    # (the margin makes the target class strictly harder)
    np.testing.assert_allclose(out[onehot == 0], s * cos[onehot == 0],
                               atol=1e-5)
    assert np.all(out[onehot == 1] < s * cos[onehot == 1] + 1e-6)


def test_arcface_easy_margin(batch):
    feats, weight, labels = batch
    out = np.asarray(arcface_logits(jnp.asarray(feats), jnp.asarray(weight),
                                    jnp.asarray(labels), s=1.0, m=0.5,
                                    easy_margin=True))
    cos = _cos(feats, weight)
    onehot = np.eye(7)[labels].astype(bool)
    # easy margin: negative-cosine targets pass through unmargined
    neg = onehot & (cos <= 0)
    np.testing.assert_allclose(out[neg], cos[neg], atol=1e-5)


def test_cosface_and_amsoftmax_subtract_margin_at_target(batch):
    feats, weight, labels = batch
    s, m = 30.0, 0.3
    cos = _cos(feats, weight)
    onehot = np.eye(7)[labels]
    expected = s * (cos - onehot * m)
    for fn in (cosface_logits, am_softmax_logits):
        out = np.asarray(fn(jnp.asarray(feats), jnp.asarray(weight),
                            jnp.asarray(labels), s=s, m=m))
        np.testing.assert_allclose(out, expected, atol=1e-5)


def test_circle_matches_reference_formula(batch):
    feats, weight, labels = batch
    s, m = 256.0, 0.25
    out = np.asarray(circle_logits(jnp.asarray(feats), jnp.asarray(weight),
                                   jnp.asarray(labels), s=s, m=m))
    sim = _cos(feats, weight)
    alpha_p = np.maximum(-sim + 1 + m, 0)
    alpha_n = np.maximum(sim + m, 0)
    onehot = np.eye(7)[labels]
    expected = (onehot * s * alpha_p * (sim - (1 - m))
                + (1 - onehot) * s * alpha_n * (sim - m))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-3)


def test_margin_logits_dispatch_and_grads(batch):
    feats, weight, labels = batch
    for kind in ("arcface", "cosface", "amsoftmax", "circle"):
        def loss(f):
            lg = margin_logits(kind, f, jnp.asarray(weight),
                               jnp.asarray(labels))
            lp = jax.nn.log_softmax(lg, axis=-1)
            return -jnp.mean(lp[jnp.arange(12), jnp.asarray(labels)])
        g = jax.grad(loss)(jnp.asarray(feats))
        assert np.all(np.isfinite(np.asarray(g)))
    with pytest.raises(ValueError):
        margin_logits("sphereface", feats, weight, labels)


def test_center_loss_matches_reference(rng):
    feats = rng.normal(size=(9, 8)).astype(np.float32)
    centers = rng.normal(size=(4, 8)).astype(np.float32)
    labels = rng.integers(0, 4, size=9)
    out = float(center_loss(jnp.asarray(feats), jnp.asarray(labels),
                            jnp.asarray(centers)))
    # reference center_loss.py builds the full distmat and selects each
    # sample's own-class entry — i.e. squared distance to its center
    expected = np.mean(np.clip(
        np.sum((feats - centers[labels]) ** 2, axis=1), 1e-12, 1e12))
    np.testing.assert_allclose(out, expected, rtol=1e-5)
    # centers receive gradient (they are trained in the reference via
    # optimizer_center)
    g = jax.grad(lambda c: center_loss(jnp.asarray(feats),
                                       jnp.asarray(labels), c))(
        jnp.asarray(centers))
    assert np.any(np.asarray(g) != 0)


def test_train_step_with_margin_head_and_center(rng):
    """TrainConfig(id_loss_type=..., center_loss_weight=...) runs end to end
    on the tiny FourDNet and produces finite decreasing loss."""
    from instance_based_loc_tpu.models.dator.train import (
        TrainConfig, create_train_state, train_step)
    from tests.test_dator import TINY_CFG

    cfg = TrainConfig(id_loss_type="arcface", center_loss_weight=0.0005,
                      base_lr=0.01, lora_only=False, epochs=1,
                      steps_per_epoch=4)
    state = create_train_state(TINY_CFG, cfg, jax.random.PRNGKey(0),
                               height=32, width=16)
    assert "center_centers" in state.params["params"]
    rgb = jnp.asarray(rng.normal(size=(8, 32, 16, 3)).astype(np.float32))
    depth = jnp.asarray(rng.normal(size=(8, 32, 16, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, size=8))
    losses = []
    for i in range(8):
        state, metrics = train_step(state, rgb, depth, labels,
                                    jax.random.PRNGKey(i), cfg)
        assert np.isfinite(float(metrics["loss"]))
        assert "center_loss" in metrics
        losses.append(float(metrics["loss"]))
    # the BNNeck's batch statistics settle over the first few steps
    # (unit-scale post-BN triplet distances), so compare past the
    # transient: the tail must be below the early-window mean
    assert np.mean(losses[-2:]) < np.mean(losses[:4]), losses


def test_augment_batch_semantics(rng):
    """Device-side augmentation contract: flips/crops are shared across
    modalities (spatial correspondence survives), erasing touches rgb only,
    shapes/dtypes unchanged, and augmentation actually perturbs the batch."""
    import jax
    from instance_based_loc_tpu.models.dator.train import augment_batch

    b, h, w = 8, 64, 32
    rgb = jnp.asarray(rng.normal(size=(b, h, w, 3)).astype(np.float32))
    # depth copies rgb's first channel so shared spatial transforms are
    # directly checkable pixel-for-pixel
    depth = jnp.repeat(rgb[..., :1], 3, axis=-1)
    out_rgb, out_depth = augment_batch(rgb, depth, jax.random.PRNGKey(3))
    assert out_rgb.shape == rgb.shape and out_depth.shape == depth.shape

    # not a no-op
    assert not np.allclose(np.asarray(out_rgb), np.asarray(rgb))

    # shared flip/translate: wherever rgb was NOT erased, channel 0 of rgb
    # equals channel 0 of depth (erasing is rgb-only, so equality holds on
    # the non-erased mask; the erased rect differs)
    r0 = np.asarray(out_rgb[..., 0])
    d0 = np.asarray(out_depth[..., 0])
    same = np.isclose(r0, d0, atol=1e-6)
    frac_same = same.mean(axis=(1, 2))
    # every sample keeps most pixels aligned (erase rect <= 40% area)
    assert (frac_same >= 0.55).all(), frac_same
    # at least one sample was erased somewhere (p=0.5 over 8 samples)
    assert (frac_same < 1.0).any()

    # determinism under the same key
    out2_rgb, out2_depth = augment_batch(rgb, depth, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(out_rgb), np.asarray(out2_rgb))
