"""ReID losses (reference `dator/loss/`): cross-entropy (optionally
label-smoothed, loss/make_loss.py CrossEntropyLabelSmooth), the batch-hard
soft-margin triplet loss (loss/triplet_loss.py: euclidean distances,
hardest-positive / hardest-negative mining per anchor, softplus soft margin
when no margin is configured), the margin-classifier family
(loss/metric_learning.py: Arcface / Cosface / AMSoftmax / CircleLoss — cosine
logits with an additive-angle / additive-cosine / circle margin at the target
class, scaled by s) and center loss (loss/center_loss.py). All fully batched
jnp — the P x K batch layout guarantees every anchor has positives and
negatives. The margin heads are functional: they take the classifier weight
explicitly instead of owning a Parameter, so the same FourDNet classifier
kernel serves both the plain-softmax and margin paths."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def cross_entropy(logits: jax.Array, labels: jax.Array,
                  label_smoothing: float = 0.0) -> jax.Array:
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes)
    if label_smoothing > 0:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / num_classes
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def euclidean_dist(x: jax.Array, y: jax.Array) -> jax.Array:
    """Clamped sqrt pairwise distances (triplet_loss.py:16-31)."""
    xx = jnp.sum(x * x, axis=1)[:, None]
    yy = jnp.sum(y * y, axis=1)[None, :]
    d2 = xx + yy - 2.0 * jnp.matmul(x, y.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.sqrt(jnp.maximum(d2, 1e-12))


def batch_hard_triplet(features: jax.Array, labels: jax.Array,
                       margin: float | None = None,
                       normalize_feature: bool = False) -> jax.Array:
    """Hardest-positive/negative triplet loss (triplet_loss.py:51-150).
    margin=None -> soft margin softplus(d_ap - d_an)."""
    if normalize_feature:
        features = features / (jnp.linalg.norm(features, axis=-1, keepdims=True) + 1e-12)
    dist = euclidean_dist(features, features)
    same = labels[:, None] == labels[None, :]
    big = jnp.float32(1e12)
    dist_ap = jnp.max(jnp.where(same, dist, -big), axis=1)
    dist_an = jnp.min(jnp.where(same, big, dist), axis=1)
    if margin is None:
        return jnp.mean(jax.nn.softplus(dist_ap - dist_an))
    return jnp.mean(jnp.maximum(dist_ap - dist_an + margin, 0.0))


def _cosine_logits(features: jax.Array, weight: jax.Array) -> jax.Array:
    """cos(theta) between L2-normalized features and class weights.
    `weight` is (num_classes, feat) — the reference's Parameter layout
    (metric_learning.py Arcface/Cosface: F.linear(F.normalize(x),
    F.normalize(W)))."""
    f = features / jnp.maximum(
        jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-12)
    w = weight / jnp.maximum(
        jnp.linalg.norm(weight, axis=-1, keepdims=True), 1e-12)
    return jnp.matmul(f, w.T, precision=jax.lax.Precision.HIGHEST)


def arcface_logits(features: jax.Array, weight: jax.Array, labels: jax.Array,
                   s: float = 30.0, m: float = 0.50,
                   easy_margin: bool = False,
                   ls_eps: float = 0.0) -> jax.Array:
    """Additive-angular-margin logits: target class gets s*cos(theta+m)
    (metric_learning.py Arcface.forward; arcface.py ArcFace uses the same
    math with s=30, m=0.5). The th/mm fallback keeps the logit monotone in
    theta once theta+m passes pi."""
    cos = _cosine_logits(features, weight)
    sin = jnp.sqrt(jnp.clip(1.0 - cos * cos, 0.0, 1.0))
    phi = cos * math.cos(m) - sin * math.sin(m)
    if easy_margin:
        phi = jnp.where(cos > 0, phi, cos)
    else:
        th = math.cos(math.pi - m)
        mm = math.sin(math.pi - m) * m
        phi = jnp.where(cos > th, phi, cos - mm)
    onehot = jax.nn.one_hot(labels, weight.shape[0], dtype=cos.dtype)
    if ls_eps > 0:
        onehot = onehot * (1 - ls_eps) + ls_eps / weight.shape[0]
    return s * (onehot * phi + (1.0 - onehot) * cos)


def cosface_logits(features: jax.Array, weight: jax.Array, labels: jax.Array,
                   s: float = 30.0, m: float = 0.30) -> jax.Array:
    """Additive-cosine-margin logits: target class gets s*(cos(theta) - m)
    (metric_learning.py Cosface.forward; AMSoftmax computes the same margin
    with a transposed weight layout — both map here)."""
    cos = _cosine_logits(features, weight)
    onehot = jax.nn.one_hot(labels, weight.shape[0], dtype=cos.dtype)
    return s * (cos - onehot * m)


# AMSoftmax (metric_learning.py:167-188) is mathematically identical to
# Cosface at this layer — cos(theta) minus m at the target, scaled by s.
am_softmax_logits = cosface_logits


def circle_logits(features: jax.Array, weight: jax.Array, labels: jax.Array,
                  s: float = 256.0, m: float = 0.25) -> jax.Array:
    """CircleLoss logits (metric_learning.py CircleLoss / arcface.py):
    per-pair adaptive weighting alpha_p/alpha_n on stop-gradient similarity,
    optima at delta_p=1-m (positives) and delta_n=m (negatives)."""
    sim = _cosine_logits(features, weight)
    sim_d = jax.lax.stop_gradient(sim)
    alpha_p = jnp.maximum(-sim_d + 1 + m, 0.0)
    alpha_n = jnp.maximum(sim_d + m, 0.0)
    s_p = s * alpha_p * (sim - (1 - m))
    s_n = s * alpha_n * (sim - m)
    onehot = jax.nn.one_hot(labels, weight.shape[0], dtype=sim.dtype)
    return onehot * s_p + (1.0 - onehot) * s_n


MARGIN_HEADS = {"arcface": arcface_logits, "cosface": cosface_logits,
                "amsoftmax": am_softmax_logits, "circle": circle_logits}


def margin_logits(kind: str, features: jax.Array, weight: jax.Array,
                  labels: jax.Array, **kwargs) -> jax.Array:
    """Dispatch over the reference's cfg.MODEL.ID_LOSS_TYPE options
    ('arcface' | 'cosface' | 'amsoftmax' | 'circle')."""
    if kind not in MARGIN_HEADS:
        raise ValueError(f"unknown margin head {kind!r}; "
                         f"options: {sorted(MARGIN_HEADS)}")
    return MARGIN_HEADS[kind](features, weight, labels, **kwargs)


def center_loss(features: jax.Array, labels: jax.Array,
                centers: jax.Array) -> jax.Array:
    """Mean squared distance of each feature to its class center
    (loss/center_loss.py:36-53 — the all-classes distmat there is only a
    vehicle for selecting each sample's own-center entry; clamp kept).
    `centers` is a trainable (num_classes, feat) array."""
    diff2 = jnp.sum((features - centers[labels]) ** 2, axis=1)
    return jnp.mean(jnp.clip(diff2, 1e-12, 1e12))


def reid_loss(cls_score: jax.Array, features: jax.Array, labels: jax.Array,
              id_weight: float = 1.0, triplet_weight: float = 1.0,
              label_smoothing: float = 0.0,
              triplet_margin: float | None = None) -> tuple[jax.Array, dict]:
    """CE + triplet composition (loss/make_loss.py:41-93 softmax_triplet)."""
    id_loss = cross_entropy(cls_score, labels, label_smoothing)
    tri_loss = batch_hard_triplet(features, labels, margin=triplet_margin)
    total = id_weight * id_loss + triplet_weight * tri_loss
    return total, {"id_loss": id_loss, "triplet_loss": tri_loss}
