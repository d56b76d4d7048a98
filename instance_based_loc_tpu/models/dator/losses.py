"""ReID losses (reference `dator/loss/`): cross-entropy (optionally
label-smoothed, loss/make_loss.py CrossEntropyLabelSmooth), and the batch-hard
soft-margin triplet loss (loss/triplet_loss.py: euclidean distances,
hardest-positive / hardest-negative mining per anchor, softplus soft margin
when no margin is configured). All fully batched jnp — the P x K batch layout
guarantees every anchor has positives and negatives."""

from __future__ import annotations

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


def reid_loss(cls_score: jax.Array, features: jax.Array, labels: jax.Array,
              id_weight: float = 1.0, triplet_weight: float = 1.0,
              label_smoothing: float = 0.0,
              triplet_margin: float | None = None) -> tuple[jax.Array, dict]:
    """CE + triplet composition (loss/make_loss.py:41-93 softmax_triplet)."""
    id_loss = cross_entropy(cls_score, labels, label_smoothing)
    tri_loss = batch_hard_triplet(features, labels, margin=triplet_margin)
    total = id_weight * id_loss + triplet_weight * tri_loss
    return total, {"id_loss": id_loss, "triplet_loss": tri_loss}
