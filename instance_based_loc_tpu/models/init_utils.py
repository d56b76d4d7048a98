"""Host-side parameter synthesis (round-3 cold-start fix).

`model.init` under jax traces the forward and runs it as a compiled device
program — over the axon tunnel that is a REMOTE compile per model, measured
at 390 s (RAM), 668 s (GDINO@800) and 290 s (SAM-H@1024) — 73% of the
cascade bench's 31-minute setup (perf/cascade_compile_probe.py). Real
deployments never need it either: checkpoint porters build params on the
host. This helper produces a same-shaped tree with `jax.eval_shape`
(zero-FLOP abstract trace) and numpy values chosen like sane initializers
(LayerNorm scales 1, biases 0, everything else N(0, 0.02)), so weights-free
and random-init paths skip the device entirely until the first forward."""

from __future__ import annotations

import jax
import numpy as np


def host_random_params(model, seed: int, *args, scale: float = 0.02,
                       **kwargs):
    """Shape-identical replacement for `model.init(PRNGKey(seed), *args)`
    built entirely on host. Values: name-aware — "scale" leaves 1.0, "bias"
    leaves 0.0, others N(0, scale) — an approximation of flax's default
    initializers that keeps LayerNorm/residual activation magnitudes sane.
    NOT a bit-match for model.init; use only where weight values are
    arbitrary (benchmarks, weights-free serving, batch-parity fixtures)."""
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(seed), *args,
                            **kwargs)
    rng = np.random.default_rng(seed)

    def fill(path, leaf):
        name = getattr(path[-1], "key", None) if path else None
        if name == "scale":
            v = np.ones(leaf.shape, np.float32)
        elif name == "bias":
            v = np.zeros(leaf.shape, np.float32)
        else:
            v = rng.normal(0.0, scale, leaf.shape).astype(np.float32)
        return v.astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(fill, shapes)


def host_train_init(model, seed: int, *args, **kwargs):
    """Training-grade host-side init: same zero-device-compile trick as
    `host_random_params`, but with distributions matching the initializers
    the models actually declare, so from-scratch TRAINING can start from it
    (host_random_params's flat N(0, 0.02) is only benchmark-grade):

      * Dense/Conv "kernel"  -> lecun-normal N(0, 1/fan_in) (flax default)
      * "bias" -> 0, LayerNorm/BatchNorm "scale" -> 1
      * batch_stats "mean" -> 0, "var" -> 1
      * "cls_token"/"pos_embed"/"sie_embed"/"embedding" -> N(0, 0.02)
        (truncated_normal(0.02) in the models; plain normal is within the
        init-noise budget)
      * "lora_down" -> N(0, 1), "lora_up" -> 0 (adapters start as identity,
        transreid_vit.py:73-75)

    Exists because `model.init` is a remote compile over the axon tunnel
    (minutes for the dual-ViT FourDNet) that buys nothing when the values
    are immediately overwritten by a warm start or are plain random.

    kwargs["rngs"], when given, is passed as model.init's rng dict (models
    that make_rng extra streams — e.g. "dropout" — need it even under
    eval_shape)."""
    rngs = kwargs.pop("rngs", None)
    if rngs is None:
        rngs = jax.random.PRNGKey(seed)
    # zero-arg closure: eval_shape would otherwise abstract python-level
    # kwargs like training=True into tracers
    shapes = jax.eval_shape(lambda: model.init(rngs, *args, **kwargs))
    # sow()'d diagnostics land in an "intermediates" collection during
    # init; they are outputs, not parameters
    shapes = {k: v for k, v in dict(shapes).items() if k != "intermediates"}
    rng = np.random.default_rng(seed)

    def fill(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        name = names[-1] if names else ""
        shape = leaf.shape
        if name == "lora_down":
            v = rng.normal(0.0, 1.0, shape)
        elif name == "lora_up":
            v = np.zeros(shape)
        elif name in ("scale", "var"):
            v = np.ones(shape)
        elif name in ("bias", "mean") or "batch_stats" in names[:-1]:
            v = (np.ones(shape) if name == "var" else np.zeros(shape))
        elif name == "kernel" and len(shape) >= 2:
            fan_in = int(np.prod(shape[:-1]))
            v = rng.normal(0.0, np.sqrt(1.0 / max(fan_in, 1)), shape)
        else:
            v = rng.normal(0.0, 0.02, shape)
        return v.astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(fill, shapes)
