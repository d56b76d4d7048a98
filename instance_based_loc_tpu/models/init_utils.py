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
