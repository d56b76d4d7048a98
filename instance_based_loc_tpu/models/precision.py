"""Inference compute-precision policy for the perception models.

TPU-first: the MXU runs bf16 matmuls at twice the f32 rate and bf16
activations halve HBM traffic, so the deployment default for the perception
cascade (RAM / GroundingDINO / SAM — reference `object_memory/object_finder.py`
runs these f32 under torch/CUDA) is bfloat16 inference with f32-mastered
checkpoints. Casting happens at the jit boundary: params and the image input
are cast once, the flax modules are untouched (flax layers follow operand
dtypes), and outputs are cast back to f32 before any thresholding.

Validated: backbone features agree with f32 to ~0.5% relative (bf16 epsilon
class — tests/test_precision.py); end-task decisions (mask thresholds, box
scores) are driven by confident margins with real checkpoints.

Override per process with IBL_MODEL_DTYPE=float32 (or per builder via the
`compute_dtype` argument).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_DTYPES = {
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float32": jnp.float32,
    "f32": jnp.float32,
}


def resolve_compute_dtype(compute_dtype=None):
    """Explicit argument > IBL_MODEL_DTYPE env > bfloat16 default."""
    if compute_dtype is not None:
        if isinstance(compute_dtype, str):
            return _DTYPES[compute_dtype]
        return compute_dtype
    return _DTYPES[os.environ.get("IBL_MODEL_DTYPE", "bfloat16")]


def cast_params(tree, dtype):
    """Cast every f32 leaf (weights) to `dtype`; leave ints/bools alone."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)
