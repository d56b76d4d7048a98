"""instance_based_loc_tpu — TPU-native RGB-D object-instance global localisation.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
`instance-based-loc` reference stack (RGB-D detection cascade -> instance
embeddings -> object memory -> assignment search -> point-cloud registration,
plus the trainable DATOR multi-modal ReID model).

Design stance (vs. the reference's object-oriented, one-crop-at-a-time,
Open3D-backed CPU/CUDA pipeline):

* geometry is vmapped/jitted JAX kernels over fixed-capacity padded arrays,
* models are flax modules with batched apply (one compiled call per frame,
  not one per crop),
* multi-chip scaling is a `jax.sharding.Mesh` with pjit/shard_map collectives,
* the host layer (I/O, small-N clustering) is thin numpy/C++.

Reference layer map: see SURVEY.md at the repo root.
"""

import jax as _jax

# Geometry/registration math is metric-bearing: the default bf16 MXU matmul
# precision corrupts distances and rotations at the 1e-2 level. Force full
# f32 matmul precision globally; model code requests bf16 explicitly via
# dtypes, which is unaffected by this setting.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
