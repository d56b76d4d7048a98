"""Core geometry ops: padded point clouds, backprojection, pose transforms,
voxel downsampling, outlier removal, frustum culling, 3D IoU, registration.

All device ops operate on fixed-capacity padded arrays with validity masks so
they trace once under `jax.jit` and tile cleanly onto the TPU MXU/VPU.
"""

from .pointcloud import PointCloud  # noqa: F401
