"""Multi-chip scaling: device meshes, sharding rules, and the pjit train/infer
steps (replaces the reference's NCCL DDP scaffolding and manual 2-GPU model
parallelism — SURVEY.md §2.10)."""

from .mesh import make_mesh, data_sharding, replicated  # noqa: F401
from .serving import place_sharded  # noqa: F401
