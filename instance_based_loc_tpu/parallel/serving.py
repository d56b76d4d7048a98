"""Multi-chip batch serving: shard localisation queries over a device mesh.

The reference serves localisation queries strictly one-at-a-time on one GPU
(object_memory.py:852 `localise`; its only concurrency attempt — a host
ThreadPool — is commented out, tum_localisation_trial.py:246-253). The
TPU-native scaling story for the serve() path is SPMD over the mesh's
"data" axis (SURVEY.md §2.10): the chunked serving mode already runs G
queries as ONE vmapped device program (`localise_frames_batched`), so
scaling out is purely a *placement* problem — shard the stacked query
buffers over "data", replicate the object memory (it is read-only at serve
time), and XLA partitions the program with zero cross-device collectives
(every query's pipeline is independent).

Usage:
    memory.serving_mesh = make_mesh(n_data=8, n_model=1)
    memory.localise_many(frames, batch=16)   # 2 queries per device

Each device runs the identical single-query math on its shard; the
partitioned executable compiles at per-shard shapes, so fusion boundaries
(hence rounding) can shift by ~1 ulp, which registration may amplify into
a different similarly-scored pose in the same basin (same caveat as the
scan batch_mode). Parity contract, asserted on the 8-device virtual CPU
mesh in tests/test_parallel_serving.py: identical object assignments and
success-gate-equal poses.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def place_sharded(mesh: Mesh, bufs, byte_bufs, keys, mem_args, scalars,
                  cache: dict | None = None):
    """Place one chunk's dispatch arguments for SPMD serving: query-stacked
    arrays sharded over "data", the packed object memory and registration
    scalars replicated. `cache` (the ObjectMemory._pack_memory dict) keeps
    the replicated memory placement across chunks so the broadcast happens
    once per (memory, mesh), not per chunk."""
    n_data = mesh.shape["data"]
    if bufs.shape[0] % n_data != 0:
        raise ValueError(
            f"serving chunk size {bufs.shape[0]} must be a multiple of the "
            f"mesh's data axis ({n_data}); pass batch={n_data} * k to "
            f"localise_many")
    dsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    q = (jax.device_put(bufs, dsh), jax.device_put(byte_bufs, dsh),
         jax.device_put(keys, dsh))
    if cache is not None and cache.get("_rep_mesh") is mesh:
        mem_r = cache["_rep_mem"]
    else:
        mem_r = tuple(jax.device_put(m, rep) for m in mem_args)
        if cache is not None:
            cache["_rep_mesh"] = mesh
            cache["_rep_mem"] = mem_r
    # scalars can change per call (fpfh factors are localise kwargs) —
    # replicate fresh each chunk; they are 7 f32 scalars, placement is noise
    sc_r = tuple(jax.device_put(s, rep) for s in scalars)
    return q + (mem_r, sc_r)
