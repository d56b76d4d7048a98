"""Profile a single GroundingDINO@800 forward on the tunneled chip and dump
a jax.profiler trace for per-op analysis (perf/analyze_trace.py).

The cascade stage probe (perf/cascade_stages.py) measures gdino@800 at
~417 ms/frame — 10x RAM Swin-L@384 despite a smaller backbone — so the time
must be in the deformable encoder (MSDA gathers) or fusion layers, not the
conv/matmul FLOPs. This script pins down which op.

Run: python perf/gdino_trace.py [outdir=/tmp/trace_gdino]
"""

import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from instance_based_loc_tpu.models.gdino import (GroundingDino, GDinoConfig,
                                                 make_text_masks)
from instance_based_loc_tpu.models.precision import (resolve_compute_dtype,
                                                     cast_params)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_gdino"
    cdt = resolve_compute_dtype()
    rng = jax.random.PRNGKey(0)

    cfg = GDinoConfig(img_size=800)
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, dtype=cdt))
    model = GroundingDino(cfg)
    ids = np.zeros((1, 16), np.int32)
    ids[0, :6] = [101, 4937, 1012, 3899, 1012, 102]
    allowed, position_ids = make_text_masks(ids)
    args = (jnp.zeros((1, 800, 800, 3), cdt), jnp.asarray(ids),
            jnp.asarray(allowed), jnp.asarray(position_ids),
            jnp.asarray(ids != 0))
    from instance_based_loc_tpu.models.init_utils import host_random_params
    params_f32 = host_random_params(model, 0, *args)
    # serving path: host word-embedding lookup, vocab table dropped
    table = np.asarray(params_f32["params"]["text_backbone"]
                       ["word_embeddings"]["embedding"], np.float32)
    params_f32 = {"params": {
        **params_f32["params"],
        "text_backbone": {k: v for k, v in
                          params_f32["params"]["text_backbone"].items()
                          if k != "word_embeddings"}}}
    args = args + (jnp.asarray(table[np.clip(ids, 0, len(table) - 1)]),)
    params = jax.device_put(cast_params(params_f32, cdt))
    jax.block_until_ready(params)
    apply = jax.jit(model.apply)

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[0])

    sync(apply(params, *args))          # compile
    t0 = time.perf_counter()
    sync(apply(params, *args))
    print(f"warm forward: {(time.perf_counter() - t0) * 1000:.1f} ms",
          flush=True)

    with jax.profiler.trace(outdir):
        for _ in range(3):
            sync(apply(params, *args))
    print(f"trace written to {outdir}", flush=True)


if __name__ == "__main__":
    main()
