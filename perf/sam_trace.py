"""Profile a single SAM forward (8 box prompts) on the tunneled chip and
dump a jax.profiler trace for per-op analysis — where does the time go
(encoder windows vs global blocks vs neck vs two-way decoder)?

Run: python perf/sam_trace.py [outdir=/tmp/trace_sam] [variant=b|h]
`h` is the reference deployment scale (sam_vit_h_4b8939) that bench.py's
cascade metric reports (~150 ms/frame wall vs a ~30 ms MXU floor for its
5.6 bf16 TFLOPs).
"""

import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from instance_based_loc_tpu.models.sam import Sam, SamConfig
from instance_based_loc_tpu.models.precision import (resolve_compute_dtype,
                                                     cast_params)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_sam"
    variant = sys.argv[2] if len(sys.argv) > 2 else "b"
    cdt = resolve_compute_dtype()
    rng = jax.random.PRNGKey(0)
    if variant == "h":
        cfg = SamConfig()           # ViT-H defaults
    else:
        cfg = SamConfig(encoder_dim=768, encoder_depth=12, encoder_heads=12,
                        global_blocks=(2, 5, 8, 11))
    sam = Sam(cfg)
    img = jnp.zeros((cfg.img_size, cfg.img_size, 3), cdt)
    boxes = jnp.zeros((8, 4), jnp.float32)
    from instance_based_loc_tpu.models.init_utils import host_random_params
    params = jax.device_put(cast_params(host_random_params(sam, 0, img, boxes), cdt))
    jax.block_until_ready(params)
    apply = jax.jit(sam.apply)

    def sync(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    sync(apply(params, img, boxes))
    t0 = time.perf_counter()
    sync(apply(params, img, boxes))
    print(f"warm forward: {(time.perf_counter() - t0) * 1000:.1f} ms",
          flush=True)
    with jax.profiler.trace(outdir):
        for _ in range(3):
            sync(apply(params, img, boxes))
    print(f"trace written to {outdir}", flush=True)


if __name__ == "__main__":
    main()
