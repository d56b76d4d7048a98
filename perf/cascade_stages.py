"""Per-stage timing for the neural perception cascade (bench.py
bench_neural_cascade's workload, split): RAM Swin-L@384, GroundingDINO@800,
SAM-B@1024 (8 box prompts), each timed alone with per-call sync, plus SAM
with the Pallas global-attention kernel (ops/pallas/sam_attention.py).

Run on the tunneled chip: python perf/cascade_stages.py
(one TPU job at a time; remote compiles take minutes — be patient.)
"""

import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from instance_based_loc_tpu.models.ram import Ram, RamConfig
from instance_based_loc_tpu.models.gdino import (GroundingDino, GDinoConfig,
                                                 make_text_masks)
from instance_based_loc_tpu.models.sam import Sam, SamConfig
from instance_based_loc_tpu.models.precision import (resolve_compute_dtype,
                                                     cast_params)


def _sync(out):
    # block_until_ready can return without forcing execution over the axon
    # tunnel (verify SKILL.md); a real element fetch is the only true sync
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def bench(name, fn, n=6):
    _sync(fn(0))
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        out = fn(i)
        _sync(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:18s} {dt:8.1f} ms/frame", flush=True)
    return dt


def main():
    cdt = resolve_compute_dtype()
    print(f"compute dtype: {np.dtype(cdt).name}", flush=True)
    rng = jax.random.PRNGKey(0)

    ram_cfg = RamConfig()
    ram_cfg = dataclasses.replace(
        ram_cfg, backbone=dataclasses.replace(ram_cfg.backbone, dtype=cdt))
    ram = Ram(ram_cfg)
    ram_in = jnp.zeros((1, ram_cfg.backbone.img_size,
                        ram_cfg.backbone.img_size, 3), cdt)
    ram_params = cast_params(ram.init(rng, ram_in), cdt)
    ram_apply = jax.jit(lambda p, x: jax.nn.sigmoid(
        ram.apply(p, x).astype(jnp.float32)))
    bench("ram@384", lambda i: ram_apply(ram_params, ram_in + i))
    del ram_params

    gd_cfg = GDinoConfig(img_size=800)
    gd_cfg = dataclasses.replace(
        gd_cfg, backbone=dataclasses.replace(gd_cfg.backbone, dtype=cdt))
    gdino = GroundingDino(gd_cfg)
    ids = np.zeros((1, 16), np.int32)
    ids[0, :6] = [101, 4937, 1012, 3899, 1012, 102]
    allowed, position_ids = make_text_masks(ids)
    gd_args = (jnp.zeros((1, 800, 800, 3), cdt), jnp.asarray(ids),
               jnp.asarray(allowed), jnp.asarray(position_ids),
               jnp.asarray(ids != 0))
    gd_params = cast_params(gdino.init(rng, *gd_args), cdt)
    gd_apply = jax.jit(gdino.apply)
    bench("gdino@800", lambda i: gd_apply(gd_params, gd_args[0] + i,
                                          *gd_args[1:]))
    # frame-batched grounding: does stacking F frames in one program raise
    # MXU utilization (amortizing per-op overhead at batch 1)?
    for f in (2, 4):
        gdb = tuple(jnp.concatenate([a] * f, 0) for a in gd_args)
        dt = bench(f"gdino@800 x{f}",
                   lambda i, gdb=gdb: gd_apply(gd_params, gdb[0] + i,
                                               *gdb[1:]))
        print(f"{'':18s} {dt / f:8.1f} ms/frame amortized", flush=True)
    del gd_params

    n_boxes = 8
    sam_variants = [
        ("sam-b@1024", dict(encoder_dim=768, encoder_depth=12,
                            encoder_heads=12, global_blocks=(2, 5, 8, 11),
                            use_pallas_attention=False)),
        ("sam-b@1024+pallas", dict(encoder_dim=768, encoder_depth=12,
                                   encoder_heads=12,
                                   global_blocks=(2, 5, 8, 11))),
        # the reference's deployment scale (sam_vit_h_4b8939): ViT-H —
        # SamConfig's defaults; this is the size bench.py's cascade
        # metric reports
        ("sam-h@1024", dict()),
    ]
    for tag, overrides in sam_variants:
        sam_cfg = SamConfig(**overrides)
        sam = Sam(sam_cfg)
        sam_img = jnp.zeros((sam_cfg.img_size, sam_cfg.img_size, 3), cdt)
        sam_boxes = jnp.zeros((n_boxes, 4), jnp.float32)
        sam_params = cast_params(sam.init(rng, sam_img, sam_boxes), cdt)
        sam_apply = jax.jit(sam.apply)
        bench(tag, lambda i: sam_apply(sam_params, sam_img + i, sam_boxes))
        if tag == "sam-h@1024":
            # frame-batched segmentation (vmap over frames, same boxes/frame
            # capacity): the serving lever for chunked localise_many
            vapply = jax.jit(jax.vmap(sam.apply, in_axes=(None, 0, 0)))
            for f in (2, 4):
                imgs = jnp.stack([sam_img] * f)
                boxes = jnp.stack([sam_boxes] * f)
                dt = bench(f"{tag} x{f}",
                           lambda i, imgs=imgs, boxes=boxes: vapply(
                               sam_params, imgs + i, boxes))
                print(f"{'':18s} {dt / f:8.1f} ms/frame amortized",
                      flush=True)
        del sam_params


if __name__ == "__main__":
    main()
