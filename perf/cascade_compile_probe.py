"""Attribute the cascade bench's remote-compile wall time (round 3): the
r02/r03 bench runs lost the cascade metric to a >20 min compile phase over
the axon tunnel. Which part — model.init (itself a remote compiled
program), params upload (~30 MB/s tunnel), or the XLA compile of each
forward program? Timestamps every stage for RAM@384, GDINO@800, SAM-H@1024
at the bench's shapes (chunk=4).

Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/cascade_compile_probe.py
"""

import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

T0 = time.perf_counter()


def mark(msg):
    print(f"[{time.perf_counter() - T0:8.1f}s] {msg}", flush=True)


def tree_mb(t):
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(t)) / 2**20


def main():
    from instance_based_loc_tpu.models.ram import Ram, RamConfig
    from instance_based_loc_tpu.models.gdino import (GroundingDino,
                                                     GDinoConfig,
                                                     make_text_masks)
    from instance_based_loc_tpu.models.sam import Sam, SamConfig
    from instance_based_loc_tpu.models.precision import (
        resolve_compute_dtype, cast_params)
    from instance_based_loc_tpu.models.init_utils import host_random_params

    cdt = resolve_compute_dtype()
    rng = jax.random.PRNGKey(0)
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    mark(f"start (backend={jax.default_backend()}, dtype={np.dtype(cdt).name})")

    # --- RAM ---
    ram_cfg = RamConfig()
    ram_cfg = dataclasses.replace(
        ram_cfg, backbone=dataclasses.replace(ram_cfg.backbone, dtype=cdt))
    ram = Ram(ram_cfg)
    ram_in = jnp.zeros((chunk, 384, 384, 3), cdt)
    p = host_random_params(ram, 0, ram_in[:1])
    mark(f"ram host-params done ({tree_mb(p):.0f} MB)")
    ram_params = jax.device_put(cast_params(p, cdt))
    jax.block_until_ready(ram_params)
    mark("ram params on device")
    ram_apply = jax.jit(lambda p, x: ram.apply(p, x))
    out = ram_apply(ram_params, ram_in)
    np.asarray(out.ravel()[0])
    mark("ram forward compiled+run")

    # --- GDINO ---
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
    p = host_random_params(gdino, 0, *gd_args)
    mark(f"gdino host-params done ({tree_mb(p):.0f} MB)")
    gd_params = jax.device_put(cast_params(p, cdt))
    jax.block_until_ready(gd_params)
    mark("gdino params on device")
    gd_apply = jax.jit(gdino.apply)
    out = gd_apply(gd_params, *gd_args)
    np.asarray(out[0].ravel()[0])
    mark("gdino forward compiled+run")

    # --- SAM-H ---
    sam_cfg = SamConfig()
    sam = Sam(sam_cfg)
    sam_img = jnp.zeros((1024, 1024, 3), cdt)
    sam_boxes = jnp.zeros((8, 4), jnp.float32)
    p = host_random_params(sam, 0, sam_img, sam_boxes)
    mark(f"sam-h host-params done ({tree_mb(p):.0f} MB)")
    sam_params = jax.device_put(cast_params(p, cdt))
    jax.block_until_ready(sam_params)
    mark("sam params on device")
    sam_imgs = jnp.stack([sam_img] * chunk)
    sam_boxes_c = jnp.stack([sam_boxes] * chunk)
    sam_vapply = jax.jit(jax.vmap(sam.apply, in_axes=(None, 0, 0)))
    out = sam_vapply(sam_params, sam_imgs, sam_boxes_c)
    np.asarray(out[0].ravel()[0])
    mark("sam-h vmapped forward compiled+run")

    # --- steady state, bench's serving order ---
    def frame(i):
        t = ram_apply(ram_params, ram_in + i)
        g = [gd_apply(gd_params, gd_args[0] + i + f, *gd_args[1:])
             for f in range(chunk)]
        s = sam_vapply(sam_params, sam_imgs + i, sam_boxes_c)
        return t, g, s

    outs = frame(0)
    jax.block_until_ready(outs)
    mark("steady-state warm")
    n = 6
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        outs = frame(i)
    np.asarray(outs[0].ravel()[0])
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / (n * chunk)
    mark(f"steady state: {dt * 1000:.1f} ms/frame = {1 / dt:.2f} fps "
         f"(chunk={chunk})")


if __name__ == "__main__":
    main()
