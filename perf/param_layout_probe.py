"""Hypothesis (r3): the ~57 ms/fwd of %copy-start/%slice-start weight ops
on SAM-H's critical path (perf/sam_trace.py xplane) are PER-CALL parameter
re-layouts — the device_put'd trees don't match the compiled program's
preferred input layouts, so XLA relays ~1.2 GB of weights every forward.

Test: compile from ShapeDtypeStructs (no upload), query
compiled.input_formats, device_put the host params INTO those formats, and
compare warm-forward time vs the plain device_put path.

Run: python perf/param_layout_probe.py [sam|gdino|ram]
"""

import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    jax.block_until_ready(out)


def timeit(fn, *args, n=6):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    from instance_based_loc_tpu.models.precision import (
        resolve_compute_dtype, cast_params)
    from instance_based_loc_tpu.models.init_utils import host_random_params

    which = sys.argv[1] if len(sys.argv) > 1 else "sam"
    cdt = resolve_compute_dtype()
    t0 = time.perf_counter()

    if which == "sam":
        from instance_based_loc_tpu.models.sam import Sam, SamConfig
        cfg = SamConfig()
        model = Sam(cfg)
        img = jnp.zeros((1024, 1024, 3), cdt)
        boxes = jnp.zeros((8, 4), jnp.float32)
        host = cast_params(host_random_params(model, 0, img, boxes), cdt)
        fn = jax.jit(model.apply)
        args = (img, boxes)
    elif which == "gdino":
        from instance_based_loc_tpu.models.gdino import (GroundingDino,
                                                         GDinoConfig,
                                                         make_text_masks)
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
        host = cast_params(host_random_params(model, 0, *args), cdt)
        fn = jax.jit(model.apply)
    else:
        from instance_based_loc_tpu.models.ram import Ram, RamConfig
        rcfg = RamConfig()
        rcfg = dataclasses.replace(
            rcfg, backbone=dataclasses.replace(rcfg.backbone, dtype=cdt))
        model = Ram(rcfg)
        args = (jnp.zeros((4, 384, 384, 3), cdt),)
        host = cast_params(host_random_params(model, 0, args[0][:1]), cdt)
        fn = jax.jit(model.apply)

    print(f"[{time.perf_counter()-t0:6.1f}s] host params ready", flush=True)

    # A) plain device_put (current serving path)
    dev = jax.device_put(host)
    jax.block_until_ready(dev)
    print(f"[{time.perf_counter()-t0:6.1f}s] plain upload done", flush=True)
    ms_plain = timeit(fn, dev, *args)
    print(f"plain device_put warm forward: {ms_plain:.1f} ms", flush=True)

    # B) compile from shapes, upload INTO the compiled input formats
    shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), host)
    arg_shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), args)
    compiled = fn.lower(shapes, *arg_shapes).compile()
    pfmt = compiled.input_formats[0][0]
    print(f"[{time.perf_counter()-t0:6.1f}s] compiled (from shapes)",
          flush=True)
    dev2 = jax.device_put(host, pfmt)
    jax.block_until_ready(dev2)
    print(f"[{time.perf_counter()-t0:6.1f}s] layout-aware upload done",
          flush=True)
    ms_fmt = timeit(compiled, dev2, *args)
    print(f"layout-aware warm forward: {ms_fmt:.1f} ms", flush=True)
    # sanity: same result
    a = np.asarray(jax.tree_util.tree_leaves(fn(dev, *args))[0],
                   np.float32)
    b = np.asarray(jax.tree_util.tree_leaves(compiled(dev2, *args))[0],
                   np.float32)
    print("parity max diff:", float(np.nanmax(np.abs(a - b))), flush=True)


if __name__ == "__main__":
    main()
