"""Attribute the CPU-mesh SPMD overhead curve (VERDICT r3 Weak #6) from the
COMPILED HLO rather than wall timings: on the 1-core box, timing the
8-virtual-device step measures scheduler contention (the r4 attempt at a
traced full-geometry axis=8 step aborted in the all-gather rendezvous
because 8 collective participants could not all get the single core within
the 40 s timeout — itself the answer in crash form).

This probe compiles the real pjit train step at data-axis {1, 8} and counts
every collective op in the optimized HLO with its shape/bytes, so "which
collective or resharding grows" has an exact, hardware-independent answer.

    python perf/dator_spmd_hlo_probe.py [small|full]
"""

from __future__ import annotations

import os
import re
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")
_SHAPE = re.compile(r"(\w[\w-]*)\(")  # op name up to '('
_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f16": 2,
          "u8": 1, "s8": 1, "f64": 8, "u16": 2, "s16": 2}


def shape_bytes(shape_str: str) -> int:
    """'f32[2,64,128]' -> bytes. Tuples handled by summing members."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _BYTES.get(dt, 4)
    return total


def collect(hlo: str):
    stats = {}
    for line in hlo.splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT )?[%\w.-]+ = (\([^)]*\)|[^ ]+) ([\w-]+)\(",
                     line)
        if not m:
            continue
        shape, op = m.groups()
        for c in COLLECTIVES:
            if op.startswith(c):
                b = shape_bytes(shape)
                key = c
                stats.setdefault(key, [0, 0])
                stats[key][0] += 1
                stats[key][1] += b
    return stats


def build(n_data: int, small: bool):
    import dataclasses
    from instance_based_loc_tpu.config import load_config
    from instance_based_loc_tpu.models.dator.train import (
        create_train_state, make_pjit_train_step)
    from instance_based_loc_tpu.parallel.mesh import make_mesh

    cfg = load_config(None, ["train.lora_only=false"])
    model_cfg = dataclasses.replace(cfg.model, num_classes=300)
    if small:
        model_cfg = dataclasses.replace(
            model_cfg, backbone=dataclasses.replace(
                model_cfg.backbone, hidden_size=192, num_layers=4,
                num_heads=4))
    mesh = make_mesh(n_data=n_data, n_model=1)
    state = create_train_state(model_cfg, cfg.train, jax.random.PRNGKey(0),
                               cfg.data.height, cfg.data.width)
    step = make_pjit_train_step(mesh, state, cfg.train,
                                (64, cfg.data.height, cfg.data.width))
    rgb = jnp.zeros((64, cfg.data.height, cfg.data.width, 3), jnp.float32)
    labels = jnp.zeros((64,), jnp.int32)
    with mesh:
        lowered = step.lower(state, rgb, rgb, labels, jax.random.PRNGKey(1))
        compiled = lowered.compile()
    n_params = sum(np.prod(x.shape) for x in jax.tree.leaves(state.params))
    return compiled.as_text(), int(n_params)


def main():
    small = (sys.argv[1] if len(sys.argv) > 1 else "small") == "small"
    print(f"mode: {'small 192x4 towers' if small else 'full ViT-B'}")
    for n_data in (1, 8):
        hlo, n_params = build(n_data, small)
        stats = collect(hlo)
        print(f"\n=== data_axis={n_data} (params {n_params / 1e6:.1f}M) ===")
        if not stats:
            print("  no collectives in optimized HLO")
        for op, (count, nbytes) in sorted(stats.items()):
            print(f"  {op}: {count} ops, {nbytes / 2**20:.1f} MiB "
                  f"aggregate operand/result shapes")


if __name__ == "__main__":
    main()
