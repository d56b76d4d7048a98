"""Two-scale decomposition of the fused localise program (CPU): time the
prepare stage against the register/select stage at toy (160x220/5obj) and
reference (640x480/9obj) scale, to rank which stage carries the 10x
device-time blowup the r4 bench saw (VERDICT r4 item 3 / Weak #2). CPU
ratios are not TPU ratios, but h*w-scaling structure is platform-independent:
register/select is capacity-static, prepare scales with pixels.

    JAX_PLATFORMS=cpu python perf/e2e_cpu_decompose.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def build(scale):
    from instance_based_loc_tpu.data.synthetic import (default_scene,
                                                       render_scene,
                                                       ring_poses)
    from instance_based_loc_tpu.memory import (ObjectMemory,
                                               ColorRegionDetector)
    from instance_based_loc_tpu.models.embedders import get_embedder

    if scale == "small":
        focal, h, w, n_obj, min_area = 200.0, 160, 220, 5, 80
    else:
        focal, h, w, n_obj, min_area = 525.0, 480, 640, 9, 500
    scene = default_scene(num_objects=n_obj, seed=3)
    poses = ring_poses(9, radius=4.5, height=1.3, target=(0, 0.4, 0))
    frames = [render_scene(scene, p, h, w, focal) for p in poses]
    detector = ColorRegionDetector(min_area=min_area,
                                   floor_colors=[scene.floor_color])
    memory = ObjectMemory(detector=detector, camera_focal_lenth_x=focal,
                          camera_focal_lenth_y=focal,
                          get_embeddings_func=get_embedder("color"),
                          log_enabled=False)
    for i in range(6):
        rgb, depth, _ = frames[i]
        memory.process_image(rgb, depth, poses[i], consider_floor=True,
                             min_points=200, outlier_removal_config=None)
    memory.downsample_all_objects(voxel_size=0.02)
    memory.recluster_objects_with_dbscan(eps=0.1, min_points_per_cluster=40)
    return memory, frames


def time_packed(memory, frames, n=6):
    """Time the fused single-query program end to end (dispatch+block)."""
    rgb, depth, _ = frames[6]
    # warm (compile)
    h = memory.localise_dispatch(rgb, depth, outlier_removal_config=None)
    np.asarray(h["packed"])
    t0 = time.perf_counter()
    for i in range(n):
        rgb, depth, _ = frames[6 + i % 3]
        h = memory.localise_dispatch(rgb, depth, outlier_removal_config=None)
        np.asarray(h["packed"])
    return (time.perf_counter() - t0) / n * 1000


def time_stages(memory, frames):
    """Split timing: run prepare_frame alone vs the full program, same
    inputs, jitted, blocked — the difference is register/select+packing."""
    from instance_based_loc_tpu.ops.localise_kernels import prepare_frame

    rgb, depth, _ = frames[6]
    hh = memory._localise_host(rgb, depth, outlier_removal_config=None)
    h, w, d_pad, e_dim = hh["dims"]
    st = hh["statics"]
    pack = hh["pack"]

    # rebuild prepare inputs from the packed query buffer the host staged
    qf = np.asarray(hh["qbuf"])
    inv_scale = qf[0]
    det_embs = qf[1:1 + d_pad * e_dim].reshape(d_pad, e_dim)
    det_valid = qf[1 + d_pad * e_dim:1 + d_pad * e_dim + d_pad] > 0.5
    qb = np.asarray(hh["qbytes"])
    rgbf = qb[:h * w * 3].reshape(h, w, 3).astype(np.float32)
    dbytes = qb[h * w * 3:h * w * 3 + 2 * h * w].reshape(h * w, 2)
    depthf = (dbytes[:, 0].astype(np.uint16)
              | (dbytes[:, 1].astype(np.uint16) << 8)) \
        .astype(np.float32).reshape(h, w) * inv_scale
    mask_bytes = qb[h * w * 3 + 2 * h * w:]
    bits = np.unpackbits(mask_bytes)
    masks = bits[:d_pad * h * w].reshape(d_pad, h, w) > 0

    args = (jnp.asarray(depthf), jnp.asarray(rgbf), jnp.asarray(masks),
            jnp.asarray(det_embs), jnp.asarray(det_valid),
            pack["mem_ex"], pack["mem_ex_valid"], pack["mem_valid"],
            pack["subsets"], *hh["scalars"][:3], jax.random.PRNGKey(0))
    kw = dict(top_n=st["top_n"], det_cap=st["reg_cap"], budget=st["budget"],
              outlier_passes=st["outlier_passes"], nb_points=st["nb_points"],
              min_det_points=st["min_det_points"])
    out = prepare_frame(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(6):
        out = prepare_frame(*args, **kw)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 6 * 1000


def main():
    for scale in ("small", "ref"):
        memory, frames = build(scale)
        full = time_packed(memory, frames)
        prep = time_stages(memory, frames)
        print(f"{scale:6s}: full fused query {full:8.1f} ms | "
              f"prepare stage {prep:8.1f} ms | "
              f"register/select+rest {full - prep:8.1f} ms")


if __name__ == "__main__":
    main()
