"""Fused device programs for the localisation serve path.

Why this exists: the reference's localise (object_memory.py:852-1169) is a
host loop that crosses the CPU<->accelerator boundary dozens of times per
query. On this build's target — a TPU reached through a tunnel where every
synchronisation costs ~32 ms and device->host bandwidth is ~30 MB/s — that
structure caps the pipeline below 1 fps no matter how fast the kernels are.

TPU-native design: the whole query runs as TWO compiled XLA programs with one
tiny fetch each; every point cloud stays resident on device.

  prepare_frame   backproject + radius-outlier + top-N selection + per-
                  exemplar cosine similarities + the SimVolume subset top-k,
                  all in one program. Fetches only scalars/rows (counts,
                  order, sims, top-k entries). The per-detection clouds stay
                  on device and are handed straight to the next program.

  register_select per-assignment union gather + subsample + FPFH + RANSAC +
                  multi-scale colored ICP + full-cloud evaluation + centroid
                  gate + best-assignment argmax + pose composition. Fetches
                  the 7-vector pose and a small per-assignment stats table.

  process_frame   the memory-build analog: backproject + outlier + optional
                  noise + world transform + per-mask compaction, one program,
                  one (Dpad, cap, 6) fetch.

The tiny in-between step (reference SimVolume selection rules:
similarity_volume.py:213-270 — dedup, keep top max(1, L) per assignment
length) is irregular control flow over ~100 entries and runs on host.

Memory-side buffers (packed once per memory version, uploaded once):
see ObjectMemory._pack_memory.
"""

from __future__ import annotations

import itertools
from functools import partial

import os

import jax
import jax.numpy as jnp
import numpy as np

from .backprojection import backproject
from .outliers import radius_outlier_keep_mask
from .transforms import (transform_points, transform_points_kinect,
                         rotmat_to_quat_xyzw)
from .normals import estimate_normals
from .fpfh import compute_fpfh
from .ransac import feature_correspondences, ransac_registration
from .icp import icp, icp_scheduled, evaluate_transform_arrays
from .kabsch import kabsch_transform
from .pointcloud import masked_mean


def make_subsets(top_n: int, k: int = 3) -> np.ndarray:
    """All C(top_n, k) detection-slot subsets (static shape for the volume
    kernel; reference builds them per-query — similarity_volume.py:102-116)."""
    return np.asarray(list(itertools.combinations(range(top_n), k)), np.int32)


# pools at least this large use the linear compaction path instead of
# top_k when IBL_LINEAR_SUBSAMPLE=1. The top_k is the largest
# h*w-scaling non-elementwise term of the prepare stage at 640x480
# (307k-row sort x 7 lanes), but the linear path's full-pool gathers
# measured 2.6x SLOWER on CPU (perf/subsample_probe.py) — which way the
# TPU falls is an on-chip A/B, so the default stays top_k until measured.
_LINEAR_SUBSAMPLE_MIN = (1 << 15 if os.environ.get("IBL_LINEAR_SUBSAMPLE")
                         else 1 << 62)

_PERM_CACHE: dict = {}


def _fixed_perm(n: int) -> np.ndarray:
    """A fixed pseudo-random permutation of range(n), baked into the program
    as a constant (one per pool size)."""
    if n not in _PERM_CACHE:
        _PERM_CACHE[n] = np.random.default_rng(0x5eed).permutation(n) \
            .astype(np.int32)
    return _PERM_CACHE[n]


def _masked_subsample_linear(valid: jax.Array, cap: int, key: jax.Array):
    """O(P) uniform masked subsample for image-scale pools: walk the pool in
    a randomly rotated fixed permutation order and keep the first `cap`
    valid rows (cumsum + searchsorted — no sort). The rotation makes the
    draw key-dependent; the fixed permutation makes it spatially unbiased.
    Exactly reproduces _masked_subsample's contract: a uniform random
    cap-subset when count > cap, all valid rows when count <= cap, valid
    rows first in the output."""
    n = valid.shape[0]
    rows = jnp.roll(jnp.asarray(_fixed_perm(n)),
                    jax.random.randint(key, (), 0, n))
    pv = valid[rows]
    c = jnp.cumsum(pv.astype(jnp.int32))
    total = c[-1]
    # position of the s-th valid row in permutation order (c is sorted)
    pos = jnp.searchsorted(c, jnp.arange(1, cap + 1, dtype=jnp.int32))
    idx = rows[jnp.clip(pos, 0, n - 1)]
    return idx, jnp.arange(cap) < jnp.minimum(total, cap)


def _masked_subsample(points: jax.Array, valid: jax.Array, cap: int,
                      key: jax.Array):
    """Pick up to `cap` valid rows uniformly at random (all of them when
    count <= cap). Returns (idx (cap,), keep (cap,)) with valid rows first."""
    n = valid.shape[0]
    if n >= _LINEAR_SUBSAMPLE_MIN and cap < n:
        return _masked_subsample_linear(valid, cap, key)
    scores = jnp.where(valid, jax.random.uniform(key, valid.shape), -jnp.inf)
    if cap >= n:   # pool smaller than the budget: take everything, pad
        top, idx = jax.lax.top_k(scores, n)
        pad = cap - n
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
        top = jnp.concatenate([top, jnp.full((pad,), -jnp.inf, top.dtype)])
        return idx, jnp.isfinite(top)
    top, idx = jax.lax.top_k(scores, cap)
    return idx, jnp.isfinite(top)


def _masked_median(values: jax.Array, valid: jax.Array) -> jax.Array:
    """np.median over the valid entries (averages the two middles for even
    counts); +inf when nothing is valid."""
    n = values.shape[0]
    v = jnp.where(valid, values, jnp.inf)
    v = jnp.sort(v)
    cnt = jnp.sum(valid.astype(jnp.int32))
    lo = jnp.clip((cnt - 1) // 2, 0, n - 1)
    hi = jnp.clip(cnt // 2, 0, n - 1)
    med = 0.5 * (v[lo] + v[hi])
    return jnp.where(cnt > 0, med, jnp.inf)


# --------------------------------------------------------------------------- #
# program 1: frame preparation
# --------------------------------------------------------------------------- #
def _prepare_body(depth, rgb, masks, det_embs, det_valid,
                  mem_ex, mem_ex_valid, mem_valid, subsets,
                  fx, fy, radius, key, *,
                  top_n: int, det_cap: int, budget: int,
                  outlier_passes: int, nb_points: int,
                  min_det_points: int = 16):
    """One fused program for the query-side of localise (reference
    object_memory.py:888-984).

    Args:
      depth (H, W) f32 (already depth-factor scaled); rgb (H, W, 3) uint/f32.
      masks (Dpad, H, W) bool with Dpad >= top_n.
      det_embs (Dpad, E) embeddings (any scale; normalised here).
      det_valid (Dpad,) real-detection mask.
      mem_ex (Mpad, Epad, E) unit-norm exemplar embeddings; mem_ex_valid
        (Mpad, Epad); mem_valid (Mpad,).
      subsets (S, k) int32 detection-slot subsets from make_subsets(top_n).
      outlier_passes: 0 = keep reference's no-cleanup localise option,
        1 = backprojection cleanup, 2 = + the second pre-registration cleanup
        (reference object_memory.py:992-998).

    Returns (fetch, kept):
      fetch: order (top_n,), counts (top_n,), active (top_n,), sims
        (top_n, Mpad), vol_vals (S, budget), vol_idx (S, budget) — all tiny.
      kept (stays on device, feed to register_select): sel_pts
        (top_n, det_cap, 3) CAMERA-frame, sel_cols, sel_msk, sel_cent.
    """
    d_pad = masks.shape[0]
    m_pad = mem_valid.shape[0]
    k = subsets.shape[1]

    points, valid = backproject(jnp.asarray(depth, jnp.float32), fx, fy)
    colors = (jnp.asarray(rgb, jnp.float32) / 255.0).reshape(-1, 3)
    pm = masks.reshape(d_pad, -1) & valid[None, :] & det_valid[:, None]

    for _ in range(outlier_passes):
        keep = jax.vmap(lambda m: radius_outlier_keep_mask(
            points, m, radius=radius, nb_points=nb_points))(pm)
        pm = pm & keep

    counts = jnp.sum(pm, axis=1)

    # top-N largest clouds (object_memory.py:900-908)
    ocounts, order = jax.lax.top_k(counts, top_n)
    omask = pm[order]                                     # (top_n, P)

    # active slots: >= min points, and never more detections than memory
    # objects (object_memory.py:473-477; counts are sorted desc so both
    # filters keep a prefix)
    m_count = jnp.sum(mem_valid.astype(jnp.int32))
    active = ((ocounts >= min_det_points)
              & (jnp.arange(top_n) < m_count))

    # per-detection subsample, camera frame (clouds stay on device)
    keys = jax.random.split(key, top_n)
    sel_idx, sel_keep = jax.vmap(
        lambda m, kk: _masked_subsample(points, m, det_cap, kk))(omask, keys)
    sel_pts = points[sel_idx]                             # (top_n, cap, 3)
    sel_cols = colors[sel_idx]
    sel_msk = sel_keep & active[:, None]
    sel_cent = jax.vmap(lambda m: masked_mean(points, m))(omask)

    # per-exemplar max cosine (object_memory.py:913-936)
    q = det_embs[order]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    ex_sims = jnp.einsum("ne,mke->nmk", q, mem_ex,
                         precision=jax.lax.Precision.HIGHEST)
    ex_sims = jnp.where(mem_ex_valid[None], ex_sims, -jnp.inf)
    sims = jnp.max(ex_sims, axis=-1)                      # (top_n, Mpad)
    sims = jnp.where(mem_valid[None, :] & active[:, None], sims, 0.0)

    # SimVolume subset top-k (one kernel for all C(top_n, k) subsets;
    # reference similarity_volume.py:102-164)
    aug = jnp.concatenate([sims, jnp.ones((top_n, 1), sims.dtype)], axis=1)
    m1 = m_pad + 1

    def one_subset(subset):
        rows = aug[subset]                                # (k, M+1)
        vol = rows[0]
        for i in range(1, k):
            vol = vol[..., None] * rows[i]
        shape = (m1,) * k
        coords = [jax.lax.broadcasted_iota(jnp.int32, shape, d)
                  for d in range(k)]
        bad = jnp.zeros(shape, bool)
        for a in range(k):
            for b in range(a + 1, k):
                bad |= (coords[a] == coords[b]) & (coords[a] != m1 - 1)
        for a in range(k):
            bad |= ~mem_valid[jnp.clip(coords[a], 0, m_pad - 1)] \
                & (coords[a] != m1 - 1)
            # inactive detection slots may only be "unassigned"
            bad |= (~active[subset[a]]) & (coords[a] != m1 - 1)
        all_un = jnp.ones(shape, bool)
        for a in range(k):
            all_un &= coords[a] == m1 - 1
        bad |= all_un
        vol = jnp.where(bad, -jnp.inf, vol)
        return jax.lax.top_k(vol.reshape(-1), budget)

    # small memories: all C(top_n, k) subset volumes fit comfortably at
    # once — vmap them (lax.map runs 35 SEQUENTIAL top_k's, ~1 ms of the
    # fused query). Big memories keep the sequential map so peak memory
    # stays one (m_pad+1)^k volume (128-object memory: 2.1M entries each).
    if subsets.shape[0] * m1 ** k <= 1 << 20:
        vol_vals, vol_idx = jax.vmap(one_subset)(subsets)
    else:
        vol_vals, vol_idx = jax.lax.map(one_subset, subsets)

    fetch = dict(order=order, counts=ocounts, active=active, sims=sims,
                 vol_vals=vol_vals, vol_idx=vol_idx)
    kept = dict(sel_pts=sel_pts, sel_cols=sel_cols, sel_msk=sel_msk,
                sel_cent=sel_cent, active=active)
    return fetch, kept


prepare_frame = partial(jax.jit, static_argnames=(
    "top_n", "det_cap", "budget", "outlier_passes", "nb_points",
    "min_det_points"))(_prepare_body)


# --------------------------------------------------------------------------- #
# in-graph assignment selection (host rules as fixed-shape device ops)
# --------------------------------------------------------------------------- #
def _select_body(subsets, vol_vals, vol_idx, m_pad: int, a_pad: int):
    """The reference's selection rules (similarity_volume.py:213-270) as one
    static-shape device computation: decode the popped entries, dedup
    identical assignments across subvolumes (lexicographic sort on canonical
    pair codes + first-occurrence mask), then keep the top max(1, L) by score
    per assignment length L. Because the volume dimension is k, lengths are
    1..k, so at most sum(max(1, L)) assignments come out — padded to a_pad.

    Returns (assn_det (a_pad, k), assn_mem (a_pad, k), pair_valid
    (a_pad, k), assn_valid (a_pad,)).
    """
    s, budget = vol_vals.shape
    k = subsets.shape[1]
    m1 = m_pad + 1
    n = s * budget

    vals = vol_vals.reshape(n)
    rem = vol_idx.reshape(n)
    coords = []
    for _ in range(k):
        coords.append(rem % m1)
        rem = rem // m1
    coords = jnp.stack(coords[::-1], axis=-1).astype(jnp.int32)   # (N, k)
    dets = jnp.broadcast_to(subsets[:, None, :], (s, budget, k)).reshape(n, k)
    pairs = coords != (m1 - 1)
    lengths = jnp.sum(pairs, axis=-1)
    valid = jnp.isfinite(vals) & (lengths > 0)

    # canonical pair codes (det-sorted because subsets are sorted tuples);
    # sort lexicographically, value-descending within a group so the first
    # occurrence of each assignment is its best-scoring (finite) copy
    pair_code = jnp.where(pairs, dets * m1 + coords + 1, 0)
    idx0 = jnp.arange(n, dtype=jnp.int32)
    sort_ops = tuple(pair_code[:, j] for j in range(k)) + (-vals, idx0)
    *skeys, _, sidx = jax.lax.sort(sort_ops, num_keys=k + 1)
    skeys = jnp.stack(skeys, axis=-1)                             # (N, k)
    first = jnp.any(skeys != jnp.roll(skeys, 1, axis=0), axis=-1)
    first = first.at[0].set(True)

    vals_s = vals[sidx]
    keep = first & valid[sidx]
    lengths_s = lengths[sidx]

    rows, row_ok = [], []
    for length in range(1, k + 1):
        cap = max(1, length)
        sc = jnp.where(keep & (lengths_s == length), vals_s, -jnp.inf)
        tv, ti = jax.lax.top_k(sc, cap)
        rows.append(sidx[ti])
        row_ok.append(jnp.isfinite(tv))
    rows = jnp.concatenate(rows)                                  # (A_real,)
    row_ok = jnp.concatenate(row_ok)
    a_real = rows.shape[0]
    assert a_pad >= a_real

    pad = a_pad - a_real
    rows = jnp.pad(rows, (0, pad))
    row_ok = jnp.pad(row_ok, (0, pad))
    assn_det = dets[rows]
    assn_mem = jnp.minimum(coords[rows], m_pad - 1)   # clamp "unassigned"
    pair_valid = pairs[rows] & row_ok[:, None]
    return assn_det, assn_mem, pair_valid, row_ok


def select_assignments(subsets: np.ndarray, vol_vals: np.ndarray,
                       vol_idx: np.ndarray, m_pad: int,
                       num_per_length: int = 4) -> list[list[list[int]]]:
    """Host-side selection rules over the fetched top-k entries, matching the
    reference's `get_top_indices_from_subvolumes`
    (similarity_volume.py:213-270): decode coordinates, drop "unassigned"
    pairs, dedup, keep the top max(1, L) per assignment length L.
    Detection indices are in ordered-slot space (0 = largest cloud)."""
    k = subsets.shape[1]
    m1 = m_pad + 1
    unassigned = m_pad
    s, budget = vol_vals.shape
    n = s * budget

    # vectorised decode of every popped entry
    coords = np.stack(np.unravel_index(vol_idx.reshape(-1), (m1,) * k),
                      axis=-1).reshape(n, k)                     # memory ids
    dets = np.broadcast_to(subsets[:, None, :],
                           (s, budget, k)).reshape(n, k)         # det slots
    vals = vol_vals.reshape(n)
    pairs = coords != unassigned                                 # real pairs
    lengths = pairs.sum(1)
    ok = np.isfinite(vals) & (lengths > 0)

    # canonical integer key per assignment (pairs are already det-sorted
    # because subsets are sorted tuples); duplicates across subsets carry
    # identical scores, so unique-by-key loses nothing
    pair_code = np.where(pairs, dets.astype(np.int64) * m1 + coords + 1, 0)
    base = np.int64(subsets.max() + 1) * m1 + 1
    key = np.zeros(n, np.int64)
    for j in range(k):
        key = key * base + pair_code[:, j]

    idx = np.nonzero(ok)[0]
    if len(idx) == 0:
        return []
    _, first = np.unique(key[idx], return_index=True)
    idx = idx[first]

    # keep the top max(1, L) by score per assignment length L
    selected: list[int] = []
    for length in range(1, int(lengths[idx].max()) + 1):
        of_len = idx[lengths[idx] == length]
        if len(of_len) == 0:
            continue
        top = of_len[np.argsort(vals[of_len])[::-1][: max(1, length)]]
        selected += list(top)

    return [[[int(d), int(m)] for d, m in
             zip(dets[i][pairs[i]], coords[i][pairs[i]])] for i in selected]


# --------------------------------------------------------------------------- #
# program 2: batched assignment registration + selection
# --------------------------------------------------------------------------- #
def _register_one(sp, sc, sm, tp, tc, tm, init_T, has_init, key, *,
                  fpfh_cap, voxel_size, global_dist_factor,
                  local_dist_factor, num_hyp, icp_coarse_iters,
                  icp_fine_iters, icp_early_exit, fpfh_nn=100,
                  do_ransac=True, check_basin=True):
    """One assignment: FPFH+RANSAC coarse align on a feature subsample, best
    init (RANSAC vs centroid-Kabsch) picked by coarse inlier count, then
    multi-scale colored ICP (reference fpfh_register.py:100-143 + the
    Kabsch-init refinement path). Clouds are mean-centred by the caller.

    Static fast paths (both preserve the ICP stage unchanged):
      do_ransac=False  skip FPFH/normals/RANSAC entirely and seed ICP from
                       the centroid-Kabsch init (multi-pair assignments,
                       where the correspondence-free init already lands in
                       the right basin — PERF.md round-3 lever (c)).
      check_basin=False skip the RANSAC-vs-init coarse evaluation; used when
                       the caller knows has_init is always False (1-pair
                       assignments: a single centroid pair cannot seed
                       Kabsch), where T0 == T_ransac unconditionally."""
    radius_normal = voxel_size * 2.0
    radius_feature = voxel_size * 5.0
    coarse_dist = voxel_size * 4.0
    fine_dist = voxel_size * local_dist_factor

    if not do_ransac:
        T0 = jnp.where(has_init, init_T, jnp.eye(4, dtype=init_T.dtype))
    else:
        # FPFH on a subsample: rows are already in random order (top_k over
        # uniform scores), so a prefix is a uniform subsample
        fsp, fsm = sp[:fpfh_cap], sm[:fpfh_cap]
        ftp, ftm = tp[:fpfh_cap], tm[:fpfh_cap]
        sn = estimate_normals(fsp, fsm, radius_normal, max_nn=30)
        tn = estimate_normals(ftp, ftm, radius_normal, max_nn=30)
        sf = compute_fpfh(fsp, sn, fsm, radius_feature, max_nn=fpfh_nn)
        tf = compute_fpfh(ftp, tn, ftm, radius_feature, max_nn=fpfh_nn)
        ci, cv = feature_correspondences(sf, fsm, tf, ftm, mutual=True)
        T_ransac, _, _ = ransac_registration(
            fsp, fsm, ftp, ci, cv, voxel_size * global_dist_factor, key,
            num_hypotheses=num_hyp)

        if check_basin:
            # pick the better basin before ICP
            _, fit_r = evaluate_transform_arrays(sp, sm, tp, tm, T_ransac,
                                                 coarse_dist)
            _, fit_i = evaluate_transform_arrays(sp, sm, tp, tm, init_T,
                                                 coarse_dist)
            fit_i = jnp.where(has_init, fit_i, -1.0)
            T0 = jnp.where(fit_i > fit_r, init_T, T_ransac)
        else:
            T0 = T_ransac

    if icp_early_exit:
        T, _, _ = icp(sp, sm, tp, tm, coarse_dist, init_transform=T0,
                      src_colors=sc, tgt_colors=tc,
                      max_iterations=icp_coarse_iters, use_colors=True,
                      early_exit=True)
        T, fitness, rmse = icp(sp, sm, tp, tm, fine_dist, init_transform=T,
                               src_colors=sc, tgt_colors=tc,
                               max_iterations=icp_fine_iters,
                               use_colors=True, early_exit=True)
    else:
        # coarse->fine as ONE scan (identical iteration sequence, one
        # sequential loop instead of two — PERF.md)
        schedule = jnp.concatenate([
            jnp.full((icp_coarse_iters,), coarse_dist, jnp.float32),
            jnp.full((icp_fine_iters,), fine_dist, jnp.float32)])
        T, fitness, rmse = icp_scheduled(sp, sm, tp, tm, schedule,
                                         init_transform=T0, src_colors=sc,
                                         tgt_colors=tc, use_colors=True)
    return T, rmse, fitness


def _register_select_body(sel_pts, sel_cols, sel_msk, sel_cent, active,
                    mem_pts, mem_cols, mem_msk, mem_cent,
                    eval_mem_pts, eval_mem_msk,
                    assn_det, assn_mem, pair_valid, assn_valid,
                    top1_mem,
                    voxel_size, global_dist_factor, local_dist_factor,
                    centroid_gate, key, *,
                    reg_cap: int, fpfh_cap: int, eval_cap: int,
                    num_hyp: int, icp_coarse_iters: int,
                    icp_fine_iters: int, icp_early_exit: bool = False,
                    reg_seeds: int = 1, fpfh_nn: int = 100,
                    slot_lengths: tuple | None = None,
                    ransac_pairs_max: int = 3):
    """ALL assignment registrations + evaluation + selection + pose
    composition in one program (reference object_memory.py:1020-1131).

    Args:
      sel_* / active: the `kept` outputs of prepare_frame (device handles).
      mem_*: resident memory pack — mem_pts (Mpad, mcap, 3), mem_cols,
        mem_msk, mem_cent (Mpad, 3).
      eval_mem_*: resident full-memory evaluation cloud (eval_cap rows).
      assn_det / assn_mem (A, Kmax) int32 + pair_valid (A, Kmax) bool +
        assn_valid (A,): the host-selected assignments (padded).
      top1_mem (top_n,) int32: each detection's top-1 memory object (for the
        centroid consistency gate).
      slot_lengths: static per-slot pair counts (0 = padding slot). When
        given together with ransac_pairs_max < max(slot_lengths), the
        assignment vmap is STATICALLY partitioned: slots with
        1 <= L <= ransac_pairs_max run the full FPFH+RANSAC coarse stage,
        all other slots seed ICP from the centroid-Kabsch init alone (the
        init competes with RANSAC per-basin anyway, and with >= 2 centroid
        pairs it already lands the right basin — PERF.md lever (c); RANSAC
        mainly rescues 1-pair assignments, which keep it). The fused
        localise_frame path knows the layout statically
        ((1, 2, 2, 3, 3, 3, 0...) from _select_body); host-driven
        register_select callers leave it None => every slot runs RANSAC
        (reference-grade behavior).

    Returns (pose7, best_idx, stats) where stats is a dict of (A,) arrays —
    one small fetch for everything.
    """
    top_n, det_cap = sel_pts.shape[0], sel_pts.shape[1]
    a_pad, k_max = assn_det.shape

    # full detected evaluation cloud from the per-detection subsamples
    flat_pts = sel_pts.reshape(-1, 3)
    flat_cols = sel_cols.reshape(-1, 3)
    flat_msk = sel_msk.reshape(-1)
    kev, kroot = jax.random.split(key)
    ev_idx, ev_keep = _masked_subsample(flat_pts, flat_msk, eval_cap, kev)
    eval_det_pts, eval_det_msk = flat_pts[ev_idx], ev_keep

    def build_side(pts_bank, cols_bank, msk_bank, idx, pvalid, kk):
        """Union of the assignment's chosen objects, mean-centred and
        subsampled to reg_cap. Returns (pts, cols, msk, mean)."""
        up = pts_bank[idx].reshape(-1, 3)            # (Kmax*cap, 3)
        uc = cols_bank[idx].reshape(-1, 3)
        um = (msk_bank[idx] & pvalid[:, None]).reshape(-1)
        mean = masked_mean(up, um)
        sidx, skeep = _masked_subsample(up, um, reg_cap, kk)
        return up[sidx] - mean, uc[sidx], skeep, mean

    # seed-redundant registration: each assignment is registered
    # reg_seeds times with independent subsample/RANSAC keys and the
    # best copy wins the global argmax. The extra copies are more vmap
    # lanes — the sequential ICP iterations dominate wall time and are
    # lane-parallel, so robustness against unlucky seeds is nearly free.
    if reg_seeds > 1:
        assn_det = jnp.tile(assn_det, (reg_seeds, 1))
        assn_mem = jnp.tile(assn_mem, (reg_seeds, 1))
        pair_valid = jnp.tile(pair_valid, (reg_seeds, 1))
        assn_valid = jnp.tile(assn_valid, (reg_seeds,))
    a_rows = assn_det.shape[0]
    keys = jax.random.split(kroot, a_rows * 2).reshape(a_rows, 2, 2)

    def one_assignment(det_idx, mem_idx, pvalid, kk, *,
                       do_ransac=True, check_basin=True):
        sp, sc, sm, dmean = build_side(sel_pts, sel_cols, sel_msk,
                                       det_idx, pvalid, kk[0])
        tp, tc, tm, mmean = build_side(mem_pts, mem_cols, mem_msk,
                                       mem_idx, pvalid, kk[1])
        # centroid-Kabsch init (correspondence-free coarse alignment)
        dc = sel_cent[det_idx] - dmean
        mc = mem_cent[mem_idx] - mmean
        w = pvalid.astype(jnp.float32)
        init_T = kabsch_transform(dc, mc, weights=w)
        has_init = jnp.sum(w) >= 2

        T, rmse, fitness = _register_one(
            sp, sc, sm, tp, tc, tm, init_T, has_init, kk[0],
            fpfh_cap=fpfh_cap, voxel_size=voxel_size,
            global_dist_factor=global_dist_factor,
            local_dist_factor=local_dist_factor, num_hyp=num_hyp,
            icp_coarse_iters=icp_coarse_iters,
            icp_fine_iters=icp_fine_iters,
            icp_early_exit=icp_early_exit, fpfh_nn=fpfh_nn,
            do_ransac=do_ransac, check_basin=check_basin)

        # compose the global transform and evaluate on the FULL clouds
        # (object_memory.py:1096-1106)
        R, tx = T[:3, :3], T[:3, 3]
        gt = tx + mmean - R @ dmean
        gT = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(gt)
        full_rmse, full_fitness = evaluate_transform_arrays(
            eval_det_pts, eval_det_msk, eval_mem_pts, eval_mem_msk, gT, 0.02)

        # centroid consistency gate: the pose must map every active
        # detection's centroid near its top-1 embedding match (median over
        # active detections; TPU-build extra, documented in ObjectMemory)
        moved = (sel_cent - dmean) @ R.T + tx
        errs = jnp.linalg.norm(
            moved - (mem_cent[top1_mem] - mmean), axis=-1)
        med = _masked_median(errs, active)
        gated = med > centroid_gate
        # The gate is a TPU-build extra (the reference ranks purely by full
        # fitness, object_memory.py:1111-1119): DEMOTE gated assignments
        # below every ungated one instead of flattening them all to -1 —
        # when all candidates are gated (weak embeddings -> unreliable
        # top-1 matches), geometric fitness still decides.
        score = jnp.where(gated, full_fitness - 2.0, full_fitness)
        fitness = jnp.where(gated, -1.0, fitness)
        return (T, gT, rmse, fitness, full_rmse, full_fitness, score,
                dmean, mmean)

    lens = tuple(slot_lengths) * reg_seeds if slot_lengths else None
    if lens is not None and ransac_pairs_max < max(lens):
        assert len(lens) == a_rows, (len(lens), a_rows)
        # static partition: full-path lanes vs Kabsch-init-only lanes
        # (padding slots L == 0 go to the cheap group; their scores are
        # masked to -inf by assn_valid below either way)
        idx_r = tuple(i for i, L in enumerate(lens)
                      if 1 <= L <= ransac_pairs_max)
        idx_k = tuple(i for i, L in enumerate(lens)
                      if not (1 <= L <= ransac_pairs_max))
        assert idx_r, "no RANSAC-eligible slot (ransac_pairs_max < 1?)"
        # a single centroid pair cannot seed Kabsch => basin check is dead
        # code when every RANSAC lane is a 1-pair slot
        basin = any(lens[i] >= 2 for i in idx_r)
        gr = jnp.asarray(idx_r, jnp.int32)
        gk = jnp.asarray(idx_k, jnp.int32)
        out_r = jax.vmap(partial(one_assignment, do_ransac=True,
                                 check_basin=basin))(
            assn_det[gr], assn_mem[gr], pair_valid[gr], keys[gr])
        out_k = jax.vmap(partial(one_assignment, do_ransac=False,
                                 check_basin=False))(
            assn_det[gk], assn_mem[gk], pair_valid[gk], keys[gk])
        inv = np.argsort(np.asarray(idx_r + idx_k))
        (T, gT, rmse, fitness, full_rmse, full_fitness, scores, dmeans,
         mmeans) = (jnp.concatenate([r, kx])[inv]
                    for r, kx in zip(out_r, out_k))
    else:
        (T, gT, rmse, fitness, full_rmse, full_fitness, scores, dmeans,
         mmeans) = jax.vmap(one_assignment)(assn_det, assn_mem,
                                            pair_valid, keys)

    score = jnp.where(assn_valid, scores, -jnp.inf)
    if reg_seeds > 1:
        # keep only each logical assignment's best-scoring seed copy, so
        # every fetched array stays (a_pad, ...) and the host side is
        # oblivious to the redundancy
        sel = jnp.argmax(score.reshape(reg_seeds, a_pad), axis=0)
        idx = sel * a_pad + jnp.arange(a_pad)
        (T, gT, rmse, fitness, full_rmse, full_fitness, score, dmeans,
         mmeans) = (x[idx] for x in
                    (T, gT, rmse, fitness, full_rmse, full_fitness, score,
                     dmeans, mmeans))
    best = jnp.argmax(score)

    # pose composition from the best assignment's means
    # (the reference composes from loop-leaked means — bug fixed, see
    # memory/object_memory.py docstring)
    Rb, tb = T[best][:3, :3], T[best][:3, 3]
    t_avg = tb + mmeans[best] - Rb @ dmeans[best]
    q_avg = rotmat_to_quat_xyzw(Rb)
    pose7 = jnp.concatenate([t_avg, q_avg])

    stats = dict(rmse=rmse, fitness=fitness, full_rmse=full_rmse,
                 full_fitness=full_fitness, transform=gT,
                 eval_det_pts=eval_det_pts, eval_det_msk=eval_det_msk)
    return pose7, best, stats


register_select = partial(jax.jit, static_argnames=(
    "reg_cap", "fpfh_cap", "eval_cap", "num_hyp", "icp_coarse_iters",
    "icp_fine_iters", "icp_early_exit", "reg_seeds",
    "fpfh_nn", "slot_lengths", "ransac_pairs_max"))(_register_select_body)


# --------------------------------------------------------------------------- #
# the fully fused query: ONE program, ONE fetch per localise call
# --------------------------------------------------------------------------- #
@partial(jax.jit, static_argnames=("top_n", "budget", "outlier_passes",
                                   "nb_points", "min_det_points", "a_pad",
                                   "reg_cap", "fpfh_cap", "eval_cap",
                                   "num_hyp", "icp_coarse_iters",
                                   "icp_fine_iters", "icp_early_exit",
                                   "reg_seeds", "fpfh_nn",
                                   "ransac_pairs_max"))
def localise_frame(depth, rgb, masks, det_embs, det_valid,
                   mem_pts, mem_cols, mem_msk, mem_cent,
                   mem_ex, mem_ex_valid, mem_valid,
                   eval_mem_pts, eval_mem_msk, subsets,
                   fx, fy, radius,
                   voxel_size, global_dist_factor, local_dist_factor,
                   centroid_gate, key, *,
                   top_n: int, budget: int, outlier_passes: int,
                   nb_points: int, min_det_points: int, a_pad: int,
                   reg_cap: int, fpfh_cap: int, eval_cap: int,
                   num_hyp: int, icp_coarse_iters: int,
                   icp_fine_iters: int, icp_early_exit: bool = False,
                   reg_seeds: int = 1, fpfh_nn: int = 100,
                   ransac_pairs_max: int = 3):
    """The whole localise query (reference object_memory.py:852-1169) as one
    XLA program: preparation + assignment selection + registration +
    evaluation + pose composition. One upload, one dispatch, one small fetch
    — the two-sync split (prepare_frame / register_select) exists for tests
    and debugging; this is the serving path."""
    kprep, kreg = jax.random.split(key)
    fetch, kept = _prepare_body(
        depth, rgb, masks, det_embs, det_valid,
        mem_ex, mem_ex_valid, mem_valid, subsets,
        fx, fy, radius, kprep,
        top_n=top_n, det_cap=reg_cap, budget=budget,
        outlier_passes=outlier_passes, nb_points=nb_points,
        min_det_points=min_det_points)

    m_pad = mem_valid.shape[0]
    assn_det, assn_mem, pair_valid, assn_valid = _select_body(
        subsets, fetch["vol_vals"], fetch["vol_idx"], m_pad, a_pad)

    top1 = jnp.argmax(fetch["sims"], axis=1).astype(jnp.int32)
    # _select_body's slot layout is static: max(1, L) slots per assignment
    # length L in ascending order, zero-padded to a_pad
    k = subsets.shape[1]
    slot_lengths = tuple(L for L in range(1, k + 1)
                         for _ in range(max(1, L)))
    assert a_pad >= len(slot_lengths), (a_pad, slot_lengths)
    slot_lengths += (0,) * (a_pad - len(slot_lengths))
    pose7, best, stats = _register_select_body(
        kept["sel_pts"], kept["sel_cols"], kept["sel_msk"],
        kept["sel_cent"], kept["active"],
        mem_pts, mem_cols, mem_msk, mem_cent,
        eval_mem_pts, eval_mem_msk,
        assn_det, assn_mem, pair_valid, assn_valid, top1,
        voxel_size, global_dist_factor, local_dist_factor,
        centroid_gate, kreg,
        reg_cap=reg_cap, fpfh_cap=fpfh_cap, eval_cap=eval_cap,
        num_hyp=num_hyp, icp_coarse_iters=icp_coarse_iters,
        icp_fine_iters=icp_fine_iters, icp_early_exit=icp_early_exit,
        reg_seeds=reg_seeds, fpfh_nn=fpfh_nn,
        slot_lengths=slot_lengths, ransac_pairs_max=ransac_pairs_max)

    out = dict(pose7=pose7, best=best,
               assn_det=assn_det, assn_mem=assn_mem,
               pair_valid=pair_valid, assn_valid=assn_valid,
               order=fetch["order"], counts=fetch["counts"],
               active=fetch["active"], sims=fetch["sims"], **stats)
    return out


_PACKED_STATICS = ("top_n", "budget", "outlier_passes", "nb_points",
                   "min_det_points", "a_pad", "reg_cap", "fpfh_cap",
                   "eval_cap", "num_hyp", "icp_coarse_iters",
                   "icp_fine_iters", "icp_early_exit", "reg_seeds",
                   "fpfh_nn", "ransac_pairs_max",
                   "h", "w", "d_pad", "e_dim", "keep_debug")


def _packed_body(query_f32, query_u8, mem_args, scalars, key,
                 h, w, d_pad, e_dim, keep_debug, statics):
    pos = 0

    def take(n):
        nonlocal pos
        out = query_f32[pos:pos + n]
        pos += n
        return out

    inv_scale = take(1)[0]
    det_embs = take(d_pad * e_dim).reshape(d_pad, e_dim)
    det_valid = take(d_pad) > 0.5

    # u8 section: rgb bytes + little-endian u16 depth (per-frame scale,
    # quantization error <= max_depth/65535/2 ~ 0.1 mm, far below the 2 cm
    # registration voxel) + MSB-first bit-packed masks (np.packbits) — the
    # query upload shrinks ~7x vs all-f32; over the ~30 MB/s tunnel the
    # upload was the single largest per-query cost (~56 ms as f32)
    rgb = query_u8[:h * w * 3].reshape(h, w, 3).astype(jnp.float32)
    doff = h * w * 3
    dbytes = query_u8[doff:doff + 2 * h * w].reshape(h * w, 2)
    d16 = (dbytes[:, 0].astype(jnp.uint16)
           | (dbytes[:, 1].astype(jnp.uint16) << 8))
    depth = d16.astype(jnp.float32).reshape(h, w) * inv_scale
    mask_bytes = query_u8[doff + 2 * h * w:]
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)       # MSB first
    bits = (mask_bytes[:, None] >> shifts[None, :]) & 1   # (B, 8)
    masks = bits.reshape(-1)[:d_pad * h * w].reshape(d_pad, h, w) > 0

    out = localise_frame(depth, rgb, masks, det_embs, det_valid,
                         *mem_args, *scalars, key, **statics)
    if not keep_debug:
        out = {k: v for k, v in out.items()
               if k not in ("eval_det_pts", "eval_det_msk")}
    leaves = jax.tree_util.tree_leaves(out)
    return jnp.concatenate([jnp.ravel(x).astype(jnp.float32)
                            for x in leaves])


@partial(jax.jit, static_argnames=_PACKED_STATICS)
def localise_frame_packed(query_f32, query_u8,
                          mem_pts, mem_cols, mem_msk, mem_cent,
                          mem_ex, mem_ex_valid, mem_valid,
                          eval_mem_pts, eval_mem_msk, subsets,
                          fx, fy, radius,
                          voxel_size, global_dist_factor, local_dist_factor,
                          centroid_gate, key, *,
                          h: int, w: int, d_pad: int, e_dim: int,
                          keep_debug: bool, **statics):
    """Tunnel-optimized serving entry: the query's heterogeneous inputs
    (depth, rgb, masks, embeddings, validity) arrive as ONE f32 buffer and
    every output leaves as ONE f32 buffer — a single upload, a single
    program launch, a single fetch per query. Over the axon tunnel each
    extra host<->device touch costs ~30 ms; the unpack/pack adds ~free
    reshapes on-device. Leaf order is jax tree order (dicts sorted by key),
    shared with `localise_packed_spec`."""
    return _packed_body(
        query_f32, query_u8,
        (mem_pts, mem_cols, mem_msk, mem_cent, mem_ex, mem_ex_valid,
         mem_valid, eval_mem_pts, eval_mem_msk, subsets),
        (fx, fy, radius, voxel_size, global_dist_factor, local_dist_factor,
         centroid_gate), key, h, w, d_pad, e_dim, keep_debug, statics)


@partial(jax.jit, static_argnames=_PACKED_STATICS)
def localise_frames_batched(query_f32s, query_u8s,
                            mem_pts, mem_cols, mem_msk, mem_cent,
                            mem_ex, mem_ex_valid, mem_valid,
                            eval_mem_pts, eval_mem_msk, subsets,
                            fx, fy, radius,
                            voxel_size, global_dist_factor, local_dist_factor,
                            centroid_gate, keys, *,
                            h: int, w: int, d_pad: int, e_dim: int,
                            keep_debug: bool, **statics):
    """Throughput mode: N queries vmapped into ONE program with one upload
    and one fetch — amortizes the per-launch tunnel overhead that caps
    single-query serving. query_f32s (N, Lf); query_u8s (N, Lb);
    keys (N, 2)."""
    mem_args = (mem_pts, mem_cols, mem_msk, mem_cent, mem_ex, mem_ex_valid,
                mem_valid, eval_mem_pts, eval_mem_msk, subsets)
    scalars = (fx, fy, radius, voxel_size, global_dist_factor,
               local_dist_factor, centroid_gate)
    return jax.vmap(
        lambda qf, qb, kk: _packed_body(qf, qb, mem_args, scalars, kk, h, w,
                                        d_pad, e_dim, keep_debug, statics))(
        query_f32s, query_u8s, keys)


@partial(jax.jit, static_argnames=_PACKED_STATICS)
def localise_frames_scanned(query_f32s, query_u8s,
                            mem_pts, mem_cols, mem_msk, mem_cent,
                            mem_ex, mem_ex_valid, mem_valid,
                            eval_mem_pts, eval_mem_msk, subsets,
                            fx, fy, radius,
                            voxel_size, global_dist_factor, local_dist_factor,
                            centroid_gate, keys, *,
                            h: int, w: int, d_pad: int, e_dim: int,
                            keep_debug: bool, **statics):
    """N queries in ONE program with one upload and one fetch, run
    SEQUENTIALLY on device via `lax.scan` — every iteration keeps the exact
    single-query program shape. Measured EQUAL to the vmapped variant and
    the pipelined path on the tunneled chip (the pipeline is
    compute-bound, PERF.md), and its loop context shifts backprojection by
    ~1 ulp which registration can amplify across similarly-scored
    assignments — so this is an experimental option; `localise_batched`
    defaults to vmap. query_f32s (N, Lf); query_u8s (N, Lb); keys (N, 2)."""
    mem_args = (mem_pts, mem_cols, mem_msk, mem_cent, mem_ex, mem_ex_valid,
                mem_valid, eval_mem_pts, eval_mem_msk, subsets)
    scalars = (fx, fy, radius, voxel_size, global_dist_factor,
               local_dist_factor, centroid_gate)

    def body(carry, xs):
        qf, qb, kk = xs
        return carry, _packed_body(qf, qb, mem_args, scalars, kk, h, w,
                                   d_pad, e_dim, keep_debug, statics)

    _, outs = jax.lax.scan(body, 0, (query_f32s, query_u8s, keys))
    return outs


_SPEC_CACHE: dict = {}


def localise_packed_spec(args, statics: dict, keep_debug: bool):
    """(treedef, [(shape, dtype)]) describing localise_frame_packed's flat
    output for the given inputs — jax.eval_shape'd once per static/shape
    signature and cached, so the host can decode the packed buffer."""
    key = (tuple((tuple(a.shape), str(a.dtype)) for a in args),
           tuple(sorted(statics.items())), keep_debug)
    if key not in _SPEC_CACHE:
        out = jax.eval_shape(lambda *a: localise_frame(*a, **statics), *args)
        if not keep_debug:
            out = {k: v for k, v in out.items()
                   if k not in ("eval_det_pts", "eval_det_msk")}
        leaves, treedef = jax.tree_util.tree_flatten(out)
        _SPEC_CACHE[key] = (treedef, [(l.shape, l.dtype) for l in leaves])
    return _SPEC_CACHE[key]


# --------------------------------------------------------------------------- #
# program 3: memory-build frame processing
# --------------------------------------------------------------------------- #
@partial(jax.jit, static_argnames=("proc_cap", "apply_outlier", "nb_points",
                                   "kinect", "add_noise"))
def process_frame(depth, rgb, masks, pose7, fx, fy, radius, depth_noise,
                  key, *, proc_cap: int, apply_outlier: bool,
                  nb_points: int, kinect: bool, add_noise: bool):
    """Memory-build side (reference object_memory.py:163-228) as one program:
    backproject, per-mask radius outlier removal, optional gaussian point
    noise (the reference's fault injection, :189-219), world transform, and
    per-mask compaction to `proc_cap` rows.

    Returns (pc6 (Dpad, proc_cap, 6) [xyz|rgb], raw_counts (Dpad,),
    sub_counts (Dpad,)) — raw_counts is the post-cleanup point count the
    min_points filter needs; rows [:sub_counts[i]] of pc6[i] are valid.
    """
    d_pad = masks.shape[0]
    points, valid = backproject(jnp.asarray(depth, jnp.float32), fx, fy)
    colors = (jnp.asarray(rgb, jnp.float32) / 255.0).reshape(-1, 3)
    pm = masks.reshape(d_pad, -1) & valid[None, :]

    if apply_outlier:
        keep = jax.vmap(lambda m: radius_outlier_keep_mask(
            points, m, radius=radius, nb_points=nb_points))(pm)
        pm = pm & keep

    if add_noise:
        knoise, key = jax.random.split(key)
        points = points + depth_noise * jax.random.normal(
            knoise, points.shape, points.dtype)

    if kinect:
        world = transform_points_kinect(points, pose7)
    else:
        world = transform_points(points, pose7)

    raw_counts = jnp.sum(pm, axis=1)
    keys = jax.random.split(key, d_pad)
    idx, keep = jax.vmap(
        lambda m, kk: _masked_subsample(world, m, proc_cap, kk))(pm, keys)
    pc6 = jnp.concatenate([world[idx], colors[idx]], axis=-1)
    pc6 = jnp.where(keep[..., None], pc6, 0.0)
    sub_counts = jnp.sum(keep, axis=1)
    return pc6, raw_counts, sub_counts
