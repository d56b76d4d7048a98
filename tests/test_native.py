"""Native C++ geometry library vs the python reference implementations."""

import numpy as np
import pytest

from instance_based_loc_tpu.ops import native
from instance_based_loc_tpu.ops.clustering import dbscan


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _same_partition(a, b):
    if not ((a == -1) == (b == -1)).all():
        return False
    sel = a != -1
    mapping = {}
    for x, y in zip(a[sel], b[sel]):
        if x in mapping and mapping[x] != y:
            return False
        mapping[x] = y
    return len(set(mapping.values())) == len(mapping)


def test_native_dbscan_matches_python(rng):
    pts = np.concatenate([
        rng.normal([0, 0, 0], 0.1, size=(300, 3)),
        rng.normal([3, 0, 0], 0.1, size=(200, 3)),
        rng.uniform(-8, 8, size=(30, 3)),
    ]).astype(np.float32)
    ours = native.dbscan_native(pts, eps=0.3, min_points=5)
    ref = dbscan(pts, eps=0.3, min_points=5, prefer_native=False)
    assert _same_partition(np.asarray(ours), np.asarray(ref))


def test_native_radius_outlier(rng):
    cluster = rng.normal(scale=0.01, size=(80, 3)).astype(np.float32)
    strays = (rng.normal(scale=3.0, size=(5, 3)) + 50).astype(np.float32)
    pts = np.concatenate([cluster, strays])
    keep = native.radius_outlier_native(pts, radius=0.05, nb_points=12)
    assert keep[:80].all()
    assert not keep[80:].any()


def test_native_voxel_downsample(rng):
    pts = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
    out_pts, out_cols = native.voxel_downsample_native(pts, cols, 0.25)
    # compare against the dict-binning reference
    vox = np.floor(pts / 0.25).astype(np.int64)
    ref = {}
    for p, c, v in zip(pts, cols, vox):
        ref.setdefault(tuple(v), []).append((p, c))
    assert len(out_pts) == len(ref)
    ref_pts = np.array([np.mean([p for p, _ in v], axis=0) for v in ref.values()])
    got = out_pts[np.lexsort(out_pts.T)]
    want = ref_pts[np.lexsort(ref_pts.T)]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_native_dbscan_large_scale(rng):
    """The reason the native path exists: ~200k points in well under a second."""
    import time
    # production-density data: voxel-downsampled clouds have bounded
    # neighbors per eps-ball (the pipeline downsamples before clustering);
    # uniform cubes give ~20 neighbors per 0.2-ball at this density
    pts = np.concatenate([
        rng.uniform(-2, 2, size=(40000, 3)) + np.array([i * 8.0, 0, 0])
        for i in range(5)
    ]).astype(np.float32)
    t0 = time.perf_counter()
    labels = native.dbscan_native(pts, eps=0.2, min_points=10)
    dt = time.perf_counter() - t0
    assert len(np.unique(labels[labels >= 0])) == 5
    assert dt < 10.0, f"native dbscan took {dt:.1f}s"
