"""Host clustering vs sklearn references (DBSCAN + agglomerative —
reference uses Open3D cluster_dbscan and sklearn AgglomerativeClustering)."""

import numpy as np
import pytest

from instance_based_loc_tpu.ops.clustering import dbscan, agglomerative_precomputed


def _same_partition(a, b, ignore_noise=True):
    """Two labelings describe the same partition (up to label renaming)."""
    a, b = np.asarray(a), np.asarray(b)
    if ignore_noise:
        if not ((a == -1) == (b == -1)).all():
            return False
        sel = a != -1
        a, b = a[sel], b[sel]
    mapping = {}
    for x, y in zip(a, b):
        if x in mapping and mapping[x] != y:
            return False
        mapping[x] = y
    return len(set(mapping.values())) == len(mapping)


@pytest.mark.parametrize("eps,min_pts", [(0.3, 5), (0.5, 10), (0.2, 3)])
def test_dbscan_matches_sklearn(rng, eps, min_pts):
    from sklearn.cluster import DBSCAN
    blobs = np.concatenate([
        rng.normal([0, 0, 0], 0.1, size=(80, 3)),
        rng.normal([2, 0, 0], 0.1, size=(60, 3)),
        rng.normal([0, 3, 1], 0.1, size=(70, 3)),
        rng.uniform(-5, 5, size=(15, 3)),  # sparse noise
    ])
    ours = dbscan(blobs, eps=eps, min_points=min_pts)
    ref = DBSCAN(eps=eps, min_samples=min_pts).fit(blobs).labels_
    # cluster cores must agree; border points may tie-break differently when
    # reachable from two clusters, so compare partitions over core points
    from sklearn.neighbors import NearestNeighbors
    nn = NearestNeighbors(radius=eps).fit(blobs)
    counts = np.array([len(i) for i in nn.radius_neighbors(blobs)[1]])
    core = counts >= min_pts
    assert _same_partition(ours[core], ref[core])
    # noise sets match exactly
    assert ((ours == -1) == (ref == -1)).mean() > 0.98


def test_dbscan_empty_and_single():
    assert len(dbscan(np.zeros((0, 3)), 0.5, 3)) == 0
    assert dbscan(np.zeros((1, 3)), 0.5, 1)[0] == 0
    assert dbscan(np.zeros((1, 3)), 0.5, 2)[0] == -1


@pytest.mark.parametrize("linkage", ["average", "complete"])
def test_agglomerative_matches_sklearn(rng, linkage):
    from sklearn.cluster import AgglomerativeClustering
    pts = np.concatenate([
        rng.normal([0, 0], 0.2, size=(10, 2)),
        rng.normal([5, 0], 0.2, size=(12, 2)),
        rng.normal([0, 5], 0.2, size=(8, 2)),
    ])
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    for thr in [1.0, 3.0, 8.0]:
        ours = agglomerative_precomputed(d, thr, linkage=linkage)
        ref = AgglomerativeClustering(n_clusters=None, distance_threshold=thr,
                                      metric="precomputed",
                                      linkage=linkage).fit(d).labels_
        assert _same_partition(ours, ref, ignore_noise=False), f"thr={thr}"


def test_agglomerative_single_element():
    assert agglomerative_precomputed(np.zeros((1, 1)), 0.5).tolist() == [0]
