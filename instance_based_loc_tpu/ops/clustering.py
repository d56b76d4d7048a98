"""Host-side clustering: DBSCAN (replaces Open3D C++ `cluster_dbscan`, used at
reference `object_memory.py:315,511,632`) and agglomerative clustering with a
distance threshold on precomputed distances (replaces sklearn
`AgglomerativeClustering`, reference `object_memory.py:414,477,598,725`).

These run on host because N is small-to-medium (objects: hundreds; merged
object points: up to ~1M after voxel downsampling) and the control flow is
irregular. DBSCAN uses a uniform-grid bucket sweep so the pairwise work stays
local; the Python loop is over occupied *cells*, not points.
"""

from __future__ import annotations

import numpy as np


class _UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n)

    def find(self, x: int) -> int:
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def dbscan(points: np.ndarray, eps: float, min_points: int,
           prefer_native: bool = True) -> np.ndarray:
    """Labels (N,) int: cluster id >= 0 or -1 for noise.

    Semantics match Open3D/sklearn: a point is core iff it has >= min_points
    neighbors within eps (self included); clusters = connected components of
    core points under the eps-graph; border points join any neighboring core's
    cluster; the rest are noise.

    Large inputs route to the C++ grid implementation (native/geometry.cpp)
    when the library is buildable; the numpy path below is the exact
    reference implementation both are tested against.
    """
    points = np.asarray(points, np.float64)
    n = len(points)
    if n == 0:
        return np.zeros(0, np.int32)
    if prefer_native and n > 20000:
        from .native import dbscan_native
        labels = dbscan_native(points, eps, min_points)
        if labels is not None:
            return labels

    cell = np.floor(points / eps).astype(np.int64)
    # order points by cell for contiguous bucket slices
    order = np.lexsort((cell[:, 2], cell[:, 1], cell[:, 0]))
    cell_sorted = cell[order]
    pts_sorted = points[order]
    boundaries = np.nonzero(np.any(np.diff(cell_sorted, axis=0) != 0, axis=1))[0] + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [n]])
    keys = {tuple(cell_sorted[s]): i for i, s in enumerate(starts)}

    offsets = np.array([(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
                        for k in (-1, 0, 1)], np.int64)
    eps2 = eps * eps

    neighbor_counts = np.zeros(n, np.int64)
    # pass 1: neighbor counts per point (cells x 27 neighbor-cell blocks)
    cell_neighbors: list[np.ndarray] = []
    for ci in range(len(starts)):
        s, e = starts[ci], ends[ci]
        base = tuple(cell_sorted[s])
        cand_idx = []
        for off in offsets:
            key = (base[0] + off[0], base[1] + off[1], base[2] + off[2])
            cj = keys.get(key)
            if cj is not None:
                cand_idx.append(np.arange(starts[cj], ends[cj]))
        cand = np.concatenate(cand_idx)
        d2 = ((pts_sorted[s:e, None, :] - pts_sorted[None, cand, :]) ** 2).sum(-1)
        within = d2 <= eps2
        neighbor_counts[s:e] = within.sum(1)
        cell_neighbors.append(cand)

    core = neighbor_counts >= min_points

    # pass 2: union core points within eps; remember a core neighbor for borders
    uf = _UnionFind(n)
    border_attach = np.full(n, -1, np.int64)
    for ci in range(len(starts)):
        s, e = starts[ci], ends[ci]
        cand = cell_neighbors[ci]
        d2 = ((pts_sorted[s:e, None, :] - pts_sorted[None, cand, :]) ** 2).sum(-1)
        within = d2 <= eps2
        for row, p in enumerate(range(s, e)):
            nbrs = cand[within[row]]
            core_nbrs = nbrs[core[nbrs]]
            if core[p]:
                for q in core_nbrs:
                    uf.union(p, q)
            elif len(core_nbrs):
                border_attach[p] = core_nbrs[0]

    labels_sorted = np.full(n, -1, np.int64)
    root_to_label: dict[int, int] = {}
    for p in range(n):
        if core[p]:
            r = uf.find(p)
            if r not in root_to_label:
                root_to_label[r] = len(root_to_label)
            labels_sorted[p] = root_to_label[r]
    for p in range(n):
        if not core[p] and border_attach[p] >= 0:
            labels_sorted[p] = labels_sorted[border_attach[p]]

    labels = np.full(n, -1, np.int64)
    labels[order] = labels_sorted
    return labels.astype(np.int32)


def agglomerative_precomputed(distance_matrix: np.ndarray,
                              distance_threshold: float,
                              linkage: str = "average") -> np.ndarray:
    """Agglomerative clustering on a precomputed distance matrix, merging the
    closest pair until the minimum inter-cluster distance exceeds
    `distance_threshold`. Matches sklearn's
    AgglomerativeClustering(n_clusters=None, distance_threshold=t,
    metric='precomputed', linkage=...) label partitioning.

    Lance-Williams updates for 'average' and 'complete' linkage; O(N^3) —
    fine for the object counts this pipeline sees (N <= a few hundred).
    """
    d = np.array(distance_matrix, np.float64)
    n = d.shape[0]
    assert d.shape == (n, n)
    if n == 1:
        return np.zeros(1, np.int32)
    np.fill_diagonal(d, np.inf)

    active = np.ones(n, bool)
    sizes = np.ones(n, np.int64)
    members: list[list[int]] = [[i] for i in range(n)]

    while active.sum() > 1:
        sub = np.where(active)[0]
        dsub = d[np.ix_(sub, sub)]
        i_s, j_s = np.unravel_index(np.argmin(dsub), dsub.shape)
        dmin = dsub[i_s, j_s]
        if dmin >= distance_threshold:
            break
        a, b = sub[i_s], sub[j_s]
        # merge b into a
        for c in sub:
            if c == a or c == b:
                continue
            if linkage == "average":
                new = (sizes[a] * d[a, c] + sizes[b] * d[b, c]) / (sizes[a] + sizes[b])
            elif linkage == "complete":
                new = max(d[a, c], d[b, c])
            else:
                raise ValueError(linkage)
            d[a, c] = d[c, a] = new
        sizes[a] += sizes[b]
        members[a] += members[b]
        active[b] = False
        d[b, :] = np.inf
        d[:, b] = np.inf

    labels = np.zeros(n, np.int32)
    for label, root in enumerate(np.where(active)[0]):
        for m in members[root]:
            labels[m] = label
    return labels
