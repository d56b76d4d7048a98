// Native host-side geometry helpers for instance_based_loc_tpu.
//
// The TPU owns the hot compute path (backprojection, registration, IoU,
// assignment search); these C++ routines cover the HOST-side irregular
// work the reference delegated to Open3D's C++ core (SURVEY.md §2.9):
//
//   * dbscan_points   — uniform-grid DBSCAN with union-find
//                       (replaces Open3D cluster_dbscan; the Python fallback
//                       in ops/clustering.py is exact but slow past ~100k pts)
//   * radius_outlier  — grid-bucketed radius neighbor counting
//   * voxel_downsample— hash-grid voxel mean positions/colors
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C native   (produces libiblgeom.so)

#include <cstdint>
#include <cmath>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct CellKey {
    int64_t x, y, z;
    bool operator==(const CellKey& o) const {
        return x == o.x && y == o.y && z == o.z;
    }
};

struct CellHash {
    size_t operator()(const CellKey& k) const {
        // three large primes; collisions only cost a bucket scan
        return static_cast<size_t>(k.x * 73856093LL ^ k.y * 19349669LL ^
                                   k.z * 83492791LL);
    }
};

using Grid = std::unordered_map<CellKey, std::vector<int32_t>, CellHash>;

Grid build_grid(const float* pts, int64_t n, double cell) {
    Grid grid;
    grid.reserve(static_cast<size_t>(n / 4 + 16));
    for (int64_t i = 0; i < n; ++i) {
        CellKey key{static_cast<int64_t>(std::floor(pts[3 * i] / cell)),
                    static_cast<int64_t>(std::floor(pts[3 * i + 1] / cell)),
                    static_cast<int64_t>(std::floor(pts[3 * i + 2] / cell))};
        grid[key].push_back(static_cast<int32_t>(i));
    }
    return grid;
}

template <typename Fn>
void for_neighbors(const Grid& grid, const float* pts, int64_t i, double cell,
                   double r2, Fn&& fn) {
    const float px = pts[3 * i], py = pts[3 * i + 1], pz = pts[3 * i + 2];
    const int64_t cx = static_cast<int64_t>(std::floor(px / cell));
    const int64_t cy = static_cast<int64_t>(std::floor(py / cell));
    const int64_t cz = static_cast<int64_t>(std::floor(pz / cell));
    for (int64_t dx = -1; dx <= 1; ++dx)
        for (int64_t dy = -1; dy <= 1; ++dy)
            for (int64_t dz = -1; dz <= 1; ++dz) {
                auto it = grid.find(CellKey{cx + dx, cy + dy, cz + dz});
                if (it == grid.end()) continue;
                for (int32_t j : it->second) {
                    const double ddx = pts[3 * j] - px;
                    const double ddy = pts[3 * j + 1] - py;
                    const double ddz = pts[3 * j + 2] - pz;
                    if (ddx * ddx + ddy * ddy + ddz * ddz <= r2) fn(j);
                }
            }
}

struct UnionFind {
    std::vector<int32_t> parent;
    explicit UnionFind(int64_t n) : parent(n) {
        for (int64_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
    }
    int32_t find(int32_t x) {
        int32_t root = x;
        while (parent[root] != root) root = parent[root];
        while (parent[x] != root) {
            int32_t next = parent[x];
            parent[x] = root;
            x = next;
        }
        return root;
    }
    void unite(int32_t a, int32_t b) {
        a = find(a);
        b = find(b);
        if (a != b) parent[b] = a;
    }
};

}  // namespace

extern "C" {

// labels out: n int32, cluster id >= 0 or -1 noise.
// Semantics identical to ops/clustering.py::dbscan (core iff >= min_points
// neighbors within eps incl. self; clusters = core connectivity; border
// points attach to any neighboring core's cluster).
void dbscan_points(const float* pts, int64_t n, double eps,
                   int32_t min_points, int32_t* labels) {
    if (n == 0) return;
    const double r2 = eps * eps;
    Grid grid = build_grid(pts, n, eps);

    std::vector<int32_t> counts(n, 0);
    for (int64_t i = 0; i < n; ++i) {
        int32_t c = 0;
        for_neighbors(grid, pts, i, eps, r2, [&](int32_t) { ++c; });
        counts[i] = c;
    }

    std::vector<uint8_t> core(n);
    for (int64_t i = 0; i < n; ++i) core[i] = counts[i] >= min_points;

    UnionFind uf(n);
    std::vector<int32_t> border_attach(n, -1);
    for (int64_t i = 0; i < n; ++i) {
        if (core[i]) {
            for_neighbors(grid, pts, i, eps, r2, [&](int32_t j) {
                if (core[j]) uf.unite(static_cast<int32_t>(i), j);
            });
        } else {
            for_neighbors(grid, pts, i, eps, r2, [&](int32_t j) {
                if (core[j] && border_attach[i] < 0) border_attach[i] = j;
            });
        }
    }

    std::unordered_map<int32_t, int32_t> root_to_label;
    for (int64_t i = 0; i < n; ++i) labels[i] = -1;
    for (int64_t i = 0; i < n; ++i) {
        if (!core[i]) continue;
        int32_t root = uf.find(static_cast<int32_t>(i));
        auto it = root_to_label.find(root);
        if (it == root_to_label.end()) {
            it = root_to_label.emplace(root,
                    static_cast<int32_t>(root_to_label.size())).first;
        }
        labels[i] = it->second;
    }
    for (int64_t i = 0; i < n; ++i) {
        if (!core[i] && border_attach[i] >= 0)
            labels[i] = labels[border_attach[i]];
    }
}

// keep out: n uint8 (1 = kept). Same semantics as ops/outliers.py.
void radius_outlier(const float* pts, int64_t n, double radius,
                    int32_t nb_points, uint8_t* keep) {
    const double r2 = radius * radius;
    Grid grid = build_grid(pts, n, radius);
    for (int64_t i = 0; i < n; ++i) {
        int32_t c = 0;
        for_neighbors(grid, pts, i, radius, r2, [&](int32_t) { ++c; });
        keep[i] = c >= nb_points;
    }
}

// Voxel-mean downsample. Writes up to n output rows; returns the count.
int64_t voxel_downsample(const float* pts, const float* cols, int64_t n,
                         double voxel, float* out_pts, float* out_cols) {
    struct Acc { double px = 0, py = 0, pz = 0, cx = 0, cy = 0, cz = 0; int64_t cnt = 0; };
    std::unordered_map<CellKey, Acc, CellHash> acc;
    acc.reserve(static_cast<size_t>(n / 4 + 16));
    for (int64_t i = 0; i < n; ++i) {
        CellKey key{static_cast<int64_t>(std::floor(pts[3 * i] / voxel)),
                    static_cast<int64_t>(std::floor(pts[3 * i + 1] / voxel)),
                    static_cast<int64_t>(std::floor(pts[3 * i + 2] / voxel))};
        Acc& a = acc[key];
        a.px += pts[3 * i];
        a.py += pts[3 * i + 1];
        a.pz += pts[3 * i + 2];
        if (cols) {
            a.cx += cols[3 * i];
            a.cy += cols[3 * i + 1];
            a.cz += cols[3 * i + 2];
        }
        a.cnt += 1;
    }
    int64_t k = 0;
    for (const auto& [key, a] : acc) {
        out_pts[3 * k] = static_cast<float>(a.px / a.cnt);
        out_pts[3 * k + 1] = static_cast<float>(a.py / a.cnt);
        out_pts[3 * k + 2] = static_cast<float>(a.pz / a.cnt);
        if (cols && out_cols) {
            out_cols[3 * k] = static_cast<float>(a.cx / a.cnt);
            out_cols[3 * k + 1] = static_cast<float>(a.cy / a.cnt);
            out_cols[3 * k + 2] = static_cast<float>(a.cz / a.cnt);
        }
        ++k;
    }
    return k;
}

}  // extern "C"
