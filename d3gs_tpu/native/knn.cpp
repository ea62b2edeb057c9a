// Host-side k-nearest-neighbor mean squared distance (k = 3).
//
// Native counterpart of the reference's simple-knn CUDA extension
// (`distCUDA2`, SURVEY.md §2.3): mean squared distance from each point to
// its 3 nearest neighbors, used once at model init to size the initial
// Gaussians. The reference uses a Morton-ordered spatial hash on GPU; here
// a uniform grid over the bounding box with ring search — O(N) memory,
// near-linear time for typical point clouds, multithreaded.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <limits>
#include <thread>
#include <vector>

namespace {

struct Grid {
    float min[3];
    float cell;      // cell edge length
    int dims[3];
    std::vector<int> cell_start;   // CSR offsets, size prod(dims)+1
    std::vector<int> point_ids;    // point indices grouped by cell

    inline int cell_index(int cx, int cy, int cz) const {
        return (cz * dims[1] + cy) * dims[0] + cx;
    }
    inline void locate(const float* p, int* c) const {
        for (int d = 0; d < 3; ++d) {
            int v = static_cast<int>((p[d] - min[d]) / cell);
            c[d] = std::min(std::max(v, 0), dims[d] - 1);
        }
    }
};

Grid build_grid(const float* pts, int n) {
    Grid g;
    float mx[3] = {-std::numeric_limits<float>::infinity(),
                   -std::numeric_limits<float>::infinity(),
                   -std::numeric_limits<float>::infinity()};
    for (int d = 0; d < 3; ++d) g.min[d] = std::numeric_limits<float>::infinity();
    for (int i = 0; i < n; ++i) {
        for (int d = 0; d < 3; ++d) {
            g.min[d] = std::min(g.min[d], pts[3 * i + d]);
            mx[d] = std::max(mx[d], pts[3 * i + d]);
        }
    }
    float ext = 0.f;
    for (int d = 0; d < 3; ++d) ext = std::max(ext, mx[d] - g.min[d]);
    // target ~8 points per cell
    int target_cells = std::max(n / 8, 1);
    float cells_per_axis = std::cbrt(static_cast<float>(target_cells));
    g.cell = std::max(ext / std::max(cells_per_axis, 1.f),
                      1e-12f);
    for (int d = 0; d < 3; ++d) {
        g.dims[d] = std::max(1, static_cast<int>((mx[d] - g.min[d]) / g.cell) + 1);
        g.dims[d] = std::min(g.dims[d], 512);
    }
    // recompute cell so dims cover the extent
    for (int d = 0; d < 3; ++d)
        g.cell = std::max(g.cell, (mx[d] - g.min[d]) / g.dims[d] + 1e-12f);

    int total = g.dims[0] * g.dims[1] * g.dims[2];
    std::vector<int> counts(total + 1, 0);
    std::vector<int> cell_of(n);
    for (int i = 0; i < n; ++i) {
        int c[3];
        g.locate(pts + 3 * i, c);
        int ci = g.cell_index(c[0], c[1], c[2]);
        cell_of[i] = ci;
        counts[ci + 1]++;
    }
    for (int i = 0; i < total; ++i) counts[i + 1] += counts[i];
    g.cell_start = counts;
    g.point_ids.resize(n);
    std::vector<int> cursor(g.cell_start.begin(), g.cell_start.end() - 1);
    for (int i = 0; i < n; ++i) g.point_ids[cursor[cell_of[i]]++] = i;
    return g;
}

inline float sq_dist(const float* a, const float* b) {
    float dx = a[0] - b[0], dy = a[1] - b[1], dz = a[2] - b[2];
    return dx * dx + dy * dy + dz * dz;
}

void knn_point(const Grid& g, const float* pts, int n, int i, int k,
               float* best) {
    for (int j = 0; j < k; ++j) best[j] = std::numeric_limits<float>::infinity();
    const float* p = pts + 3 * i;
    int c[3];
    g.locate(p, c);
    int max_ring = std::max({g.dims[0], g.dims[1], g.dims[2]});
    for (int ring = 0; ring <= max_ring; ++ring) {
        // prune: if the k-th best is closer than the ring's inner boundary,
        // no farther cell can improve it
        if (ring > 0) {
            float ring_min = (ring - 1) * g.cell;
            if (best[k - 1] < ring_min * ring_min) break;
        }
        int x0 = std::max(c[0] - ring, 0), x1 = std::min(c[0] + ring, g.dims[0] - 1);
        int y0 = std::max(c[1] - ring, 0), y1 = std::min(c[1] + ring, g.dims[1] - 1);
        int z0 = std::max(c[2] - ring, 0), z1 = std::min(c[2] + ring, g.dims[2] - 1);
        for (int cz = z0; cz <= z1; ++cz)
            for (int cy = y0; cy <= y1; ++cy)
                for (int cx = x0; cx <= x1; ++cx) {
                    // only the ring shell (interior was visited before)
                    int dmax = std::max({std::abs(cx - c[0]), std::abs(cy - c[1]),
                                         std::abs(cz - c[2])});
                    if (dmax != ring) continue;
                    int ci = g.cell_index(cx, cy, cz);
                    for (int s = g.cell_start[ci]; s < g.cell_start[ci + 1]; ++s) {
                        int j = g.point_ids[s];
                        if (j == i) continue;
                        float d2 = sq_dist(p, pts + 3 * j);
                        if (d2 < best[k - 1]) {
                            // insertion into the tiny sorted list
                            int slot = k - 1;
                            while (slot > 0 && best[slot - 1] > d2) {
                                best[slot] = best[slot - 1];
                                --slot;
                            }
                            best[slot] = d2;
                        }
                    }
                }
    }
}

}  // namespace

extern "C" {

// out[i] = mean squared distance to the k nearest neighbors of point i.
// pts: (n, 3) float32 row-major. Returns 0 on success.
int knn_mean_sq_dist(const float* pts, int n, int k, float* out) {
    if (n <= 1 || k <= 0) {
        for (int i = 0; i < n; ++i) out[i] = 0.f;
        return 0;
    }
    Grid g = build_grid(pts, n);
    int kk = std::min(k, n - 1);
    unsigned hw = std::thread::hardware_concurrency();
    int n_threads = std::max(1u, std::min(hw, 32u));
    std::atomic<int> next(0);
    const int chunk = 1024;
    auto worker = [&]() {
        std::vector<float> best(kk);
        while (true) {
            int s = next.fetch_add(chunk);
            if (s >= n) break;
            int e = std::min(s + chunk, n);
            for (int i = s; i < e; ++i) {
                knn_point(g, pts, n, i, kk, best.data());
                float acc = 0.f;
                for (int j = 0; j < kk; ++j) acc += best[j];
                out[i] = acc / kk;
            }
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
    return 0;
}

}  // extern "C"
