// glass_host: native host-side runtime for glass_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the host-side
// data plane around it — the pieces a production deployment runs per dataset
// or per partition rebuild, where Python-loop costs bite:
//   - CSR build: sort + degree + {mean,sum,gcn} normalization
//     (semantics of ops/graph.py::build_graph, reference impl/models.py:83-111)
//   - reverse Cuthill-McKee ordering (locality for block-sparse / partitioned
//     layouts)
//   - link-prediction negative sampling (reference datasets.py:73-91)
//   - induced-subgraph extraction for GNN-seg (reference GNNSeg.py:213-249)
//
// Exposed as a plain C ABI consumed through ctypes (glass_tpu/native.py);
// every entry point has a numpy fallback so the framework works unbuilt.

#include <algorithm>
#ifdef _OPENMP
#include <omp.h>
#include <parallel/algorithm>
#endif
#include <cstdint>
#include <cstring>
#include <cmath>
#include <numeric>
#include <queue>
#include <random>
#include <unordered_set>
#include <vector>

extern "C" {

// Sorts edges by (row, col), computes weighted row degrees, applies the
// requested normalization. aggr: 0 = sum, 1 = mean, 2 = gcn.
// In:  row/col/w of length e (w may be null => ones), n nodes.
// Out: out_row/out_col (int32), out_w (float) of length e, out_deg (double, n).
// Returns 0 on success.
int glass_build_csr(const int64_t* row, const int64_t* col, const float* w,
                    int64_t e, int64_t n, int aggr,
                    int32_t* out_row, int32_t* out_col, float* out_w,
                    double* out_deg) {
  // Fused (row*n + col, original index) keys + a parallel sort: ~4x over
  // the former comparator-indirect std::sort at 72M edges (the sort was
  // the whole-graph builder's single largest host cost). Ties on the key
  // sort by original index, making duplicate-edge order stable.
  std::vector<std::pair<int64_t, int64_t>> kv(e);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < e; ++i) kv[i] = {row[i] * n + col[i], i};
#ifdef _OPENMP
  __gnu_parallel::sort(kv.begin(), kv.end());
#else
  std::sort(kv.begin(), kv.end());
#endif
  std::vector<double> deg(n, 0.0);
  for (int64_t i = 0; i < e; ++i) {
    deg[row[i]] += w ? static_cast<double>(w[i]) : 1.0;
  }
  for (int64_t i = 0; i < n; ++i) {
    if (deg[i] < 0.5) deg[i] += 1.0;  // isolated-node guard
    out_deg[i] = deg[i];
  }
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < e; ++i) {
    const int64_t j = kv[i].second;
    const double wj = w ? static_cast<double>(w[j]) : 1.0;
    out_row[i] = static_cast<int32_t>(row[j]);
    out_col[i] = static_cast<int32_t>(col[j]);
    double v;
    switch (aggr) {
      case 0: v = wj; break;                                   // sum
      case 1: v = wj / deg[row[j]]; break;                     // mean
      case 2: v = wj / std::sqrt(deg[row[j]] * deg[col[j]]); break;  // gcn
      default: v = 0.0; break;  // unreachable: aggr validated in python
    }
    out_w[i] = static_cast<float>(v);
  }
  return 0;
}

// Reverse Cuthill-McKee ordering. Edges must describe an undirected graph
// (both directions present). out_perm[i] = old id at new position i.
int glass_rcm(const int64_t* row, const int64_t* col, int64_t e, int64_t n,
              int64_t* out_perm) {
  std::vector<int64_t> ptr(n + 1, 0), adj(e);
  for (int64_t i = 0; i < e; ++i) ptr[row[i] + 1]++;
  for (int64_t i = 0; i < n; ++i) ptr[i + 1] += ptr[i];
  {
    std::vector<int64_t> cur(ptr.begin(), ptr.end() - 1);
    for (int64_t i = 0; i < e; ++i) adj[cur[row[i]]++] = col[i];
  }
  std::vector<int64_t> degree(n);
  for (int64_t i = 0; i < n; ++i) {
    degree[i] = ptr[i + 1] - ptr[i];
    // sort each adjacency by degree for the classic CM tie-break
  }
  for (int64_t i = 0; i < n; ++i) {
    std::sort(adj.begin() + ptr[i], adj.begin() + ptr[i + 1],
              [&](int64_t a, int64_t b) { return degree[a] < degree[b]; });
  }
  std::vector<char> seen(n, 0);
  std::vector<int64_t> result;
  result.reserve(n);
  // process components, seeding each from its minimum-degree unseen node
  std::vector<int64_t> by_degree(n);
  std::iota(by_degree.begin(), by_degree.end(), 0);
  std::sort(by_degree.begin(), by_degree.end(),
            [&](int64_t a, int64_t b) { return degree[a] < degree[b]; });
  std::queue<int64_t> q;
  for (int64_t s : by_degree) {
    if (seen[s]) continue;
    seen[s] = 1;
    q.push(s);
    while (!q.empty()) {
      int64_t u = q.front();
      q.pop();
      result.push_back(u);
      for (int64_t k = ptr[u]; k < ptr[u + 1]; ++k) {
        int64_t v = adj[k];
        if (!seen[v]) {
          seen[v] = 1;
          q.push(v);
        }
      }
    }
  }
  // reverse
  for (int64_t i = 0; i < n; ++i) out_perm[i] = result[n - 1 - i];
  return 0;
}

// Samples e_neg directed non-edges (a, b), a != b, absent from the edge set.
// Deterministic under `seed`. Returns 0 on success, 1 if the graph is too
// dense to find enough negatives.
int glass_negative_sample(const int64_t* row, const int64_t* col, int64_t e,
                          int64_t n, int64_t e_neg, uint64_t seed,
                          int64_t* out_src, int64_t* out_dst) {
  std::unordered_set<int64_t> existing;
  existing.reserve(static_cast<size_t>(e * 2));
  for (int64_t i = 0; i < e; ++i) existing.insert(row[i] * n + col[i]);
  std::mt19937_64 gen(seed);
  std::uniform_int_distribution<int64_t> dist(0, n - 1);
  int64_t got = 0;
  int64_t attempts = 0;
  const int64_t max_attempts = e_neg * 1000 + 1000000;
  while (got < e_neg && attempts < max_attempts) {
    ++attempts;
    const int64_t a = dist(gen), b = dist(gen);
    if (a == b) continue;
    const int64_t key = a * n + b;
    if (existing.count(key)) continue;
    existing.insert(key);
    out_src[got] = a;
    out_dst[got] = b;
    ++got;
  }
  return got == e_neg ? 0 : 1;
}

// Induced-subgraph extraction for GNN-seg: for each padded subgraph row
// (pos, width L, pad -1), emits the dense local adjacency (L x L float32,
// 1.0 per directed edge) into out_adj[s].
int glass_induced_subgraphs(const int64_t* row, const int64_t* col, int64_t e,
                            int64_t n, const int64_t* pos, int64_t s_count,
                            int64_t width, float* out_adj) {
  // CSR of the global graph for neighbor queries
  std::vector<int64_t> ptr(n + 1, 0), adj(e);
  for (int64_t i = 0; i < e; ++i) ptr[row[i] + 1]++;
  for (int64_t i = 0; i < n; ++i) ptr[i + 1] += ptr[i];
  {
    std::vector<int64_t> cur(ptr.begin(), ptr.end() - 1);
    for (int64_t i = 0; i < e; ++i) adj[cur[row[i]]++] = col[i];
  }
  std::vector<int64_t> local(n, -1);
  for (int64_t s = 0; s < s_count; ++s) {
    const int64_t* nodes = pos + s * width;
    int64_t k = 0;
    for (; k < width && nodes[k] >= 0; ++k) local[nodes[k]] = k;
    float* a = out_adj + s * width * width;
    for (int64_t j = 0; j < k; ++j) {
      const int64_t u = nodes[j];
      for (int64_t p = ptr[u]; p < ptr[u + 1]; ++p) {
        const int64_t lv = local[adj[p]];
        if (lv >= 0) a[j * width + lv] += 1.0f;
      }
    }
    for (int64_t j = 0; j < k; ++j) local[nodes[j]] = -1;
  }
  return 0;
}

// Banded-slab fill for the Pallas band layout (ops/pallas_band.py):
// out[g, row - g*rps*128, col - clo[g]*128] += w, accumulated in double
// (matching the numpy builder's f64 bincount) and written as f32. Inputs
// are the nonzero-weight COO arrays; the caller sizes out as
// n_g * (rps*128) * (wb*128) floats. One sequential pass => deterministic.
int glass_band_fill(const int64_t* row, const int64_t* col, const double* w,
                    int64_t e, int64_t rps, int64_t wb, const int32_t* clo,
                    int64_t n_g, float* out) {
  const int64_t rows_per_g = rps * 128;
  const int64_t slab_cols = wb * 128;
  const int64_t slab_sz = rows_per_g * slab_cols;
  std::vector<double> acc(static_cast<size_t>(n_g) * slab_sz, 0.0);
  // Row-sorted inputs (the builder's normal case) fill in parallel: each
  // thread owns a contiguous GROUP range, so every accumulator slot is
  // touched by exactly one thread in original edge order — bit-identical
  // to the sequential pass (f64 accumulation order per slot unchanged).
  bool sorted = true;
  for (int64_t i = 1; i < e; ++i) {
    if (row[i] < row[i - 1]) { sorted = false; break; }
  }
  int bad = 0;
  if (sorted && e > 0) {
#pragma omp parallel reduction(|| : bad)
    {
#ifdef _OPENMP
      const int T = omp_get_num_threads();
      const int t = omp_get_thread_num();
#else
      const int T = 1, t = 0;
#endif
      const int64_t g_lo = n_g * t / T, g_hi = n_g * (t + 1) / T;
      const int64_t* lo_p =
          std::lower_bound(row, row + e, g_lo * rows_per_g);
      const int64_t* hi_p =
          std::lower_bound(row, row + e, g_hi * rows_per_g);
      for (int64_t i = lo_p - row; i < hi_p - row; ++i) {
        const int64_t g = (row[i] / 128) / rps;
        if (g < 0 || g >= n_g) { bad = 1; break; }
        const int64_t lr = row[i] - g * rows_per_g;
        const int64_t lc = col[i] - static_cast<int64_t>(clo[g]) * 128;
        if (lr < 0 || lr >= rows_per_g || lc < 0 || lc >= slab_cols) {
          bad = 1;
          break;
        }
        acc[g * slab_sz + lr * slab_cols + lc] += w[i];
      }
    }
  } else {
    for (int64_t i = 0; i < e; ++i) {
      const int64_t g = (row[i] / 128) / rps;
      if (g < 0 || g >= n_g) return 1;
      const int64_t lr = row[i] - g * rows_per_g;
      const int64_t lc = col[i] - static_cast<int64_t>(clo[g]) * 128;
      if (lr < 0 || lr >= rows_per_g || lc < 0 || lc >= slab_cols) return 1;
      acc[g * slab_sz + lr * slab_cols + lc] += w[i];
    }
  }
  if (bad) return 1;
  const int64_t total = n_g * slab_sz;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < total; ++i) out[i] = static_cast<float>(acc[i]);
  return 0;
}

// Wide-chunk BCSR block fill (ops/pallas_spmm.py): each edge lands in its
// block's destination slot e_dst[i] (caller-computed, sorted-by-block
// order): out[e_dst/chunk][row%128][(e_dst%chunk)*128 + col%128] += w.
// f64 accumulation, f32 output — bit-matching the numpy bincount fallback.
int glass_bcsr_fill(const int64_t* row, const int64_t* col, const double* w,
                    const int64_t* e_dst, int64_t e, int64_t chunk,
                    int64_t n_store, float* out) {
  const int64_t store_cols = chunk * 128;
  const int64_t store_sz = 128 * store_cols;
  std::vector<double> acc(static_cast<size_t>(n_store) * store_sz, 0.0);
  for (int64_t i = 0; i < e; ++i) {
    const int64_t st = e_dst[i] / chunk;
    if (st < 0 || st >= n_store) return 1;
    acc[st * store_sz + (row[i] % 128) * store_cols
        + (e_dst[i] % chunk) * 128 + (col[i] % 128)] += w[i];
  }
  const int64_t total = n_store * store_sz;
  for (int64_t i = 0; i < total; ++i) out[i] = static_cast<float>(acc[i]);
  return 0;
}

}  // extern "C"
