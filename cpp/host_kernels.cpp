// Native host kernels for polysolve_tpu — the C++ side of the framework.
//
// Role: the setup-phase graph algorithms that the reference implements in
// native code — K-way graph partitioning and permutation build
// (reference GraphPartition.cpp:176-289, MASSolver.cu:83-131), BSR/ELL
// packing (BSRMatrix.cu:21-200), and fill-reducing ordering (the role AMD /
// KaMinPar play in the reference's symbolic phases). The device side is
// XLA/Pallas; these host paths dominate setup time at 10M+ DoF, where numpy
// is too slow.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).
// Build: tools/build_native.sh (g++ -O3 -shared -fPIC).
//
// All graph inputs are CSR with int64 indptr and int32 indices.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <queue>
#include <random>
#include <vector>

extern "C" {

// --------------------------------------------------------------------------
// Reverse Cuthill–McKee ordering.
// perm_out[i] = old index of the node placed at position i.
// Returns 0 on success.
// --------------------------------------------------------------------------
int rcm_order(const int64_t* indptr, const int32_t* indices, int64_t n,
              int32_t* perm_out) {
  std::vector<int32_t> degree(n);
  for (int64_t i = 0; i < n; ++i)
    degree[i] = static_cast<int32_t>(indptr[i + 1] - indptr[i]);

  std::vector<uint8_t> visited(n, 0);
  std::vector<int32_t> order;
  order.reserve(n);
  std::vector<int32_t> nbrs;

  for (;;) {
    // next start: unvisited node of minimum degree
    int64_t start = -1;
    int32_t best_deg = INT32_MAX;
    for (int64_t i = 0; i < n; ++i) {
      if (!visited[i] && degree[i] < best_deg) {
        best_deg = degree[i];
        start = i;
      }
    }
    if (start < 0) break;

    visited[start] = 1;
    order.push_back(static_cast<int32_t>(start));
    size_t head = order.size() - 1;
    while (head < order.size()) {
      int32_t u = order[head++];
      nbrs.clear();
      for (int64_t p = indptr[u]; p < indptr[u + 1]; ++p) {
        int32_t v = indices[p];
        if (v >= 0 && v < n && !visited[v]) {
          visited[v] = 1;
          nbrs.push_back(v);
        }
      }
      std::sort(nbrs.begin(), nbrs.end(), [&](int32_t a, int32_t b) {
        return degree[a] < degree[b];
      });
      for (int32_t v : nbrs) order.push_back(v);
    }
  }
  // reverse
  for (int64_t i = 0; i < n; ++i) perm_out[i] = order[n - 1 - i];
  return 0;
}

// --------------------------------------------------------------------------
// Greedy smoothed-aggregation aggregation (Vaněk-style, sequential — the
// quality reference for the Python MIS variant).
// agg_out[i] = aggregate id, returns number of aggregates (or -1 on error).
// weights = |a_ij| strength values aligned with indices; diag entries are
// ignored (indices[p] == row).
// --------------------------------------------------------------------------
int64_t greedy_aggregate(const int64_t* indptr, const int32_t* indices,
                         const double* weights, int64_t n, double eps,
                         const double* diag, int64_t* agg_out) {
  std::vector<int8_t> state(n, 0);  // 0 = free, 1 = aggregated
  std::fill(agg_out, agg_out + n, -1);
  int64_t n_agg = 0;

  auto strong = [&](int64_t i, int64_t p) {
    int32_t j = indices[p];
    if (j == i) return false;
    double thr = eps * std::sqrt(std::abs(diag[i]) * std::abs(diag[j]));
    return std::abs(weights[p]) >= thr && thr >= 0;
  };

  // pass 1: nodes whose strong neighborhood is fully free form new aggregates
  for (int64_t i = 0; i < n; ++i) {
    if (state[i]) continue;
    bool all_free = true;
    for (int64_t p = indptr[i]; p < indptr[i + 1] && all_free; ++p)
      if (strong(i, p) && state[indices[p]]) all_free = false;
    if (!all_free) continue;
    agg_out[i] = n_agg;
    state[i] = 1;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      if (strong(i, p)) {
        int32_t j = indices[p];
        if (!state[j]) {
          agg_out[j] = n_agg;
          state[j] = 1;
        }
      }
    }
    ++n_agg;
  }
  // pass 2: attach remaining nodes to the strongest neighboring aggregate
  for (int64_t i = 0; i < n; ++i) {
    if (state[i]) continue;
    double best_w = -1.0;
    int64_t best_agg = -1;
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int32_t j = indices[p];
      if (j != i && agg_out[j] >= 0 && std::abs(weights[p]) > best_w) {
        best_w = std::abs(weights[p]);
        best_agg = agg_out[j];
      }
    }
    if (best_agg >= 0) {
      agg_out[i] = best_agg;
      state[i] = 1;
    }
  }
  // pass 3: singletons
  for (int64_t i = 0; i < n; ++i)
    if (agg_out[i] < 0) agg_out[i] = n_agg++;
  return n_agg;
}

// --------------------------------------------------------------------------
// CSR → padded ELL packing (the host analog of BSRMatrix.cu's GPU build).
// cols_out/vals_out are (n, width) row-major, pre-zeroed by the caller or
// here. Returns max row degree (-1 if it exceeds width).
// --------------------------------------------------------------------------
int64_t csr_to_ell(const int64_t* indptr, const int32_t* indices,
                   const double* data, int64_t n, int64_t width,
                   int32_t* cols_out, double* vals_out) {
  std::memset(cols_out, 0, sizeof(int32_t) * n * width);
  std::memset(vals_out, 0, sizeof(double) * n * width);
  int64_t max_deg = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t deg = indptr[i + 1] - indptr[i];
    max_deg = std::max(max_deg, deg);
    if (deg > width) return -1;
    for (int64_t k = 0; k < deg; ++k) {
      cols_out[i * width + k] = indices[indptr[i] + k];
      vals_out[i * width + k] = data[indptr[i] + k];
    }
  }
  return max_deg;
}

// --------------------------------------------------------------------------
// Contiguous row-block partition with halo maps (the distributed setup —
// reference role: GraphPartition + part_offsets, MASSolver.cu:83-131).
// For each shard s owning rows [s*rows_per, (s+1)*rows_per):
//   halo_lo_out[s] = min column referenced − own_start (≤0)
//   halo_hi_out[s] = max column referenced − own_end + 1 (≥0)
// --------------------------------------------------------------------------
int partition_halos(const int64_t* indptr, const int32_t* indices, int64_t n,
                    int64_t n_shards, int64_t rows_per, int64_t* halo_lo_out,
                    int64_t* halo_hi_out) {
  for (int64_t s = 0; s < n_shards; ++s) {
    int64_t r0 = s * rows_per;
    int64_t r1 = std::min(r0 + rows_per, n);
    int64_t lo = 0, hi = 0;
    for (int64_t i = r0; i < r1; ++i) {
      for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
        int64_t c = indices[p];
        lo = std::min(lo, c - r0);
        hi = std::max(hi, c - (r1 - 1));
      }
    }
    halo_lo_out[s] = lo;
    halo_hi_out[s] = hi;
  }
  return 0;
}

// --------------------------------------------------------------------------
// Minimum-degree fill-reducing ordering (quotient graph with element
// absorption — the role AMD plays inside the reference's CHOLMOD / Pardiso
// symbolic phases, cmake/recipes/suitesparse, Pardiso.cpp:203-259).
// perm_out[k] = variable eliminated at step k. Exact external degrees via a
// stamp array; lazy heap for min selection. Returns 0 on success.
// --------------------------------------------------------------------------
int md_order(const int64_t* indptr, const int32_t* indices, int64_t n,
             int32_t* perm_out) {
  std::vector<std::vector<int32_t>> var_adj(n);   // live variable neighbors
  std::vector<std::vector<int32_t>> var_elems(n); // adjacent elements
  std::vector<std::vector<int32_t>> elem_verts(n);
  std::vector<uint8_t> eliminated(n, 0), absorbed(n, 0), in_lp(n, 0);
  std::vector<int64_t> cur_deg(n);
  std::vector<int64_t> stamp(n, -1);
  int64_t stamp_val = 0;

  for (int64_t i = 0; i < n; ++i) {
    auto& a = var_adj[i];
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int32_t j = indices[p];
      if (j != i && j >= 0 && j < n) a.push_back(j);
    }
    std::sort(a.begin(), a.end());
    a.erase(std::unique(a.begin(), a.end()), a.end());
    cur_deg[i] = static_cast<int64_t>(a.size());
  }

  using HeapEntry = std::pair<int64_t, int32_t>;
  std::priority_queue<HeapEntry, std::vector<HeapEntry>,
                      std::greater<HeapEntry>> heap;
  for (int64_t i = 0; i < n; ++i)
    heap.emplace(cur_deg[i], static_cast<int32_t>(i));

  std::vector<int32_t> Lp;
  for (int64_t k = 0; k < n; ++k) {
    int32_t p = -1;
    while (!heap.empty()) {
      auto [d, v] = heap.top();
      if (eliminated[v] || d != cur_deg[v]) { heap.pop(); continue; }
      p = v;
      heap.pop();
      break;
    }
    if (p < 0) {  // disconnected leftovers (shouldn't happen)
      for (int64_t i = 0; i < n; ++i)
        if (!eliminated[i]) { p = static_cast<int32_t>(i); break; }
    }

    // Lp = reach(p) = adj vars ∪ verts of adjacent elements, minus p
    Lp.clear();
    for (int32_t v : var_adj[p])
      if (!eliminated[v] && !in_lp[v]) {
        in_lp[v] = 1;
        Lp.push_back(v);
      }
    for (int32_t e : var_elems[p]) {
      if (absorbed[e]) continue;
      for (int32_t v : elem_verts[e])
        if (!eliminated[v] && !in_lp[v]) {
          in_lp[v] = 1;
          Lp.push_back(v);
        }
      absorbed[e] = 1;          // e's clique is covered by the new element p
      elem_verts[e].clear();
      elem_verts[e].shrink_to_fit();
    }

    perm_out[k] = p;
    eliminated[p] = 1;
    elem_verts[p] = Lp;         // p becomes an element with vertex set Lp
    var_adj[p].clear();
    var_adj[p].shrink_to_fit();
    var_elems[p].clear();
    var_elems[p].shrink_to_fit();

    // update every variable in Lp (in_lp[] marks Lp membership)
    for (int32_t i : Lp) {
      // prune var_adj[i]: drop eliminated vars and vars covered by element p
      auto& a = var_adj[i];
      size_t w = 0;
      for (int32_t v : a)
        if (!eliminated[v] && !in_lp[v]) a[w++] = v;
      a.resize(w);
      // prune absorbed elements, then attach p
      auto& es = var_elems[i];
      w = 0;
      for (int32_t e : es)
        if (!absorbed[e]) es[w++] = e;
      es.resize(w);
      es.push_back(p);
      // exact external degree via a fresh stamp
      ++stamp_val;
      stamp[i] = stamp_val;
      int64_t deg = 0;
      for (int32_t v : a)
        if (stamp[v] != stamp_val) { stamp[v] = stamp_val; ++deg; }
      for (int32_t e : es)
        for (int32_t v : elem_verts[e])
          if (!eliminated[v] && stamp[v] != stamp_val) {
            stamp[v] = stamp_val;
            ++deg;
          }
      cur_deg[i] = deg;
      heap.emplace(deg, i);
    }
    for (int32_t i : Lp) in_lp[i] = 0;
  }
  return 0;
}

// --------------------------------------------------------------------------
// Bandwidth of a CSR pattern (symbolic phase helper).
// --------------------------------------------------------------------------
int64_t csr_bandwidth(const int64_t* indptr, const int32_t* indices,
                      int64_t n) {
  int64_t bw = 0;
  for (int64_t i = 0; i < n; ++i)
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      int64_t d = static_cast<int64_t>(indices[p]) - i;
      if (d < 0) d = -d;
      bw = std::max(bw, d);
    }
  return bw;
}

}  // extern "C"
