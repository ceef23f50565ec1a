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
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <random>
#include <thread>
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

    // update every variable in Lp (in_lp[] marks Lp membership) using
    // Amestoy's approximate external degree: first compute
    // w[e] = |Le \ Lp| for every element adjacent to Lp in one sweep,
    // then each degree is O(|A_i| + |E_i|) — the AMD bound, no reach scans.
    ++stamp_val;
    const int64_t lp_size = static_cast<int64_t>(Lp.size());
    for (int32_t i : Lp) {
      auto& es = var_elems[i];
      size_t w = 0;
      for (int32_t e : es)
        if (!absorbed[e]) es[w++] = e;
      es.resize(w);
      for (int32_t e : es) {
        if (stamp[e] != stamp_val) {
          stamp[e] = stamp_val;
          cur_deg[e] = static_cast<int64_t>(elem_verts[e].size());
          // cur_deg[] doubles as w[] for eliminated ids (they never re-enter
          // the heap), avoiding a second n-sized array
        }
        --cur_deg[e];
      }
    }
    for (int32_t i : Lp) {
      // prune var_adj[i]: drop eliminated vars and vars covered by element p
      auto& a = var_adj[i];
      size_t w = 0;
      for (int32_t v : a)
        if (!eliminated[v] && !in_lp[v]) a[w++] = v;
      a.resize(w);
      auto& es = var_elems[i];
      int64_t deg = static_cast<int64_t>(a.size()) + (lp_size - 1);
      size_t we = 0;
      for (int32_t e : es) {
        int64_t ext = cur_deg[e];  // |Le \ Lp|
        if (ext <= 0) {            // aggressive absorption: Le subset of Lp
          absorbed[e] = 1;
          elem_verts[e].clear();
          elem_verts[e].shrink_to_fit();
          continue;
        }
        es[we++] = e;
        deg += ext;
      }
      es.resize(we);
      es.push_back(p);
      deg = std::min(deg, n);  // clamp the upper bound
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

// ==========================================================================
// Multilevel K-way graph partitioner (the KaMinPar role in the reference —
// GraphPartition.cpp:176-289: 32-node banks for the MAS preconditioner, and
// the row-partition for distribution). Multilevel recursive bisection:
// heavy-edge-matching coarsening -> greedy BFS bisection -> FM boundary
// refinement -> uncoarsen. Weights are int64 (callers quantize).
// ==========================================================================

namespace {

struct Graph {
  int64_t n = 0;
  std::vector<int64_t> indptr;
  std::vector<int32_t> adj;
  std::vector<int64_t> w;       // edge weights
  std::vector<int64_t> vw;      // vertex weights (coarse vertices aggregate)
};

// Heavy-edge matching: returns coarse graph + fine->coarse map.
Graph hem_coarsen(const Graph& g, std::vector<int32_t>& map, std::mt19937& rng) {
  const int64_t n = g.n;
  std::vector<int32_t> match(n, -1);
  std::vector<int32_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = static_cast<int32_t>(i);
  std::shuffle(order.begin(), order.end(), rng);
  for (int32_t u : order) {
    if (match[u] != -1) continue;
    int64_t best_w = -1;
    int32_t best_v = -1;
    for (int64_t p = g.indptr[u]; p < g.indptr[u + 1]; ++p) {
      int32_t v = g.adj[p];
      if (v != u && match[v] == -1 && g.w[p] > best_w) {
        best_w = g.w[p];
        best_v = v;
      }
    }
    match[u] = (best_v >= 0) ? best_v : u;
    if (best_v >= 0) match[best_v] = u;
  }
  map.assign(n, -1);
  int32_t nc = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (map[i] != -1) continue;
    map[i] = nc;
    if (match[i] != static_cast<int32_t>(i)) map[match[i]] = nc;
    ++nc;
  }
  // contract
  Graph c;
  c.n = nc;
  c.vw.assign(nc, 0);
  for (int64_t i = 0; i < n; ++i) c.vw[map[i]] += g.vw[i];
  // bucket edges by coarse source, merge duplicates with a stamp array
  std::vector<std::vector<std::pair<int32_t, int64_t>>> rows(nc);
  for (int64_t u = 0; u < n; ++u) {
    int32_t cu = map[u];
    for (int64_t p = g.indptr[u]; p < g.indptr[u + 1]; ++p) {
      int32_t cv = map[g.adj[p]];
      if (cu != cv) rows[cu].emplace_back(cv, g.w[p]);
    }
  }
  c.indptr.assign(nc + 1, 0);
  for (int32_t u = 0; u < nc; ++u) {
    auto& r = rows[u];
    std::sort(r.begin(), r.end());
    size_t wpos = 0;
    for (size_t i = 0; i < r.size();) {
      int64_t sum = 0;
      size_t j = i;
      while (j < r.size() && r[j].first == r[i].first) sum += r[j++].second;
      r[wpos++] = {r[i].first, sum};
      i = j;
    }
    r.resize(wpos);
    c.indptr[u + 1] = c.indptr[u] + static_cast<int64_t>(wpos);
  }
  c.adj.resize(c.indptr[nc]);
  c.w.resize(c.indptr[nc]);
  for (int32_t u = 0; u < nc; ++u) {
    int64_t base = c.indptr[u];
    for (size_t i = 0; i < rows[u].size(); ++i) {
      c.adj[base + i] = rows[u][i].first;
      c.w[base + i] = rows[u][i].second;
    }
  }
  return c;
}

// Greedy BFS bisection into sides 0/1 targeting vertex-weight split
// target0 : (total - target0), then FM boundary refinement.
void bisect(const Graph& g, int64_t target0, std::vector<int8_t>& side,
            std::mt19937& rng) {
  const int64_t n = g.n;
  side.assign(n, 1);
  int64_t total = 0;
  for (int64_t i = 0; i < n; ++i) total += g.vw[i];
  // BFS-grow side 0 from a pseudo-peripheral seed
  int64_t w0 = 0;
  std::vector<uint8_t> vis(n, 0);
  std::uniform_int_distribution<int64_t> pick(0, n - 1);
  int64_t seed = pick(rng);
  std::queue<int32_t> q;
  q.push(static_cast<int32_t>(seed));
  vis[seed] = 1;
  while (w0 < target0) {
    if (q.empty()) {
      int64_t s = -1;
      for (int64_t i = 0; i < n; ++i)
        if (!vis[i]) { s = i; break; }
      if (s < 0) break;
      vis[s] = 1;
      q.push(static_cast<int32_t>(s));
    }
    int32_t u = q.front();
    q.pop();
    side[u] = 0;
    w0 += g.vw[u];
    for (int64_t p = g.indptr[u]; p < g.indptr[u + 1]; ++p) {
      int32_t v = g.adj[p];
      if (!vis[v]) { vis[v] = 1; q.push(v); }
    }
  }
  // FM refinement: a few passes of best-gain boundary moves under balance
  const int64_t lo0 = target0 - target0 / 16 - 1;
  const int64_t hi0 = target0 + target0 / 16 + 1;
  std::vector<int64_t> gain(n);
  for (int pass = 0; pass < 4; ++pass) {
    bool moved = false;
    for (int64_t u = 0; u < n; ++u) {
      int64_t ext = 0, in = 0;
      for (int64_t p = g.indptr[u]; p < g.indptr[u + 1]; ++p) {
        if (side[g.adj[p]] != side[u]) ext += g.w[p];
        else in += g.w[p];
      }
      gain[u] = ext - in;
      if (gain[u] > 0) {
        int64_t nw0 = w0 + (side[u] == 1 ? g.vw[u] : -g.vw[u]);
        if (nw0 >= lo0 && nw0 <= hi0) {
          side[u] = static_cast<int8_t>(1 - side[u]);
          w0 = nw0;
          moved = true;
        }
      }
    }
    if (!moved) break;
  }
}

// Extract the side-s subgraph with a local index map.
Graph subgraph(const Graph& g, const std::vector<int8_t>& side, int8_t s,
               std::vector<int64_t>& orig_of) {
  Graph h;
  std::vector<int32_t> loc(g.n, -1);
  orig_of.clear();
  for (int64_t i = 0; i < g.n; ++i)
    if (side[i] == s) {
      loc[i] = static_cast<int32_t>(orig_of.size());
      orig_of.push_back(i);
    }
  h.n = static_cast<int64_t>(orig_of.size());
  h.indptr.assign(h.n + 1, 0);
  h.vw.resize(h.n);
  for (int64_t i = 0; i < h.n; ++i) {
    int64_t u = orig_of[i];
    h.vw[i] = g.vw[u];
    int64_t deg = 0;
    for (int64_t p = g.indptr[u]; p < g.indptr[u + 1]; ++p)
      if (loc[g.adj[p]] >= 0) ++deg;
    h.indptr[i + 1] = h.indptr[i] + deg;
  }
  h.adj.resize(h.indptr[h.n]);
  h.w.resize(h.indptr[h.n]);
  for (int64_t i = 0; i < h.n; ++i) {
    int64_t u = orig_of[i];
    int64_t pos = h.indptr[i];
    for (int64_t p = g.indptr[u]; p < g.indptr[u + 1]; ++p)
      if (loc[g.adj[p]] >= 0) {
        h.adj[pos] = loc[g.adj[p]];
        h.w[pos] = g.w[p];
        ++pos;
      }
  }
  return h;
}

// Multilevel bisection: coarsen until small, bisect, project (maps compose).
void ml_bisect(const Graph& g, int64_t target0, std::vector<int8_t>& side,
               std::mt19937& rng) {
  if (g.n <= 64) {
    bisect(g, target0, side, rng);
    return;
  }
  std::vector<Graph> levels;
  std::vector<std::vector<int32_t>> maps;
  levels.push_back(g);
  while (levels.back().n > 64) {
    std::vector<int32_t> map;
    Graph c = hem_coarsen(levels.back(), map, rng);
    if (c.n >= levels.back().n * 9 / 10) break;  // stalled
    maps.push_back(std::move(map));
    levels.push_back(std::move(c));
  }
  std::vector<int8_t> cside;
  bisect(levels.back(), target0, cside, rng);
  // project back with FM refinement at each level
  for (int64_t l = static_cast<int64_t>(maps.size()) - 1; l >= 0; --l) {
    const Graph& fine = levels[l];
    std::vector<int8_t> fside(fine.n);
    for (int64_t i = 0; i < fine.n; ++i) fside[i] = cside[maps[l][i]];
    // re-balance/refine on the fine level
    int64_t w0 = 0;
    for (int64_t i = 0; i < fine.n; ++i)
      if (fside[i] == 0) w0 += fine.vw[i];
    const int64_t lo0 = target0 - target0 / 16 - 1;
    const int64_t hi0 = target0 + target0 / 16 + 1;
    for (int pass = 0; pass < 3; ++pass) {
      bool moved = false;
      for (int64_t u = 0; u < fine.n; ++u) {
        int64_t ext = 0, in = 0;
        for (int64_t p = fine.indptr[u]; p < fine.indptr[u + 1]; ++p) {
          if (fside[fine.adj[p]] != fside[u]) ext += fine.w[p];
          else in += fine.w[p];
        }
        bool balance_move =
            (fside[u] == 0 && w0 > hi0) || (fside[u] == 1 && w0 < lo0);
        if (ext > in || balance_move) {
          int64_t nw0 = w0 + (fside[u] == 1 ? fine.vw[u] : -fine.vw[u]);
          if ((nw0 >= lo0 && nw0 <= hi0) || balance_move) {
            fside[u] = static_cast<int8_t>(1 - fside[u]);
            w0 = nw0;
            moved = true;
          }
        }
      }
      if (!moved) break;
    }
    cside = std::move(fside);
  }
  side = std::move(cside);
}

// Recursive K-way driver.
void kway_recurse(const Graph& g, const std::vector<int64_t>& orig,
                  int64_t k, int32_t base, int32_t* part_out,
                  std::mt19937& rng) {
  if (k <= 1 || g.n == 0) {
    for (int64_t i = 0; i < g.n; ++i) part_out[orig[i]] = base;
    return;
  }
  int64_t k0 = k / 2;
  int64_t total = 0;
  for (int64_t i = 0; i < g.n; ++i) total += g.vw[i];
  int64_t target0 = total * k0 / k;
  std::vector<int8_t> side;
  ml_bisect(g, target0, side, rng);
  for (int8_t s = 0; s < 2; ++s) {
    std::vector<int64_t> sub_orig;
    Graph h = subgraph(g, side, s, sub_orig);
    std::vector<int64_t> horig(h.n);
    for (int64_t i = 0; i < h.n; ++i) horig[i] = orig[sub_orig[i]];
    kway_recurse(h, horig, s == 0 ? k0 : k - k0,
                 s == 0 ? base : base + static_cast<int32_t>(k0),
                 part_out, rng);
  }
}

}  // namespace

extern "C" {

// --------------------------------------------------------------------------
// K-way graph partition (multilevel recursive bisection). weights: int64
// edge weights aligned with indices (pass all-1s for unweighted). Returns k
// actually used (== k), or -1 on error. part_out[i] in [0, k).
// --------------------------------------------------------------------------
int64_t kway_partition(const int64_t* indptr, const int32_t* indices,
                       const int64_t* weights, int64_t n, int64_t k,
                       int32_t* part_out) {
  if (k <= 0 || n <= 0) return -1;
  Graph g;
  g.n = n;
  g.indptr.assign(indptr, indptr + n + 1);
  int64_t nnz = indptr[n];
  g.adj.assign(indices, indices + nnz);
  g.w.assign(weights, weights + nnz);
  g.vw.assign(n, 1);
  std::vector<int64_t> orig(n);
  for (int64_t i = 0; i < n; ++i) orig[i] = i;
  std::mt19937 rng(12345);
  kway_recurse(g, orig, k, 0, part_out, rng);
  return k;
}

}  // extern "C"


// ============================================================================
// Sparse matrix products for the AMG setup phase (the role AMGCL's built-in
// spgemm plays in the reference — AMGCL.cpp:148-184 rebuilds the hierarchy
// every factorize; scipy's single-threaded csr_matmat dominated our setup
// profile at 1M+ rows). Gustavson row-merge with stamp markers, row-parallel
// across threads. Results are staged in per-thread buffers and copied out via
// spgemm_fetch (two-call ctypes pattern — nnz(C) is unknown up front).
// ============================================================================

namespace {

struct SpgemmOut {
  std::vector<int64_t> rownnz;
  std::vector<int32_t> idx;
  std::vector<double> val;
};

// C rows [r0, r1) of  beta*S + alpha*A@B  (S optional, may be null).
void spgemm_rows(const int64_t* ipA, const int32_t* jA, const double* vA,
                 int64_t r0, int64_t r1, const int64_t* ipB,
                 const int32_t* jB, const double* vB, int64_t ncols,
                 double alpha, const int64_t* ipS, const int32_t* jS,
                 const double* vS, double beta, SpgemmOut* out) {
  std::vector<int64_t> marker(ncols, -1);
  std::vector<int64_t> pos(ncols);
  std::vector<std::pair<int32_t, double>> rowbuf;
  out->rownnz.assign(static_cast<size_t>(r1 - r0), 0);
  out->idx.clear();
  out->val.clear();
  // rough reserve: flops of the first row extrapolated, clamped
  out->idx.reserve(static_cast<size_t>((r1 - r0) * 8));
  out->val.reserve(static_cast<size_t>((r1 - r0) * 8));
  for (int64_t i = r0; i < r1; ++i) {
    const size_t rowstart = out->idx.size();
    if (ipS) {
      for (int64_t p = ipS[i]; p < ipS[i + 1]; ++p) {
        const int32_t c = jS[p];
        marker[c] = i;
        pos[c] = static_cast<int64_t>(out->idx.size());
        out->idx.push_back(c);
        out->val.push_back(beta * vS[p]);
      }
    }
    for (int64_t p = ipA[i]; p < ipA[i + 1]; ++p) {
      const int32_t a = jA[p];
      const double av = alpha * vA[p];
      for (int64_t q = ipB[a]; q < ipB[a + 1]; ++q) {
        const int32_t c = jB[q];
        if (marker[c] != i) {
          marker[c] = i;
          pos[c] = static_cast<int64_t>(out->idx.size());
          out->idx.push_back(c);
          out->val.push_back(av * vB[q]);
        } else {
          out->val[static_cast<size_t>(pos[c])] += av * vB[q];
        }
      }
    }
    const size_t rn = out->idx.size() - rowstart;
    if (rn > 1) {  // sorted columns: scipy downstream assumes canonical CSR
      rowbuf.resize(rn);
      for (size_t t = 0; t < rn; ++t)
        rowbuf[t] = {out->idx[rowstart + t], out->val[rowstart + t]};
      std::sort(rowbuf.begin(), rowbuf.end(),
                [](const std::pair<int32_t, double>& x,
                   const std::pair<int32_t, double>& y) {
                  return x.first < y.first;
                });
      for (size_t t = 0; t < rn; ++t) {
        out->idx[rowstart + t] = rowbuf[t].first;
        out->val[rowstart + t] = rowbuf[t].second;
      }
    }
    out->rownnz[static_cast<size_t>(i - r0)] = static_cast<int64_t>(rn);
  }
}

constexpr int kSpgemmMaxThreads = 8;
SpgemmOut g_spgemm_out[kSpgemmMaxThreads];
int g_spgemm_nt = 0;

}  // namespace

extern "C" {

// C = beta*S + alpha*A(m×·)@B(·×ncolsB). Pass ipS=nullptr to skip the S
// term. Writes indptrC (m+1); returns nnz(C) (fetch with spgemm_fetch) or -1.
int64_t spgemm_axpby(const int64_t* indptrA, const int32_t* indicesA,
                     const double* dataA, int64_t m, const int64_t* indptrB,
                     const int32_t* indicesB, const double* dataB,
                     int64_t ncolsB, double alpha, const int64_t* indptrS,
                     const int32_t* indicesS, const double* dataS, double beta,
                     int64_t* indptrC) {
  if (m < 0 || ncolsB < 0) return -1;
  unsigned hw = std::thread::hardware_concurrency();
  int nt = static_cast<int>(std::min<unsigned>(hw ? hw : 1, kSpgemmMaxThreads));
  if (m < 65536) nt = 1;  // marker alloc + spawn not worth it on small mats
  g_spgemm_nt = nt;
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; ++t) {
    const int64_t r0 = m * t / nt, r1 = m * (t + 1) / nt;
    if (t == nt - 1) {
      spgemm_rows(indptrA, indicesA, dataA, r0, r1, indptrB, indicesB, dataB,
                  ncolsB, alpha, indptrS, indicesS, dataS, beta,
                  &g_spgemm_out[t]);
    } else {
      pool.emplace_back(spgemm_rows, indptrA, indicesA, dataA, r0, r1,
                        indptrB, indicesB, dataB, ncolsB, alpha, indptrS,
                        indicesS, dataS, beta, &g_spgemm_out[t]);
    }
  }
  for (auto& th : pool) th.join();
  indptrC[0] = 0;
  int64_t at = 0;
  for (int t = 0; t < nt; ++t) {
    for (int64_t r : g_spgemm_out[t].rownnz) {
      indptrC[at + 1] = indptrC[at] + r;
      ++at;
    }
  }
  return indptrC[m];
}

int64_t spgemm(const int64_t* indptrA, const int32_t* indicesA,
               const double* dataA, int64_t m, const int64_t* indptrB,
               const int32_t* indicesB, const double* dataB, int64_t ncolsB,
               int64_t* indptrC) {
  return spgemm_axpby(indptrA, indicesA, dataA, m, indptrB, indicesB, dataB,
                      ncolsB, 1.0, nullptr, nullptr, nullptr, 0.0, indptrC);
}

// Copy the staged result of the last spgemm/spgemm_axpby call.
int spgemm_fetch(int32_t* indicesC, double* dataC) {
  if (g_spgemm_nt <= 0) return -1;
  size_t at = 0;
  for (int t = 0; t < g_spgemm_nt; ++t) {
    const SpgemmOut& o = g_spgemm_out[t];
    std::memcpy(indicesC + at, o.idx.data(), o.idx.size() * sizeof(int32_t));
    std::memcpy(dataC + at, o.val.data(), o.val.size() * sizeof(double));
    at += o.idx.size();
    g_spgemm_out[t] = SpgemmOut();  // release staging memory
  }
  g_spgemm_nt = 0;
  return 0;
}

// B = Aᵀ for CSR A (m×ncols): counting sort on columns; output rows come out
// with sorted (row-index) columns. Caller allocates indptrB (ncols+1),
// indicesB/dataB (nnz).
int csr_transpose(const int64_t* indptr, const int32_t* indices,
                  const double* data, int64_t m, int64_t ncols,
                  int64_t* indptrB, int32_t* indicesB, double* dataB) {
  const int64_t nnz = indptr[m];
  std::vector<int64_t> head(static_cast<size_t>(ncols) + 1, 0);
  for (int64_t p = 0; p < nnz; ++p) ++head[static_cast<size_t>(indices[p]) + 1];
  for (int64_t c = 0; c < ncols; ++c) head[c + 1] += head[c];
  std::memcpy(indptrB, head.data(), (static_cast<size_t>(ncols) + 1) * sizeof(int64_t));
  for (int64_t i = 0; i < m; ++i) {
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      const int64_t dst = head[indices[p]]++;
      indicesB[dst] = static_cast<int32_t>(i);
      dataB[dst] = data[p];
    }
  }
  return 0;
}

// --------------------------------------------------------------------------
// DIA packing (the device stencil fast path). dia_analyze marks the distinct
// diagonals straight off CSR (no COO materialization); returns K, or -1 when
// K would exceed cap (the ELL-fallback probe). csr_to_dia scatters values
// into the diag-major (K, n) layout; vals must arrive zero-initialized.
// --------------------------------------------------------------------------
int64_t dia_analyze(const int64_t* indptr, const int32_t* indices, int64_t n,
                    int64_t cap, int64_t* offs_out) {
  if (n <= 0) return 0;
  std::vector<uint8_t> seen(static_cast<size_t>(2 * n - 1), 0);
  for (int64_t i = 0; i < n; ++i)
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p)
      seen[static_cast<size_t>(indices[p] - i + n - 1)] = 1;
  int64_t k = 0;
  for (int64_t s = 0; s < 2 * n - 1; ++s) {
    if (seen[s]) {
      if (k >= cap) return -1;
      offs_out[k++] = s - (n - 1);
    }
  }
  return k;
}

int csr_to_dia(const int64_t* indptr, const int32_t* indices,
               const double* data, int64_t n, const int64_t* offs, int64_t K,
               double* vals) {
  std::vector<int32_t> lut(static_cast<size_t>(2 * n - 1), -1);
  for (int64_t k = 0; k < K; ++k)
    lut[static_cast<size_t>(offs[k] + n - 1)] = static_cast<int32_t>(k);
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      const int32_t k = lut[static_cast<size_t>(indices[p] - i + n - 1)];
      if (k < 0) return -1;
      vals[static_cast<int64_t>(k) * n + i] += data[p];
    }
  }
  return 0;
}


// --------------------------------------------------------------------------
// Composite tile-ELL packer (polysolve_tpu/ops/tile_ell.py).
//
// First-fit slot assignment with a per-dest-lane monotone cursor: rows map
// to lanes of 128-row tiles; each slot-row carries a per-source-lane segment
// map; two entries conflict in a slot-row only if they need different
// segments from the same source lane. Tiles split into window groups whose
// segment span fits one 128-row x window. Two-phase (plan stages the
// placement; fetch fills caller arrays) — serialize plan+fetch on the
// Python side like spgemm.
// --------------------------------------------------------------------------

}  // extern "C"

namespace {
struct TilePlan {
  std::vector<int32_t> chunk_of;  // per nnz
  std::vector<int8_t> srow_of;    // per nnz (< CR <= 127)
  std::vector<int8_t> q8;         // TC*CR*128, chunk-major
  std::vector<int32_t> wb;        // TC
  std::vector<int32_t> tile_of;   // TC
  int64_t cr = 0;
};
TilePlan g_tile_plan;
}  // namespace

extern "C" {

// Returns total chunk count TC, or -1. span_cap: max (segment - window
// base); window bases are 8-aligned, so pass <= 120 for 128-row windows.
int64_t tile_ell_plan(const int64_t* indptr, const int32_t* indices,
                      int64_t n, int64_t cr, int64_t span_cap) {
  constexpr int L = 128;
  if (n < 0 || cr <= 0 || cr > 128) return -1;
  auto& P = g_tile_plan;
  P.cr = cr;
  const int64_t nnz = indptr[n];
  P.chunk_of.assign(static_cast<size_t>(nnz), -1);
  P.srow_of.assign(static_cast<size_t>(nnz), 0);
  P.q8.clear();
  P.wb.clear();
  P.tile_of.clear();
  const int64_t TR = (n + L - 1) / L;

  struct Ent {
    int32_t seg;
    int32_t lane;
    int64_t p;
  };
  std::vector<Ent> ent;
  std::vector<int16_t> qmap;   // nslots*L, -1 = unset
  std::vector<uint8_t> used;   // nslots*L
  std::vector<int32_t> cursor(L);

  for (int64_t t = 0; t < TR; ++t) {
    const int64_t r0 = t * L, r1 = std::min(n, (t + 1) * L);
    const int64_t lo = indptr[r0], hi = indptr[r1];
    if (hi == lo) {  // empty tile keeps one zero chunk (output pipeline)
      P.q8.resize(P.q8.size() + static_cast<size_t>(cr) * L, 0);
      P.wb.push_back(0);
      P.tile_of.push_back(static_cast<int32_t>(t));
      continue;
    }
    ent.clear();
    ent.reserve(static_cast<size_t>(hi - lo));
    for (int64_t r = r0; r < r1; ++r)
      for (int64_t p = indptr[r]; p < indptr[r + 1]; ++p)
        ent.push_back({indices[p] / L, static_cast<int32_t>(r - r0), p});
    std::stable_sort(ent.begin(), ent.end(),
                     [](const Ent& a, const Ent& b) { return a.seg < b.seg; });

    size_t i = 0;
    while (i < ent.size()) {
      const int32_t base = ent[i].seg - (ent[i].seg % 8);
      size_t j = i;
      while (j < ent.size() && ent[j].seg - base <= span_cap) ++j;

      const size_t chunk_base = P.wb.size();
      int nslots = 0;
      qmap.clear();
      used.clear();
      std::fill(cursor.begin(), cursor.end(), 0);
      for (size_t e = i; e < j; ++e) {
        const int l = ent[e].lane;
        const int rho = indices[ent[e].p] % L;
        const int16_t sloc = static_cast<int16_t>(ent[e].seg - base);
        int s = cursor[l];
        for (;; ++s) {
          if (s >= nslots) {
            qmap.resize(qmap.size() + L, -1);
            used.resize(used.size() + L, 0);
            ++nslots;
          }
          int16_t& q = qmap[static_cast<size_t>(s) * L + rho];
          if (!used[static_cast<size_t>(s) * L + l] &&
              (q == -1 || q == sloc)) {
            used[static_cast<size_t>(s) * L + l] = 1;
            q = sloc;
            P.chunk_of[ent[e].p] =
                static_cast<int32_t>(chunk_base + s / cr);
            P.srow_of[ent[e].p] = static_cast<int8_t>(s % cr);
            cursor[l] = s;
            break;
          }
        }
      }
      const int nch = static_cast<int>((nslots + cr - 1) / cr);
      const size_t q8_base = P.q8.size();
      P.q8.resize(q8_base + static_cast<size_t>(nch) * cr * L, 0);
      for (int s = 0; s < nslots; ++s)
        for (int z = 0; z < L; ++z) {
          const int16_t v = qmap[static_cast<size_t>(s) * L + z];
          P.q8[q8_base + static_cast<size_t>(s) * L + z] =
              static_cast<int8_t>(v < 0 ? 0 : v);
        }
      for (int c = 0; c < nch; ++c) {
        P.wb.push_back(base);
        P.tile_of.push_back(static_cast<int32_t>(t));
      }
      i = j;
    }
  }
  return static_cast<int64_t>(P.wb.size());
}

// Fills caller-allocated arrays from the staged plan: vals/r8 are
// (TC, CR, 128) zero-initialized by the caller; q8/wb/tile_of copied whole.
int tile_ell_fetch(const int64_t* indptr, const int32_t* indices,
                   const double* data, int64_t n, double* vals, int8_t* r8,
                   int8_t* q8, int32_t* wb, int32_t* tile_of) {
  constexpr int L = 128;
  auto& P = g_tile_plan;
  const int64_t cr = P.cr;
  if (cr <= 0) return -1;
  for (int64_t r = 0; r < n; ++r) {
    const int l = static_cast<int>(r % L);
    for (int64_t p = indptr[r]; p < indptr[r + 1]; ++p) {
      const size_t off =
          (static_cast<size_t>(P.chunk_of[p]) * cr + P.srow_of[p]) * L + l;
      vals[off] = data[p];
      r8[off] = static_cast<int8_t>(indices[p] % L);
    }
  }
  std::copy(P.q8.begin(), P.q8.end(), q8);
  std::copy(P.wb.begin(), P.wb.end(), wb);
  std::copy(P.tile_of.begin(), P.tile_of.end(), tile_of);
  // release staging
  TilePlan().chunk_of.swap(P.chunk_of);
  TilePlan().srow_of.swap(P.srow_of);
  TilePlan().q8.swap(P.q8);
  return 0;
}


// --------------------------------------------------------------------------
// Supertile composite tile-ELL packer v2 (ops/tile_ell.py kernel v2):
// chunks of CR slot-rows serve ST consecutive 128-row dest tiles (one
// shared x window + one gather per chunk); each slot-row is tagged with a
// single dest tile, reduced on-device by an MXU one-hot matmul. Group
// tails round to CR once per SUPERTILE-group instead of per tile-group —
// the padding fix for FEM tiles with only ~50 slot-rows of work.
// --------------------------------------------------------------------------

}  // extern "C"

namespace {
struct TilePlan2 {
  std::vector<int32_t> chunk_of;  // per nnz
  std::vector<int16_t> srow_of;   // per nnz (< CR <= 128)
  std::vector<uint8_t> which_q;   // per nnz: 0 = qmap A, 1 = qmap B
  std::vector<int8_t> q8;         // TC*CR*128 chunk-major (slot-row major)
  std::vector<int8_t> q8b;        // TC*CR*128 second segment map (nqm=2)
  std::vector<int8_t> oh;         // TC*ST*CR one-hot dest-tile rows
  std::vector<int32_t> wb;        // TC
  std::vector<int32_t> super_of;  // TC
  int64_t cr = 0, st = 0, nqm = 1;
};
TilePlan2 g_tile_plan2;
}  // namespace

extern "C" {

// Returns total chunk count TC or -1. st = dest tiles per supertile
// (multiple of 8), cr = slot-rows per chunk, span_cap <= 120.
int64_t tile_ell_plan2(const int64_t* indptr, const int32_t* indices,
                       int64_t n, int64_t cr, int64_t st, int64_t span_cap,
                       int64_t nqm) {
  constexpr int L = 128;
  if (n < 0 || cr <= 0 || cr > 128 || st <= 0 || st > 127) return -1;
  if (nqm < 1 || nqm > 2) return -1;
  auto& P = g_tile_plan2;
  P.cr = cr;
  P.st = st;
  P.nqm = nqm;
  const int64_t nnz = indptr[n];
  P.chunk_of.assign(static_cast<size_t>(nnz), -1);
  P.srow_of.assign(static_cast<size_t>(nnz), 0);
  P.which_q.assign(static_cast<size_t>(nnz), 0);
  P.q8.clear();
  P.q8b.clear();
  P.oh.clear();
  P.wb.clear();
  P.super_of.clear();
  const int64_t rows_per_super = st * L;
  const int64_t NS = (n + rows_per_super - 1) / rows_per_super;

  struct Ent {
    int32_t seg;
    int16_t lane;
    int16_t dt;
    int64_t p;
  };
  std::vector<Ent> ent;
  std::vector<int16_t> qmap;   // nslots*L, -1 unset
  std::vector<int16_t> qmapB;  // second segment map per slot-row (nqm=2)
  std::vector<uint8_t> used;   // nslots*L
  std::vector<int16_t> sdt;    // dest tile per slot-row
  std::vector<int32_t> cursor(static_cast<size_t>(st) * L);

  for (int64_t S = 0; S < NS; ++S) {
    const int64_t r0 = S * rows_per_super, r1 = std::min(n, r0 + rows_per_super);
    const int64_t lo = indptr[r0], hi = indptr[r1];
    if (hi == lo) {  // empty supertile: one zero chunk
      P.q8.resize(P.q8.size() + static_cast<size_t>(cr) * L, 0);
      P.q8b.resize(P.q8b.size() + static_cast<size_t>(cr) * L, 0);
      P.oh.resize(P.oh.size() + static_cast<size_t>(st) * cr, 0);
      P.wb.push_back(0);
      P.super_of.push_back(static_cast<int32_t>(S));
      continue;
    }
    ent.clear();
    ent.reserve(static_cast<size_t>(hi - lo));
    for (int64_t r = r0; r < r1; ++r)
      for (int64_t p = indptr[r]; p < indptr[r + 1]; ++p)
        ent.push_back({indices[p] / L, static_cast<int16_t>(r % L),
                       static_cast<int16_t>((r - r0) / L), p});
    std::stable_sort(ent.begin(), ent.end(),
                     [](const Ent& a, const Ent& b) { return a.seg < b.seg; });

    size_t i = 0;
    while (i < ent.size()) {
      const int32_t base = ent[i].seg - (ent[i].seg % 8);
      size_t j = i;
      while (j < ent.size() && ent[j].seg - base <= span_cap) ++j;

      const size_t chunk_base = P.wb.size();
      int nslots = 0;
      qmap.clear();
      qmapB.clear();
      used.clear();
      sdt.clear();
      std::fill(cursor.begin(), cursor.end(), 0);
      for (size_t e = i; e < j; ++e) {
        const int l = ent[e].lane;
        const int dt = ent[e].dt;
        const int rho = indices[ent[e].p] % L;
        const int16_t sloc = static_cast<int16_t>(ent[e].seg - base);
        int s = cursor[static_cast<size_t>(dt) * L + l];
        for (;; ++s) {
          if (s >= nslots) {
            qmap.resize(qmap.size() + L, -1);
            qmapB.resize(qmapB.size() + L, -1);
            used.resize(used.size() + L, 0);
            sdt.push_back(static_cast<int16_t>(dt));
            ++nslots;
          }
          if (sdt[s] != dt) continue;
          if (used[static_cast<size_t>(s) * L + l]) continue;
          int16_t& qa = qmap[static_cast<size_t>(s) * L + rho];
          int16_t& qb = qmapB[static_cast<size_t>(s) * L + rho];
          int pick = -1;
          if (qa == -1 || qa == sloc) pick = 0;
          else if (nqm > 1 && (qb == -1 || qb == sloc)) pick = 1;
          if (pick >= 0) {
            used[static_cast<size_t>(s) * L + l] = 1;
            (pick == 0 ? qa : qb) = sloc;
            P.chunk_of[ent[e].p] =
                static_cast<int32_t>(chunk_base + s / cr);
            P.srow_of[ent[e].p] = static_cast<int16_t>(s % cr);
            P.which_q[ent[e].p] = static_cast<uint8_t>(pick);
            cursor[static_cast<size_t>(dt) * L + l] = s;
            break;
          }
        }
      }
      const int nch = static_cast<int>((nslots + cr - 1) / cr);
      const size_t q8_base = P.q8.size();
      P.q8.resize(q8_base + static_cast<size_t>(nch) * cr * L, 0);
      P.q8b.resize(q8_base + static_cast<size_t>(nch) * cr * L, 0);
      const size_t oh_base = P.oh.size();
      P.oh.resize(oh_base + static_cast<size_t>(nch) * st * cr, 0);
      for (int s = 0; s < nslots; ++s) {
        for (int z = 0; z < L; ++z) {
          const int16_t va = qmap[static_cast<size_t>(s) * L + z];
          const int16_t vb = qmapB[static_cast<size_t>(s) * L + z];
          P.q8[q8_base + static_cast<size_t>(s) * L + z] =
              static_cast<int8_t>(va < 0 ? 0 : va);
          P.q8b[q8_base + static_cast<size_t>(s) * L + z] =
              static_cast<int8_t>(vb < 0 ? 0 : vb);
        }
        const int c = s / cr, sr = s % cr;
        P.oh[oh_base + (static_cast<size_t>(c) * st + sdt[s]) * cr + sr] = 1;
      }
      for (int c = 0; c < nch; ++c) {
        P.wb.push_back(base);
        P.super_of.push_back(static_cast<int32_t>(S));
      }
      i = j;
    }
  }
  return static_cast<int64_t>(P.wb.size());
}

// r8 carries the source lane in bits 0-6 and the qmap select in bit 7
// (nqm=2); q8b receives the second segment map.
int tile_ell_fetch2(const int64_t* indptr, const int32_t* indices,
                    const double* data, int64_t n, double* vals, int8_t* r8,
                    int8_t* q8, int8_t* q8b, int8_t* oh, int32_t* wb,
                    int32_t* super_of) {
  constexpr int L = 128;
  auto& P = g_tile_plan2;
  const int64_t cr = P.cr;
  if (cr <= 0) return -1;
  for (int64_t r = 0; r < n; ++r) {
    const int l = static_cast<int>(r % L);
    for (int64_t p = indptr[r]; p < indptr[r + 1]; ++p) {
      if (P.chunk_of[p] < 0) return -2;  // unplaced entry (plan bug)
      const size_t off =
          (static_cast<size_t>(P.chunk_of[p]) * cr + P.srow_of[p]) * L + l;
      vals[off] += data[p];
      r8[off] = static_cast<int8_t>((indices[p] % L) |
                                    (P.which_q[p] ? 0x80 : 0));
    }
  }
  std::copy(P.q8.begin(), P.q8.end(), q8);
  std::copy(P.q8b.begin(), P.q8b.end(), q8b);
  std::copy(P.oh.begin(), P.oh.end(), oh);
  std::copy(P.wb.begin(), P.wb.end(), wb);
  std::copy(P.super_of.begin(), P.super_of.end(), super_of);
  TilePlan2 empty;
  empty.chunk_of.swap(P.chunk_of);
  empty.srow_of.swap(P.srow_of);
  empty.which_q.swap(P.which_q);
  empty.q8.swap(P.q8);
  empty.q8b.swap(P.q8b);
  empty.oh.swap(P.oh);
  return 0;
}

// --------------------------------------------------------------------------
// Supertile composite tile-ELL packer v3 (ops/tile_ell.py): ROLLING-window
// slot-rows instead of fixed segment groups. Slot-rows carry ABSOLUTE
// segment maps and an individual span cap; chunks are cut at CR slot-rows
// (or when a slot-row's max segment leaves the 127-segment window of the
// chunk's 8-aligned base). v2's per-(group, supertile) CR tail rounding
// (2-4x padding at CR=128 on FEM bands) disappears: tails occur only at
// supertile boundaries and span breaks, and entries near old group
// boundaries now share slot-rows with their neighbors (less lane
// imbalance). Same kernel contract as v2: chunks sorted by supertile, one
// shared x window (wb) + one dest-tile one-hot per chunk, nqm=1.
// --------------------------------------------------------------------------

}  // extern "C"

namespace {
struct TilePlan3 {
  std::vector<int32_t> chunk_of;  // per nnz
  std::vector<int16_t> srow_of;   // per nnz (< CR <= 128)
  std::vector<int8_t> q8;         // TC*CR*128 chunk-major (slot-row major)
  std::vector<int8_t> oh;         // TC*ST*CR one-hot dest-tile rows
  std::vector<int32_t> wb;        // TC
  std::vector<int32_t> super_of;  // TC
  int64_t cr = 0, st = 0;
};
TilePlan3 g_tile_plan3;
}  // namespace

extern "C" {

// Returns total chunk count TC or -1. span_cap <= 120 bounds a single
// slot-row's segment span from its own 8-aligned min (chunk windows use
// the full 127 from the chunk base).
int64_t tile_ell_plan3(const int64_t* indptr, const int32_t* indices,
                       int64_t n, int64_t cr, int64_t st, int64_t span_cap,
                       int64_t bs) {
  constexpr int L = 128;
  if (n < 0 || cr <= 0 || cr > 128 || st <= 0 || st > 127) return -1;
  if (span_cap < 8 || span_cap > 120) return -1;
  if (bs < 1 || bs > 8) return -1;
  auto& P = g_tile_plan3;
  P.cr = cr;
  P.st = st;
  const int64_t nnz = indptr[n];
  P.chunk_of.assign(static_cast<size_t>(nnz), -1);
  P.srow_of.assign(static_cast<size_t>(nnz), 0);
  P.q8.clear();
  P.oh.clear();
  P.wb.clear();
  P.super_of.clear();
  const int64_t rows_per_super = st * L;
  const int64_t NS = (n + rows_per_super - 1) / rows_per_super;

  struct Ent {
    int32_t seg;
    int16_t lane;
    int16_t dt;
    int64_t p;
  };
  std::vector<Ent> ent;
  std::vector<int32_t> slot_loc;             // per supertile entry: slot id
  std::vector<int32_t> qmap;                 // nslots*L abs segment, -1 unset
  std::vector<uint8_t> used;                 // nslots*L
  std::vector<int16_t> s_dt;                 // dest tile per slot
  std::vector<int32_t> s_min, s_max;         // slot segment span
  std::vector<std::vector<int32_t>> per_dt(static_cast<size_t>(st));
  std::vector<int32_t> open_lo(static_cast<size_t>(st));
  std::vector<int32_t> cursor(static_cast<size_t>(st) * L);
  std::vector<int32_t> s_chunk, s_srow;      // per slot after chunk cut

  const auto align8 = [](int32_t x) { return x - (x % 8); };

  for (int64_t S = 0; S < NS; ++S) {
    const int64_t r0 = S * rows_per_super, r1 = std::min(n, r0 + rows_per_super);
    const int64_t lo = indptr[r0], hi = indptr[r1];
    if (hi == lo) {  // empty supertile: bs zero chunks (one superchunk)
      P.q8.resize(P.q8.size() + static_cast<size_t>(bs) * cr * L, 0);
      P.oh.resize(P.oh.size() + static_cast<size_t>(bs) * st * cr, 0);
      for (int64_t b = 0; b < bs; ++b) {
        P.wb.push_back(0);
        P.super_of.push_back(static_cast<int32_t>(S));
      }
      continue;
    }
    ent.clear();
    ent.reserve(static_cast<size_t>(hi - lo));
    for (int64_t r = r0; r < r1; ++r)
      for (int64_t p = indptr[r]; p < indptr[r + 1]; ++p)
        ent.push_back({indices[p] / L, static_cast<int16_t>(r % L),
                       static_cast<int16_t>((r - r0) / L), p});
    std::stable_sort(ent.begin(), ent.end(),
                     [](const Ent& a, const Ent& b) { return a.seg < b.seg; });

    slot_loc.assign(ent.size(), -1);
    qmap.clear();
    used.clear();
    s_dt.clear();
    s_min.clear();
    s_max.clear();
    for (auto& v : per_dt) v.clear();
    std::fill(open_lo.begin(), open_lo.end(), 0);
    std::fill(cursor.begin(), cursor.end(), 0);

    for (size_t e = 0; e < ent.size(); ++e) {
      const int l = ent[e].lane;
      const int dt = ent[e].dt;
      const int rho = indices[ent[e].p] % L;
      const int32_t seg = ent[e].seg;
      auto& vec = per_dt[static_cast<size_t>(dt)];
      // prune slots whose span window can no longer reach seg
      int32_t& olo = open_lo[static_cast<size_t>(dt)];
      while (olo < static_cast<int32_t>(vec.size()) &&
             seg > align8(s_min[vec[olo]]) + span_cap)
        ++olo;
      int32_t k = std::max(cursor[static_cast<size_t>(dt) * L + l], olo);
      for (;; ++k) {
        int32_t sid;
        if (k == static_cast<int32_t>(vec.size())) {  // new slot
          sid = static_cast<int32_t>(s_dt.size());
          vec.push_back(sid);
          s_dt.push_back(static_cast<int16_t>(dt));
          s_min.push_back(seg);
          s_max.push_back(seg);
          qmap.resize(qmap.size() + L, -1);
          used.resize(used.size() + L, 0);
        } else {
          sid = vec[k];
          if (seg > align8(s_min[sid]) + span_cap) continue;  // closed
          if (used[static_cast<size_t>(sid) * L + l]) continue;
          const int32_t q = qmap[static_cast<size_t>(sid) * L + rho];
          if (q != -1 && q != seg) continue;
        }
        used[static_cast<size_t>(sid) * L + l] = 1;
        qmap[static_cast<size_t>(sid) * L + rho] = seg;
        if (seg > s_max[sid]) s_max[sid] = seg;
        slot_loc[e] = sid;
        cursor[static_cast<size_t>(dt) * L + l] = k;
        break;
      }
    }

    // chunk cut: slots in creation order (s_min nondecreasing); bs
    // consecutive chunks form a SUPERCHUNK sharing one x window (wb) —
    // the kernel processes a whole superchunk per grid step
    const int32_t nslots = static_cast<int32_t>(s_dt.size());
    const size_t chunk_base = P.wb.size();
    s_chunk.assign(nslots, 0);
    s_srow.assign(nslots, 0);
    int32_t nch = 0, count = static_cast<int32_t>(cr), base = 0;
    int32_t chunk_in_sc = static_cast<int32_t>(bs);
    bool have_sc = false;
    for (int32_t sid = 0; sid < nslots; ++sid) {
      const bool window_break = have_sc && (s_max[sid] - base > 127);
      if (count == static_cast<int32_t>(cr) || window_break) {
        if (!have_sc || window_break ||
            chunk_in_sc == static_cast<int32_t>(bs)) {
          // close the current superchunk (pad to bs chunks) and open a new
          while (have_sc && chunk_in_sc < static_cast<int32_t>(bs)) {
            P.wb.push_back(base);
            P.super_of.push_back(static_cast<int32_t>(S));
            ++nch;
            ++chunk_in_sc;
          }
          base = align8(s_min[sid]);
          chunk_in_sc = 0;
          have_sc = true;
        }
        P.wb.push_back(base);
        P.super_of.push_back(static_cast<int32_t>(S));
        ++nch;
        ++chunk_in_sc;
        count = 0;
      }
      s_chunk[sid] = nch - 1;
      s_srow[sid] = count++;
    }
    while (have_sc && chunk_in_sc < static_cast<int32_t>(bs)) {
      P.wb.push_back(base);
      P.super_of.push_back(static_cast<int32_t>(S));
      ++nch;
      ++chunk_in_sc;
    }
    const size_t q8_base = P.q8.size();
    P.q8.resize(q8_base + static_cast<size_t>(nch) * cr * L, 0);
    const size_t oh_base = P.oh.size();
    P.oh.resize(oh_base + static_cast<size_t>(nch) * st * cr, 0);
    for (int32_t sid = 0; sid < nslots; ++sid) {
      const int32_t cb = P.wb[chunk_base + s_chunk[sid]];
      const size_t row =
          (static_cast<size_t>(s_chunk[sid]) * cr + s_srow[sid]) * L;
      for (int z = 0; z < L; ++z) {
        const int32_t q = qmap[static_cast<size_t>(sid) * L + z];
        P.q8[q8_base + row + z] = static_cast<int8_t>(q < 0 ? 0 : q - cb);
      }
      P.oh[oh_base +
           (static_cast<size_t>(s_chunk[sid]) * st + s_dt[sid]) * cr +
           s_srow[sid]] = 1;
    }
    for (size_t e = 0; e < ent.size(); ++e) {
      const int32_t sid = slot_loc[e];
      P.chunk_of[ent[e].p] =
          static_cast<int32_t>(chunk_base + s_chunk[sid]);
      P.srow_of[ent[e].p] = static_cast<int16_t>(s_srow[sid]);
    }
  }
  return static_cast<int64_t>(P.wb.size());
}

int tile_ell_fetch3(const int64_t* indptr, const int32_t* indices,
                    const double* data, int64_t n, double* vals, int8_t* r8,
                    int8_t* q8, int8_t* oh, int32_t* wb, int32_t* super_of) {
  constexpr int L = 128;
  auto& P = g_tile_plan3;
  const int64_t cr = P.cr;
  if (cr <= 0) return -1;
  for (int64_t r = 0; r < n; ++r) {
    const int l = static_cast<int>(r % L);
    for (int64_t p = indptr[r]; p < indptr[r + 1]; ++p) {
      if (P.chunk_of[p] < 0) return -2;  // unplaced entry (plan bug)
      const size_t off =
          (static_cast<size_t>(P.chunk_of[p]) * cr + P.srow_of[p]) * L + l;
      vals[off] += data[p];
      r8[off] = static_cast<int8_t>(indices[p] % L);
    }
  }
  std::copy(P.q8.begin(), P.q8.end(), q8);
  std::copy(P.oh.begin(), P.oh.end(), oh);
  std::copy(P.wb.begin(), P.wb.end(), wb);
  std::copy(P.super_of.begin(), P.super_of.end(), super_of);
  TilePlan3 empty;
  empty.chunk_of.swap(P.chunk_of);
  empty.srow_of.swap(P.srow_of);
  empty.q8.swap(P.q8);
  empty.oh.swap(P.oh);
  return 0;
}

}  // extern "C"
