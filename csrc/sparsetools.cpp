// sparsetools — native host-side sparse-pattern toolkit.
//
// The reference delegates its combinatorial sparse work to native code
// (SuiteSparse's AMD/coloring inside KLU/UMFPACK, SparseMatrixColorings'
// compiled Julia; SURVEY.md §2.9).  This library is the TPU build's
// equivalent: the symbolic, pattern-level passes that run ONCE per problem
// on the host — graph coloring for compressed Jacobians, bandwidth-reducing
// orderings for DIA/banded layouts, and ELL layout planning — implemented in
// C++ because they are pointer-chasing loops Python executes ~100-1000×
// slower (a 512² Brusselator pattern has 3.1M nnz; the pure-Python greedy
// coloring takes minutes, this takes milliseconds).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in-image).
// All index arrays are int32 CSR (indptr[n_rows+1], indices[nnz]).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

extern "C" {

// Greedy distance-2 column coloring: columns j,k conflict iff they share a
// row (the partial-coloring used for column-compressed Jacobians — same
// algorithm family as SparseMatrixColorings.GreedyColoringAlgorithm).
// Returns the number of colors, or -1 on error.  colors: out, n_cols.
int32_t greedy_column_coloring(
    const int32_t* indptr, const int32_t* indices,
    int32_t n_rows, int32_t n_cols, int32_t* colors) {
  if (n_rows < 0 || n_cols < 0) return -1;
  const int64_t nnz = indptr[n_rows];

  // Build column -> nnz range via a CSC-style transpose of the pattern.
  std::vector<int32_t> col_counts(n_cols, 0);
  for (int64_t k = 0; k < nnz; ++k) col_counts[indices[k]]++;
  std::vector<int64_t> col_ptr(n_cols + 1, 0);
  for (int32_t j = 0; j < n_cols; ++j)
    col_ptr[j + 1] = col_ptr[j] + col_counts[j];
  std::vector<int32_t> col_rows(nnz);
  {
    std::vector<int64_t> cursor(col_ptr.begin(), col_ptr.end() - 1);
    for (int32_t i = 0; i < n_rows; ++i)
      for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k)
        col_rows[cursor[indices[k]]++] = i;
  }

  std::fill(colors, colors + n_cols, -1);
  // forbidden[c] == j marks color c as used by a distance-2 neighbor of j.
  std::vector<int32_t> forbidden(n_cols, -1);
  int32_t n_colors = 0;
  for (int32_t j = 0; j < n_cols; ++j) {
    for (int64_t k = col_ptr[j]; k < col_ptr[j + 1]; ++k) {
      const int32_t row = col_rows[k];
      for (int64_t m = indptr[row]; m < indptr[row + 1]; ++m) {
        const int32_t other = indices[m];
        const int32_t c = colors[other];
        if (c >= 0) forbidden[c] = j;
      }
    }
    int32_t c = 0;
    while (c < n_cols && forbidden[c] == j) ++c;
    colors[j] = c;
    if (c + 1 > n_colors) n_colors = c + 1;
  }
  return n_colors;
}

// Reverse Cuthill-McKee ordering on the symmetrized pattern — bandwidth
// reduction so general sparse systems become DIA/banded-friendly (the
// fill-reducing-ordering role AMD plays inside the reference's KLU path).
// perm: out, n (new ordering: perm[new_index] = old_index).
int32_t rcm_ordering(
    const int32_t* indptr, const int32_t* indices, int32_t n, int32_t* perm) {
  if (n < 0) return -1;
  const int64_t nnz = indptr[n];
  // Symmetrize adjacency (pattern of A + Aᵀ), dropping diagonal.
  std::vector<std::vector<int32_t>> adj(n);
  for (int32_t i = 0; i < n; ++i)
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      const int32_t j = indices[k];
      if (j == i || j < 0 || j >= n) continue;
      adj[i].push_back(j);
      adj[j].push_back(i);
    }
  std::vector<int32_t> degree(n);
  for (int32_t i = 0; i < n; ++i) {
    auto& a = adj[i];
    std::sort(a.begin(), a.end());
    a.erase(std::unique(a.begin(), a.end()), a.end());
    degree[i] = static_cast<int32_t>(a.size());
  }

  std::vector<char> visited(n, 0);
  int64_t out = 0;
  std::vector<int32_t> order;
  order.reserve(n);
  for (;;) {
    // next unvisited vertex of minimum degree (pseudo-peripheral-ish seed)
    int32_t seed = -1;
    for (int32_t i = 0; i < n; ++i)
      if (!visited[i] && (seed < 0 || degree[i] < degree[seed])) seed = i;
    if (seed < 0) break;
    // BFS with neighbors sorted by increasing degree (Cuthill-McKee)
    std::queue<int32_t> q;
    q.push(seed);
    visited[seed] = 1;
    while (!q.empty()) {
      const int32_t v = q.front();
      q.pop();
      order.push_back(v);
      std::vector<int32_t> nbrs;
      for (int32_t w : adj[v])
        if (!visited[w]) nbrs.push_back(w);
      std::sort(nbrs.begin(), nbrs.end(),
                [&](int32_t a, int32_t b) { return degree[a] < degree[b]; });
      for (int32_t w : nbrs) {
        visited[w] = 1;
        q.push(w);
      }
    }
  }
  // reverse
  for (int32_t i = 0; i < n; ++i) perm[i] = order[n - 1 - i];
  (void)out;
  (void)nnz;
  return 0;
}

// ELL layout plan: max row width, plus per-slot (column index, source nnz
// permutation, validity) for CSR→ELL padding without Python loops.
// cols/perm/valid are out arrays of size n_rows*width; call once with
// width=0 to query the width (returned).
int32_t ell_plan(
    const int32_t* indptr, const int32_t* indices, int32_t n_rows,
    int32_t width, int32_t* cols, int64_t* perm, int8_t* valid) {
  int32_t maxw = 0;
  for (int32_t i = 0; i < n_rows; ++i) {
    const int32_t w = static_cast<int32_t>(indptr[i + 1] - indptr[i]);
    if (w > maxw) maxw = w;
  }
  if (width == 0) return maxw;
  if (width < maxw) return -1;
  for (int32_t i = 0; i < n_rows; ++i) {
    int32_t slot = 0;
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k, ++slot) {
      cols[static_cast<int64_t>(i) * width + slot] = indices[k];
      perm[static_cast<int64_t>(i) * width + slot] = k;
      valid[static_cast<int64_t>(i) * width + slot] = 1;
    }
    for (; slot < width; ++slot) {
      cols[static_cast<int64_t>(i) * width + slot] = 0;
      perm[static_cast<int64_t>(i) * width + slot] = 0;
      valid[static_cast<int64_t>(i) * width + slot] = 0;
    }
  }
  return maxw;
}

// Distinct diagonal offsets of a square CSR pattern (for DIA conversion).
// offsets: out, capacity n_offsets_cap; returns the count (or -1 if it
// exceeds the capacity).
int32_t band_offsets(
    const int32_t* indptr, const int32_t* indices, int32_t n,
    int32_t* offsets, int32_t n_offsets_cap) {
  if (n <= 0) return n == 0 ? 0 : -1;
  std::vector<char> seen(2 * static_cast<int64_t>(n) - 1, 0);
  for (int32_t i = 0; i < n; ++i)
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      const int32_t j = indices[k];
      if (j < 0 || j >= n) return -1;  // malformed pattern: no OOB scatter
      seen[static_cast<int64_t>(j) - i + (n - 1)] = 1;
    }
  int32_t count = 0;
  for (int64_t d = 0; d < 2 * static_cast<int64_t>(n) - 1; ++d)
    if (seen[d]) {
      if (count >= n_offsets_cap) return -1;
      offsets[count++] = static_cast<int32_t>(d - (n - 1));
    }
  return count;
}

// Symbolic banded-LU fill analysis: for a pattern with lower/upper
// bandwidths (kl, ku), LU without pivoting fills within the band; with
// partial pivoting the upper bandwidth grows to kl+ku.  Returns packed
// (kl << 16) | ku of the input pattern for the factorization planner.
int32_t bandwidths(
    const int32_t* indptr, const int32_t* indices, int32_t n) {
  int32_t kl = 0, ku = 0;
  for (int32_t i = 0; i < n; ++i)
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      const int32_t d = indices[k] - i;
      if (d > ku) ku = d;
      if (-d > kl) kl = -d;
    }
  return (kl << 16) | ku;
}

// ---------------------------------------------------------------------------
// General sparse direct (the KLU role for patterns beyond the banded tiers).
//
// The reference recommends KLUFactorization for general sparse Jacobians
// (docs/src/tutorials/large_systems.md:211-244); KLU itself is a HOST (CPU)
// library even in the CUDA stack.  This is the same architecture: a
// fill-reducing minimum-degree ordering plus a Gilbert–Peierls left-looking
// sparse LU with threshold partial pivoting, run host-side once per Newton
// step via jax.pure_callback, while the structured tiers (tridiagonal PCR,
// block-cyclic-reduction banded) stay on-device.
// ---------------------------------------------------------------------------

// Approximate minimum-degree ordering (quotient-graph flavored: eliminated
// vertices become elements whose boundaries merge; degrees are the classic
// external-degree upper bound, updated lazily through a min-heap).
// perm: out, n (perm[k] = the variable eliminated at step k).
int32_t amd_ordering(
    const int32_t* indptr, const int32_t* indices, int32_t n, int32_t* perm) {
  if (n < 0) return -1;
  if (n == 0) return 0;
  // Symmetrized adjacency without diagonal.
  std::vector<std::vector<int32_t>> var_adj(n);
  for (int32_t i = 0; i < n; ++i)
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      const int32_t j = indices[k];
      if (j == i || j < 0 || j >= n) continue;
      var_adj[i].push_back(j);
      var_adj[j].push_back(i);
    }
  for (auto& a : var_adj) {
    std::sort(a.begin(), a.end());
    a.erase(std::unique(a.begin(), a.end()), a.end());
  }

  std::vector<std::vector<int32_t>> elems;           // element -> boundary vars
  std::vector<std::vector<int32_t>> elem_of(n);      // var -> element ids
  std::vector<char> eliminated(n, 0);
  std::vector<int64_t> degree(n);
  using HeapItem = std::pair<int64_t, int32_t>;      // (degree, var)
  std::priority_queue<HeapItem, std::vector<HeapItem>,
                      std::greater<HeapItem>> heap;
  for (int32_t i = 0; i < n; ++i) {
    degree[i] = static_cast<int64_t>(var_adj[i].size());
    heap.push({degree[i], i});
  }

  std::vector<int32_t> mark(n, -1);
  for (int32_t step = 0; step < n; ++step) {
    int32_t v = -1;
    while (!heap.empty()) {
      auto [d, cand] = heap.top();
      heap.pop();
      if (!eliminated[cand] && d == degree[cand]) { v = cand; break; }
    }
    if (v < 0) {  // heap exhausted by stale entries: pick any remaining
      for (int32_t i = 0; i < n; ++i)
        if (!eliminated[i]) { v = i; break; }
    }
    if (v < 0) return -1;
    eliminated[v] = 1;
    perm[step] = v;

    // New element boundary: live vars adjacent to v, directly or through
    // any element v touches (those elements are absorbed).
    std::vector<int32_t> boundary;
    const int32_t tag = step;
    auto add = [&](int32_t u) {
      if (!eliminated[u] && mark[u] != tag) {
        mark[u] = tag;
        boundary.push_back(u);
      }
    };
    for (int32_t u : var_adj[v]) add(u);
    for (int32_t e : elem_of[v])
      for (int32_t u : elems[e]) add(u);
    const int32_t eid = static_cast<int32_t>(elems.size());
    // Absorb v's elements: boundary vars drop them below.
    std::vector<int32_t> absorbed = elem_of[v];
    std::sort(absorbed.begin(), absorbed.end());
    elems.push_back(boundary);

    for (int32_t u : boundary) {
      // prune eliminated vars (and v) from u's variable list
      auto& a = var_adj[u];
      a.erase(std::remove_if(a.begin(), a.end(),
                             [&](int32_t w) { return eliminated[w] != 0; }),
              a.end());
      // drop absorbed elements, then append the new one
      auto& el = elem_of[u];
      el.erase(std::remove_if(el.begin(), el.end(),
                              [&](int32_t e) {
                                return std::binary_search(
                                    absorbed.begin(), absorbed.end(), e);
                              }),
               el.end());
      el.push_back(eid);
      // external-degree upper bound: direct vars + element boundaries
      int64_t d = static_cast<int64_t>(a.size());
      for (int32_t e : el) d += static_cast<int64_t>(elems[e].size()) - 1;
      degree[u] = d;
      heap.push({d, u});
    }
    var_adj[v].clear();
    var_adj[v].shrink_to_fit();
    elem_of[v].clear();
  }
  return 0;
}

// Gilbert–Peierls left-looking sparse LU with threshold partial pivoting,
// factor-and-solve in one shot: x = A⁻¹ b for ONE rhs on the (optionally)
// symmetrically permuted matrix A(p, p).  CSR input (values in `data`,
// float64).  Returns nnz(L)+nnz(U) on success (the fill diagnostic), or
// -1 on allocation/size error, -2 on numerical singularity.
// All work arrays are internal; only x (size n) is written.
int64_t sp_lu_solve(
    const int32_t* indptr, const int32_t* indices, const double* data,
    int32_t n, const int32_t* perm /* may be null */, const double* b,
    double* x, double pivot_threshold) {
  if (n < 0) return -1;
  if (n == 0) return 0;
  const int64_t nnz = indptr[n];

  // ---- build CSC of the permuted matrix Ap = A(p, p) -----------------
  std::vector<int32_t> pinv(n);
  for (int32_t k = 0; k < n; ++k)
    pinv[perm ? perm[k] : k] = k;
  std::vector<int64_t> col_ptr(n + 1, 0);
  for (int32_t i = 0; i < n; ++i)
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      const int32_t j = indices[k];
      if (j < 0 || j >= n) return -1;
      col_ptr[pinv[j] + 1]++;
    }
  for (int32_t j = 0; j < n; ++j) col_ptr[j + 1] += col_ptr[j];
  std::vector<int32_t> row_idx(nnz);
  std::vector<double> val(nnz);
  {
    std::vector<int64_t> cur(col_ptr.begin(), col_ptr.end() - 1);
    for (int32_t i = 0; i < n; ++i)
      for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
        const int64_t dst = cur[pinv[indices[k]]]++;
        row_idx[dst] = pinv[i];
        val[dst] = data[k];
      }
  }

  // ---- left-looking factorization ------------------------------------
  // L, U stored CSC; pivoting tracked via prow (position of row r in the
  // pivot order; -1 while unpivoted).
  std::vector<std::vector<int32_t>> Li(n), Ui(n);
  std::vector<std::vector<double>> Lx(n), Ux(n);
  std::vector<int32_t> prow(n, -1);   // row -> pivot position
  std::vector<int32_t> prow_inv(n);   // pivot position -> row
  std::vector<double> work(n, 0.0);
  std::vector<char> in_pattern(n, 0);
  std::vector<int32_t> pattern;       // topo-ordered reach (built reversed)
  std::vector<int32_t> dfs_stack, dfs_ptr;
  int64_t fill = 0;

  for (int32_t j = 0; j < n; ++j) {
    // scatter Ap(:, j)
    pattern.clear();
    // DFS reach over columns of L (by pivot position) — iterative, with
    // per-node child cursors so nodes emit in postorder (topological).
    for (int64_t k = col_ptr[j]; k < col_ptr[j + 1]; ++k) {
      const int32_t r = row_idx[k];
      work[r] = val[k];
      if (in_pattern[r]) continue;
      // DFS from r
      dfs_stack.clear(); dfs_ptr.clear();
      dfs_stack.push_back(r); dfs_ptr.push_back(0);
      in_pattern[r] = 1;
      while (!dfs_stack.empty()) {
        const int32_t node = dfs_stack.back();
        const int32_t pos = prow[node];
        bool descended = false;
        if (pos >= 0) {
          auto& child_rows = Li[pos];
          int32_t& cp = dfs_ptr.back();
          while (cp < static_cast<int32_t>(child_rows.size())) {
            const int32_t c = child_rows[cp++];
            if (!in_pattern[c]) {
              in_pattern[c] = 1;
              dfs_stack.push_back(c);
              dfs_ptr.push_back(0);
              descended = true;
              break;
            }
          }
        }
        if (!descended &&
            (prow[node] < 0 ||
             dfs_ptr.back() >=
                 static_cast<int32_t>(Li[prow[node]].size()))) {
          pattern.push_back(node);   // postorder emit
          dfs_stack.pop_back();
          dfs_ptr.pop_back();
        }
      }
    }
    // pattern is in postorder = reverse topological; iterate reversed so
    // dependencies (earlier pivots) apply first.
    for (int64_t t = static_cast<int64_t>(pattern.size()) - 1; t >= 0; --t) {
      const int32_t r = pattern[t];
      const int32_t pos = prow[r];
      if (pos < 0) continue;                   // not yet pivoted: below diag
      const double xk = work[r];
      if (xk == 0.0) continue;
      const auto& rows = Li[pos];
      const auto& vals = Lx[pos];
      for (size_t m = 0; m < rows.size(); ++m)
        work[rows[m]] -= xk * vals[m];
    }

    // pivot choice among unpivoted rows in the pattern: prefer the
    // "diagonal" (row whose original position is j) when within
    // pivot_threshold of the max magnitude (KLU-style).
    double amax = 0.0;
    int32_t rmax = -1;
    double adiag = 0.0;
    bool have_diag = false;
    for (int32_t r : pattern) {
      if (prow[r] >= 0) continue;
      const double av = std::fabs(work[r]);
      if (av > amax) { amax = av; rmax = r; }
      if (r == j) { adiag = std::fabs(work[r]); have_diag = true; }
    }
    int32_t piv = rmax;
    if (have_diag && adiag >= pivot_threshold * amax && adiag > 0.0) piv = j;
    if (piv < 0 || work[piv] == 0.0 || !std::isfinite(work[piv])) {
      return -2;                                // structurally/numerically singular
    }
    const double pv = work[piv];
    prow[piv] = j;
    prow_inv[j] = piv;

    // split pattern into U (pivoted rows) and L (unpivoted, scaled)
    for (int32_t r : pattern) {
      const double w = work[r];
      work[r] = 0.0;
      in_pattern[r] = 0;
      if (w == 0.0 && r != piv) continue;
      const int32_t pos = prow[r];
      if (r == piv) {
        Ui[j].push_back(j);
        Ux[j].push_back(pv);
      } else if (pos >= 0 && pos < j) {
        Ui[j].push_back(pos);
        Ux[j].push_back(w);
      } else {
        Li[j].push_back(r);
        Lx[j].push_back(w / pv);
      }
    }
    fill += static_cast<int64_t>(Li[j].size() + Ui[j].size());
  }

  // ---- solve:  Ap = P_r⁻¹ L U  (row pivoting) ⇒ L U z = P_r b̂, x̂ = z
  // with b̂ = b(p), x = x̂ scattered back through p.
  std::vector<double> rhs(n), z(n);
  for (int32_t i = 0; i < n; ++i)
    rhs[i] = b[perm ? perm[i] : i];
  // forward solve L y = (P_r rhs): traverse pivot columns in order,
  // y[k] = rhs[prow_inv[k]] already reduced in-place.
  for (int32_t k = 0; k < n; ++k) {
    const double yk = rhs[prow_inv[k]];
    z[k] = yk;
    if (yk == 0.0) continue;
    const auto& rows = Li[k];
    const auto& vals = Lx[k];
    for (size_t m = 0; m < rows.size(); ++m)
      rhs[rows[m]] -= yk * vals[m];
  }
  // backward solve U x = z (U is CSC with diagonal last ordering unknown:
  // entries of column k are (pivot position, value) with the diagonal at
  // the slot pushed first — iterate columns in reverse, divide by diag,
  // then scatter-subtract the off-diagonal column entries).
  for (int32_t k = n - 1; k >= 0; --k) {
    // find the diagonal entry (position == k)
    double diag = 0.0;
    const auto& rows = Ui[k];
    const auto& vals = Ux[k];
    for (size_t m = 0; m < rows.size(); ++m)
      if (rows[m] == k) { diag = vals[m]; break; }
    if (diag == 0.0 || !std::isfinite(diag)) return -2;
    const double xk = z[k] / diag;
    z[k] = xk;
    if (xk != 0.0)
      for (size_t m = 0; m < rows.size(); ++m)
        if (rows[m] != k) z[rows[m]] -= xk * vals[m];
  }
  for (int32_t k = 0; k < n; ++k)
    x[perm ? perm[k] : k] = z[k];
  return fill;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Persistent factor object: symbolic/numeric split + refactorization reuse.
//
// The reference's linear-solve cache exists to reuse factorization work
// across Newton steps on a fixed sparsity pattern
// (lib/NonlinearSolveBase/src/linear_solve.jl:91-115 reuse_A_if_factorization;
// KLU's symbolic/numeric split is the core economics of its KLU path).  The
// one-shot sp_lu_solve above redoes the DFS reach and pivot search every
// call; this object runs them ONCE, storing per-column L/U patterns, the
// CSC assembly map, and the pivot order, so later Newton steps on the same
// pattern are a numeric-only sweep (sp_lu_refactor) + triangular solves.
//
// Pattern retention: unlike the one-shot path, explicit zeros are KEPT in
// the stored pattern — the symbolic reach is value-independent, so a value
// that becomes nonzero on a later refactorization already has a slot.
// Refactorization reuses the original pivot ORDER (KLU-style); if a reused
// pivot degrades below 1e-8 of its column's magnitude the refactor reports
// -3 and the caller re-pivots with a fresh factorization.
// ---------------------------------------------------------------------------

namespace {

struct SpLuFactor {
  int32_t n = 0;
  double pivot_threshold = 0.1;
  std::vector<int32_t> perm;                 // symmetric perm (empty = id)
  // CSC assembly of Ap = A(p, p) from the CSR data vector:
  std::vector<int64_t> col_ptr;              // n+1
  std::vector<int32_t> row_idx;              // permuted row per CSC entry
  std::vector<int64_t> csc_src;              // index into CSR data[]
  // factorization (column j == pivot position j):
  std::vector<std::vector<int32_t>> Li;      // permuted row ids (below diag)
  std::vector<std::vector<double>> Lx;       // values scaled by pivot
  std::vector<std::vector<int32_t>> Ui;      // pivot positions < j, ascending
  std::vector<std::vector<double>> Ux;
  std::vector<double> Ud;                    // diagonal pivots
  std::vector<int32_t> prow, prow_inv;       // row <-> pivot position
  // scratch
  std::vector<double> work, rhs, z;
};

}  // namespace

extern "C" {

// Build the factor object (symbolic analysis + first numeric
// factorization).  Returns the handle, or null on failure; *status gets
// nnz(L)+nnz(U) on success, -1 on size error, -2 on singularity.
void* sp_lu_factor_create(
    const int32_t* indptr, const int32_t* indices, const double* data,
    int32_t n, const int32_t* perm, double pivot_threshold,
    int64_t* status) {
  *status = -1;
  if (n <= 0) return nullptr;
  auto F = new SpLuFactor();
  F->n = n;
  F->pivot_threshold = pivot_threshold;
  if (perm) F->perm.assign(perm, perm + n);

  const int64_t nnz = indptr[n];
  std::vector<int32_t> pinv(n);
  for (int32_t k = 0; k < n; ++k) pinv[perm ? perm[k] : k] = k;
  F->col_ptr.assign(n + 1, 0);
  for (int32_t i = 0; i < n; ++i)
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      const int32_t j = indices[k];
      if (j < 0 || j >= n) { delete F; return nullptr; }
      F->col_ptr[pinv[j] + 1]++;
    }
  for (int32_t j = 0; j < n; ++j) F->col_ptr[j + 1] += F->col_ptr[j];
  F->row_idx.resize(nnz);
  F->csc_src.resize(nnz);
  {
    std::vector<int64_t> cur(F->col_ptr.begin(), F->col_ptr.end() - 1);
    for (int32_t i = 0; i < n; ++i)
      for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
        const int64_t dst = cur[pinv[indices[k]]]++;
        F->row_idx[dst] = pinv[i];
        F->csc_src[dst] = k;
      }
  }

  F->Li.resize(n); F->Lx.resize(n);
  F->Ui.resize(n); F->Ux.resize(n);
  F->Ud.assign(n, 0.0);
  F->prow.assign(n, -1);
  F->prow_inv.assign(n, 0);
  F->work.assign(n, 0.0);
  F->rhs.resize(n);
  F->z.resize(n);

  std::vector<char> in_pattern(n, 0);
  std::vector<int32_t> pattern, dfs_stack, dfs_ptr;
  int64_t fill = 0;

  for (int32_t j = 0; j < n; ++j) {
    pattern.clear();
    for (int64_t k = F->col_ptr[j]; k < F->col_ptr[j + 1]; ++k) {
      const int32_t r = F->row_idx[k];
      F->work[r] = data[F->csc_src[k]];
      if (in_pattern[r]) continue;
      dfs_stack.clear(); dfs_ptr.clear();
      dfs_stack.push_back(r); dfs_ptr.push_back(0);
      in_pattern[r] = 1;
      while (!dfs_stack.empty()) {
        const int32_t node = dfs_stack.back();
        const int32_t pos = F->prow[node];
        bool descended = false;
        if (pos >= 0) {
          auto& child_rows = F->Li[pos];
          int32_t& cp = dfs_ptr.back();
          while (cp < static_cast<int32_t>(child_rows.size())) {
            const int32_t c = child_rows[cp++];
            if (!in_pattern[c]) {
              in_pattern[c] = 1;
              dfs_stack.push_back(c);
              dfs_ptr.push_back(0);
              descended = true;
              break;
            }
          }
        }
        if (!descended &&
            (F->prow[node] < 0 ||
             dfs_ptr.back() >=
                 static_cast<int32_t>(F->Li[F->prow[node]].size()))) {
          pattern.push_back(node);
          dfs_stack.pop_back();
          dfs_ptr.pop_back();
        }
      }
    }
    for (int64_t t = static_cast<int64_t>(pattern.size()) - 1; t >= 0; --t) {
      const int32_t r = pattern[t];
      const int32_t pos = F->prow[r];
      if (pos < 0) continue;
      const double xk = F->work[r];
      if (xk == 0.0) continue;
      const auto& rows = F->Li[pos];
      const auto& vals = F->Lx[pos];
      for (size_t m = 0; m < rows.size(); ++m)
        F->work[rows[m]] -= xk * vals[m];
    }

    double amax = 0.0;
    int32_t rmax = -1;
    double adiag = 0.0;
    bool have_diag = false;
    for (int32_t r : pattern) {
      if (F->prow[r] >= 0) continue;
      const double av = std::fabs(F->work[r]);
      if (av > amax) { amax = av; rmax = r; }
      if (r == j) { adiag = std::fabs(F->work[r]); have_diag = true; }
    }
    int32_t piv = rmax;
    if (have_diag && adiag >= pivot_threshold * amax && adiag > 0.0) piv = j;
    if (piv < 0 || F->work[piv] == 0.0 || !std::isfinite(F->work[piv])) {
      delete F;
      *status = -2;
      return nullptr;
    }
    const double pv = F->work[piv];
    F->prow[piv] = j;
    F->prow_inv[j] = piv;
    F->Ud[j] = pv;

    // Keep the FULL pattern (zeros included) so refactorization slots are
    // stable; U entries sorted by pivot position for the refactor sweep.
    std::vector<std::pair<int32_t, double>> ucol;
    for (int32_t r : pattern) {
      const double w = F->work[r];
      F->work[r] = 0.0;
      in_pattern[r] = 0;
      if (r == piv) continue;
      const int32_t pos = F->prow[r];
      if (pos >= 0 && pos < j) {
        ucol.emplace_back(pos, w);
      } else {
        F->Li[j].push_back(r);
        F->Lx[j].push_back(w / pv);
      }
    }
    std::sort(ucol.begin(), ucol.end());
    F->Ui[j].reserve(ucol.size());
    F->Ux[j].reserve(ucol.size());
    for (auto& [pos, w] : ucol) {
      F->Ui[j].push_back(pos);
      F->Ux[j].push_back(w);
    }
    fill += static_cast<int64_t>(F->Li[j].size() + F->Ui[j].size() + 1);
  }
  *status = fill;
  return F;
}

// Numeric-only refactorization on the stored pattern + pivot order.
// Returns 0 on success, -2 on a zero/non-finite pivot, -3 when a reused
// pivot has degraded (|pivot| < 1e-8 * column max) — caller should build a
// fresh factor to re-pivot.
int32_t sp_lu_refactor(void* handle, const double* data) {
  auto F = static_cast<SpLuFactor*>(handle);
  const int32_t n = F->n;
  for (int32_t j = 0; j < n; ++j) {
    for (int64_t k = F->col_ptr[j]; k < F->col_ptr[j + 1]; ++k)
      F->work[F->row_idx[k]] = data[F->csc_src[k]];
    auto& ui = F->Ui[j];
    auto& ux = F->Ux[j];
    for (size_t m = 0; m < ui.size(); ++m) {
      const int32_t k = ui[m];
      const double xk = F->work[F->prow_inv[k]];
      ux[m] = xk;
      if (xk == 0.0) continue;
      const auto& rows = F->Li[k];
      const auto& vals = F->Lx[k];
      for (size_t t = 0; t < rows.size(); ++t)
        F->work[rows[t]] -= xk * vals[t];
    }
    const int32_t piv = F->prow_inv[j];
    const double pv = F->work[piv];
    auto& li = F->Li[j];
    auto& lx = F->Lx[j];
    double amax = std::fabs(pv);
    for (int32_t r : li) amax = std::max(amax, std::fabs(F->work[r]));
    // clear scratch before any early return
    F->work[piv] = 0.0;
    const double apv = std::fabs(pv);
    bool bad = (pv == 0.0 || !std::isfinite(pv));
    bool degraded = (!bad && apv < 1e-8 * amax);
    F->Ud[j] = pv;
    for (size_t m = 0; m < li.size(); ++m) {
      const double w = F->work[li[m]];
      F->work[li[m]] = 0.0;
      lx[m] = bad ? 0.0 : w / pv;
    }
    for (size_t m = 0; m < ui.size(); ++m)
      F->work[F->prow_inv[ui[m]]] = 0.0;
    if (bad) return -2;
    if (degraded) return -3;
  }
  return 0;
}

// Triangular solves with the stored factors: x = A(p,p)-solve of b.
// Returns 0 on success, -2 on a zero diagonal.
int32_t sp_lu_factor_solve(void* handle, const double* b, double* x) {
  auto F = static_cast<SpLuFactor*>(handle);
  const int32_t n = F->n;
  const int32_t* perm = F->perm.empty() ? nullptr : F->perm.data();
  for (int32_t i = 0; i < n; ++i)
    F->rhs[i] = b[perm ? perm[i] : i];
  for (int32_t k = 0; k < n; ++k) {
    const double yk = F->rhs[F->prow_inv[k]];
    F->z[k] = yk;
    if (yk == 0.0) continue;
    const auto& rows = F->Li[k];
    const auto& vals = F->Lx[k];
    for (size_t m = 0; m < rows.size(); ++m)
      F->rhs[rows[m]] -= yk * vals[m];
  }
  for (int32_t k = n - 1; k >= 0; --k) {
    const double diag = F->Ud[k];
    if (diag == 0.0 || !std::isfinite(diag)) return -2;
    const double xk = F->z[k] / diag;
    F->z[k] = xk;
    if (xk == 0.0) continue;
    const auto& pos = F->Ui[k];
    const auto& vals = F->Ux[k];
    for (size_t m = 0; m < pos.size(); ++m)
      F->z[pos[m]] -= xk * vals[m];
  }
  for (int32_t k = 0; k < n; ++k)
    x[perm ? perm[k] : k] = F->z[k];
  return 0;
}

void sp_lu_factor_free(void* handle) {
  delete static_cast<SpLuFactor*>(handle);
}

// ---- factor export for DEVICE-side triangular application ----------------
// The stored factor solves in "pivot space" (columns are eliminated in
// order, so pivot step k == permuted column k; pivoting permutes rows
// only).  Exported in that space the two sweeps become clean static-
// pattern triangular systems:
//   b_hat[k] = b[in_perm[k]]                   (in_perm = perm . prow_inv)
//   (I + Lhat) y = b_hat   with Lhat[prow[Li[k][m]], k] = Lx[k][m]  (> k)
//   Uhat z = y             with Uhat[Ui[k][m], k] = Ux[k][m] (< k), diag Ud
//   x[out_perm[k]] = z[k]                      (out_perm = perm)
// The pattern is static across numeric-only refactorizations (full-pattern
// retention + frozen pivot order), so a host-side level schedule built
// once stays valid until a re-pivot (detected by the caller via the
// factorization counter).

// Current factor sizes: strict-lower nnz(Lhat) and strict-upper nnz(Uhat).
int32_t sp_lu_factor_sizes(void* handle, int64_t* nnzL, int64_t* nnzU) {
  auto F = static_cast<SpLuFactor*>(handle);
  int64_t nl = 0, nu = 0;
  for (int32_t k = 0; k < F->n; ++k) {
    nl += static_cast<int64_t>(F->Li[k].size());
    nu += static_cast<int64_t>(F->Ui[k].size());
  }
  *nnzL = nl;
  *nnzU = nu;
  return 0;
}

// Flat CSC-by-pivot-column export (caller allocates via sizes above).
// Lrow entries are pivot positions (> column), Urow entries are pivot
// positions (< column).  Returns 0.
int32_t sp_lu_factor_export(void* handle, int64_t* Lp, int32_t* Lrow,
                            double* Lval, int64_t* Up, int32_t* Urow,
                            double* Uval, double* Ud, int32_t* in_perm,
                            int32_t* out_perm) {
  auto F = static_cast<SpLuFactor*>(handle);
  const int32_t n = F->n;
  const int32_t* perm = F->perm.empty() ? nullptr : F->perm.data();
  int64_t pl = 0, pu = 0;
  for (int32_t k = 0; k < n; ++k) {
    Lp[k] = pl;
    Up[k] = pu;
    const auto& li = F->Li[k];
    const auto& lx = F->Lx[k];
    for (size_t m = 0; m < li.size(); ++m) {
      Lrow[pl] = F->prow[li[m]];
      Lval[pl] = lx[m];
      ++pl;
    }
    const auto& ui = F->Ui[k];
    const auto& ux = F->Ux[k];
    for (size_t m = 0; m < ui.size(); ++m) {
      Urow[pu] = ui[m];
      Uval[pu] = ux[m];
      ++pu;
    }
    Ud[k] = F->Ud[k];
    const int32_t pr = F->prow_inv[k];
    in_perm[k] = perm ? perm[pr] : pr;
    out_perm[k] = perm ? perm[k] : k;
  }
  Lp[n] = pl;
  Up[n] = pu;
  return 0;
}

}  // extern "C"
