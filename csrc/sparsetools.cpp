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

}  // extern "C"
