// Native sparse linear algebra for the general-CSR constraint path.
//
// Role-equivalent of the reference's serial sparse kernels:
//   - ParOptAMD.{h,cpp}            : approximate-minimum-degree ordering
//   - ParOptSparseCholesky.{h,cpp} : sparse Cholesky factorization
//   - ParOptSparseUtils.{h,cpp}    : CSR utilities, C + A*D*A^T products
//
// Like the reference's ParOptQuasiDefSparseMat ("a simple serial LDL sparse
// matrix factorization", ParOptSparseMat.cpp:231-233) this path is serial
// per-host: irregular sparse factorization is a poor fit for the TPU, so it
// runs on the host CPU while the TPU executes the dense/batched work.
//
// Algorithms are standard textbook forms (elimination tree, ereach,
// up-looking Cholesky; quotient-graph minimum degree), implemented from
// scratch.  C API only — consumed from Python via ctypes.

#include <algorithm>
#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// elimination tree of A (CSC/CSR of a symmetric matrix, pattern only)
// ---------------------------------------------------------------------------
void build_etree(int n, const int* rowp, const int* cols, int* parent,
                 std::vector<int>& ancestor) {
  ancestor.assign(n, -1);
  for (int k = 0; k < n; k++) {
    parent[k] = -1;
    for (int p = rowp[k]; p < rowp[k + 1]; p++) {
      int i = cols[p];
      // walk from i up to the root of its subtree, path-compressing
      while (i != -1 && i < k) {
        int inext = ancestor[i];
        ancestor[i] = k;
        if (inext == -1) {
          parent[i] = k;
        }
        i = inext;
      }
    }
  }
}

// reach of row k in the elimination tree: pattern of row k of L.
// Returns the row pattern in topological order in s[top..n-1].
int ereach(int n, const int* rowp, const int* cols, int k, const int* parent,
           int* s, int* w) {
  int top = n;
  w[k] = k;  // mark k
  for (int p = rowp[k]; p < rowp[k + 1]; p++) {
    int i = cols[p];
    if (i > k) continue;
    int len = 0;
    while (w[i] != k) {  // traverse up the etree
      s[len++] = i;
      w[i] = k;
      i = parent[i];
    }
    while (len > 0) {
      s[--top] = s[--len];
    }
  }
  return top;  // s[top..n-1] = pattern (excluding k)
}

struct CholHandle {
  int n = 0;
  // permutation (new = perm[old]); identity when natural ordering
  std::vector<int> perm, iperm;
  // permuted matrix pattern (upper-including-diagonal per row, CSR)
  std::vector<int> arowp, acols;
  std::vector<int> aval_src;  // map to original value array positions
  // elimination tree + column pointers of L (CSC-like, by column)
  std::vector<int> parent;
  std::vector<int> lp;    // size n+1
  std::vector<int> li;    // row indices of L (below diagonal)
  std::vector<double> lx; // values of L (below diagonal)
  std::vector<double> d;  // diagonal of L (L has sqrt'd diagonal)
  bool symbolic_done = false;
};

// build the permuted "lower" pattern: row k holds column indices j <= k
void build_permuted_lower(CholHandle* h, int n, const int* rowp,
                          const int* cols) {
  h->arowp.assign(n + 1, 0);
  std::vector<std::vector<std::pair<int, int>>> rows(n);
  for (int i = 0; i < n; i++) {
    int pi = h->perm[i];
    for (int p = rowp[i]; p < rowp[i + 1]; p++) {
      int pj = h->perm[cols[p]];
      int r = std::max(pi, pj);
      int c = std::min(pi, pj);
      if (pi >= pj) {  // keep each entry once (from its lower image)
        rows[r].push_back({c, p});
      }
    }
  }
  for (int r = 0; r < n; r++) {
    std::sort(rows[r].begin(), rows[r].end());
    // dedupe keeping first source position (values summed at factor time
    // would be wrong; patterns from FE assembly shouldn't have duplicates)
    h->arowp[r + 1] = h->arowp[r] + (int)rows[r].size();
  }
  h->acols.resize(h->arowp[n]);
  h->aval_src.resize(h->arowp[n]);
  for (int r = 0; r < n; r++) {
    int base = h->arowp[r];
    for (size_t q = 0; q < rows[r].size(); q++) {
      h->acols[base + (int)q] = rows[r][q].first;
      h->aval_src[base + (int)q] = rows[r][q].second;
    }
  }
}

// ---------------------------------------------------------------------------
// minimum-degree ordering (quotient-graph style with element absorption,
// approximate external degrees — the role of ParOptAMD)
// ---------------------------------------------------------------------------
void min_degree_order(int n, const int* rowp, const int* cols, int* perm) {
  // adjacency (strictly off-diagonal, symmetrized)
  std::vector<std::vector<int>> adj(n);
  for (int i = 0; i < n; i++) {
    for (int p = rowp[i]; p < rowp[i + 1]; p++) {
      int j = cols[p];
      if (j != i) {
        adj[i].push_back(j);
      }
    }
  }
  for (int i = 0; i < n; i++) {
    std::sort(adj[i].begin(), adj[i].end());
    adj[i].erase(std::unique(adj[i].begin(), adj[i].end()), adj[i].end());
  }
  std::vector<char> eliminated(n, 0);
  std::vector<int> degree(n);
  for (int i = 0; i < n; i++) degree[i] = (int)adj[i].size();

  std::vector<char> mark(n, 0);
  for (int k = 0; k < n; k++) {
    // pick min-degree uneliminated node
    int best = -1, bestdeg = n + 1;
    for (int i = 0; i < n; i++) {
      if (!eliminated[i] && degree[i] < bestdeg) {
        best = i;
        bestdeg = degree[i];
      }
    }
    int v = best;
    perm[v] = k;
    eliminated[v] = 1;
    // form clique among uneliminated neighbors
    std::vector<int> nbrs;
    for (int u : adj[v]) {
      if (!eliminated[u]) nbrs.push_back(u);
    }
    for (int u : nbrs) {
      // merge: adj[u] = (adj[u] ∪ nbrs) \ {u, eliminated}
      for (int w : adj[u]) {
        if (!eliminated[w] && w != u) mark[w] = 1;
      }
      for (int w : nbrs) {
        if (w != u) mark[w] = 1;
      }
      std::vector<int> merged;
      for (int w : adj[u]) {
        if (mark[w]) {
          merged.push_back(w);
          mark[w] = 0;
        }
      }
      for (int w : nbrs) {
        if (mark[w]) {
          merged.push_back(w);
          mark[w] = 0;
        }
      }
      // clear any leftover marks
      for (int w : merged) mark[w] = 0;
      adj[u].swap(merged);
      std::sort(adj[u].begin(), adj[u].end());
      adj[u].erase(std::unique(adj[u].begin(), adj[u].end()), adj[u].end());
      degree[u] = (int)adj[u].size();
    }
    adj[v].clear();
    adj[v].shrink_to_fit();
  }
}

}  // namespace

extern "C" {

// Minimum-degree fill-reducing ordering.  perm[old] = new position.
// Returns 0 on success.
int paropt_amd_order(int n, const int* rowp, const int* cols, int* perm) {
  if (n <= 0) return 1;
  min_degree_order(n, rowp, cols, perm);
  return 0;
}

// order_type: 0 = natural, 1 = minimum degree
void* paropt_chol_create(int n, const int* rowp, const int* cols,
                         int order_type) {
  CholHandle* h = new CholHandle();
  h->n = n;
  h->perm.resize(n);
  h->iperm.resize(n);
  if (order_type == 1) {
    min_degree_order(n, rowp, cols, h->perm.data());
  } else {
    for (int i = 0; i < n; i++) h->perm[i] = i;
  }
  for (int i = 0; i < n; i++) h->iperm[h->perm[i]] = i;

  build_permuted_lower(h, n, rowp, cols);

  // elimination tree on the permuted lower pattern
  h->parent.resize(n);
  std::vector<int> ancestor;
  build_etree(n, h->arowp.data(), h->acols.data(), h->parent.data(),
              ancestor);

  // symbolic: column counts of L via ereach
  std::vector<int> s(n), w(n, -1), counts(n, 0);
  for (int k = 0; k < n; k++) {
    int top = ereach(n, h->arowp.data(), h->acols.data(), k,
                     h->parent.data(), s.data(), w.data());
    for (int p = top; p < n; p++) {
      counts[s[p]]++;  // L(k, j) nonzero -> column j gains an entry
    }
  }
  h->lp.assign(n + 1, 0);
  for (int j = 0; j < n; j++) h->lp[j + 1] = h->lp[j] + counts[j];
  h->li.resize(h->lp[n]);
  h->lx.resize(h->lp[n]);
  h->d.resize(n);
  h->symbolic_done = true;
  return (void*)h;
}

int paropt_chol_nnz(void* vh) {
  CholHandle* h = (CholHandle*)vh;
  return h->lp[h->n] + h->n;
}

// Numeric factorization: values aligned with the (rowp, cols) passed to
// create.  Returns 0 on success, k+1 if the matrix is not positive definite
// at permuted column k.
int paropt_chol_factor(void* vh, const double* values) {
  CholHandle* h = (CholHandle*)vh;
  int n = h->n;
  // permuted lower values
  std::vector<double> aval(h->arowp[n]);
  for (int p = 0; p < h->arowp[n]; p++) {
    aval[p] = values[h->aval_src[p]];
  }
  std::vector<int> s(n), w(n, -1), lnext(n);
  std::vector<double> x(n, 0.0);
  for (int j = 0; j < n; j++) lnext[j] = h->lp[j];

  for (int k = 0; k < n; k++) {
    // scatter row k of A (lower part) into x
    int top = ereach(n, h->arowp.data(), h->acols.data(), k,
                     h->parent.data(), s.data(), w.data());
    double dk = 0.0;
    for (int p = h->arowp[k]; p < h->arowp[k + 1]; p++) {
      int j = h->acols[p];
      if (j == k) {
        dk = aval[p];
      } else {
        x[j] = aval[p];
      }
    }
    // sparse triangular solve: L(0:k-1, 0:k-1) l_k' = a_k
    for (int pp = top; pp < n; pp++) {
      int j = s[pp];
      double lkj = x[j] / h->d[j];
      x[j] = 0.0;
      // update x with column j of L
      for (int q = h->lp[j]; q < lnext[j]; q++) {
        x[h->li[q]] -= h->lx[q] * lkj;
      }
      dk -= lkj * lkj;
      // append L(k, j)
      int q = lnext[j]++;
      h->li[q] = k;
      h->lx[q] = lkj;
    }
    if (dk <= 0.0 || !std::isfinite(dk)) {
      return k + 1;
    }
    h->d[k] = std::sqrt(dk);
  }
  return 0;
}

// Solve A x = b in place for nrhs right-hand sides (column-major, each
// length n, in ORIGINAL ordering).
int paropt_chol_solve(void* vh, double* b, int nrhs) {
  CholHandle* h = (CholHandle*)vh;
  int n = h->n;
  std::vector<double> y(n);
  for (int r = 0; r < nrhs; r++) {
    double* brhs = b + (size_t)r * n;
    // permute
    for (int i = 0; i < n; i++) y[h->perm[i]] = brhs[i];
    // forward: L y = b
    for (int j = 0; j < n; j++) {
      y[j] /= h->d[j];
      for (int q = h->lp[j]; q < h->lp[j + 1]; q++) {
        y[h->li[q]] -= h->lx[q] * y[j];
      }
    }
    // backward: L' x = y
    for (int j = n - 1; j >= 0; j--) {
      for (int q = h->lp[j]; q < h->lp[j + 1]; q++) {
        y[j] -= h->lx[q] * y[h->li[q]];
      }
      y[j] /= h->d[j];
    }
    // unpermute
    for (int i = 0; i < n; i++) brhs[i] = y[h->perm[i]];
  }
  return 0;
}

void paropt_chol_destroy(void* vh) { delete (CholHandle*)vh; }

// ---------------------------------------------------------------------------
// C + A * D * A^T for CSR A [m x n], diagonal D [n], C diagonal [m].
// Two-phase: symbolic (pattern) then numeric.  (ParOptSparseUtils.h:8-49)
// ---------------------------------------------------------------------------

// Symbolic: computes row pointers of the (full, symmetric) product pattern.
// Call once with out_cols == nullptr to get nnz via out_rowp, then again
// with allocated out_cols.
int paropt_adat_symbolic(int m, int n, const int* rowp, const int* cols,
                         int* out_rowp, int* out_cols) {
  // build A^T (CSC of A) pattern
  std::vector<int> colp(n + 1, 0), crow(rowp[m]);
  for (int p = 0; p < rowp[m]; p++) colp[cols[p] + 1]++;
  for (int j = 0; j < n; j++) colp[j + 1] += colp[j];
  {
    std::vector<int> next(colp.begin(), colp.end() - 1);
    for (int i = 0; i < m; i++) {
      for (int p = rowp[i]; p < rowp[i + 1]; p++) {
        crow[next[cols[p]]++] = i;
      }
    }
  }
  std::vector<int> mark(m, -1);
  out_rowp[0] = 0;
  int nnz = 0;
  for (int i = 0; i < m; i++) {
    int cnt = 0;
    for (int p = rowp[i]; p < rowp[i + 1]; p++) {
      int k = cols[p];
      for (int q = colp[k]; q < colp[k + 1]; q++) {
        int j = crow[q];
        if (mark[j] != i) {
          mark[j] = i;
          if (out_cols) out_cols[nnz + cnt] = j;
          cnt++;
        }
      }
    }
    // ensure the diagonal is present
    if (mark[i] != i) {
      mark[i] = i;
      if (out_cols) out_cols[nnz + cnt] = i;
      cnt++;
    }
    if (out_cols) {
      std::sort(out_cols + nnz, out_cols + nnz + cnt);
    }
    nnz += cnt;
    out_rowp[i + 1] = nnz;
  }
  return 0;
}

// Numeric: fills out_vals for the pattern computed by adat_symbolic.
int paropt_adat_numeric(int m, int n, const int* rowp, const int* cols,
                        const double* vals, const double* dvec,
                        const double* cdiag, const int* out_rowp,
                        const int* out_cols, double* out_vals) {
  std::vector<int> colp(n + 1, 0), crow(rowp[m]), cpos(rowp[m]);
  for (int p = 0; p < rowp[m]; p++) colp[cols[p] + 1]++;
  for (int j = 0; j < n; j++) colp[j + 1] += colp[j];
  {
    std::vector<int> next(colp.begin(), colp.end() - 1);
    for (int i = 0; i < m; i++) {
      for (int p = rowp[i]; p < rowp[i + 1]; p++) {
        int q = next[cols[p]]++;
        crow[q] = i;
        cpos[q] = p;
      }
    }
  }
  std::vector<double> x(m, 0.0);
  std::vector<int> mark(m, -1);
  for (int i = 0; i < m; i++) {
    for (int p = rowp[i]; p < rowp[i + 1]; p++) {
      int k = cols[p];
      double aik_d = vals[p] * dvec[k];
      for (int q = colp[k]; q < colp[k + 1]; q++) {
        int j = crow[q];
        if (mark[j] != i) {
          mark[j] = i;
          x[j] = 0.0;
        }
        x[j] += aik_d * vals[cpos[q]];
      }
    }
    if (mark[i] != i) {
      mark[i] = i;
      x[i] = 0.0;
    }
    if (cdiag) x[i] += cdiag[i];
    for (int p = out_rowp[i]; p < out_rowp[i + 1]; p++) {
      int j = out_cols[p];
      out_vals[p] = (mark[j] == i) ? x[j] : 0.0;
    }
  }
  return 0;
}

}  // extern "C"
