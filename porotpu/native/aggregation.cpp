// Native kernels for host-side solver setup.
//
// The reference delegates its setup-heavy native work to PETSc/DOLFIN C++
// (SURVEY.md §2.3); porotpu keeps the device path in JAX/XLA and uses this
// small C++ runtime for the host-side setup hot spots:
//   - greedy smoothed-aggregation over a CSR strength graph (the
//     sequential-by-nature kernel of AMG setup, porotpu/precond/amg.py)
//   - CSR -> padded-ELL packing for very large operators
//
// Built on demand into libporotpu_native.so (see native/__init__.py) and
// called through ctypes; the pure-numpy implementations remain as
// fallbacks.

#include <cstdint>
#include <vector>

extern "C" {

// Greedy standard aggregation (3 passes), equivalent to
// porotpu.precond.amg._aggregate.  agg must be length n, prefilled with -1.
// Returns the number of aggregates.
int64_t greedy_aggregate(const int64_t* indptr, const int32_t* indices,
                         int64_t n, int64_t* agg) {
  int64_t na = 0;
  // pass 1: roots whose strong neighborhood is fully unaggregated
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] != -1) continue;
    bool free_nbhd = true;
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      if (agg[indices[k]] != -1) {
        free_nbhd = false;
        break;
      }
    }
    if (free_nbhd) {
      agg[i] = na;
      for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k)
        agg[indices[k]] = na;
      ++na;
    }
  }
  // pass 2: attach stragglers to a neighboring aggregate (live state,
  // matching the python fallback's sequential semantics)
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] != -1) continue;
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      int64_t a = agg[indices[k]];
      if (a != -1) {
        agg[i] = a;
        break;
      }
    }
  }
  // pass 3: isolated nodes become their own aggregate
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] == -1) agg[i] = na++;
  }
  return na;
}

// CSR -> ELL fill: data_out (n x L) zero-prefilled, cols_out prefilled.
void csr_to_ell(const int64_t* indptr, const int32_t* indices,
                const double* data, int64_t n, int64_t L, double* data_out,
                int32_t* cols_out) {
  for (int64_t i = 0; i < n; ++i) {
    int64_t start = indptr[i], len = indptr[i + 1] - indptr[i];
    int32_t first = len > 0 ? indices[start] : 0;
    for (int64_t l = 0; l < L; ++l) {
      if (l < len) {
        data_out[i * L + l] = data[start + l];
        cols_out[i * L + l] = indices[start + l];
      } else {
        data_out[i * L + l] = 0.0;
        cols_out[i * L + l] = first;
      }
    }
  }
}

// Same, emitting float32 directly (skips the f64 intermediate + cast).
void csr_to_ell_f32(const int64_t* indptr, const int32_t* indices,
                    const double* data, int64_t n, int64_t L, float* data_out,
                    int32_t* cols_out) {
  for (int64_t i = 0; i < n; ++i) {
    int64_t start = indptr[i], len = indptr[i + 1] - indptr[i];
    int32_t first = len > 0 ? indices[start] : 0;
    for (int64_t l = 0; l < L; ++l) {
      if (l < len) {
        data_out[i * L + l] = static_cast<float>(data[start + l]);
        cols_out[i * L + l] = indices[start + l];
      } else {
        data_out[i * L + l] = 0.0f;
        cols_out[i * L + l] = first;
      }
    }
  }
}

// Collapse a dof CSR matrix (d dofs per node) into a node graph:
// out_{IJ} = sum over block |a_ij|.  Replaces the Q^T |A| Q spgemm pair
// (porotpu/precond/amg.py _node_graph) with one linear pass.
// Emits COO (node_rows, node_cols, vals) of length nnz(A); caller
// deduplicates via scipy coo->csr.
void collapse_node_graph(const int64_t* indptr, const int32_t* indices,
                         const double* data, int64_t n, int64_t d,
                         int32_t* out_rows, int32_t* out_cols,
                         double* out_vals) {
  for (int64_t i = 0; i < n; ++i) {
    int32_t bi = static_cast<int32_t>(i / d);
    for (int64_t k = indptr[i]; k < indptr[i + 1]; ++k) {
      out_rows[k] = bi;
      out_cols[k] = indices[k] / d;
      out_vals[k] = data[k] < 0 ? -data[k] : data[k];
    }
  }
}

}  // extern "C"
