// sparsekit: native host-side data loader for bayesbridge_tpu.
//
// TPU-native counterpart of the reference's native CPU layer (the MKL
// csr-matvec ctypes binding and the OpenMP binary_matmul Cython kernel;
// reference: bayesbridge/design_matrix/mkl_matvec.py:17-56,
// cython_matmal/binary_matmul.pyx:11-38). On TPU the per-iteration
// matvecs run on-device, so the native layer's job moves to one-time
// data preparation: converting large CSR/CSC inputs into the padded ELL
// device layout, transposing CSR, and computing column statistics —
// all OpenMP-parallel and allocation-free (callers pass NumPy buffers).
//
// Build: `make` in this directory (g++ -O3 -fopenmp -shared -fPIC).
// Python binding: ctypes (see sparsekit.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Pad CSR rows into ELL (indices, values). Padded slots keep index 0 and
// value 0 so gather lanes contribute nothing.
void csr_to_ell_f64(const int64_t* indptr, const int32_t* indices,
                    const double* data, int64_t n_rows, int64_t k_max,
                    int32_t* ell_idx, double* ell_val) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_rows; ++i) {
    const int64_t start = indptr[i], end = indptr[i + 1];
    int32_t* out_idx = ell_idx + i * k_max;
    double* out_val = ell_val + i * k_max;
    int64_t k = 0;
    for (int64_t pos = start; pos < end; ++pos, ++k) {
      out_idx[k] = indices[pos];
      out_val[k] = data[pos];
    }
    for (; k < k_max; ++k) {
      out_idx[k] = 0;
      out_val[k] = 0.0;
    }
  }
}

void csr_to_ell_f32(const int64_t* indptr, const int32_t* indices,
                    const float* data, int64_t n_rows, int64_t k_max,
                    int32_t* ell_idx, float* ell_val) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_rows; ++i) {
    const int64_t start = indptr[i], end = indptr[i + 1];
    int32_t* out_idx = ell_idx + i * k_max;
    float* out_val = ell_val + i * k_max;
    int64_t k = 0;
    for (int64_t pos = start; pos < end; ++pos, ++k) {
      out_idx[k] = indices[pos];
      out_val[k] = data[pos];
    }
    for (; k < k_max; ++k) {
      out_idx[k] = 0;
      out_val[k] = 0.0f;
    }
  }
}

// CSR transpose (a.k.a. CSR->CSC) via parallel counting sort.
void csr_transpose_f64(const int64_t* indptr, const int32_t* indices,
                       const double* data, int64_t n_rows, int64_t n_cols,
                       int64_t* out_indptr, int32_t* out_indices,
                       double* out_data) {
  const int64_t nnz = indptr[n_rows];
  // Column counts.
  std::memset(out_indptr, 0, sizeof(int64_t) * (n_cols + 1));
  for (int64_t pos = 0; pos < nnz; ++pos) out_indptr[indices[pos] + 1]++;
  for (int64_t j = 0; j < n_cols; ++j) out_indptr[j + 1] += out_indptr[j];
  // Scatter (sequential to keep within-column row order ascending).
  std::vector<int64_t> cursor(out_indptr, out_indptr + n_cols);
  for (int64_t i = 0; i < n_rows; ++i) {
    for (int64_t pos = indptr[i]; pos < indptr[i + 1]; ++pos) {
      const int32_t j = indices[pos];
      const int64_t dst = cursor[j]++;
      out_indices[dst] = static_cast<int32_t>(i);
      out_data[dst] = data[pos];
    }
  }
}

// Column sums of a CSR matrix (for centering offsets).
void csr_col_sums_f64(const int64_t* indptr, const int32_t* indices,
                      const double* data, int64_t n_rows, int64_t n_cols,
                      double* out_sums) {
  std::memset(out_sums, 0, sizeof(double) * n_cols);
  const int64_t nnz = indptr[n_rows];
#pragma omp parallel
  {
    std::vector<double> local(n_cols, 0.0);
#pragma omp for schedule(static) nowait
    for (int64_t pos = 0; pos < nnz; ++pos) local[indices[pos]] += data[pos];
#pragma omp critical
    for (int64_t j = 0; j < n_cols; ++j) out_sums[j] += local[j];
  }
}

// Row-length histogram max (k_max for ELL padding).
int64_t csr_max_row_len(const int64_t* indptr, int64_t n_rows) {
  int64_t k_max = 0;
#pragma omp parallel for reduction(max : k_max) schedule(static)
  for (int64_t i = 0; i < n_rows; ++i)
    k_max = std::max(k_max, indptr[i + 1] - indptr[i]);
  return k_max;
}

}  // extern "C"
