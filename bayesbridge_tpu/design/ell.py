"""CSR -> padded ELL conversion (host-side, one-time data preparation).

The TPU-friendly sparse layout: every row padded to the max row length so
that gathers and row reductions are static-shaped, dense VPU work. Both
X (row-ELL) and X' (column-ELL, built from CSC) are stored, so `dot` and
`Tdot` are each a gather + masked row-sum with NO scatter — scatters
serialize on TPU, gathers vectorize.

Conversion prefers the native C++ `sparsekit` data loader (OpenMP row
loop; see bayesbridge_tpu/native/) and falls back to a vectorized NumPy
implementation. This layer replaces the reference's MKL handle plumbing
(reference: bayesbridge/design_matrix/mkl_matvec.py:17-56) — on TPU the
"accelerated backend" is a data layout, not a vendor library.
"""

import numpy as np

from ..native import sparsekit


def csr_to_ell(indptr, indices, data, n_cols, pad_value=0):
    """Convert CSR buffers to padded (indices, values) ELL arrays.

    Returns (ell_idx, ell_val) of shape (n_rows, k_max) where k_max is the
    max row length. Padding uses index `pad_value` with value 0, so padded
    gather lanes contribute exactly zero.
    """
    n_rows = len(indptr) - 1
    row_len = np.diff(indptr)
    k_max = int(row_len.max()) if n_rows > 0 and row_len.size else 0
    k_max = max(k_max, 1)

    native = sparsekit.try_csr_to_ell(indptr, indices, data, n_rows, k_max)
    if native is not None:
        return native

    ell_idx = np.full((n_rows, k_max), pad_value, dtype=np.int32)
    ell_val = np.zeros((n_rows, k_max), dtype=data.dtype)
    # Vectorized fill: flat position of (row i, slot j) in CSR data is
    # indptr[i] + j whenever j < row_len[i].
    slot = np.arange(k_max)[None, :]
    valid = slot < row_len[:, None]
    flat_pos = (indptr[:-1, None] + slot)[valid]
    ell_idx[valid] = indices[flat_pos]
    ell_val[valid] = data[flat_pos]
    return ell_idx, ell_val


def dual_ell_from_scipy(X_csr, dtype):
    """Build (row-ELL of X, col-ELL of X i.e. row-ELL of X')."""
    X_csr = X_csr.tocsr()
    X_csc = X_csr.tocsc()
    row_idx, row_val = csr_to_ell(
        X_csr.indptr, X_csr.indices, X_csr.data.astype(dtype), X_csr.shape[1]
    )
    col_idx, col_val = csr_to_ell(
        X_csc.indptr, X_csc.indices, X_csc.data.astype(dtype), X_csc.shape[0]
    )
    return (row_idx, row_val), (col_idx, col_val)
