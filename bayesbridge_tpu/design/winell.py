"""Windowed-ELL sparse matvec: the general-valued beyond-HBM backend.

This is the TPU replacement for the one MKL-CSR regime the bitpacked
byte-LUT kernel (:mod:`.bitlut`) does not cover: designs too large for
the dense hybrid blocks whose values are NOT mostly 0/1 — count-valued
or continuous sparse covariates (reference:
bayesbridge/design_matrix/mkl_matvec.py:17-56 serves arbitrary-valued
CSR at any RAM-sized nnz).

The obstacle to a fast sparse matvec on TPU is the gather: XLA's
arbitrary-index gather runs at ~0.1 Gnnz/s, and Mosaic's fast
``dynamic_gather`` only gathers within ONE 128-lane register, with each
sublane row indexing its own 128-entry table row. The layout is built
around exactly that primitive:

* the INPUT dimension is cut into windows of ``W`` (a multiple of 128)
  contiguous positions;
* the OUTPUT dimension is cut into tiles of 128 lanes;
* for each (tile, window) cell, the entries are stored ELL-style as
  ``K`` slot rows of 128 lanes — ``idx[slot, lane]`` is the entry's
  window-local input position (int16), ``val[slot, lane]`` its value —
  so one (K, 128) register load gathers K·128 input values with
  ``W/128`` within-register gathers (one per 128-lane piece of the
  window, combined by a select on ``idx >> 7``), multiplies by the
  values and reduces over slots into the output tile:

      out[tile, lane] += sum_slot val[slot, lane] * v[window, idx[slot, lane]]

* entries beyond the K-th slot of their (tile, window, lane) cell are
  rare (K is sized ~3x the Poisson mean) and spill to a tiny
  plain-ELL side matrix handled by the XLA gather path.

Both matvec directions use this one kernel on dual packings (row-major
for ``X v``, column-major for ``X' u``), mirroring the dual-ELL and
dual-bitmap layouts. Storage is ~(2+4)/fill bytes per nnz per
orientation (fill = Poisson mean / K, typically 25-40%), independent of
the dense n·p footprint. All padding gathers v[window, 0] with value 0
and is sliced off the output.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bitlut import _gather_lanes

_LANE = 128


def _ceil_to(x, m):
    return -(-x // m) * m


def plan_windows(n_in, n_out, nnz):
    """Choose (W, K): window width and ELL slot depth.

    W targets a per-(output, window) Poisson mean of ~4-13 entries so
    the K slots fill well; K is ~3x the mean so spill (handled by the
    slow path) stays in the fraction-of-a-percent range.
    """
    density = nnz / max(1, n_in * n_out)
    W = _LANE
    while W < 8 * _LANE and W * density < 4.0:
        W *= 2
    mean = W * density
    K = 32 if mean > 8.0 else 16
    return W, K


def _tile_block(n_out):
    """(T, TB): padded tile count and tiles per kernel block (Mosaic
    wants the second-minor block dim divisible by 8 or whole-array)."""
    T = max(1, _ceil_to(n_out, _LANE) // _LANE)
    TB = min(8, T)
    return _ceil_to(T, TB), TB


def estimate_bytes(shape, nnz):
    """Predicted dual-orientation storage (6 B per slot: int16 idx +
    f32 value) for the auto-selection heuristic — computable from shape
    and nnz alone, before any packing."""
    n, p = shape
    total = 0
    for n_in, n_out in ((p, n), (n, p)):
        W, K = plan_windows(n_in, n_out, nnz)
        T, _ = _tile_block(n_out)
        Wn = max(1, _ceil_to(n_in, W) // W)
        total += Wn * T * K * _LANE * 6
    return total


def pack_winell(X_csr, W, K):
    """Pack a CSR matrix (rows = outputs) into windowed-ELL arrays.

    Returns (idx, val, spill_csr) where idx/val have shape
    (Wn * T * K, 128) — Wn input windows (major), T output tiles, K
    slots — and spill_csr is a scipy CSR holding the (rare) entries
    beyond the K-th slot of their cell, or None. O(nnz) time.
    """
    import scipy.sparse as sps
    n_out, n_in = X_csr.shape
    T, _ = _tile_block(n_out)
    Wn = max(1, _ceil_to(n_in, W) // W)
    nnz = X_csr.nnz

    idx = np.zeros((Wn * T * K, _LANE), dtype=np.int16)
    val = np.zeros((Wn * T * K, _LANE), dtype=np.float32)
    if nnz == 0:
        return idx, val, None

    indptr, indices = X_csr.indptr, X_csr.indices
    data = np.asarray(X_csr.data, dtype=np.float32)
    rows = np.repeat(np.arange(n_out, dtype=np.int64),
                     np.diff(indptr))
    cols = indices.astype(np.int64)
    w = cols // W
    local = (cols - w * W).astype(np.int16)
    lane = (rows & (_LANE - 1)).astype(np.int32)
    tile = rows >> 7

    # Slot index = running count within each (row, window) cell. CSR
    # order is (row asc, col asc) so the cell key is non-decreasing and
    # the count is a change-point cumcount.
    key = rows * Wn + w
    pos = np.arange(nnz, dtype=np.int64)
    change = np.empty(nnz, dtype=bool)
    change[0] = True
    np.not_equal(key[1:], key[:-1], out=change[1:])
    start = np.maximum.accumulate(np.where(change, pos, 0))
    slot = (pos - start).astype(np.int64)

    main = slot < K
    cell = (w * T + tile) * K + slot
    idx[cell[main], lane[main]] = local[main]
    val[cell[main], lane[main]] = data[main]

    if main.all():
        return idx, val, None
    rest = ~main
    spill = sps.csr_matrix(
        (data[rest], (rows[rest], cols[rest])), shape=(n_out, n_in))
    return idx, val, spill


def _winell_kernel(v_ref, idx_ref, val_ref, out_ref, *,
                   n_reg, K, tiles, square):
    w = pl.program_id(1)

    @pl.when(w == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # One gather pass over the whole (tiles*K, 128) block per window
    # register, then a grouped sublane reduction into the tile rows.
    idx = idx_ref[:].astype(jnp.int32)
    val = val_ref[:]
    if square:
        val = val * val
    lane = idx & (_LANE - 1)
    gathered = _gather_lanes(
        jnp.broadcast_to(v_ref[0, 0, :], idx.shape), lane)
    for r in range(1, n_reg):
        g_r = _gather_lanes(
            jnp.broadcast_to(v_ref[0, r, :], idx.shape), lane)
        gathered = jnp.where((idx >> 7) == r, g_r, gathered)
    prod = val * gathered
    out_ref[:] += jnp.sum(prod.reshape(tiles, K, _LANE), axis=1)


@functools.partial(
    jax.jit, static_argnames=('n_out', 'W', 'K', 'square', 'interpret'))
def winell_matvec(idx, val, v, n_out, W, K, square=False, interpret=False):
    """Windowed-ELL matvec: out[m] = sum_k val[cell(m), k] * v[...].

    Parameters
    ----------
    idx, val : (Wn * T * K, 128) int16 / float32 from `pack_winell`.
    v : (n_in,) float32 input vector (zero-padded internally).
    n_out : true output length (the padded tail is dropped).
    W, K : the packing plan.
    square : multiply by val**2 instead of val (Fisher diagonals).
    """
    import contextlib

    n_reg = W // _LANE
    T, TB = _tile_block(n_out)
    Wn = idx.shape[0] // (T * K)
    dtype = val.dtype
    if not interpret and dtype == jnp.float64:
        raise NotImplementedError(
            "The compiled windowed-ELL kernel is 32-bit (Mosaic TPU has "
            "no 64-bit vectors); build the design with dtype=np.float32.")
    v3d = jnp.zeros(Wn * W, dtype).at[:v.shape[0]].set(
        v.astype(dtype)).reshape(Wn, n_reg, _LANE)
    x64_off = jax.enable_x64(False) if not interpret \
        else contextlib.nullcontext()
    with x64_off:
        out = pl.pallas_call(
            functools.partial(_winell_kernel, n_reg=n_reg, K=K,
                              tiles=TB, square=square),
            grid=(T // TB, Wn),
            in_specs=[
                pl.BlockSpec((1, n_reg, _LANE), lambda t, w: (w, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TB * K, _LANE),
                             lambda t, w: (w * (T // TB) + t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TB * K, _LANE),
                             lambda t, w: (w * (T // TB) + t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB, _LANE), lambda t, w: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, _LANE), dtype),
            interpret=interpret,
        )(v3d, idx, val)
    return out.reshape(T * _LANE)[:n_out]
