"""Sparse design matrix with TPU-native storage backends.

Re-designs the reference's CSR + MKL class (reference:
bayesbridge/design_matrix/sparse_matrix.py:19-196) around what TPU
hardware is actually fast at. Two interchangeable backends:

``hybrid`` (default where it fits)
    XLA-TPU gathers run at ~1e8 elements/s while MXU matmuls stream HBM
    at full bandwidth, so for typical OHDSI-style densities (1-20%) the
    bandwidth-optimal layout is DENSE, split by column representability:

      * exactly-representable columns form ONE narrow block whose dtype
        is chosen by total HBM bytes: int4 (packed s4, 0.5 B/elem —
        an eighth of the f32 traffic) when values fit [-8, 7] (binary
        0/1 indicators, dummy-coded categoricals), int8 for wider
        integer columns (counts ≤ 127), else bf16 over the bf16-exact
        column set (half the f32 traffic). Zero rounding in every case:
        the narrow→bf16 up-convert is fused into the MXU matmul so HBM
        traffic stays at the stored width;
      * all remaining columns stay in the working dtype.

    Both ``X v`` and ``X' u`` are then single MXU matmuls over the same
    arrays (no transpose copy needed). At 10% density this is ~100x
    faster than gather-based sparse matvecs and uses comparable memory
    to a dual-CSR f32 representation.

``bitpack``
    Beyond-HBM scale for mostly-binary designs (the OHDSI regime the
    reference serves with MKL CSR matvecs, mkl_matvec.py:17-56): 0/1
    columns stored as a dual bitmap — ONE bit per element in both
    orientations — with matvecs evaluated by the Pallas byte-LUT gather
    kernel in :mod:`.bitlut` (~660 Gelem/s on v5e, ~60x the ELL gather
    path at 1% density, 32x less HBM than f32 dense). Non-binary
    columns ride in a narrow dense side block.

``winell``
    Beyond-HBM scale for GENERAL-valued sparse designs (count or
    continuous covariates — the rest of the regime the reference serves
    with MKL CSR matvecs): a windowed-ELL layout whose Pallas kernel
    gathers the input vector with within-register ``dynamic_gather``
    over 128-lane column windows (:mod:`.winell`), ~nnz-proportional
    storage with a tiny XLA-gather spill path for overfull cells.

``ell``
    Padded dual-ELL (row-major and column-major) gather layout —
    memory proportional to nnz; used for extremely sparse designs where
    neither dense blocks nor bitmaps pay off, and on CPU where gathers
    are cheap.

Shared semantics regardless of backend (matching the reference):
centering is a rank-1 ``column_offset`` correction, never materialized
(sparse_matrix.py:45-48); the intercept column is implicit
(sparse_matrix.py:77-81, 110-114); Fisher products carry the
centering/intercept corrections (sparse_matrix.py:131-196).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

from warnings import warn

from .abstract import AbstractDesignMatrix
from .ell import csr_to_ell, dual_ell_from_scipy
from . import bitlut
from . import fusedne
from . import winell as winell_mod
from ..native import sparsekit
from ..utils.dtypes import default_float

_DENSE_FISHER_MAX_ELEMS = 5e7  # lazy-densify guard for the Cholesky path
# Hybrid blocks must fit comfortably in HBM next to everything else.
_HYBRID_MAX_BYTES = float(os.environ.get('BB_HYBRID_MAX_BYTES', 8e9))
# Dual bitmaps (n*p/4 bytes total) get the same residency budget.
_BITPACK_MAX_BYTES = float(os.environ.get('BB_BITPACK_MAX_BYTES', 8e9))
# Minimum share of binary columns for the bitpack backend to pay off.
_BITPACK_MIN_BINARY_FRAC = 0.5

# Can a given platform actually build and consume a packed-s4 operand?
# PJRT plugins are allowed to leave S4 unimplemented (tunneled TPU
# runtimes have been observed to reject — or HANG on — the host->device
# transfer of an S4 buffer and `convert(s4->bf16)` feeding a dot), and
# XLA:CPU only gained it recently — so the storage-tier pick must never
# choose a representation the runtime cannot execute. Cache is keyed by
# PLATFORM of the device the design will EXECUTE on, never by whatever
# `jax.default_device` context happens to be ambient at build time:
# designs are routinely BUILT under a CPU default-device context (to
# keep GB-scale host blocks off a slow tunnel) and then placed on the
# accelerator, and a build-context probe poisons the tier choice for
# the execution device (the exact failure that produced BENCH_r03's
# timeout).
_INT4_SUPPORTED = {}


def _int4_matmul_supported(device=None):
    """True iff `device` (default: the default backend's first device,
    ``jax.devices()[0]`` — the device jitted code EXECUTES on) can
    (a) materialize a packed jnp.int4 array from host int8 and (b) widen
    it into an MXU matmul — exactly the two operations the int4 hybrid
    tier performs. Probed once per platform on an 8x8 toy; any failure
    (transfer rejection, UNIMPLEMENTED convert/dot) disables the tier.

    The whole tier is additionally opt-in via ``BB_HYBRID_INT4=1``:
    packed-s4 support is rare enough across PJRT runtimes (and a
    *hanging* transfer cannot be probed safely) that auto-select must
    never pick a representation the deployment chip cannot execute.
    With the flag unset this returns False without touching the device.

    Keep-or-cut criterion (VERDICT r4 #6): no runtime this project can
    reach executes packed S4 today, so the tier is unproven weight. It
    stays while it remains opt-in + demotion-safe + covered by
    tests/test_tier_gating.py; CUT the tier (keeping those tests as the
    regression record for the gating logic) in the first round where an
    S4-capable runtime is available and the tier still does not beat
    int8 at the flagship shape there.
    """
    if os.environ.get('BB_HYBRID_INT4', '0') != '1':
        return False
    if device is None:
        # The EXECUTION device: jax.devices() ignores the ambient
        # jax.default_device context and reports the default backend.
        device = jax.devices()[0]
    key = device.platform
    if key not in _INT4_SUPPORTED:
        try:
            with jax.default_device(device):
                toy = jnp.asarray(np.ones((8, 8), np.int8),
                                  dtype=jnp.int4)
                f = jax.jit(lambda a: a.astype(jnp.bfloat16)
                            @ jnp.ones((8, 8), jnp.bfloat16))
                # A host fetch (not block_until_ready) is what truthfully
                # forces remote execution through tunneled runtimes.
                np.asarray(f(toy))
            _INT4_SUPPORTED[key] = True
        except Exception:  # noqa: BLE001 - any runtime rejection counts
            _INT4_SUPPORTED[key] = False
    return _INT4_SUPPORTED[key]


def _chunked_gram(chunk_fn, m, p, w, dtype):
    """Accumulate ``(Z' W Z, Z' w)`` over row chunks of an m x p design
    whose rows are produced on demand by ``chunk_fn(start, size)`` (a
    (size, p) panel in the working dtype). Bounds the working-dtype
    transient to one chunk (BB_GRAM_CHUNK_BYTES, default 256 MB) instead
    of materializing the full w-scaled n x p design, so the Cholesky
    path's Fisher product scales to any n while p stays
    Cholesky-sized. Chunk starts are clamped (the last chunk re-reads
    rows the previous one already covered) with the overlap masked out
    of the weight slice, so every row is counted exactly once."""
    budget = int(os.environ.get('BB_GRAM_CHUNK_BYTES', 2 ** 28))
    itemsize = jnp.dtype(dtype).itemsize
    c = max(256, budget // max(1, 2 * p * itemsize))
    c = min(m, -(-c // 8) * 8)
    k = -(-m // c)
    # Wide f32 MXU dots at DEFAULT precision chain their partials
    # through bf16 on TPU (measured 1e-4..2e-3 rel err, while width-1
    # matvecs are f32-accurate); the Gram feeds the Cholesky sampler's
    # precision matrix, so force the multi-pass f32 decomposition. Off
    # the CG hot path — cost is MXU passes over VMEM tiles, HBM
    # traffic unchanged.
    hi = jax.lax.Precision.HIGHEST
    if k <= 1:
        Z = chunk_fn(0, m)
        return jnp.matmul(Z.T, w[:, None] * Z, precision=hi), Z.T @ w

    def body(i, carry):
        G, s = carry
        start = jnp.minimum(i * c, m - c)
        mask = (start + jnp.arange(c)) >= i * c
        wb = jax.lax.dynamic_slice(w, (start,), (c,)) \
            * mask.astype(dtype)
        Z = chunk_fn(start, c)
        return (G + jnp.matmul(Z.T, wb[:, None] * Z, precision=hi),
                s + Z.T @ wb)

    init = (jnp.zeros((p, p), dtype), jnp.zeros(p, dtype))
    return jax.lax.fori_loop(0, k, body, init)


def _densify_columns(X_csc, cols, out_dtype):
    """Host-side CSC -> dense block in the target dtype, O(nnz) writes
    (no full-width float64 dense intermediate: at benchmark scale the
    chunked `.toarray()` route costs tens of GB of transient churn and
    minutes of wall clock)."""
    n = X_csc.shape[0]
    out = np.zeros((n, len(cols)), dtype=out_dtype)
    indptr, indices, data = X_csc.indptr, X_csc.indices, X_csc.data
    for k, j in enumerate(np.asarray(cols)):
        sl = slice(indptr[j], indptr[j + 1])
        out[indices[sl], k] = data[sl]
    return out


def _exact_column_mask(X_csc, exact_entry):
    """Columns of a CSC matrix whose every stored entry satisfies the
    per-entry boolean `exact_entry`."""
    col_nnz = np.diff(X_csc.indptr)
    # A column is exact iff all its entries are. reduceat indices must
    # stay in-bounds (trailing empty columns have indptr == nnz); the
    # bogus values those produce are masked out below.
    start = np.minimum(X_csc.indptr[:-1], X_csc.nnz - 1)
    n_exact = np.add.reduceat(exact_entry, start)
    return np.where(col_nnz > 0, n_exact == col_nnz, True)


def _bf16_exact_columns(X_csc):
    """Boolean mask of columns whose values round-trip bf16 exactly."""
    import ml_dtypes
    if X_csc.nnz == 0:
        return np.ones(X_csc.shape[1], dtype=bool)
    data = X_csc.data
    roundtrip = data.astype(ml_dtypes.bfloat16).astype(data.dtype)
    return _exact_column_mask(X_csc, roundtrip == data)


def _int8_exact_columns(X_csc):
    """Boolean mask of columns whose values are integers in [-127, 127]
    (exactly representable in int8 — and, after the fused up-convert,
    in bfloat16 too)."""
    if X_csc.nnz == 0:
        return np.ones(X_csc.shape[1], dtype=bool)
    data = X_csc.data
    ok = (data == np.round(data)) & (np.abs(data) <= 127)
    return _exact_column_mask(X_csc, ok)


def _int4_exact_columns(X_csc):
    """Boolean mask of columns whose values are integers in [-8, 7]
    (exactly representable in int4; 0/1 dummy-coded columns — the bulk
    of a typical EHR design — qualify). XLA packs s4 two-per-byte in
    device memory, so these columns move half the HBM bytes of int8."""
    if X_csc.nnz == 0:
        return np.ones(X_csc.shape[1], dtype=bool)
    data = X_csc.data
    ok = (data == np.round(data)) & (data >= -8) & (data <= 7)
    return _exact_column_mask(X_csc, ok)


def _binary_column_mask(X_csc):
    """Columns whose stored entries are all exactly 1 (0/1-valued)."""
    if X_csc.nnz == 0:
        return np.ones(X_csc.shape[1], dtype=bool)
    return _exact_column_mask(X_csc, X_csc.data == 1.0)


@jax.tree_util.register_pytree_node_class
class SparseDesignMatrix(AbstractDesignMatrix):

    def __init__(self, X, center_predictor=False, add_intercept=True,
                 copy_array=False, dtype=None, backend='auto',
                 fused=None, _parts=None):
        super().__init__()
        self.intercept_added = add_intercept
        self.centered = center_predictor
        # Per-design fused-kernel policy ('auto'|'full'|'1'|'0'); None
        # defers to the BB_FUSED_NE env var at call time. First-class so
        # two designs in one process can run different policies
        # (design/fusedne.dispatch_mode documents the values).
        self.fused_policy = fused
        self._dense_cache = None
        self._hybrid_sharded = False
        self._hybrid_shard = None
        if _parts is not None:  # pytree unflatten path
            (self.backend, self._shape_main, self._nnz,
             self.exact_is_binary, self._bitpack_meta,
             self._winell_meta) = _parts[0]
            self._bitpack_shard = None
            self._winell_shard = None
            arrays = _parts[1]
            if self.backend == 'hybrid':
                (self.X_exact, self.X_float, self.exact_cols,
                 self.float_cols, self.column_offset) = arrays
            elif self.backend == 'bitpack':
                (self.bits_col, self.bits_row, self.X_float,
                 self.bin_cols, self.float_cols, self.column_offset) = arrays
            elif self.backend == 'winell':
                (self.widx_dot, self.wval_dot, self.widx_tdot,
                 self.wval_tdot, self.sd_idx, self.sd_val, self.st_idx,
                 self.st_val, self.column_offset) = arrays
            else:
                (self.row_idx, self.row_val, self.col_idx, self.col_val,
                 self.column_offset) = arrays
            return

        if not sps.issparse(X):
            raise ValueError("SparseDesignMatrix expects a scipy sparse "
                             "matrix; use DenseDesignMatrix otherwise.")
        dtype = np.dtype(dtype or default_float())
        if backend in ('bitpack', 'winell') and dtype != np.float32 \
                and jax.default_backend() == 'tpu':
            # Fail BEFORE the expensive build (CSC conversion +
            # packing costs ~10 min at the flagship shape): the
            # COMPILED Pallas kernels behind these backends are
            # 32-bit (Mosaic has no 64-bit vectors), so a forced pick
            # in an x64 TPU session would only die at the first
            # matvec. The gate matches the kernels' own dispatch
            # (`interpret = jax.default_backend() != 'tpu'`, below):
            # off-TPU the interpret-mode kernels run any dtype — the
            # design-matrix suite exercises them in f64 — so only the
            # compiled path is barred. The auto path already avoids
            # these backends for non-f32 dtypes (see the dtype gates
            # below).
            raise ValueError(
                "backend='{}' requires dtype=np.float32 (its compiled "
                "kernels are 32-bit); got {}. Pass dtype=np.float32 — "
                "it works inside x64 sessions.".format(backend, dtype))
        X = self.remove_intercept_indicator(X.tocsr())
        X = X.tocsr()
        self._shape_main = X.shape
        self._nnz = X.nnz

        if center_predictor:
            offsets = sparsekit.try_col_means(
                X.indptr, X.indices, X.data.astype(np.float64),
                X.shape[0], X.shape[1],
            )
            if offsets is None:
                offsets = np.squeeze(np.asarray(X.mean(axis=0)))
        else:
            offsets = np.zeros(X.shape[1])
        self.column_offset = jnp.asarray(offsets, dtype)

        X_csc = None  # one shared CSC view; conversions cost ~12 B/nnz
        if backend == 'auto':
            n, p = X.shape
            X_csc = X.tocsc()
            exact_frac = float(np.mean(_bf16_exact_columns(X_csc))) \
                if p else 1.0
            binary_frac = float(np.mean(_binary_column_mask(X_csc))) \
                if p else 1.0
            if dtype == np.float32:
                # Mirror _build_hybrid's storage choice: int4 (0.5 B,
                # packed s4) / int8 (1 B) for small-integer columns vs
                # bf16 (2 B) for the bf16-exact set, whichever moves
                # fewer bytes.
                int4_frac = float(np.mean(_int4_exact_columns(X_csc))) \
                    if p else 1.0
                int8_frac = float(np.mean(_int8_exact_columns(X_csc))) \
                    if p else 1.0
                cost_int4 = int4_frac * 0.5 + (1 - int4_frac) * 4
                per_elem = min(
                    int8_frac * 1 + (1 - int8_frac) * 4,
                    exact_frac * 2 + (1 - exact_frac) * 4)
                # Only pay the capability probe when int4 would actually
                # change the estimate.
                if cost_int4 < per_elem and _int4_matmul_supported():
                    per_elem = cost_int4
            else:
                per_elem = dtype.itemsize
            hybrid_bytes = n * p * per_elem
            ell_bytes = 2 * X.nnz * (4 + dtype.itemsize)
            bitpack_bytes = n * p * binary_frac / 4.0 \
                + n * p * (1 - binary_frac) * dtype.itemsize
            winell_bytes = winell_mod.estimate_bytes(X.shape, X.nnz)
            # The windowed-ELL slots only pay off while the expected
            # entries per (output, window) cell stay under the slot
            # budget; dense-ish designs would drown in ELL spill.
            w_est, k_est = winell_mod.plan_windows(p, n, X.nnz)
            winell_ok = w_est * X.nnz <= 0.75 * k_est * max(1, n * p)
            # Prefer-hybrid-within-budget is MEASURED, not assumed: at
            # the flagship 100k x 50k (90% binary) the hybrid int8+f32
            # blocks ran 6.071 iter/s vs bitpack's 5.711 (-6%) at half
            # the stored bytes (6.5 vs 3.2 GB) — the MXU streams int8
            # faster than the byte-LUT kernel expands bitmaps, so
            # bitpack's 2x byte headroom is bought only when HBM
            # residency actually demands it (BASELINE.md round-5 A/B,
            # baselines/r5_measure_artifact.jsonl).
            if hybrid_bytes <= _HYBRID_MAX_BYTES:
                backend = 'hybrid'
            elif (binary_frac >= _BITPACK_MIN_BINARY_FRAC
                  and bitpack_bytes <= _BITPACK_MAX_BYTES
                  and dtype == np.float32):
                backend = 'bitpack'
            elif winell_bytes <= _BITPACK_MAX_BYTES and winell_ok \
                    and dtype == np.float32:
                backend = 'winell'
            elif hybrid_bytes <= ell_bytes:
                # Neither compact form helps (dense-ish, few binary
                # columns): over-budget dense blocks are still the least
                # bad option, as the ELL layout would be even larger.
                backend = 'hybrid'
            else:
                backend = 'ell'
            if backend in ('hybrid', 'ell') and dtype != np.float32 \
                    and hybrid_bytes > _HYBRID_MAX_BYTES \
                    and min(bitpack_bytes if binary_frac
                            >= _BITPACK_MIN_BINARY_FRAC else np.inf,
                            winell_bytes if winell_ok else np.inf) \
                    <= _BITPACK_MAX_BYTES:
                # An x64 session just fell off the fast beyond-HBM path
                # for dtype reasons alone — say so instead of silently
                # taking an over-budget or ~60x-slower backend
                # (VERDICT r2 item 4/8).
                warn("backend='auto' selected '{}' only because the "
                     "compiled bitpack/winell kernels are 32-bit; at "
                     "this scale ({:,} x {:,}) that costs memory or "
                     "throughput. Build the design with "
                     "dtype=np.float32 (works inside x64 sessions) to "
                     "use the fast beyond-HBM path.".format(backend, n, p))
        self.backend = backend
        self._bitpack_meta = None
        self._bitpack_shard = None
        self._winell_meta = None
        self._winell_shard = None

        if X_csc is None and backend in ('hybrid', 'bitpack'):
            X_csc = X.tocsc()
        if backend == 'hybrid':
            self._build_hybrid(X_csc, dtype)
        elif backend == 'bitpack':
            self._build_bitpack(X, X_csc, dtype)
        elif backend == 'winell':
            self._build_winell(X, dtype)
        elif backend == 'ell':
            self._build_ell(X, dtype)
        else:
            raise ValueError(f"Unknown backend '{backend}'")

    # -- construction ---------------------------------------------------- #

    def _build_hybrid(self, X_csc, dtype):
        import ml_dtypes
        # 0/1-valued data squares to itself: lets Fisher diagonals reuse
        # the plain weighted column sums with no squared transient.
        self.exact_is_binary = bool(np.all(
            (X_csc.data == 0.0) | (X_csc.data == 1.0))) if X_csc.nnz \
            else True
        # Narrow blocks only pay off in f32 working precision; under
        # float64 keep every column in the working dtype (exact).
        if dtype == np.float32:
            # Pick whichever exact representation moves fewer HBM bytes:
            # int4 (0.5 B/elem, packed two-per-byte on TPU) for
            # small-integer columns, int8 (1 B/elem) for the wider
            # integer set, bf16 (2 B/elem) for the usually-larger
            # bf16-exact column set. The convert into the MXU operand
            # dtype fuses into the consuming matmul either way.
            int4_mask = _int4_exact_columns(X_csc)
            int8_mask = _int8_exact_columns(X_csc)
            bf16_mask = _bf16_exact_columns(X_csc)
            n_int4 = int4_mask.sum()
            n_int8, n_bf16 = int8_mask.sum(), bf16_mask.sum()
            p = X_csc.shape[1]
            costs = {
                'int4': 0.5 * n_int4 + 4 * (p - n_int4),
                'int8': 1 * n_int8 + 4 * (p - n_int8),
                'bf16': 2 * n_bf16 + 4 * (p - n_bf16),
            }
            pick = min(costs, key=costs.get)
            if pick == 'int4' and not _int4_matmul_supported():
                # The runtime can't execute S4 (transfer or matmul
                # UNIMPLEMENTED); take the next-cheapest tier it can.
                del costs['int4']
                pick = min(costs, key=costs.get)
            if pick == 'int4' and fusedne.dispatch_mode(
                    'quad', self.fused_policy) is not None:
                # int4 storage disqualifies the fused one-sweep kernels
                # (they up-convert int8/bf16/f32 blocks). When the CG
                # operator itself runs fused ('full'/'1' dispatch) that
                # costs MORE net HBM traffic than the 2x-denser tier
                # saves — one fused sweep moves E + F bytes where the
                # composed pair over int4 moves 2*(E/2 + F) = E + 2F —
                # so keep int4 only as a storage rescue. Under the
                # default all-composed policy the denser int4 tier
                # wins outright: it halves E on every composed pass
                # and the multi-RHS pre-solve serves int4 blocks too
                # (_presolve_multirhs up-converts via _exact_block).
                alt = min((k for k in costs if k != 'int4'),
                          key=costs.get)
                if X_csc.shape[0] * costs[alt] <= _HYBRID_MAX_BYTES:
                    pick = alt
            if pick == 'int4':
                # Densify through int8 (NumPy has no 4-bit layout); the
                # device array is the packed s4 form.
                exact_mask, exact_dtype = int4_mask, np.dtype(np.int8)
            elif pick == 'int8':
                exact_mask, exact_dtype = int8_mask, np.dtype(np.int8)
            else:
                pick = 'bf16'
                exact_mask = bf16_mask
                exact_dtype = np.dtype(ml_dtypes.bfloat16)
        else:
            pick = None
            exact_mask, exact_dtype = _bf16_exact_columns(X_csc), dtype
        exact_cols = np.where(exact_mask)[0]
        float_cols = np.where(~exact_mask)[0]
        self.exact_cols = jnp.asarray(exact_cols, jnp.int32)
        self.float_cols = jnp.asarray(float_cols, jnp.int32)
        X_exact_host = _densify_columns(X_csc, exact_cols, exact_dtype)
        if pick == 'int4':
            self.X_exact = jnp.asarray(X_exact_host, dtype=jnp.int4)
        else:
            self.X_exact = jnp.asarray(X_exact_host)
        self.X_float = jnp.asarray(
            _densify_columns(X_csc, float_cols, dtype))

    def _build_bitpack(self, X_csr, X_csc, dtype):
        """Dual bitmap over the 0/1 columns (one bit per element in each
        orientation, packed O(nnz) straight from the index structure —
        no dense transient, no column-subset copies) plus a narrow dense
        block for the rest."""
        n, p = X_csr.shape
        binary_mask = _binary_column_mask(X_csc)
        bin_cols = np.where(binary_mask)[0]
        float_cols = np.where(~binary_mask)[0]
        p_bin = len(bin_cols)
        if p_bin == 0 and p > 0:
            raise ValueError(
                "backend='bitpack' requires at least one exactly-0/1 "
                "column (the bitmap kernel stores one bit per element); "
                "this design has none. Use backend='hybrid', 'winell' "
                "or 'ell' instead.")
        self.exact_is_binary = True
        self.bin_cols = jnp.asarray(bin_cols, jnp.int32)
        self.float_cols = jnp.asarray(float_cols, jnp.int32)
        self.X_float = jnp.asarray(
            _densify_columns(X_csc, float_cols, dtype))

        # Static padding plans for the two product directions.
        gcol_pad, n_pad, k_dot = bitlut.plan_blocks(p_bin, n)
        grow_pad, pbin_pad, k_tdot = bitlut.plan_blocks(n, p_bin)
        # Pallas runs in interpret mode off-TPU (the CPU test path).
        interpret = jax.default_backend() != 'tpu'
        self._bitpack_meta = (p_bin, gcol_pad, n_pad, k_dot,
                              grow_pad, pbin_pad, k_tdot, interpret)

        bits_col = np.zeros((gcol_pad, n_pad), dtype=np.uint8)
        bits_row = np.zeros((grow_pad, pbin_pad), dtype=np.uint8)
        if p_bin:
            # Indices within one CSC column / CSR row are unique, so the
            # fancy-indexed |= never collides. The original matrices are
            # read in place; non-binary columns are skipped by the
            # bin_cols -> packed-column map.
            col_of = np.full(p, -1, dtype=np.int64)
            col_of[bin_cols] = np.arange(p_bin)
            for jb, j in enumerate(bin_cols):
                rows = X_csc.indices[X_csc.indptr[j]:X_csc.indptr[j + 1]]
                bits_col[jb >> 3, rows] |= np.uint8(1 << (jb & 7))
            all_binary = p_bin == p
            for i in range(n):
                cols = X_csr.indices[X_csr.indptr[i]:X_csr.indptr[i + 1]]
                if not all_binary:
                    cols = col_of[cols]
                    cols = cols[cols >= 0]
                bits_row[i >> 3, cols] |= np.uint8(1 << (i & 7))
        self.bits_col = jnp.asarray(bits_col)
        self.bits_row = jnp.asarray(bits_row)

    def _build_winell(self, X_csr, dtype):
        """Dual windowed-ELL packing (row-major for X v, column-major
        for X' u) plus tiny plain-ELL spill matrices for cells deeper
        than the slot budget (design/winell.py)."""
        if dtype != np.float32:
            raise ValueError(
                "backend='winell' stores float32 values (the compiled "
                "Mosaic kernel is 32-bit); pass dtype=np.float32 — this "
                "works inside x64 sessions too.")
        n, p = X_csr.shape
        X = X_csr.copy()
        X.eliminate_zeros()  # occupancy == (value != 0) for densify
        X.sort_indices()
        self.exact_is_binary = False
        w_dot, k_dot = winell_mod.plan_windows(p, n, X.nnz)
        idx_d, val_d, spill_d = winell_mod.pack_winell(X, w_dot, k_dot)
        Xt = X.T.tocsr()
        Xt.sort_indices()
        w_tdot, k_tdot = winell_mod.plan_windows(n, p, X.nnz)
        idx_t, val_t, spill_t = winell_mod.pack_winell(Xt, w_tdot, k_tdot)
        interpret = jax.default_backend() != 'tpu'
        self._winell_meta = (w_dot, k_dot, w_tdot, k_tdot,
                             spill_d is not None, spill_t is not None,
                             interpret)
        self.widx_dot = jnp.asarray(idx_d)
        self.wval_dot = jnp.asarray(val_d)
        self.widx_tdot = jnp.asarray(idx_t)
        self.wval_tdot = jnp.asarray(val_t)
        # Host-side CSR retained for shard_winell's per-device re-pack;
        # excluded from the pytree (host memory only).
        self._csr_host = X

        def ell_or_empty(spill):
            if spill is None:
                return (jnp.zeros((0, 1), jnp.int32),
                        jnp.zeros((0, 1), jnp.float32))
            i, v = csr_to_ell(spill.indptr, spill.indices,
                              spill.data.astype(np.float32),
                              spill.shape[1])
            return jnp.asarray(i), jnp.asarray(v)

        self.sd_idx, self.sd_val = ell_or_empty(spill_d)
        self.st_idx, self.st_val = ell_or_empty(spill_t)

    def _winell_dot_main(self, v_main):
        if self._winell_shard is not None:
            return self._winell_dot_sharded(v_main)
        (w_dot, k_dot, *_, has_sd, _unused, interpret) = self._winell_meta
        n = self._shape_main[0]
        r = winell_mod.winell_matvec(
            self.widx_dot, self.wval_dot, v_main, n, w_dot, k_dot,
            interpret=interpret)
        if has_sd:
            r = r + jnp.sum(
                self.sd_val * jnp.take(v_main.astype(self.sd_val.dtype),
                                       self.sd_idx, axis=0), axis=1)
        return r

    def _winell_tdot_main(self, u, power=1):
        if self._winell_shard is not None:
            return self._winell_tdot_sharded(u, power=power)
        (_, _, w_tdot, k_tdot, _unused, has_st,
         interpret) = self._winell_meta
        p_main = self._shape_main[1]
        r = winell_mod.winell_matvec(
            self.widx_tdot, self.wval_tdot, u, p_main, w_tdot, k_tdot,
            square=(power == 2), interpret=interpret)
        if has_st:
            val = self.st_val * self.st_val if power == 2 else self.st_val
            r = r + jnp.sum(
                val * jnp.take(u.astype(self.st_val.dtype),
                               self.st_idx, axis=0), axis=1)
        return r

    def _winell_dot_sharded(self, v_main):
        """X v over the observation mesh: each device runs the kernel
        on its privately-packed row block — row-local, no collective."""
        from jax.sharding import PartitionSpec as P
        (mesh, ax, w_dot, k_dot, _wt, _kt, n_loc,
         interpret) = self._winell_shard
        n = self._shape_main[0]

        def local(idx, val, sdi, sdv, v):
            r = winell_mod.winell_matvec(
                idx[0], val[0], v, n_loc, w_dot, k_dot,
                interpret=interpret)
            return r + jnp.sum(
                sdv[0] * jnp.take(v, sdi[0], axis=0), axis=1)

        f = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(ax), P(ax), P(ax), P(ax), P()),
            out_specs=P(ax), check_vma=False)
        return f(self.widx_dot, self.wval_dot, self.sd_idx, self.sd_val,
                 v_main.astype(self.wval_dot.dtype))[:n]

    def _winell_tdot_sharded(self, u, power=1):
        """X' u over the observation mesh: per-block partial products
        reduced with a psum (lowers to ICI collectives on a pod)."""
        from jax.sharding import PartitionSpec as P
        (mesh, ax, _wd, _kd, w_tdot, k_tdot, n_loc,
         interpret) = self._winell_shard
        p_main = self._shape_main[1]
        n_dev = mesh.shape[ax]
        u_pad = jnp.zeros(n_dev * n_loc, self.wval_tdot.dtype).at[
            :u.shape[0]].set(u.astype(self.wval_tdot.dtype))

        def local(idx, val, sti, stv, u_loc):
            r = winell_mod.winell_matvec(
                idx[0], val[0], u_loc, p_main, w_tdot, k_tdot,
                square=(power == 2), interpret=interpret)
            sv = stv[0] * stv[0] if power == 2 else stv[0]
            r = r + jnp.sum(sv * jnp.take(u_loc, sti[0], axis=0), axis=1)
            return jax.lax.psum(r, ax)

        f = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(ax), P(ax), P(ax), P(ax), P(ax)),
            out_specs=P(), check_vma=False)
        return f(self.widx_tdot, self.wval_tdot, self.st_idx,
                 self.st_val, u_pad)

    def shard_winell(self, mesh, axis_name):
        """Shard the windowed-ELL backend along the observation axis.

        The packed (window, tile, slot) cells interleave observations,
        so instead of slicing the packed arrays each device re-packs its
        own contiguous block of observation rows (and that block's
        transpose) into private windowed-ELL arrays, stacked along a
        leading device axis. ``X v`` then runs the kernel on the local
        block with no communication; ``X' u`` partial products psum over
        ICI. Storage is nnz-proportional, so the observation axis is the
        memory scaler; a 2-d mesh's predictor axis is not used. Must be
        called on the construction-time object (the host CSR is retained
        there for the re-pack). Returns self.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P
        if self.backend != 'winell':
            raise ValueError("shard_winell requires the winell backend")
        X = getattr(self, '_csr_host', None)
        if X is None:
            raise ValueError(
                "shard_winell needs the construction-time CSR, which is "
                "not carried through jit flattening; shard the design "
                "before handing it to jitted code.")
        n_dev = mesh.shape[axis_name]
        n, p = X.shape
        n_loc = -(-n // n_dev)
        nnz_loc = max(1, X.nnz // n_dev)
        # One shared packing plan keeps per-device shapes uniform.
        w_dot, k_dot = winell_mod.plan_windows(p, n_loc, nnz_loc)
        w_tdot, k_tdot = winell_mod.plan_windows(n_loc, p, nnz_loc)

        def spill_ell(spill, n_rows):
            if spill is None:
                return (np.zeros((n_rows, 1), np.int32),
                        np.zeros((n_rows, 1), np.float32))
            i, v = csr_to_ell(spill.indptr, spill.indices,
                              spill.data.astype(np.float32),
                              spill.shape[1])
            return i, v

        def pad_stack(pairs):
            width = max(i.shape[1] for i, _ in pairs)
            return (
                np.stack([np.pad(i, ((0, 0), (0, width - i.shape[1])))
                          for i, _ in pairs]),
                np.stack([np.pad(v, ((0, 0), (0, width - v.shape[1])))
                          for _, v in pairs]))

        idx_d, val_d, idx_t, val_t, sd, st = [], [], [], [], [], []
        for d in range(n_dev):
            Xd = X[d * n_loc:min((d + 1) * n_loc, n)]
            if Xd.shape[0] < n_loc:
                Xd = sps.vstack(
                    [Xd, sps.csr_matrix((n_loc - Xd.shape[0], p),
                                        dtype=Xd.dtype)]).tocsr()
            Xd.sort_indices()
            i, v, s = winell_mod.pack_winell(Xd, w_dot, k_dot)
            idx_d.append(i)
            val_d.append(v)
            sd.append(spill_ell(s, n_loc))
            Xt = Xd.T.tocsr()
            Xt.sort_indices()
            i, v, s = winell_mod.pack_winell(Xt, w_tdot, k_tdot)
            idx_t.append(i)
            val_t.append(v)
            st.append(spill_ell(s, p))

        put = lambda x, spec: jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, spec))
        dev3 = P(axis_name, None, None)
        self.widx_dot = put(np.stack(idx_d), dev3)
        self.wval_dot = put(np.stack(val_d), dev3)
        self.widx_tdot = put(np.stack(idx_t), dev3)
        self.wval_tdot = put(np.stack(val_t), dev3)
        si, sv = pad_stack(sd)
        self.sd_idx, self.sd_val = put(si, dev3), put(sv, dev3)
        si, sv = pad_stack(st)
        self.st_idx, self.st_val = put(si, dev3), put(sv, dev3)
        self.column_offset = put(self.column_offset, P())
        interpret = self._winell_meta[-1]
        self._winell_shard = (mesh, axis_name, w_dot, k_dot,
                              w_tdot, k_tdot, n_loc, interpret)
        return self

    def _build_ell(self, X, dtype):
        self.exact_is_binary = False
        (row_idx, row_val), (col_idx, col_val) = \
            dual_ell_from_scipy(X, dtype)
        self.row_idx = jnp.asarray(row_idx)
        self.row_val = jnp.asarray(row_val)
        self.col_idx = jnp.asarray(col_idx)
        self.col_val = jnp.asarray(col_val)

    # -- pytree protocol ------------------------------------------------ #

    def tree_flatten(self):
        if self.backend == 'hybrid':
            arrays = (self.X_exact, self.X_float, self.exact_cols,
                      self.float_cols, self.column_offset)
        elif self.backend == 'bitpack':
            arrays = (self.bits_col, self.bits_row, self.X_float,
                      self.bin_cols, self.float_cols, self.column_offset)
        elif self.backend == 'winell':
            arrays = (self.widx_dot, self.wval_dot, self.widx_tdot,
                      self.wval_tdot, self.sd_idx, self.sd_val,
                      self.st_idx, self.st_val, self.column_offset)
        else:
            arrays = (self.row_idx, self.row_val, self.col_idx,
                      self.col_val, self.column_offset)
        aux = (self.intercept_added, self.centered, self.backend,
               self._shape_main, self._nnz,
               getattr(self, 'exact_is_binary', False),
               getattr(self, '_bitpack_meta', None),
               getattr(self, '_winell_meta', None),
               getattr(self, '_bitpack_shard', None),
               getattr(self, '_winell_shard', None),
               getattr(self, '_hybrid_sharded', False),
               getattr(self, '_hybrid_shard', None),
               getattr(self, 'fused_policy', None))
        return arrays, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (intercept_added, centered, backend, shape_main, nnz, binary,
         bitpack_meta, winell_meta, bitpack_shard, winell_shard,
         hybrid_sharded, hybrid_shard) = aux[:12]
        # Designs cached (pickled aux) before the fused_policy field
        # existed unflatten with the None (env-var) default.
        fused = aux[12] if len(aux) > 12 else None
        obj = cls(None, center_predictor=centered,
                  add_intercept=intercept_added, fused=fused,
                  _parts=((backend, shape_main, nnz, binary,
                           bitpack_meta, winell_meta), children))
        obj._bitpack_shard = bitpack_shard
        obj._winell_shard = winell_shard
        obj._hybrid_sharded = hybrid_sharded
        obj._hybrid_shard = hybrid_shard
        return obj

    # -- shape / metadata ------------------------------------------------ #

    @property
    def shape(self):
        n, p = self._shape_main
        return n, p + int(self.intercept_added)

    @property
    def is_sparse(self):
        return True

    @property
    def nnz(self):
        """nnz of the stored main part (used by the sampler-choice cost
        model only, sparse_matrix.py:60-66)."""
        return self._nnz

    @property
    def dtype(self):
        if self.backend == 'winell':
            return self.column_offset.dtype
        if self.backend in ('hybrid', 'bitpack'):
            if self.X_float.size:
                return self.X_float.dtype
            if self.backend == 'bitpack':
                return self.column_offset.dtype
            if self.X_exact.dtype in (jnp.int4, jnp.int8):
                # Sub-word integer tiers have no implicit promotion
                # path; their working dtype is the f32 they up-convert
                # into inside the matmuls.
                return jnp.dtype(jnp.float32)
            return jnp.promote_types(self.X_exact.dtype, jnp.float32)
        return self.row_val.dtype

    # -- core products --------------------------------------------------- #

    # Stored blocks may carry zero-padded rows/columns (added by
    # parallel.sharding._put_pad so uneven shapes still shard evenly
    # over a mesh): operand vectors are zero-padded to the stored width
    # and outputs sliced back, making the padding semantically inert.

    @staticmethod
    def _pad1(u, m):
        pad = m - u.shape[0]
        return u if pad == 0 else jnp.pad(u, (0, pad))

    def _exact_block(self):
        """The exact block as an MXU operand. int4/int8 are widened to
        bf16 (exact for integers up to 127); XLA fuses the convert into
        the consuming matmul so HBM traffic stays at the stored width
        (0.5 B/elem for the packed s4 form)."""
        Xe = self.X_exact
        if Xe.dtype in (jnp.int4, jnp.int8):
            return Xe.astype(jnp.bfloat16)
        return Xe

    def _bitpack_dot_bin(self, v_bin):
        """Binary-column part of X @ v via the byte-LUT Pallas kernel.
        On a mesh (`shard_bitpack`), each device runs the kernel on its
        shard of the column-packed bitmap — X v is row-local over the
        observation axis; with a predictor axis, each column shard
        builds its LUT from its own slice of v and the partial outputs
        psum over the predictor axis (ICI)."""
        p_bin, gcol_pad, n_pad, k_dot, *_, interpret = self._bitpack_meta
        v_pad = jnp.zeros(8 * gcol_pad, v_bin.dtype).at[:p_bin].set(v_bin)
        if self._bitpack_shard is None:
            return bitlut.bitpacked_matvec(
                self.bits_col, v_pad, self._shape_main[0], k_dot,
                interpret=interpret)
        mesh, ax, pax = self._bitpack_shard
        from jax.sharding import PartitionSpec as P
        if pax is None:
            f = jax.shard_map(
                lambda bits, v: bitlut.bitpacked_matvec(
                    bits, v, bits.shape[1], k_dot, interpret=interpret),
                mesh=mesh, in_specs=(P(None, ax), P()), out_specs=P(ax),
                check_vma=False)
        else:
            f = jax.shard_map(
                lambda bits, v: jax.lax.psum(
                    bitlut.bitpacked_matvec(bits, v, bits.shape[1],
                                            k_dot, interpret=interpret),
                    pax),
                mesh=mesh, in_specs=(P(pax, ax), P(pax)),
                out_specs=P(ax), check_vma=False)
        return f(self.bits_col, v_pad)[:self._shape_main[0]]

    def _bitpack_tdot_bin(self, u):
        """Binary-column part of X' @ u via the same kernel on the
        row-packed bitmap. On a mesh, each device reduces its row
        shard's partial X' u and the partials are psum-ed over ICI;
        with a predictor axis, each column shard emits its own slice
        of the output (no reduction over that axis)."""
        (p_bin, _, _, _, grow_pad, pbin_pad, k_tdot,
         interpret) = self._bitpack_meta
        u_pad = jnp.zeros(8 * grow_pad, u.dtype).at[:u.shape[0]].set(u)
        if self._bitpack_shard is None:
            return bitlut.bitpacked_matvec(
                self.bits_row, u_pad, p_bin, k_tdot, interpret=interpret)
        mesh, ax, pax = self._bitpack_shard
        from jax.sharding import PartitionSpec as P
        if pax is None:
            f = jax.shard_map(
                lambda bits, u_loc: jax.lax.psum(
                    bitlut.bitpacked_matvec(bits, u_loc, p_bin, k_tdot,
                                            interpret=interpret), ax),
                mesh=mesh, in_specs=(P(ax, None), P(ax)), out_specs=P(),
                check_vma=False)
            return f(self.bits_row, u_pad)
        f = jax.shard_map(
            lambda bits, u_loc: jax.lax.psum(
                bitlut.bitpacked_matvec(bits, u_loc, bits.shape[1],
                                        k_tdot, interpret=interpret), ax),
            mesh=mesh, in_specs=(P(ax, pax), P(ax)), out_specs=P(pax),
            check_vma=False)
        return f(self.bits_row, u_pad)[:p_bin]

    def shard_bitpack(self, mesh, axis_name, pred_axis=None):
        """Shard the dual bitmaps over the mesh, re-padding so every
        device holds whole kernel blocks.

        1-d (`pred_axis=None`): the OBSERVATION axis is sharded —
        bits_col by its output/lane axis, bits_row by its input
        byte-group axis. 2-d: the packed-predictor axis additionally
        shards over `mesh[pred_axis]` — bits_col by byte-groups (each
        shard LUTs its slice of v; X v partials psum over predictors)
        and bits_row by output lanes (each shard owns a slice of X' u).
        X_float rows shard along the observation axis; the p-length
        state stays replicated. Returns self."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        if self.backend != 'bitpack':
            raise ValueError("shard_bitpack requires the bitpack backend")
        n_dev = mesh.shape[axis_name]
        n_pshard = mesh.shape[pred_axis] if pred_axis else 1
        (p_bin, gcol_pad, n_pad, k_dot, grow_pad, pbin_pad, k_tdot,
         interpret) = self._bitpack_meta
        n_pad2 = -(-n_pad // (n_dev * k_dot * 128)) * (n_dev * k_dot * 128)
        grow_pad2 = -(-grow_pad // (n_dev * 32)) * (n_dev * 32)
        # Per-predictor-shard byte-group counts must stay kernel-legal
        # (multiples of 8; 32 keeps the wide block height).
        gcol_pad2 = -(-gcol_pad // (n_pshard * 8)) * (n_pshard * 8)
        pbin_pad2 = -(-pbin_pad // (n_pshard * k_tdot * 128)) \
            * (n_pshard * k_tdot * 128)
        self.bits_col = jnp.asarray(bitlut.pad_packed(
            np.asarray(self.bits_col), gcol_pad2, n_pad2))
        self.bits_row = jnp.asarray(bitlut.pad_packed(
            np.asarray(self.bits_row), grow_pad2, pbin_pad2))
        self._bitpack_meta = (p_bin, gcol_pad2, n_pad2, k_dot,
                              grow_pad2, pbin_pad2, k_tdot, interpret)
        put = lambda x, spec: jax.device_put(
            x, NamedSharding(mesh, spec))
        self.bits_col = put(self.bits_col, P(pred_axis, axis_name))
        self.bits_row = put(self.bits_row, P(axis_name, pred_axis))
        if self.X_float.size:
            # Zero-pad the float block's rows to the mesh rather than
            # silently replicating it: at bitpack scale the (n x
            # p_float) f32 block can be the dominant per-device
            # footprint, so falling back to replication on an uneven
            # observation count would forfeit the memory scaling the
            # axis exists for. Every consumer pads its row operand
            # (`_pad1`) or slices the product back to n — padded rows
            # are genuine zeros, contributing nothing to reductions.
            n_f = self.X_float.shape[0]
            n_f_pad = -(-n_f // n_dev) * n_dev
            if n_f_pad != n_f:
                self.X_float = jnp.pad(
                    self.X_float, ((0, n_f_pad - n_f), (0, 0)))
            self.X_float = put(self.X_float, P(axis_name, None))
        self.column_offset = put(self.column_offset, P())
        self._bitpack_shard = (mesh, axis_name, pred_axis)
        return self

    def main_dot(self, v_main):
        """(X_main - 1 column_offset') @ v_main."""
        n = self._shape_main[0]
        if self.backend == 'hybrid':
            # bf16 @ f32 promotes: XLA fuses the up-convert into the MXU
            # matmul, so HBM traffic stays at the stored (int8/bf16) width.
            Xe = self._exact_block()
            result = Xe @ self._pad1(
                jnp.take(v_main, self.exact_cols), Xe.shape[1])
            if self.float_cols.size:
                result = result + self.X_float @ self._pad1(
                    jnp.take(v_main, self.float_cols),
                    self.X_float.shape[1])
            result = result[:n]
        elif self.backend == 'bitpack':
            result = self._bitpack_dot_bin(jnp.take(v_main, self.bin_cols))
            if self.float_cols.size:
                # X_float may carry zero rows padded to the mesh.
                result = result + (self.X_float @ jnp.take(
                    v_main, self.float_cols))[:result.shape[0]]
        elif self.backend == 'winell':
            result = self._winell_dot_main(v_main)
        else:
            gathered = jnp.take(v_main, self.row_idx, axis=0)
            result = jnp.sum(self.row_val * gathered, axis=1)[:n]
        return result - self.column_offset @ v_main

    def main_Tdot(self, u):
        """(X_main - 1 column_offset')' @ u."""
        if self.backend == 'hybrid':
            out_dtype = self.column_offset.dtype
            p_main = self._shape_main[1]
            Xe = self._exact_block()
            u_pad = self._pad1(u, Xe.shape[0])
            result = jnp.zeros(p_main, out_dtype)
            result = result.at[self.exact_cols].set(
                (Xe.T @ u_pad)[:self.exact_cols.shape[0]])
            if self.float_cols.size:
                result = result.at[self.float_cols].set(
                    (self.X_float.T @ u_pad)[:self.float_cols.shape[0]])
        elif self.backend == 'bitpack':
            p_main = self._shape_main[1]
            result = jnp.zeros(p_main, self.column_offset.dtype)
            result = result.at[self.bin_cols].set(self._bitpack_tdot_bin(u))
            if self.float_cols.size:
                result = result.at[self.float_cols].set(
                    self.X_float.T @ self._pad1(u, self.X_float.shape[0]))
        elif self.backend == 'winell':
            result = self._winell_tdot_main(u)
        else:
            gathered = jnp.take(u, self.col_idx, axis=0)
            result = jnp.sum(self.col_val * gathered,
                             axis=1)[:self._shape_main[1]]
        return result - jnp.sum(u) * self.column_offset

    def fused_ne_mode(self, kind='quad'):
        """Interpret-flag for the fused one-sweep kernel serving the
        `kind` call site ('quad' | 'presolve' | 'link'), else None
        (composed dot/Tdot): the kernels serve unsharded f32 hybrid
        designs whose exact block is a storage dtype they can
        up-convert, and the default policy fuses only the pre-solve
        group (design/fusedne.dispatch_mode has the measured argument).
        bench.py's roofline model keys its per-array pass counts on
        this."""
        interpret = fusedne.dispatch_mode(kind, self.fused_policy)
        if (interpret is None or self.backend != 'hybrid'
                or (self._hybrid_sharded and self._hybrid_shard is None)
                or self.dtype != jnp.float32
                or self.X_exact.dtype not in (jnp.int8, jnp.bfloat16,
                                              jnp.float32)
                or self.exact_cols.size == 0):
            return None
        if self._hybrid_shard is None:
            # Blocks sharded by hand (e.g. assigned from
            # host_local_to_global on a multi-host job) rather than
            # through shard_design: pallas_call cannot partition a
            # multi-device operand outside shard_map, so fall back to
            # the composed path, which GSPMD partitions fine. (Tracers
            # don't expose device placement — the eager call sites
            # decide before tracing.)
            try:
                multi = len(self.X_exact.sharding.device_set) > 1
            except Exception:
                multi = False
            if multi:
                return None
        return interpret

    def _fused_sharded_call(self, local_fn, row_vecs, rep_args, n_outs):
        """Run a fused kernel per observation shard under shard_map
        (1-d obs mesh, `_hybrid_shard`): `local_fn(Xe, Xf_or_None,
        row_locals, rep_args)` returns a flat tuple of `n_outs`
        p-length / scalar partials, each psum-reduced over the mesh
        axis (ICI collectives on a pod). Row vectors of true length n
        are zero-padded to the mesh-padded row count — the padded rows
        of the stored blocks are genuine zeros, so they contribute
        nothing to any reduction."""
        from jax.sharding import PartitionSpec as P
        mesh, ax = self._hybrid_shard
        n = self._shape_main[0]
        n_pad = self.X_exact.shape[0]
        pads = tuple(jnp.zeros(n_pad, self.dtype).at[:n].set(u)
                     for u in row_vecs)
        has_float = bool(self.float_cols.size)
        n_rows = len(pads)

        if has_float:
            def wrapped(Xe, Xf, *rest):
                outs = local_fn(Xe, Xf, rest[:n_rows], rest[n_rows:])
                return tuple(jax.lax.psum(o, ax) for o in outs)
            in_specs = (P(ax, None), P(ax, None)) \
                + (P(ax),) * n_rows + (P(),) * len(rep_args)
            args = (self.X_exact, self.X_float) + pads + tuple(rep_args)
        else:
            def wrapped(Xe, *rest):
                outs = local_fn(Xe, None, rest[:n_rows], rest[n_rows:])
                return tuple(jax.lax.psum(o, ax) for o in outs)
            in_specs = (P(ax, None),) \
                + (P(ax),) * n_rows + (P(),) * len(rep_args)
            args = (self.X_exact,) + pads + tuple(rep_args)
        f = jax.shard_map(wrapped, mesh=mesh, in_specs=in_specs,
                          out_specs=(P(),) * n_outs, check_vma=False)
        return f(*args)

    def quad_matvec(self, v, weight, return_t=False):
        """X' (weight * (X v)) — the CG operator's design part
        (reference: bayesbridge/reg_coef_sampler/cg_sampler.py:104-113).
        On the hybrid backend BOTH stored blocks are swept ONCE by the
        fused normal-equations Pallas kernel (design/fusedne.py, 2x
        less traffic than dot-then-Tdot — the whole operator
        application is a single HBM sweep of the design); the intercept
        and centering fold into the kernel's per-row offset `c` and its
        returned residual vector `u = weight * (X v)`. `return_t`
        routes through the composed expressions — the kernel returns
        the weighted residual, not the raw predictor."""
        interpret = self.fused_ne_mode('quad')
        if interpret is None or return_t:
            return super().quad_matvec(v, weight, return_t)
        n, p_main = self._shape_main
        v = jnp.asarray(v, self.dtype)
        weight = jnp.asarray(weight, self.dtype)
        if self.intercept_added:
            v0, v_main = v[0], v[1:]
        else:
            v0, v_main = jnp.zeros((), self.dtype), v
        ve = self._pad1(jnp.take(v_main, self.exact_cols),
                        self.X_exact.shape[1])
        c_scalar = v0 - self.column_offset @ v_main
        has_float = bool(self.float_cols.size)
        vf = self._pad1(jnp.take(v_main, self.float_cols),
                        self.X_float.shape[1]) if has_float else None
        if self._hybrid_shard is not None:
            def local(Xe, Xf, rows, reps):
                (w_l,), (ve_r, *vf_r_c) = rows, reps
                c_vec = jnp.full((Xe.shape[0],), vf_r_c[-1], self.dtype)
                if Xf is not None:
                    oe, of, u = fusedne.fused_ne_matvec2(
                        Xe, Xf, ve_r, vf_r_c[0], c_vec, w_l,
                        interpret=interpret)
                    return oe, of, jnp.sum(u)
                oe, u = fusedne.fused_ne_matvec(
                    Xe, ve_r, c_vec, w_l, interpret=interpret)
                return oe, jnp.sum(u)
            reps = (ve, vf, c_scalar) if has_float else (ve, c_scalar)
            outs = self._fused_sharded_call(
                local, (weight,), reps, 3 if has_float else 2)
            out_e, out_f = outs[0], outs[1] if has_float else None
            sum_u = outs[-1]
        else:
            c_vec = jnp.full((n,), c_scalar, self.dtype)
            if has_float:
                out_e, out_f, u = fusedne.fused_ne_matvec2(
                    self.X_exact[:n], self.X_float[:n], ve, vf, c_vec,
                    weight, interpret=interpret)
            else:
                out_e, u = fusedne.fused_ne_matvec(
                    self.X_exact[:n], ve, c_vec, weight,
                    interpret=interpret)
            sum_u = jnp.sum(u)
        result = jnp.zeros(p_main, self.dtype)
        result = result.at[self.exact_cols].set(
            out_e[:self.exact_cols.shape[0]])
        if self.float_cols.size:
            result = result.at[self.float_cols].set(
                out_f[:self.float_cols.shape[0]])
        result = result - sum_u * self.column_offset
        if self.intercept_added:
            result = jnp.concatenate((sum_u[None], result))
        self.dot_count += 1
        self.Tdot_count += 1
        return result

    # -- block-ordered CG data path -------------------------------------- #

    def cg_blockorder_ctx(self):
        """(perm, unperm, offset_bo) for a BLOCK-ORDERED CG solve, or
        None where inapplicable.

        The hybrid backend stores its columns dtype-split, so every
        composed `quad_matvec` gathers the operand into block order and
        scatters the result back — two p-length random-index shuffles
        PER CG ITERATION (~0.35 ms each at p=50k on v5e, measured
        ~4.9 ms/Gibbs-iteration on the flagship trace). CG is
        permutation-equivariant, so the solver instead conjugates the
        WHOLE solve by the block permutation: operands reorder once at
        entry, `quad_matvec_blockorder` splits by static SLICES (free),
        and the draw unpermutes once at exit.

        `perm` maps block order -> original positions (gather
        original[perm] to get block order); `unperm` inverts it;
        `offset_bo` is the centering offset in block order (computed
        once per solve — inside the CG loop it must not be re-gathered).
        """
        if self.backend != 'hybrid' or self._hybrid_sharded \
                or self.fused_ne_mode('quad') is not None:
            return None
        return self._blockorder_perm()

    def _blockorder_perm(self):
        """(perm, unperm, offset_bo) of the hybrid dtype-split column
        layout, independent of the CG-eligibility gate above."""
        perm_main = jnp.concatenate((
            jnp.asarray(self.exact_cols), jnp.asarray(self.float_cols)))
        offset_bo = jnp.take(self.column_offset, perm_main)
        if self.intercept_added:
            perm = jnp.concatenate((
                jnp.zeros(1, perm_main.dtype), perm_main + 1))
        else:
            perm = perm_main
        unperm = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(perm.shape[0], dtype=perm.dtype))
        return perm, unperm, offset_bo

    def quad_matvec_blockorder(self, v_bo, weight, offset_bo,
                               return_t=False):
        """`quad_matvec` on a block-ordered operand: out_bo such that
        out_bo[unperm] == quad_matvec(v_bo[unperm], weight), with the
        column split/reassembly done by static slices instead of
        per-call gathers/scatters (see `cg_blockorder_ctx`).
        `return_t=True` additionally returns the forward intermediate
        ``t = X v`` (observation order — independent of the column
        permutation), from which the CG solver accumulates the final
        draw's linear predictor."""
        n = self._shape_main[0]
        pe_t = self.exact_cols.shape[0]
        v_bo = jnp.asarray(v_bo, self.dtype)
        weight = jnp.asarray(weight, self.dtype)
        if self.intercept_added:
            v0, v_main_bo = v_bo[0], v_bo[1:]
        else:
            v0 = jnp.zeros((), self.dtype)
            v_main_bo = v_bo
        ve, vf = v_main_bo[:pe_t], v_main_bo[pe_t:]
        Xe = self._exact_block()
        t = Xe @ self._pad1(ve, Xe.shape[1])
        if self.float_cols.size:
            t = t + self.X_float @ self._pad1(vf, self.X_float.shape[1])
        t = t[:n] + (v0 - offset_bo @ v_main_bo)
        u = weight * t
        sum_u = jnp.sum(u)
        out_e = (Xe.T @ self._pad1(u, Xe.shape[0]))[:pe_t]
        if self.float_cols.size:
            out_f = (self.X_float.T @ self._pad1(
                u, self.X_float.shape[0]))[:self.float_cols.shape[0]]
            main = jnp.concatenate((out_e, out_f))
        else:
            main = out_e
        main = main - sum_u * offset_bo
        self.dot_count += 1
        self.Tdot_count += 1
        out = jnp.concatenate((sum_u[None], main)) \
            if self.intercept_added else main
        return (out, t) if return_t else out

    def fused_link_grad(self, v, a, b, mid):
        """GLM loglik + gradient in ONE sweep of the hybrid blocks:
        (loglik, Tdot(u)) with u the `mid` link score of t = X v (see
        design/fusedne.py). Returns None when the fused kernel is not
        eligible — the model falls back to its composed dot-then-Tdot
        expressions."""
        interpret = self.fused_ne_mode('link')
        if interpret is None:
            return None
        n, p_main = self._shape_main
        v = jnp.asarray(v, self.dtype)
        a = jnp.asarray(a, self.dtype)
        b = jnp.asarray(b, self.dtype)
        if self.intercept_added:
            v0, v_main = v[0], v[1:]
        else:
            v0, v_main = jnp.zeros((), self.dtype), v
        ve = self._pad1(jnp.take(v_main, self.exact_cols),
                        self.X_exact.shape[1])
        c_scalar = v0 - self.column_offset @ v_main
        has_float = bool(self.float_cols.size)
        vf = self._pad1(jnp.take(v_main, self.float_cols),
                        self.X_float.shape[1]) if has_float else None
        if self._hybrid_shard is not None:
            def local(Xe, Xf, rows, reps):
                (a_l, b_l), (ve_r, *vf_r_c) = rows, reps
                c_vec = jnp.full((Xe.shape[0],), vf_r_c[-1], self.dtype)
                Xs = (Xe, Xf) if Xf is not None else (Xe,)
                vs = (ve_r, vf_r_c[0]) if Xf is not None else (ve_r,)
                os_, u, lp = fusedne.fused_link_matvec(
                    Xs, vs, c_vec, a_l, b_l, mid, with_logp=True,
                    interpret=interpret)
                return tuple(os_) + (jnp.sum(u), lp)
            reps = (ve, vf, c_scalar) if has_float else (ve, c_scalar)
            res = self._fused_sharded_call(
                local, (a, b), reps, (4 if has_float else 3))
            outs = res[:-2]
            sum_u, logp = res[-2], res[-1]
        else:
            c_vec = jnp.full((n,), c_scalar, self.dtype)
            if has_float:
                Xs, vs = (self.X_exact[:n], self.X_float[:n]), (ve, vf)
            else:
                Xs, vs = (self.X_exact[:n],), (ve,)
            outs, u, logp = fusedne.fused_link_matvec(
                Xs, vs, c_vec, a, b, mid, with_logp=True,
                interpret=interpret)
            sum_u = jnp.sum(u)
        grad = jnp.zeros(p_main, self.dtype)
        grad = grad.at[self.exact_cols].set(
            outs[0][:self.exact_cols.shape[0]])
        if self.float_cols.size:
            grad = grad.at[self.float_cols].set(
                outs[1][:self.float_cols.shape[0]])
        grad = grad - sum_u * self.column_offset
        if self.intercept_added:
            grad = jnp.concatenate((sum_u[None], grad))
        self.dot_count += 1
        self.Tdot_count += 1
        return logp, grad

    def has_presolve_reductions(self):
        """The hybrid backend serves the batched pre-solve layout (the
        multi-RHS dot below, or the fused kernel under a 'full'/'1'
        policy); other sparse backends compose per reduction."""
        return self.backend == 'hybrid' and self.exact_cols.size > 0

    def _presolve_multirhs(self, u1, u2, u3, u4=None):
        """The pre-solve transpose reductions as ONE multi-RHS
        MXU dot per stored block — ``X_b' @ [u1 u2 u3 (u4)]`` — plus
        each block's squared-column moment: free for a binary exact
        block (0/1 idempotence reuses column 3), an extra matvec over
        the float block ((Xf.Xf)'u3, the square fusing into the dot's
        operand read). Against the reference's three separate CSR
        passes (reg_coef_sampler.py:60-103 + cg_sampler.py:140-143)
        this is 1 + float-fraction passes; against the round-3 fused
        VPU sweep it measured 1.41x faster on the v5e because the MXU
        streams the blocks at ~755 GB/s where the sweep is VPU-bound
        (baselines/dev_ne_variants.py --presolve, BASELINE.md). The
        optional `u4` (the warm start's weighted predictor) widens the
        same dot by one column — the stored bytes are read no extra
        time, which is what lets the CG initial residual cost one
        forward pass instead of a dot+Tdot pair.

        Precision: wide (rhs > 1) f32 dots at DEFAULT precision chain
        MXU partials through bf16 on TPU (~2e-3 rel err), so both
        dots request HIGH — measured 1.3e-5 vs an accurate oracle at
        14.0 ms/6.5 GB on the flagship shape, where HIGHEST costs
        16.2 ms for 7.6e-6 (baselines/dev_ne_variants.py --presolve).
        Returns (outs, sums) in fused_tdots's layout: per block
        (X'u1, X'u2, X'u3, (X.X)'u3[, X'u4]) plus the operand sums."""
        dtype = self.dtype
        hi = jax.lax.Precision.HIGH
        Xe = self._exact_block()
        cols = [u1, u2, u3] + ([u4] if u4 is not None else [])
        U = jnp.stack(cols, axis=1)
        pad = Xe.shape[0] - U.shape[0]
        U_pad = U if pad == 0 else jnp.pad(U, ((0, pad), (0, 0)))
        Re = jax.lax.dot_general(
            Xe, U_pad, (((0,), (0,)), ((), ())), precision=hi,
            preferred_element_type=dtype)[:self.exact_cols.shape[0]]
        if getattr(self, 'exact_is_binary', False):
            sq_e = Re[:, 2]
        else:
            if self.X_exact.dtype == jnp.int4:
                # int4 squares stay <= 64 < 256: exact in bf16.
                Xe2 = jnp.square(Xe)
            else:
                # Integer squares can exceed bf16's exact-int range
                # (256); square in the working dtype.
                Xe2 = jnp.square(Xe.astype(dtype))
            sq_e = (Xe2.T @ U_pad[:, 2])[:self.exact_cols.shape[0]]
        blk_e = (Re[:, 0], Re[:, 1], Re[:, 2], sq_e)
        if u4 is not None:
            blk_e = blk_e + (Re[:, 3],)
        outs = [blk_e]
        if self.float_cols.size:
            Xf = self.X_float
            padf = Xf.shape[0] - U.shape[0]
            U_padf = U if padf == 0 \
                else jnp.pad(U, ((0, padf), (0, 0)))
            Rf = jax.lax.dot_general(
                Xf, U_padf, (((0,), (0,)), ((), ())), precision=hi,
                preferred_element_type=dtype)[:self.float_cols.shape[0]]
            sq_f = ((Xf * Xf).T @ U_padf[:, 2])[:self.float_cols.shape[0]]
            blk_f = (Rf[:, 0], Rf[:, 1], Rf[:, 2], sq_f)
            if u4 is not None:
                blk_f = blk_f + (Rf[:, 3],)
            outs.append(blk_f)
        sums = [jnp.sum(u) for u in cols]
        return outs, sums

    def presolve_reductions(self, u1, u2, u3, u4=None):
        """(Tdot(u1), Tdot(u2), fisher_diag(u3)[, Tdot(u4)]) in one
        batched layout: the composed multi-RHS MXU dots
        (`_presolve_multirhs`, the measured default) or — under a
        'full'/'1' fused policy — ONE sweep of the hybrid blocks via
        the fused reduction kernel (design/fusedne.py fused_tdots;
        `u4` then composes as a separate Tdot since the kernel's
        reduction set is fixed). The intercept, centering, and
        squared-column-moment corrections are assembled from the
        per-block outputs exactly as main_Tdot / compute_fisher_diag
        do."""
        interpret = self.fused_ne_mode('presolve')
        if interpret is None and not self.has_presolve_reductions():
            return super().presolve_reductions(u1, u2, u3, u4)
        n, p_main = self._shape_main
        u1 = jnp.asarray(u1, self.dtype)
        u2 = jnp.asarray(u2, self.dtype)
        u3 = jnp.asarray(u3, self.dtype)
        if u4 is not None:
            u4 = jnp.asarray(u4, self.dtype)
        has_float = bool(self.float_cols.size)
        if interpret is None:
            outs, sums = self._presolve_multirhs(u1, u2, u3, u4)
        elif self._hybrid_shard is not None:
            def local(Xe, Xf, rows, reps):
                Xs = (Xe, Xf) if Xf is not None else (Xe,)
                blocks = fusedne.fused_tdots(Xs, *rows,
                                             interpret=interpret)
                flat = tuple(o for blk in blocks for o in blk)
                return flat + tuple(jnp.sum(u) for u in rows)
            res = self._fused_sharded_call(
                local, (u1, u2, u3), (), (8 if has_float else 4) + 3)
            outs = [tuple(res[4 * bi:4 * bi + 4])
                    for bi in range(2 if has_float else 1)]
            sums = list(res[-3:])
        else:
            Xs = (self.X_exact[:n], self.X_float[:n]) if has_float \
                else (self.X_exact[:n],)
            outs = fusedne.fused_tdots(Xs, u1, u2, u3,
                                       interpret=interpret)
            sums = [jnp.sum(u) for u in (u1, u2, u3)]

        def assemble(idx):
            res = jnp.zeros(p_main, self.dtype)
            res = res.at[self.exact_cols].set(
                outs[0][idx][:self.exact_cols.shape[0]])
            if has_float:
                res = res.at[self.float_cols].set(
                    outs[1][idx][:self.float_cols.shape[0]])
            return res

        v = assemble(0) - sums[0] * self.column_offset
        pert = assemble(1) - sums[1] * self.column_offset
        diag = assemble(3)
        if self.centered:
            wcol = assemble(2)  # raw X' u3 per main column (no offset)
            diag = diag - 2.0 * self.column_offset * wcol
            diag = diag + sums[2] * self.column_offset ** 2
        if self.intercept_added:
            v = jnp.concatenate((sums[0][None], v))
            pert = jnp.concatenate((sums[1][None], pert))
            diag = jnp.concatenate((sums[2][None], diag))
        self.Tdot_count += 2
        if u4 is None:
            return v, pert, diag
        if interpret is None:
            tdot4 = assemble(4) - sums[3] * self.column_offset
            if self.intercept_added:
                tdot4 = jnp.concatenate((sums[3][None], tdot4))
            self.Tdot_count += 1
        else:
            # The fused kernel's reduction set is fixed at four;
            # compose the warm-start column separately.
            tdot4 = self.Tdot(u4)
        return v, pert, diag, tdot4

    def dot(self, v):
        memo = self._check_memo(v)
        if memo is not None:
            return memo
        v_key = v  # memo keys on the CALLER's value: the device
        v = jnp.asarray(v, self.dtype)  # round-trip of the converted
        if self.intercept_added:        # array is lossy on emulated-f64
            result = self.main_dot(v[1:]) + v[0]  # backends
        else:
            result = self.main_dot(v)
        self._store_memo(v_key, result)
        self.dot_count += 1
        return result

    def Tdot(self, u):
        u = jnp.asarray(u, self.dtype)
        result = self.main_Tdot(u)
        if self.intercept_added:
            result = jnp.concatenate((jnp.sum(u)[None], result))
        self.Tdot_count += 1
        return result

    # -- Fisher information ---------------------------------------------- #

    def _weighted_col_moments(self, weight, power):
        """sum_i weight_i * X_ij^power per main column j."""
        if self.backend == 'winell':
            # The tdot packing evaluates X' w; the square flag folds
            # val**2 into the same kernel for the second moment.
            return self._winell_tdot_main(weight, power=power)
        if self.backend == 'bitpack':
            # 0/1 bits are idempotent under powers: both moments are the
            # plain weighted column sums X' w for the binary block.
            out_dtype = self.column_offset.dtype
            p_main = self._shape_main[1]
            r = jnp.zeros(p_main, out_dtype)
            r = r.at[self.bin_cols].set(self._bitpack_tdot_bin(weight))
            if self.float_cols.size:
                Xf = self.X_float * self.X_float if power == 2 \
                    else self.X_float
                r = r.at[self.float_cols].set(
                    Xf.T @ self._pad1(weight, Xf.shape[0]))
            return r
        if self.backend == 'hybrid':
            out_dtype = self.column_offset.dtype
            Xe = self._exact_block()
            Xf = self.X_float
            if power == 2:
                # 0/1 blocks square to themselves -> skip the n x p
                # squared transient for the (dominant) exact block.
                if not getattr(self, 'exact_is_binary', False):
                    if self.X_exact.dtype == jnp.int4:
                        # int4 squares stay <= 64 < 256: exact in bf16,
                        # no full-width squared transient needed.
                        Xe = jnp.square(Xe)
                    else:
                        # Integer squares can exceed bf16's exact-int
                        # range (256); square in the working dtype.
                        Xe = jnp.square(Xe.astype(out_dtype))
                Xf = Xf * Xf
            p_main = self._shape_main[1]
            w_pad = self._pad1(weight, Xe.shape[0])
            r = jnp.zeros(p_main, out_dtype)
            r = r.at[self.exact_cols].set(jnp.asarray(
                (Xe.T @ w_pad)[:self.exact_cols.shape[0]], out_dtype))
            if self.float_cols.size:
                r = r.at[self.float_cols].set(
                    (Xf.T @ w_pad)[:self.float_cols.shape[0]])
            return r
        w_gather = jnp.take(weight, self.col_idx, axis=0)
        val = self.col_val ** power
        return jnp.sum(val * w_gather, axis=1)[:self._shape_main[1]]

    def compute_fisher_diag(self, weight):
        """diag(X' W X) with centering/intercept corrections
        (sparse_matrix.py:164-177)."""
        weight = jnp.asarray(weight, self.dtype)
        diag = self._weighted_col_moments(weight, 2)
        if self.centered:
            weighted_col_sum = self._weighted_col_moments(weight, 1)
            diag = diag - 2.0 * self.column_offset * weighted_col_sum
            diag = diag + jnp.sum(weight) * self.column_offset ** 2
        if self.intercept_added:
            diag = jnp.concatenate((jnp.sum(weight)[None], diag))
        return diag

    def compute_fisher_info(self, weight, diag_only=False):
        """X' W X over the full (intercept + centered) design, built as
        a p x p Gram product WITHOUT densifying the n x p design
        (reference computes it sparsely too: sparse_matrix.py:131-162,
        via `X_csr.T @ diag(w) @ X_csr`). The hybrid/ell backends stream
        the stored blocks through row-chunked MXU matmuls whose
        transient is bounded (BB_GRAM_CHUNK_BYTES, default 256 MB), so
        large-n small-p designs — the regime where the sampler cost
        model SELECTS the Cholesky sampler — work at any n. The memory
        guard sits on the p x p OUTPUT (VERDICT r3 item 5), not on
        n x p."""
        if diag_only:
            return self.compute_fisher_diag(weight)
        n, p_main = self._shape_main
        p_total = p_main + int(self.intercept_added)
        if p_total * p_total > _DENSE_FISHER_MAX_ELEMS:
            raise MemoryError(
                "Refusing to build a {:d} x {:d} dense Fisher "
                "information matrix; use the CG sampler.".format(
                    p_total, p_total))
        weight = jnp.asarray(weight, self.dtype)
        if self.backend in ('hybrid', 'ell'):
            G, s1 = self._gram_main(weight)
        else:
            # bitpack/winell are the beyond-HBM backends (p in the
            # hundreds of thousands): the p x p output guard above
            # already rejects every Cholesky-sized case they would hit,
            # so the (n*p-guarded) densify only ever serves small
            # designs explicitly constructed with these backends.
            X = self._materialize_dense(main_only=True)
            Xw = weight[:, None] * X
            G = jnp.matmul(X.T, Xw,
                           precision=jax.lax.Precision.HIGHEST)
            s1 = X.T @ weight
        s0 = jnp.sum(weight)
        if self.centered:
            c = self.column_offset
            G = G - jnp.outer(c, s1) - jnp.outer(s1, c) \
                + s0 * jnp.outer(c, c)
            s1 = s1 - s0 * c
        if self.intercept_added:
            top = jnp.concatenate((s0[None], s1))
            G = jnp.concatenate((s1[:, None], G), axis=1)
            G = jnp.concatenate((top[None, :], G), axis=0)
        return G

    def _gram_main(self, weight):
        """(X' W X, X' w) over the UNCENTERED main columns, streamed in
        row chunks: each chunk up-converts its stored panels into the
        working dtype, scales one side by its weight slice, and feeds
        one MXU matmul accumulating into the p x p output — the n x p
        w-scaled transient of the naive form never materializes."""
        dtype = self.dtype
        p_main = self._shape_main[1]
        if self.backend == 'hybrid':
            blocks, idxs = [], []
            for b, ix in ((self.X_exact, self.exact_cols),
                          (self.X_float, self.float_cols)):
                if ix.size:  # slice off mesh-padding columns, if any
                    blocks.append(b[:, :ix.shape[0]])
                    idxs.append(ix)
            if not blocks:
                z = jnp.zeros((p_main, p_main), dtype)
                return z, jnp.zeros(p_main, dtype)
            m = blocks[0].shape[0]
            w = self._pad1(weight, m)  # padded block rows are zeros

            def chunk(start, size):
                return jnp.concatenate(
                    [jax.lax.dynamic_slice(
                        b, (start, 0), (size, b.shape[1])).astype(dtype)
                     for b in blocks], axis=1)

            G, s1 = _chunked_gram(chunk, m, sum(b.shape[1]
                                                for b in blocks), w, dtype)
            if len(idxs) == 1 and idxs[0].shape[0] == p_main:
                return G, s1  # single full block: already column order
            idx = jnp.concatenate(idxs)
            Gp = jnp.zeros((p_main, p_main), dtype)
            Gp = Gp.at[idx[:, None], idx[None, :]].set(G)
            return Gp, jnp.zeros(p_main, dtype).at[idx].set(s1)
        # ell: scatter each row chunk's (slot -> column) pairs into a
        # bounded dense panel, then the same MXU accumulation. Padded
        # slots add value 0 at column 0 — inert.
        m = self.row_idx.shape[0]
        w = self._pad1(weight, m)

        def chunk(start, size):
            idx_c = jax.lax.dynamic_slice(
                self.row_idx, (start, 0), (size, self.row_idx.shape[1]))
            val_c = jax.lax.dynamic_slice(
                self.row_val, (start, 0), (size, self.row_val.shape[1]))
            Z = jnp.zeros((size, p_main), dtype)
            rows = jnp.broadcast_to(jnp.arange(size)[:, None], idx_c.shape)
            return Z.at[rows, idx_c].add(val_c.astype(dtype))

        return _chunked_gram(chunk, m, p_main, w, dtype)

    def compute_transposed_fisher_info(self, weight, include_intrcpt=False):
        """X diag(weight) X' over predictors (sparse_matrix.py:182-196)."""
        weight = jnp.asarray(weight, self.dtype)
        weight_main = weight[1:] if include_intrcpt else weight
        X_main = self._materialize_dense(main_only=True)
        Xc = X_main - self.column_offset[None, :] if self.centered else X_main
        result = jnp.matmul(Xc * weight_main[None, :], Xc.T,
                            precision=jax.lax.Precision.HIGHEST)
        if include_intrcpt:
            result = result + weight[0]
        return result

    # -- densification ---------------------------------------------------- #

    def _materialize_dense(self, main_only=False):
        """Lazily build the dense design (centered, with intercept unless
        `main_only`). Used on Cholesky-sized problems only; guarded."""
        n, p_main = self._shape_main
        if n * p_main > _DENSE_FISHER_MAX_ELEMS:
            raise MemoryError(
                "Refusing to densify a {:d} x {:d} sparse design for the "
                "dense Fisher-information path; use the CG sampler.".format(
                    n, p_main)
            )
        if main_only:
            return self._densify_main()
        if self._dense_cache is not None:
            return self._dense_cache
        X = self._densify_main()
        if self.centered:
            X = X - self.column_offset[None, :]
        if self.intercept_added:
            X = jnp.concatenate(
                (jnp.ones((n, 1), self.dtype), X), axis=1)
        # Cache only concrete results: under a trace the arrays are
        # tracers (the design enters jit as a pytree argument) and
        # caching them would leak; XLA CSE dedupes within a step anyway.
        if not isinstance(X, jax.core.Tracer):
            self._dense_cache = X
        return self._dense_cache if self._dense_cache is not None else X

    def _densify_main(self):
        n, p_main = self._shape_main
        dtype = self.dtype
        if self.backend == 'hybrid':
            X = jnp.zeros((n, p_main), dtype)
            X = X.at[:, self.exact_cols].set(
                self.X_exact[:n, :self.exact_cols.shape[0]].astype(dtype))
            if self.float_cols.size:
                X = X.at[:, self.float_cols].set(
                    self.X_float[:n,
                                 :self.float_cols.shape[0]].astype(dtype))
            return X
        if self.backend == 'bitpack':
            p_bin = self._bitpack_meta[0]
            X = jnp.zeros((n, p_main), dtype)
            if p_bin:
                n_groups = -(-p_bin // 8)
                bytes_gn = self.bits_col[:n_groups, :n]  # (groups, n)
                bits = (bytes_gn[:, :, None].astype(jnp.int32)
                        >> jnp.arange(8)) & 1  # (groups, n, 8)
                X_bin = jnp.moveaxis(bits, 1, 0).reshape(n, 8 * n_groups)
                X = X.at[:, self.bin_cols].set(
                    X_bin[:, :p_bin].astype(dtype))
            if self.float_cols.size:
                X = X.at[:, self.float_cols].set(
                    self.X_float[:n].astype(dtype))
            return X
        if self.backend == 'winell':
            if self._winell_shard is not None:
                # Sharded layouts carry a leading device axis; densify
                # from the retained construction-time CSR instead. The
                # host CSR does not ride pytree flattening, so after a
                # jit round-trip say what happened rather than
                # AttributeError-ing.
                csr = getattr(self, '_csr_host', None)
                if csr is None:
                    raise ValueError(
                        "cannot densify a sharded winell design after "
                        "a jit round-trip (the construction-time CSR "
                        "is host state); densify the original design "
                        "object instead")
                return jnp.asarray(csr.toarray(), dtype)
            w_dot, k_dot = self._winell_meta[:2]
            has_sd = self._winell_meta[4]
            T = winell_mod._tile_block(n)[0]
            wn = self.widx_dot.shape[0] // (T * k_dot)
            idx = self.widx_dot.astype(jnp.int32)
            r = jnp.arange(idx.shape[0])
            tile = (r // k_dot) % T
            wblk = (r // k_dot) // T
            out_rows = tile[:, None] * 128 + jnp.arange(128)[None, :]
            cols = wblk[:, None] * w_dot + idx
            # Padded slots add value 0 at (row, window start): inert.
            X = jnp.zeros((T * 128, wn * w_dot), dtype)
            X = X.at[out_rows, cols].add(self.wval_dot.astype(dtype))
            X = X[:n, :p_main]
            if has_sd:
                rows2 = jnp.broadcast_to(jnp.arange(n)[:, None],
                                         self.sd_idx.shape)
                X = X.at[rows2, self.sd_idx].add(
                    self.sd_val.astype(dtype))
            return X
        zeros = jnp.zeros((n, p_main), dtype)
        row_idx, row_val = self.row_idx[:n], self.row_val[:n]
        rows = jnp.broadcast_to(jnp.arange(n)[:, None], row_idx.shape)
        # Padded slots write value 0 at column 0: harmless under "add".
        return zeros.at[rows, row_idx].add(row_val)

    def toarray(self):
        return np.asarray(self._materialize_dense())

    def extract_matrix(self, order=None):
        return self._materialize_dense()
