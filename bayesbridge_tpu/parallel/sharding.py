"""Multi-chip scaling via jax.sharding meshes.

The reference is single-process and scales only through MKL threads /
a single-GPU CuPy path (SURVEY.md §2.12). The TPU-native "distributed
backend" is a device mesh: the design matrix (and the per-observation
state: obs_prec, outcome vectors) is sharded along the OBSERVATION axis,
so in every CG iteration

  * ``X @ v``   is embarrassingly row-local,
  * ``X' @ u``  is a column-local partial product followed by a
                reduction that XLA lowers to ``psum``-style collectives
                over ICI,

while the p-dimensional chain state (coef, lscale) stays replicated.
Sharding is declarative: arrays are placed with NamedSharding and GSPMD
inserts the collectives when the jitted Gibbs step is compiled —
no NCCL/MPI-style code, per the scaling-book recipe (mesh ->
annotations -> let XLA insert collectives).

The column-ELL arrays (the stored transpose) shard along the PREDICTOR
axis of the same 1-d mesh: both matvec directions then split their
gather/reduce work across every device.

For pod-scale predictor counts a 2-d (obs x pred) mesh additionally
shards the hybrid blocks' COLUMN axis (SURVEY §5.7): the replicated
coefficient vector is all-gathered into each column shard's slice, X v
partials reduce over the 'pred' axis and X' u partials over the 'obs'
axis — both collectives ride ICI on-pod. Build one with
``make_mesh((n_obs_shards, n_pred_shards))`` and pass
``pred_axis=PRED_AXIS`` to ``shard_model``.
"""

from warnings import warn

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..design.dense import DenseDesignMatrix
from ..design.sparse import SparseDesignMatrix

SHARD_AXIS = 'shard'
PRED_AXIS = 'pred'

# Arrays above this size warn when an uneven mesh axis silently degrades
# them to full replication (below it, replication is intended: the
# p-length state vectors ride along replicated by design).
_REPLICATION_WARN_BYTES = 16 * 2 ** 20


def make_mesh(n_devices=None, devices=None, axis_name=SHARD_AXIS,
              pred_axis=PRED_AXIS):
    """Device mesh over which designs are sharded.

    n_devices : int | (int, int) | None
        An int (or None = all devices) builds the 1-d observation mesh;
        an (n_obs_shards, n_pred_shards) tuple builds the 2-d mesh whose
        second axis shards the predictor dimension.
    """
    if devices is None:
        devices = jax.devices()
    if isinstance(n_devices, tuple):
        n_row, n_col = n_devices
        devices = np.asarray(devices[:n_row * n_col]).reshape(n_row, n_col)
        return Mesh(devices, (axis_name, pred_axis))
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def _axis_size(mesh, axis):
    return int(np.prod([mesh.shape[a] for a in
                        (axis if isinstance(axis, tuple) else (axis,))]))


def _put(x, mesh, spec):
    # Drop mesh axes that don't divide the corresponding array dimension
    # (device_put requires even shards); the array stays replicated along
    # that axis instead — warning loudly when the array is large enough
    # that replication forfeits real memory scaling. The big design
    # blocks never take this path: `_put_pad` zero-pads them to the mesh.
    cleaned = []
    for dim, axis in enumerate(spec):
        if axis is None:
            cleaned.append(None)
            continue
        if x.shape[dim] % _axis_size(mesh, axis) == 0:
            cleaned.append(axis)
        else:
            cleaned.append(None)
            if x.size * x.dtype.itemsize >= _REPLICATION_WARN_BYTES:
                warn("Mesh axis {!r} (size {}) does not divide array "
                     "dimension {} (size {}); the {:.2f} GB array is "
                     "REPLICATED on every device instead of sharded."
                     .format(axis, _axis_size(mesh, axis), dim,
                             x.shape[dim],
                             x.size * x.dtype.itemsize / 1e9))
    return jax.device_put(x, NamedSharding(mesh, P(*cleaned)))


def _put_pad(x, mesh, spec, pad_dims=(0,)):
    """device_put with zero-padding of `pad_dims` to the mesh grid, so
    an uneven observation (or predictor) count is padded and genuinely
    sharded rather than silently replicated. The design classes slice
    padded outputs / zero-pad operand vectors, so zero rows and columns
    are semantically inert."""
    pads = []
    for dim, axis in enumerate(spec):
        if axis is None or dim not in pad_dims:
            pads.append((0, 0))
            continue
        size = _axis_size(mesh, axis)
        pads.append((0, -int(x.shape[dim]) % size))
    if any(p != (0, 0) for p in pads):
        x = jnp.pad(x, pads)
    return _put(x, mesh, spec)


def shard_design(design, mesh, axis_name=SHARD_AXIS, pred_axis=None):
    """Place a design matrix's arrays on the mesh, sharded as described
    in the module docstring. Returns the same object (arrays replaced).

    pred_axis : optional mesh axis name sharding the predictor
        (column) dimension of the stored blocks (2-d mesh only).
    """
    col = P(pred_axis) if pred_axis else P(axis_name)
    if isinstance(design, DenseDesignMatrix):
        design.X = _put_pad(design.X, mesh, P(axis_name, pred_axis),
                            pad_dims=(0,))
        design._sharded = True  # fused NE kernel can't be partitioned
        return design
    if isinstance(design, SparseDesignMatrix):
        if design.backend == 'bitpack':
            # Dual bitmaps shard along observations via shard_map (the
            # Pallas kernel runs per device shard; X'u partials psum
            # over ICI); on a 2-d mesh the packed-predictor axis
            # additionally shards over `pred_axis` (bits_col by
            # byte-groups with per-shard LUTs, bits_row by output
            # lanes).
            return design.shard_bitpack(mesh, axis_name,
                                        pred_axis=pred_axis)
        if design.backend == 'winell':
            # The windowed-ELL packings interleave (window, tile, slot)
            # cells, so each device re-packs its contiguous observation
            # block (and that block's transpose) into private packings
            # (shard_winell): X v runs the kernel row-locally, X' u
            # partials psum over ICI. Storage is nnz-proportional, so
            # the observation axis is the memory scaler; a 2-d mesh's
            # predictor axis is unused for this backend.
            if pred_axis:
                warn("shard_design: the 'winell' backend shards along "
                     "the observation axis only; the predictor mesh "
                     "axis replicates its arrays.")
            return design.shard_winell(mesh, axis_name)
        if design.backend == 'hybrid':
            # Dense blocks shard along observations (and predictors on a
            # 2-d mesh); the X'u / Xv partial products then reduce over
            # ICI collectives inserted by GSPMD. Uneven row/column
            # counts are zero-padded to the mesh (the design's products
            # slice the padding back off) so the blocks are genuinely
            # distributed at any shape.
            design.X_exact = _put_pad(
                _demote_unsupported(design.X_exact,
                                    mesh.devices.flat[0]),
                mesh, P(axis_name, pred_axis), pad_dims=(0, 1))
            design.X_float = _put_pad(design.X_float, mesh,
                                      P(axis_name, pred_axis),
                                      pad_dims=(0, 1))
            design._hybrid_sharded = True
            # On a pure observation (1-d) mesh the fused one-sweep
            # kernels still apply: each device runs them on its private
            # row block under shard_map and the p-length partials psum
            # over ICI. A predictor split would need a collective
            # BETWEEN the kernel's two phases (full t before X'u), i.e.
            # two block reads — so 2-d meshes take the composed path,
            # whose matmuls GSPMD partitions.
            design._hybrid_shard = (mesh, axis_name) \
                if pred_axis is None else None
        else:
            design.row_idx = _put_pad(design.row_idx, mesh,
                                      P(axis_name, None))
            design.row_val = _put_pad(design.row_val, mesh,
                                      P(axis_name, None))
            # The stored transpose shards along its own leading
            # (predictor) axis.
            design.col_idx = _put_pad(design.col_idx, mesh, col)
            design.col_val = _put_pad(design.col_val, mesh, col)
        design.column_offset = _put(design.column_offset, mesh, col)
        return design
    raise TypeError(type(design))


def place_model(model, device=None):
    """Commit every array of a model (design blocks, outcome vectors) to
    one device. Returns the model (arrays replaced).

    Uncommitted host-resident arrays are re-uploaded by EVERY jitted call
    that consumes them; on a locally attached chip the transfer is
    near-free, but through a remote-attached/tunneled runtime re-uploading
    a multi-GB design per ``gibbs``/``gibbs_resume`` call can dominate the
    wall clock. Single-device counterpart of :func:`shard_model` (which
    commits arrays to a mesh); a no-op placement-wise if the arrays are
    already on `device`.
    """
    if device is None:
        device = jax.devices()[0]
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(_demote_unsupported(x, device), device),
        model)


def _demote_unsupported(x, device):
    """Re-validate narrow-dtype leaves against the device they are being
    moved TO: a design may have been built under a different default
    device (e.g. CPU, to keep GB-scale blocks off a slow tunnel) whose
    capability set is wider than the accelerator's. Packed-s4 leaves a
    runtime cannot transfer/execute are widened to int8 — numerically
    identical (both up-convert into the MXU operand dtype at use sites)
    at 2x the HBM bytes — rather than letting the first jitted call
    fail, or worse hang, on the chip."""
    if getattr(x, 'dtype', None) is None or str(x.dtype) != 'int4':
        return x
    from ..design.sparse import _int4_matmul_supported
    if _int4_matmul_supported(device):
        return x
    warn("place_model: widening a packed-s4 (int4) array to int8 — the "
         "target device platform {!r} cannot execute S4 operands. The "
         "design keeps exact semantics at 2x the storage bytes."
         .format(device.platform))
    return np.asarray(x, dtype=np.int8)


def shard_model(model, mesh, axis_name=SHARD_AXIS, pred_axis=None):
    """Shard the design and the per-observation outcome arrays of a
    model along the observation axis (and, on a 2-d mesh with
    `pred_axis`, the design's predictor axis). Returns the model."""
    shard_design(model.design, mesh, axis_name, pred_axis)
    row = P(axis_name)
    if model.name == 'linear':
        model.y = _put(model.y, mesh, row)
    elif model.name == 'logit':
        model.n_trial = _put(model.n_trial, mesh, row)
        model.n_success = _put(model.n_success, mesh, row)
    elif model.name == 'cox':
        # Risk-set cumsums are global prefix scans; keep the index
        # arrays replicated and shard only the design.
        pass
    return model
