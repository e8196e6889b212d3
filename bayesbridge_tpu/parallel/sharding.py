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
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..design.dense import DenseDesignMatrix
from ..design.sparse import SparseDesignMatrix

SHARD_AXIS = 'shard'


def make_mesh(n_devices=None, devices=None, axis_name=SHARD_AXIS):
    """1-d device mesh over which designs are sharded."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def _put(x, mesh, spec):
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_design(design, mesh, axis_name=SHARD_AXIS):
    """Place a design matrix's arrays on the mesh, sharded as described
    in the module docstring. Returns the same object (arrays replaced)."""
    row = P(axis_name)
    if isinstance(design, DenseDesignMatrix):
        design.X = _put(design.X, mesh, P(axis_name, None))
        return design
    if isinstance(design, SparseDesignMatrix):
        if design.backend == 'hybrid':
            # Dense blocks shard along the observation (row) axis; the
            # X'u partial products then reduce over ICI.
            design.X_exact = _put(design.X_exact, mesh, P(axis_name, None))
            design.X_float = _put(design.X_float, mesh, P(axis_name, None))
        else:
            design.row_idx = _put(design.row_idx, mesh, P(axis_name, None))
            design.row_val = _put(design.row_val, mesh, P(axis_name, None))
            design.col_idx = _put(design.col_idx, mesh, P(axis_name, None))
            design.col_val = _put(design.col_val, mesh, P(axis_name, None))
        design.column_offset = _put(design.column_offset, mesh, row)
        return design
    raise TypeError(type(design))


def shard_model(model, mesh, axis_name=SHARD_AXIS):
    """Shard the design and the per-observation outcome arrays of a
    model along the observation axis. Returns the model."""
    shard_design(model.design, mesh, axis_name)
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
