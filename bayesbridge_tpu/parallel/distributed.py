"""Multi-host / multi-slice entry point (SURVEY §5.8).

The reference has no distributed backend at all (its only accelerated
paths are MKL threads and a single-GPU CuPy offload; SURVEY §2.12).
TPU-native scale-out needs no NCCL/MPI code: each host process calls
:func:`initialize_multihost` once, builds the SAME model from the SAME
data (or its shard — see below), and the mesh returned by
:func:`global_mesh` spans every chip in the job. GSPMD then compiles the
identical Gibbs program on every process, with the CG reduction's
``psum`` riding ICI within a slice and DCN across slices.

Single-process usage is unchanged — none of this module is imported on
the default path.

Typical launch (one process per host, e.g. under `gcloud ... ssh --all`
or a scheduler)::

    from bayesbridge_tpu.parallel import distributed, shard_model
    distributed.initialize_multihost()          # env-driven discovery
    mesh = distributed.global_mesh()            # all chips, 1-d
    shard_model(model, mesh)
    bridge.gibbs(...)                           # same script everywhere

Data loading: `jax.device_put` with a NamedSharding of a multi-host mesh
requires the full array on every host (fine up to ~10 GB designs, the
bitmaps and hybrid blocks are built host-side anyway). For designs too
large to replicate host-side, build per-host row blocks and assemble
with :func:`host_local_to_global`.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import SHARD_AXIS, PRED_AXIS


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None, **kwargs):
    """Initialize the JAX distributed runtime for a multi-host job.

    A thin, idempotent wrapper over ``jax.distributed.initialize``: with
    no arguments the coordinator/process topology is discovered from the
    environment (TPU pod metadata, or JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID). Safe to call in single-process
    runs of the same script: if there is nothing to discover and no
    coordinator is given, it is a no-op.
    """
    if jax.distributed.is_initialized():
        return  # already in a job; idempotent
    import os
    env_driven = any(k in os.environ for k in (
        'JAX_COORDINATOR_ADDRESS', 'COORDINATOR_ADDRESS',
        'MEGASCALE_COORDINATOR_ADDRESS'))
    if coordinator_address is None and num_processes is None \
            and not env_driven:
        return  # single-process run; nothing to initialize
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id, **kwargs)
    except RuntimeError:
        if coordinator_address is None and num_processes is None:
            # Env hinted at a job but jax refused (typically: a backend
            # was already initialized by earlier JAX use in a
            # single-process run on a TPU VM whose image exports
            # coordinator variables): stay single-process.
            from warnings import warn
            warn("initialize_multihost: could not join a multi-host "
                 "job (a JAX backend is likely already initialized); "
                 "continuing single-process. Call initialize_multihost() "
                 "before any other JAX use to join a multi-host job.")
            return
        raise  # explicit arguments: surface jax's own error


def global_mesh(pred_shards=1, axis_name=SHARD_AXIS, pred_axis=PRED_AXIS):
    """Mesh over every chip in the (possibly multi-host) job.

    pred_shards : int
        1 builds the 1-d observation mesh; k > 1 builds the 2-d
        (obs x pred) mesh with k predictor shards. Chips are laid out so
        the predictor axis stays within the fastest interconnect
        neighborhood jax reports (``jax.devices()`` order is
        ICI-contiguous per host/slice).
    """
    devices = np.asarray(jax.devices())
    if pred_shards == 1:
        return Mesh(devices, (axis_name,))
    if len(devices) % pred_shards:
        raise ValueError(
            f"{len(devices)} devices do not divide into "
            f"{pred_shards} predictor shards.")
    return Mesh(devices.reshape(-1, pred_shards), (axis_name, pred_axis))


def host_local_to_global(local_rows, mesh, axis_name=SHARD_AXIS):
    """Assemble per-host row blocks into one globally-sharded array.

    Each process passes ITS contiguous block of rows (process order =
    row order); the result is a global array row-sharded over `mesh`
    without any host ever holding the full data — the multi-host analog
    of the reference streaming its CSR matrix through MKL from one
    host's RAM.
    """
    from jax.experimental import multihost_utils
    return multihost_utils.host_local_array_to_global_array(
        local_rows, mesh, P(axis_name))
