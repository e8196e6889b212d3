"""Profiling helpers.

The reference's only tracing is lightweight counters (design matvec
counts, CG iterations; reference:
bayesbridge/design_matrix/abstract_matrix.py:17-18,61-72 and
cg_sampler.py:70-72), which this library carries through the scan
outputs (`mcmc_info['_reg_coef_sampling_info']`). For real on-device
tracing, these thin wrappers expose the XLA profiler so a Gibbs run can
be inspected in TensorBoard/Perfetto (op-level timeline, HBM traffic,
fusion boundaries):

    from bayesbridge_tpu.utils.profiling import trace

    with trace('/tmp/bb-profile'):
        bridge.gibbs(200, seed=0)

    # tensorboard --logdir /tmp/bb-profile   (or upload the .pb to
    # ui.perfetto.dev)

Named sub-regions inside user code can be marked with
``annotate("label")``, which shows up on the trace timeline.
"""

from contextlib import contextmanager

import jax


@contextmanager
def trace(log_dir, host_tracer_level=2, python_tracer_level=0):
    """Capture an XLA device trace of the enclosed block into `log_dir`.

    A `jax.profiler.start_trace/stop_trace` pair with sane defaults;
    reentrancy-safe (nested calls only trace the outermost block).
    """
    if getattr(trace, '_active', False):
        yield
        return
    trace._active = True
    jax.profiler.start_trace(
        log_dir,
        create_perfetto_trace=True,
    )
    try:
        yield
    finally:
        trace._active = False
        jax.profiler.stop_trace()


def annotate(name):
    """Context manager naming a region on the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)
