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


def op_stats_from_trace(log_dir, device_only=True):
    """Parse a :func:`trace` capture into per-op timing rows.

    Reads the xplane protobufs under `log_dir` through the xprof
    converter (the TensorBoard profile plugin's own parser) and returns
    a list of dicts, one per profiled op::

        {'device': bool, 'type': 'fusion', 'name': '%fusion.3', ...,
         'occurrences': 12, 'total_us': 340.2, 'self_us': 340.2,
         'flop_rate_gflops': 1.2, 'memory_bw_gbps': 640.1,
         'bound_by': 'Memory'}

    On TPU runs the rows carry measured per-op memory bandwidth and
    boundedness, grounding roofline claims in device counters rather
    than byte models (bench.py uses this for its `measured` report).
    """
    import glob
    import json
    import os

    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(glob.glob(os.path.join(log_dir, '**', '*.xplane.pb'),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f'no *.xplane.pb under {log_dir}')
    data, _ = rtd.xspace_to_tool_data(paths, 'framework_op_stats', {})
    tables = json.loads(data if isinstance(data, str) else data.decode())
    table = tables[0] if isinstance(tables, list) else tables
    idx = {c['label']: i for i, c in enumerate(table['cols'])}

    def cell(row, label):
        return row['c'][idx[label]].get('v')

    rows = []
    for row in table.get('rows', []):
        on_device = cell(row, 'Host/device') == 'Device'
        if device_only and not on_device:
            continue
        rows.append({
            'device': on_device,
            'type': cell(row, 'Operation Type'),
            'name': cell(row, 'Operation Name'),
            'occurrences': int(cell(row, '#Occurrences') or 0),
            'total_us': float(cell(row, 'Total time (us)') or 0.0),
            'self_us': float(cell(row, 'Total self-time (us)') or 0.0),
            'flop_rate_gflops':
                float(cell(row, 'Model FLOP Rate (GFLOP/s)') or 0.0),
            'memory_bw_gbps':
                float(cell(row, 'Measured Memory BW (GBytes/Sec)')
                      or 0.0),
            'bound_by': cell(row, 'Bound by'),
        })
    return rows
