"""Cold-start smoke of the benchmark's exact code path (VERDICT r3
item 8): bench.py's build -> place -> step pipeline at toy scale with a
CLEARED design cache and a real ``backend='auto'`` pick — no
monkeypatched capability globals. The round-3 flagship bench was lost to
a regression ("works only with a warm /tmp") that exactly this test
catches: the storage tier chosen by a cold build must execute on the
default backend.
"""

import glob
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def test_bench_cold_smoke(capsys):
    import bench
    n_obs, n_pred = 600, 250
    for stale in glob.glob(f'/tmp/bb_bench_design_n{n_obs}_p{n_pred}_*'):
        os.remove(stale)
    bench._MODELS.clear()
    bench.cold_smoke(n_obs=n_obs, n_pred=n_pred, n_iter=2)
    out = capsys.readouterr().out
    assert f'"cold_smoke_n{n_obs}_p{n_pred}"' in out
    # Leave no design-cache residue for other shapes' runs to trip on.
    for stale in glob.glob(f'/tmp/bb_bench_design_n{n_obs}_p{n_pred}_*'):
        os.remove(stale)
    bench._MODELS.clear()


def test_bench_retry_scope():
    """The composed-path retry fires only for tracebacks that implicate
    the fused kernels; anything else must surface immediately
    (VERDICT r3 weak #2a: the r3 bench retried an int4 storage bug as
    if it were a fused-kernel failure and timed out the round)."""
    import bench
    assert bench._fused_kernels_implicated(
        'File ".../design/fusedne.py", line 200, in fused_ne_matvec')
    assert bench._fused_kernels_implicated(
        'INTERNAL: Mosaic failed to compile TPU kernel')
    assert not bench._fused_kernels_implicated(
        'RecursionError: Recursively calling jit int4 convert')
    assert not bench._fused_kernels_implicated(
        'XlaRuntimeError: RESOURCE_EXHAUSTED: HBM OOM')
