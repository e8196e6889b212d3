"""Flagship-scale sweep of the CG stopping tolerance vs ESS/sec.

The reference budgets each CG solve with atol = 1e-5 * sqrt(p)
(reg_coef_sampler.py:95-96) — a per-draw accuracy rule chosen for CPU
economics. On TPU the question is whether that budget maximizes the
STATISTICAL throughput (median coef ESS/sec): a looser solve costs
accuracy but buys iterations/sec; a tighter one the reverse. This
sweeps cg_atol_multiplier over decades around the reference rule using
the shared steady-state protocol (baselines.r5_measure.run_one) and
prints one JSON line per setting. Measured 2026-08-21 (BASELINE.md
tolerance table): 10x looser = +19% iter/s, +17% ESS/sec, replicated
at 300 timed draws; the shipped default stays at the reference rule.

Usage:  python -m baselines.sweep_cg_tol                 # flagship
        BB_BENCH_N=20000 BB_BENCH_P=10000 BB_BENCH_ITER=100 \
            BB_SWEEP_TOL=0.1,1,10,100 python -m baselines.sweep_cg_tol
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from baselines.r5_measure import get_model, json_safe, run_one \
    # noqa: E402


def main():
    import jax
    n_obs = int(os.environ.get('BB_BENCH_N', 100_000))
    n_pred = int(os.environ.get('BB_BENCH_P', 50_000))
    n_iter = int(os.environ.get('BB_BENCH_ITER', 100))
    mults = [float(s) for s in
             os.environ.get('BB_SWEEP_TOL', '0.1,1,10,100').split(',')]

    model = get_model(n_obs, n_pred)
    print(json.dumps({'shape': [n_obs, n_pred], 'n_iter': n_iter,
                      'backend': jax.default_backend(),
                      'design_backend': model.design.backend}), flush=True)
    for m in mults:
        res = run_one(model, n_iter, atol_mult=m)
        print(json.dumps(json_safe(res), allow_nan=False), flush=True)


if __name__ == '__main__':
    main()
