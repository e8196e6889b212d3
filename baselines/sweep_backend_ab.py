"""Flagship-shape A/B: hybrid int8 blocks vs the bitpack byte-LUT
backend (VERDICT r4 #2).

`backend='auto'` picks hybrid vs bitpack by HBM byte budget alone
(design/sparse.py); this measures the two head-to-head at the exact
regime the build exists for — the 90%-binary n=100k x p=50k sparse
logit — using the shared steady-state protocol
(baselines.r5_measure.run_one). Measured 2026-08-21 (BASELINE.md
round-5 A/B): hybrid 6.071 iter/s at 6.5 GB vs bitpack 5.711 at
3.2 GB — hybrid wins within its byte budget, bitpack buys headroom.

Usage:  python -m baselines.sweep_backend_ab
        BB_BENCH_N=20000 BB_BENCH_P=10000 BB_BENCH_ITER=50 \
            python -m baselines.sweep_backend_ab
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from baselines.r5_measure import get_model, json_safe, run_one \
    # noqa: E402
from bench import design_storage_bytes  # noqa: E402


def main():
    import jax
    n_obs = int(os.environ.get('BB_BENCH_N', 100_000))
    n_pred = int(os.environ.get('BB_BENCH_P', 50_000))
    n_iter = int(os.environ.get('BB_BENCH_ITER', 100))
    backends = os.environ.get('BB_SWEEP_BACKENDS',
                              'hybrid,bitpack').split(',')

    print(json.dumps({'shape': [n_obs, n_pred], 'n_iter': n_iter,
                      'backend': jax.default_backend()}), flush=True)
    for be in backends:
        model = get_model(n_obs, n_pred, backend=be)
        assert be == 'auto' or model.design.backend == be, \
            (be, model.design.backend)
        res = run_one(model, n_iter)
        res['design_gb'] = round(
            design_storage_bytes(model.design) / 1e9, 3)
        print(json.dumps(json_safe(res), allow_nan=False), flush=True)


if __name__ == '__main__':
    main()
