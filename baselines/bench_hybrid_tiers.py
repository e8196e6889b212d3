"""Hybrid exact-block storage-tier benchmark (int4 vs int8 vs bf16).

The hybrid backend's dominant HBM stream is the narrow exact-column
block; this script times the same binary design with each storage tier
forced, to verify on hardware that the packed-s4 tier actually moves
half the bytes of int8 (i.e. that XLA keeps s4 packed in HBM and fuses
the up-convert into the MXU matmul) rather than silently materializing
a wide intermediate.

Timing follows the chained-dependency methodology (BASELINE.md): K
dependent dot/Tdot pairs inside one jit, fetch a scalar.

Usage: python -m baselines.bench_hybrid_tiers [--n N] [--p P] [--reps R]
"""

import argparse
import time

import numpy as np
import scipy.sparse as sps


def build_binary(n, p, density, seed=0):
    rng = np.random.default_rng(seed)
    nnz_per_row = max(1, int(round(density * p)))
    cols = rng.integers(0, p, size=(n, nnz_per_row))
    indptr = np.arange(n + 1, dtype=np.int64) * nnz_per_row
    X = sps.csr_matrix(
        (np.ones(n * nnz_per_row), cols.ravel(), indptr), shape=(n, p))
    X.sum_duplicates()
    X.data[:] = 1.0
    return X


def time_tier(X, tier, reps, jax, jnp, monkey):
    from jax import lax
    from bayesbridge_tpu.design import SparseDesignMatrix
    from bayesbridge_tpu.design import sparse as sparse_mod

    all_false = lambda X_csc: np.zeros(X_csc.shape[1], dtype=bool)
    saved = (sparse_mod._int4_exact_columns, sparse_mod._int8_exact_columns)
    try:
        if tier in ('int8', 'bf16'):
            sparse_mod._int4_exact_columns = all_false
        if tier == 'bf16':
            sparse_mod._int8_exact_columns = all_false
        design = SparseDesignMatrix(X, center_predictor=False,
                                    add_intercept=False,
                                    dtype=np.float32, backend='hybrid')
    finally:
        (sparse_mod._int4_exact_columns,
         sparse_mod._int8_exact_columns) = saved
    assert str(design.X_exact.dtype) == \
        {'int4': 'int4', 'int8': 'int8', 'bf16': 'bfloat16'}[tier], \
        design.X_exact.dtype

    n, p = design.shape
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal(p), jnp.float32)

    @jax.jit
    def chained(d, x0):
        def body(_, x):
            y = d.Tdot(d.dot(x))
            return y / jnp.linalg.norm(y)
        return jnp.sum(lax.fori_loop(0, reps, body, x0))

    out = np.asarray(jax.jit(lambda d, x: d.dot(x))(design, v), np.float64)
    float(chained(design, v))  # compile + warm
    t0 = time.perf_counter()
    float(chained(design, v))
    pair_ms = (time.perf_counter() - t0) / reps * 1e3
    stored_gb = design.X_exact.size \
        * {'int4': 0.5, 'int8': 1, 'bf16': 2}[tier] / 1e9
    return dict(tier=tier, matvec_ms=pair_ms / 2, stored_gb=stored_gb,
                out=out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=100_000)
    ap.add_argument('--p', type=int, default=20_000)
    ap.add_argument('--density', type=float, default=0.05)
    ap.add_argument('--reps', type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    X = build_binary(args.n, args.p, args.density)
    print(f"n={args.n} p={args.p} density={args.density} "
          f"backend={jax.default_backend()}")
    from bayesbridge_tpu.design.sparse import _int4_matmul_supported
    tiers = ['bf16', 'int8']
    if _int4_matmul_supported():
        tiers.append('int4')
    else:
        print("int4 tier skipped: runtime has no S4 support "
              "(capability probe failed)")
    results = [time_tier(X, t, args.reps, jax, jnp, None)
               for t in tiers]
    ref = results[0]
    print(f"{'tier':>6} {'stored_GB':>10} {'matvec_ms':>10} "
          f"{'eff_GB/s':>9} {'vs_bf16':>8}")
    for r in results:
        ms = r['matvec_ms']
        print(f"{r['tier']:>6} {r['stored_gb']:10.3f} {ms:10.3f} "
              f"{r['stored_gb'] / (ms / 1e3):9.1f} "
              f"{ref['matvec_ms'] / ms:7.2f}x")
        err = np.max(np.abs(r['out'] - ref['out'])) \
            / (np.max(np.abs(ref['out'])) + 1e-12)
        if err > 1e-4:
            print(f"  WARNING {r['tier']} relerr {err:.2e} vs bf16")


if __name__ == '__main__':
    main()
