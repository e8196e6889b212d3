"""Sparse-matvec backend benchmark on the TPU (VERDICT r1 item 2).

Times X @ v and X' @ u for the SparseDesignMatrix backends at an
OHDSI-style density on a design whose f32 dense form exceeds the hybrid
HBM budget, i.e. the regime the reference serves with the MKL CSR matvec
(reference: bayesbridge/design_matrix/mkl_matvec.py:17-56). Two value
regimes: all-binary entries (bitpack's domain) and continuous entries
(winell's domain — VERDICT r2 missing #1: values outside {0,1} at
n*p > 8 GB).

Usage: python -m baselines.bench_sparse_matvec [--n N] [--p P]
           [--density D] [--reps R] [--values binary|normal|both]
"""

import argparse
import gc
import time

import numpy as np
import scipy.sparse as sps


def build_sparse(n, p, density, seed=0, values='binary'):
    rng = np.random.default_rng(seed)
    nnz_per_row = max(1, int(round(density * p)))
    cols = rng.integers(0, p, size=(n, nnz_per_row))
    indptr = np.arange(n + 1, dtype=np.int64) * nnz_per_row
    X = sps.csr_matrix(
        (np.ones(n * nnz_per_row), cols.ravel(), indptr), shape=(n, p))
    X.sum_duplicates()
    if values == 'normal':
        X.data[:] = rng.standard_normal(X.nnz)
        X.eliminate_zeros()
    else:
        X.data[:] = 1.0
    return X


def time_backend(X, backend, reps, jax, jnp):
    from jax import lax
    from bayesbridge_tpu.design import SparseDesignMatrix
    tic = time.perf_counter()
    design = SparseDesignMatrix(X, center_predictor=False,
                                add_intercept=False, dtype=np.float32,
                                backend=backend)
    build_s = time.perf_counter() - tic
    n, p = design.shape
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal(p), jnp.float32)
    u = jnp.asarray(rng.standard_normal(n), jnp.float32)

    dot = jax.jit(lambda d, x: d.dot(x))
    tdot = jax.jit(lambda d, x: d.Tdot(x))
    out_d = np.asarray(dot(design, v), np.float64)  # fetch = sync
    out_t = np.asarray(tdot(design, u), np.float64)

    # Timing methodology for a remote-attached chip (~30 ms RPC floor,
    # async dispatch): chain `reps` DEPENDENT Tdot(dot(.)) round trips
    # inside one jit and fetch a scalar, so neither RPC latency nor
    # result caching can fake the number. Reported per single matvec.
    @jax.jit
    def chained(d, x0):
        def body(_, x):
            y = d.Tdot(d.dot(x))
            return y / jnp.linalg.norm(y)
        return jnp.sum(lax.fori_loop(0, reps, body, x0))

    float(chained(design, v))  # compile + warm
    t0 = time.perf_counter()
    float(chained(design, v))
    pair_ms = (time.perf_counter() - t0) / reps * 1e3
    result = dict(backend=backend, build_s=build_s,
                  matvec_ms=pair_ms / 2,
                  out_dot=out_d, out_tdot=out_t)
    del design, v, u
    gc.collect()
    return result


def run_sweep(args, values, jax, jnp):
    X = build_sparse(args.n, args.p, args.density, values=values)
    nnz = X.nnz
    f32_gb = args.n * args.p * 4 / 1e9
    print(f"\n== values={values} == n={args.n} p={args.p} "
          f"density={args.density} nnz={nnz:.3g} "
          f"(dense f32 {f32_gb:.1f} GB) backend={jax.default_backend()}")

    fast = 'bitpack' if values == 'binary' else 'winell'
    results = {}
    for backend, reps in [('ell', args.ell_reps),
                          (fast, args.reps),
                          ('hybrid', args.reps)]:
        try:
            results[backend] = time_backend(X, backend, reps, jax, jnp)
        except Exception as e:
            print(f"{backend}: skipped ({type(e).__name__}: {str(e)[:80]})")

    ref = results.get('ell') or next(iter(results.values()))
    print(f"{'backend':>8} {'build_s':>8} {'matvec_ms':>10} "
          f"{'Gnnz/s':>8} {'Gelem/s':>8} {'vs_ell':>7}")
    for name, r in results.items():
        ms = r['matvec_ms']
        gnnz = nnz / (ms / 1e3) / 1e9
        gelem = args.n * args.p / (ms / 1e3) / 1e9
        print(f"{name:>8} {r['build_s']:8.1f} {ms:10.2f} "
              f"{gnnz:8.2f} {gelem:8.1f} {ref['matvec_ms'] / ms:6.1f}x")
        for key in ('out_dot', 'out_tdot'):
            err = np.max(np.abs(r[key] - ref[key])) \
                / (np.max(np.abs(ref[key])) + 1e-12)
            if err > 1e-4:
                print(f"  WARNING {name}.{key} relerr {err:.2e} vs ell")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=262144)
    ap.add_argument('--p', type=int, default=16384)
    ap.add_argument('--density', type=float, default=0.01)
    ap.add_argument('--reps', type=int, default=20)
    ap.add_argument('--ell-reps', type=int, default=3)
    ap.add_argument('--values', default='both',
                    choices=['binary', 'normal', 'both'])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sweeps = ['binary', 'normal'] if args.values == 'both' \
        else [args.values]
    for values in sweeps:
        run_sweep(args, values, jax, jnp)


if __name__ == '__main__':
    main()
