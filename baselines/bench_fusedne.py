"""Fused normal-equations kernel benchmark on the TPU.

Times the CG conditional-precision operator's design part
``X' (w * (X v))`` (reference: bayesbridge/reg_coef_sampler/
cg_sampler.py:104-113) two ways on the same design:

* composed — ``Tdot(w * dot(v))``, two stored-block HBM sweeps (the
  hybrid backend's unfused matmul pair);
* fused — ``design.quad_matvec(v, w)`` via the single-sweep Pallas
  kernel (design/fusedne.py).

Both paths run inside one jitted K-step chain of data-dependent calls
(each step feeds the previous output back in) so the tunnel's ~33 ms
RPC floor and the async dispatch queue amortize away; the timing
fetches one scalar at the end.

Usage: python -m baselines.bench_fusedne [--n N] [--p P] [--reps R]
           [--chain K] [--case hybrid|dense|both]
"""

import argparse
import time

import numpy as np


def _chain_timer(fn, v0, w, chain, reps, jax, jnp):
    """Median seconds per single fn(v, w) application: jit a K-step
    dependent chain, run `reps` times, fetch a scalar."""
    from functools import partial

    @partial(jax.jit, static_argnames=())
    def run(v, w):
        def body(carry, _):
            out = fn(carry, w)
            # Renormalize so the iterates stay finite over the chain.
            out = out / jnp.maximum(jnp.linalg.norm(out), 1e-30)
            return out[:v.shape[0]], 0.
        final, _ = jax.lax.scan(body, v, None, length=chain)
        return jnp.sum(final)

    float(run(v0, w))  # compile + warm
    times = []
    for _ in range(reps):
        tic = time.time()
        float(run(v0, w))
        times.append((time.time() - tic) / chain)
    return float(np.median(times))


def bench_case(name, design, stored_gb, reps, chain, jax, jnp):
    import os
    n, p = design.shape
    rng = np.random.default_rng(3)
    v0 = jnp.asarray(rng.standard_normal(p).astype(np.float32))
    w = jnp.asarray(rng.exponential(size=n).astype(np.float32) + .1)

    os.environ['BB_FUSED_NE'] = '0'
    t_comp = _chain_timer(design.quad_matvec, v0, w, chain, reps, jax, jnp)
    os.environ['BB_FUSED_NE'] = 'auto'
    t_fused = _chain_timer(design.quad_matvec, v0, w, chain, reps, jax, jnp)

    # Numerical agreement of the two paths at this size.
    os.environ['BB_FUSED_NE'] = '0'
    ref = np.asarray(design.quad_matvec(v0, w))
    os.environ['BB_FUSED_NE'] = 'auto'
    got = np.asarray(design.quad_matvec(v0, w))
    err = float(np.max(np.abs(got - ref)) / (np.abs(ref).max() + 1e-30))

    eff_comp = 2 * stored_gb / t_comp     # two sweeps of the block
    eff_fused = stored_gb / t_fused       # one sweep
    print(f"{name:>8} {stored_gb:9.3f} {t_comp * 1e3:11.2f} "
          f"{t_fused * 1e3:10.2f} {t_comp / t_fused:7.2f}x "
          f"{eff_comp:8.0f} {eff_fused:9.0f} {err:9.1e}")
    return t_comp / t_fused


def bench_presolve(name, design, stored_gb, reps, chain, jax, jnp):
    """Time the three pre-solve reductions (collapsed obs Tdot, noise
    Tdot, Jacobi diagonal) fused vs composed. Serialization between
    chain steps rides a zero-valued scalar folded into u1 (no extra
    design passes)."""
    import os
    from functools import partial
    n, p = design.shape
    rng = np.random.default_rng(5)
    u1 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    u2 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    w = jnp.asarray(rng.exponential(size=n).astype(np.float32) + .1)

    def timer():
        @partial(jax.jit)
        def run(u1, u2, w):
            def body(carry, _):
                v, pert, diag = design.presolve_reductions(
                    u1 + carry, u2, w)
                # Tiny but structurally nonzero factor: 0.0 would let
                # the algebraic simplifier cut the dependency and CSE
                # every scan iteration into one.
                dep = 1e-20 * (jnp.sum(v) + jnp.sum(pert) + jnp.sum(diag))
                return dep, 0.
            dep, _ = jax.lax.scan(body, 0.0, None, length=chain)
            return dep
        float(run(u1, u2, w))
        times = []
        for _ in range(reps):
            tic = time.time()
            float(run(u1, u2, w))
            times.append((time.time() - tic) / chain)
        return float(np.median(times))

    os.environ['BB_FUSED_NE'] = '0'
    t_comp = timer()
    os.environ['BB_FUSED_NE'] = 'auto'
    t_fused = timer()
    os.environ['BB_FUSED_NE'] = '0'
    ref = design.presolve_reductions(u1, u2, w)
    os.environ['BB_FUSED_NE'] = 'auto'
    got = design.presolve_reductions(u1, u2, w)
    err = max(float(np.max(np.abs(np.asarray(g) - np.asarray(r)))
                    / (np.abs(np.asarray(r)).max() + 1e-30))
              for g, r in zip(got, ref))
    print(f"{name:>8} {stored_gb:9.3f} {t_comp * 1e3:11.2f} "
          f"{t_fused * 1e3:10.2f} {t_comp / t_fused:7.2f}x "
          f"{3 * stored_gb / t_comp:8.0f} {stored_gb / t_fused:9.0f} "
          f"{err:9.1e}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--n', type=int, default=100_000)
    parser.add_argument('--p', type=int, default=20_000)
    parser.add_argument('--reps', type=int, default=5)
    parser.add_argument('--chain', type=int, default=20)
    parser.add_argument('--case', default='both',
                        choices=['hybrid', 'dense', 'both'])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from bayesbridge_tpu.design import DenseDesignMatrix, SparseDesignMatrix
    from bayesbridge_tpu.utils.simulate_data import simulate_design

    print(f"n={args.n} p={args.p} backend={jax.default_backend()}")
    print(f"{'case':>8} {'stored_GB':>9} {'composed_ms':>11} "
          f"{'fused_ms':>10} {'speedup':>8} {'eff2_GBs':>8} "
          f"{'eff1_GBs':>9} {'rel_err':>9}")

    if args.case in ('hybrid', 'both'):
        X = simulate_design(args.n, args.p, binary_frac=.9, seed=0)
        design = SparseDesignMatrix(X, add_intercept=True,
                                    backend='hybrid', dtype=np.float32)
        gb = (design.X_exact.size * design.X_exact.dtype.itemsize
              + design.X_float.size * 4) / 1e9
        bench_case('hybrid', design, gb, args.reps, args.chain, jax, jnp)
        bench_presolve('pre-hyb', design, gb, args.reps, args.chain,
                       jax, jnp)
        del design

    if args.case in ('dense', 'both'):
        n_d = min(args.n, 40_000)
        rng = np.random.default_rng(1)
        Xd = rng.standard_normal((n_d, args.p // 4)).astype(np.float32)
        design = DenseDesignMatrix(Xd, add_intercept=True,
                                   dtype=np.float32)
        gb = design.X.size * 4 / 1e9
        bench_case('dense', design, gb, args.reps, args.chain, jax, jnp)


if __name__ == '__main__':
    main()
