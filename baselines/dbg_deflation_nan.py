"""Bisect the TPU-only NaN in the deflated-PCG path (r5 smoke leg:
k=8 at 20k x 10k went NaN with 0 CG iterations while k=0 was clean and
the same configuration passes on CPU).

Stages, cheapest first, each printed the moment it lands:
  A. design-level: quad_matmat_blockorder vs per-column
     quad_matvec_blockorder on the smoke-scale hybrid design
  B. standalone sample_gaussian_cg: k=8 vs k=0 finiteness/closeness
  C. gibbs: per-draw logp/n_cg_iter, first NaN draw index
Run: python -m baselines.dbg_deflation_nan [stages e.g. AB]
"""

import sys

import numpy as np

from baselines.r5_measure import get_model


def main():
    stages = (sys.argv[1] if len(sys.argv) > 1 else 'ABC').upper()
    import jax
    import jax.numpy as jnp
    print('backend:', jax.default_backend(), flush=True)

    model = get_model(20_000, 10_000)
    design = model.design
    print('model built; backend:', design.backend,
          'bo_ctx:', design.cg_blockorder_ctx() is not None, flush=True)
    n, p1 = design.shape
    rng = np.random.default_rng(0)
    obs_prec = jnp.asarray(rng.uniform(.05, .25, n), jnp.float32)

    if 'A' in stages:
        perm, unperm, offset_bo = design.cg_blockorder_ctx()
        k = 8
        V = jnp.asarray(rng.standard_normal((p1, k)), jnp.float32)
        out_mm, t_mm = design.quad_matmat_blockorder(
            V, obs_prec, offset_bo, return_t=True)
        cols, ts = [], []
        for j in range(k):
            o, t = design.quad_matvec_blockorder(
                V[:, j], obs_prec, offset_bo, return_t=True)
            cols.append(o)
            ts.append(t)
        out_mv = jnp.stack(cols, axis=1)
        t_mv = jnp.stack(ts, axis=1)

        def rel(a, b):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            return float(np.abs(a - b).max()
                         / max(np.abs(b).max(), 1e-30))

        print('A: finite(matmat out/t):',
              bool(jnp.isfinite(out_mm).all()),
              bool(jnp.isfinite(t_mm).all()),
              'rel(out):', rel(out_mm, out_mv),
              'rel(t):', rel(t_mm, t_mv), flush=True)

    if 'B' in stages:
        from bayesbridge_tpu.ops.cg import sample_gaussian_cg
        key = jax.random.PRNGKey(3)
        prior_prec_sqrt = jnp.full((p1,), 1.5, jnp.float32)
        z = jnp.asarray(rng.standard_normal(p1), jnp.float32)
        x_init = jnp.zeros(p1, jnp.float32)
        ps = jnp.asarray(rng.uniform(.5, 2., p1), jnp.float32)
        atol = 1e-5 * np.sqrt(p1)
        coef0, info0 = sample_gaussian_cg(
            key, design, obs_prec, prior_prec_sqrt, z, x_init, ps,
            atol=atol)
        print('B: k=0 n_iter', int(info0['n_cg_iter']),
              'finite', bool(jnp.isfinite(coef0).all()), flush=True)
        basis = jnp.asarray(
            rng.standard_normal((8, p1)) / np.sqrt(p1), jnp.float32)
        coef8, info8 = sample_gaussian_cg(
            key, design, obs_prec, prior_prec_sqrt, z, x_init, ps,
            atol=atol, recycled_basis=basis)
        bnew = info8['recycled_basis']
        print('B: k=8 n_iter', int(info8['n_cg_iter']),
              'finite coef', bool(jnp.isfinite(coef8).all()),
              'finite basis', bool(jnp.isfinite(bnew).all()),
              'rel(coef8-coef0):',
              float(jnp.abs(coef8 - coef0).max()
                    / jnp.abs(coef0).max()), flush=True)
        # second draw recycling the returned basis (the carry scenario)
        coef8b, info8b = sample_gaussian_cg(
            jax.random.PRNGKey(4), design, obs_prec, prior_prec_sqrt,
            z, x_init, ps, atol=atol, recycled_basis=bnew)
        print('B: recycle n_iter', int(info8b['n_cg_iter']),
              'finite', bool(jnp.isfinite(coef8b).all()),
              'finite basis',
              bool(jnp.isfinite(info8b['recycled_basis']).all()),
              flush=True)

    if 'C' in stages:
        from bayesbridge_tpu import (
            BayesBridge, RegressionCoefPrior, SamplerOptions,
        )
        bridge = BayesBridge(model, RegressionCoefPrior(
            bridge_exponent=0.5, regularizing_slab_size=2.))
        init = {'coef': np.zeros(p1), 'global_scale': 0.1,
                'local_scale': np.ones(p1 - 1)}
        n_draws = int(sys.argv[2]) if len(sys.argv) > 2 else 40
        for k in (8,):
            opts = SamplerOptions('cg', cg_recycled_basis=k)
            samples, carry = bridge.gibbs(
                n_draws, 0, seed=0, init=init, options=opts,
                params_to_save=('coef', 'logp'))
            logp = np.asarray(samples['logp'])
            ncg = np.asarray(
                carry['_reg_coef_sampling_info']['n_cg_iter'])
            bad = ~np.isfinite(logp)
            first = int(np.argmax(bad)) if bad.any() else -1
            print(f'C: k={k} first_bad_logp={first} '
                  f'of {n_draws}', flush=True)
            print('C: logp[:8]', np.round(logp[:8], 2), flush=True)
            print('C: ncg[:20]', ncg[:20].tolist(), flush=True)
            print('C: ncg[-20:]', ncg[-20:].tolist(),
                  'mean', round(float(ncg.mean()), 2), flush=True)
            cb = np.asarray(carry.get('cg_basis', np.zeros(1)))
            print('C: carry basis finite', bool(np.isfinite(cb).all()),
                  'absmax', float(np.abs(cb).max()), flush=True)


if __name__ == '__main__':
    main()
