"""On-chip statistical parity: f32 TPU CG chain vs f64 CPU Cholesky.

The unit suites pin per-draw numerics and the NumPy-oracle parity test
pins small-scale distributional agreement on one backend. This script
supplies the remaining evidence leg: the PRODUCTION configuration
(float32 chain, CG sampler, real TPU) must produce the same posterior
as a float64 CPU chain driven through the OTHER Gaussian sampler
(Cholesky) — crossing hardware, precision, and sampler in one
comparison. Agreement is judged coordinate-wise on posterior means and
sds with ESS-aware Monte-Carlo standard errors (z = |m1 - m2| /
sqrt(se1^2 + se2^2)); the chains use different seeds so draws are
independent.

Run: python -m baselines.parity_onchip        # ~5 min (CPU leg bound)
Appends one JSON line to baselines/r5_measure_artifact.jsonl.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from baselines.r5_measure import emit  # noqa: E402


def run_chain(X, outcome, method, dtype, seed, n_iter, n_burnin,
              device):
    import jax
    from bayesbridge_tpu import (
        BayesBridge, RegressionModel, RegressionCoefPrior,
    )
    with jax.default_device(device):
        model = RegressionModel(outcome, X, family='logit', dtype=dtype)
        bridge = BayesBridge(model, RegressionCoefPrior(
            bridge_exponent=.5, regularizing_slab_size=2.))
        samples, _ = bridge.gibbs(
            n_iter, n_burnin, seed=seed, coef_sampler_type=method,
            init={'global_scale': .1}, params_to_save=('coef',))
    return np.asarray(samples['coef'], np.float64)


def moments(draws):
    from bayesbridge_tpu.utils.mcmc_summarizer import (
        compute_effective_sample_size,
    )
    mean = draws.mean(axis=-1)
    sd = draws.std(axis=-1)
    ess = np.maximum(np.asarray(
        compute_effective_sample_size(draws)), 8.0)
    # sd standard error via the delta method with the EMPIRICAL fourth
    # moment: Var(s^2) ~ (m4 - s^4)/ESS, Var(s) ~ Var(s^2)/(4 s^2).
    # The Gaussian shortcut s/sqrt(2 ESS) understates the SE badly
    # here — bridge-shrunk marginals are heavy-tailed (empirical
    # kurtosis in the hundreds for near-zero coefficients), which a
    # first version of this script misread as sd disagreement.
    c = draws - mean[..., None]
    m4 = np.mean(c ** 4, axis=-1)
    var_s2 = np.maximum(m4 - sd ** 4, 1e-300) / ess
    sd_se = np.sqrt(var_s2) / np.maximum(2 * sd, 1e-150)
    return mean, sd, sd / np.sqrt(ess), sd_se


def main():
    import jax
    from bayesbridge_tpu.utils.simulate_data import (
        simulate_design, simulate_outcome,
    )
    n, p = 2000, 200
    n_iter = int(os.environ.get('BB_PARITY_ITER', 5000))
    n_burnin = 1000
    X = simulate_design(n, p, binary_frac=.7, format_='sparse', seed=11)
    beta = np.zeros(p)
    beta[:5] = 1.0
    outcome = simulate_outcome(X, beta, 'logit', seed=12)

    accel = jax.devices()[0]
    cpu = jax.devices('cpu')[0]
    draws_tpu = run_chain(X, outcome, 'cg', np.float32, 0,
                          n_iter, n_burnin, accel)
    draws_cpu = run_chain(X, outcome, 'cholesky', np.float64, 1,
                          n_iter, n_burnin, cpu)

    m1, s1, se1, sd_se1 = moments(draws_tpu)
    m2, s2, se2, sd_se2 = moments(draws_cpu)
    z_mean = np.abs(m1 - m2) / np.hypot(se1, se2)
    z_sd = np.abs(s1 - s2) / np.hypot(sd_se1, sd_se2)
    emit({'leg': 'parity_onchip', 'shape': [n, p],
          'n_kept': int(n_iter - n_burnin),
          'chain_a': 'tpu_f32_cg_%s' % accel.platform,
          'chain_b': 'cpu_f64_cholesky',
          'z_mean_max': round(float(z_mean.max()), 2),
          'z_mean_frac_gt3': round(float((z_mean > 3).mean()), 4),
          'z_sd_max': round(float(z_sd.max()), 2),
          'z_sd_frac_gt3': round(float((z_sd > 3).mean()), 4),
          'median_sd_ratio': round(float(np.median(s1 / s2)), 4),
          'frac_sd_a_gt_b': round(float((s1 > s2).mean()), 3),
          'max_abs_mean_diff': round(float(np.abs(m1 - m2).max()), 5)})
    ok = (z_mean > 4).mean() < 0.01 and (z_sd > 4).mean() < 0.01
    print('PARITY', 'OK' if ok else 'FAIL')
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
