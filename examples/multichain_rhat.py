"""Convergence diagnostics with data-parallel chains.

Runs four overdispersed Gibbs chains in ONE compiled program
(vmap over the chain axis; add `mesh=` to spread chains across TPU
chips), then checks split-R-hat and pooled ESS — the workflow the
single-chain reference requires separate processes for.

    python -m examples.multichain_rhat
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from bayesbridge_tpu import (  # noqa: E402
    BayesBridge, RegressionModel, RegressionCoefPrior,
)
from bayesbridge_tpu.multichain import gibbs_chains, gibbs_chains_resume
from bayesbridge_tpu.utils.mcmc_summarizer import (
    compute_multichain_ess, compute_split_rhat,
)
from bayesbridge_tpu.utils.simulate_data import (
    simulate_design, simulate_outcome,
)


def main():
    n_obs, n_pred, n_chains = 1000, 100, 4
    X = simulate_design(n_obs, n_pred, binary_frac=.9, seed=0)
    beta_true = np.zeros(n_pred)
    beta_true[:5] = 1.0
    outcome = simulate_outcome(X, beta_true, 'logit', seed=1)

    model = RegressionModel(outcome, X, family='logit')
    prior = RegressionCoefPrior(bridge_exponent=.5,
                                regularizing_slab_size=2.)
    bridge = BayesBridge(model, prior)

    # Overdispersed starts: R-hat only detects non-convergence if the
    # chains begin in different basins.
    rng = np.random.default_rng(42)
    inits = [{'coef': 2.0 * rng.standard_normal(n_pred + 1),
              'global_scale': 10.0 ** rng.uniform(-2, 0),
              'local_scale': np.ones(n_pred)}
             for _ in range(n_chains)]

    samples, info = gibbs_chains(
        bridge, n_iter=600, n_chains=n_chains, n_burnin=200, seed=0,
        init=inits, coef_sampler_type='cg',
        params_to_save=('coef', 'logp'))

    rhat = compute_split_rhat(samples['coef'])
    ess = compute_multichain_ess(samples['coef'])
    print(f"split-R-hat: max={rhat.max():.3f}  "
          f"median={np.median(rhat):.3f}  (want < 1.01-1.1)")
    print(f"pooled ESS : min={ess.min():.0f}  median={np.median(ess):.0f}"
          f"  (out of {samples['coef'].shape[-1] * n_chains} draws)")

    # Not converged yet? Extend every chain from its exact final state.
    if rhat.max() > 1.1:
        print("extending chains 400 more iterations ...")
        samples, info = gibbs_chains_resume(
            bridge, info, 400, merge=True, prev_samples=samples)
        rhat = compute_split_rhat(samples['coef'])
        print(f"split-R-hat after extension: max={rhat.max():.3f}")

    post_mean = samples['coef'].mean(axis=(0, 2))
    top = np.argsort(-np.abs(post_mean[1:]))[:5]
    print("top-5 coefficients (true signal is predictors 0-4):", top)


if __name__ == '__main__':
    main()
