"""TPU-native BayesBridge: Bayesian sparse regression with the bridge prior.

A from-scratch JAX/XLA/Pallas re-design of the BayesBridge Gibbs sampler
(prior-preconditioned conjugate-gradient sampler of Nishimura & Suchard 2022
plus Polya-Gamma augmented Gibbs) for linear / logistic / Cox regression.

The public API mirrors the reference library
(reference: bayesbridge/__init__.py:1-4):

    from bayesbridge_tpu import (
        BayesBridge, RegressionModel, RegressionCoefPrior, SamplerOptions
    )

Design stance (TPU-first, not a port):
  * the whole Gibbs iteration is one jitted step function driven by
    ``lax.scan`` with zero host round-trips per iteration;
  * all randomness flows through ``jax.random`` keys threaded in the carry;
  * the native rejection samplers (tilted-stable, Polya-Gamma) are
    vectorized masked ``lax.while_loop`` kernels instead of scalar C loops;
  * design matrices live in HBM as dense arrays or padded dual-ELL sparse
    layouts whose matvecs map onto the MXU / VPU;
  * multi-chip scaling uses ``jax.sharding`` meshes (rows of X sharded over
    devices, ``psum`` for the X'u reductions) instead of MKL threads.
"""

from .prior import RegressionCoefPrior
from .models import RegressionModel
from .gibbs_util import SamplerOptions
from .bridge import BayesBridge
from .multichain import gibbs_chains

__all__ = ["RegressionCoefPrior", "RegressionModel", "SamplerOptions",
           "BayesBridge", "gibbs_chains"]

__version__ = "0.1.0"
