"""Floating point configuration.

The reference library is float64 throughout. On TPU, float64 is emulated and
slow, so the library is dtype-polymorphic: every on-device computation follows
the dtype of the design matrix / state arrays. Under ``jax.config.update
("jax_enable_x64", True)`` (used by the test-suite for parity with the
reference) everything runs in float64; in the default TPU configuration
everything runs in float32 with a handful of float64-sensitive reductions
kept numerically stable by algorithm choice rather than precision.
"""

import jax.numpy as jnp
import numpy as np


def default_float():
    """The widest float dtype currently enabled in JAX (f64 iff x64 mode)."""
    return jnp.zeros(0).dtype if jnp.zeros(0).dtype == jnp.float64 \
        else jnp.float32


def asarray_f(x, dtype=None):
    """Convert to a jnp floating array in the requested / default dtype."""
    if dtype is None:
        dtype = default_float()
    return jnp.asarray(x, dtype=dtype)


def to_numpy(x):
    return np.asarray(x)
