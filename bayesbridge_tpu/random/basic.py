"""Random-state facade for the Gibbs sampler.

The reference keeps a global NumPy RNG plus two PCG64 streams with
get/set-state for checkpointing (reference: bayesbridge/random/random.py:5-41).
Here all randomness flows from a single ``jax.random`` key that is split
per use; the checkpoint state is just the key's raw data, which makes
resume-equals-uninterrupted exact within this library.
"""

import numpy as np
import jax
import jax.random as jrandom

from .polya_gamma import sample_polya_gamma
from .tilted_stable import sample_tilted_stable


class BasicRandom:
    """Owns the PRNG key and exposes the sampler kernels."""

    def __init__(self, seed=None):
        self.set_seed(seed)

    def set_seed(self, seed):
        if seed is None:
            seed = int(np.random.SeedSequence().entropy % (2 ** 63))
        self._key = jrandom.key(seed)

    @property
    def key(self):
        return self._key

    def split_key(self, num=2):
        """Split off `num - 1` fresh subkeys, advancing the internal key."""
        keys = jrandom.split(self._key, num)
        self._key = keys[0]
        return keys[1:] if num > 2 else keys[1]

    def get_state(self):
        return {'jax_key_data': np.asarray(jrandom.key_data(self._key))}

    def set_state(self, state):
        self._key = jrandom.wrap_key_data(
            jax.numpy.asarray(state['jax_key_data'])
        )

    # ------------------------------------------------------------------ #
    # Kernels (eager convenience wrappers; the Gibbs scan calls the      #
    # functional versions directly with carried keys)                    #
    # ------------------------------------------------------------------ #

    def polya_gamma(self, shape, tilt):
        return np.asarray(
            sample_polya_gamma(self.split_key(), shape, tilt)
        )

    def tilted_stable(self, char_exponent, tilt):
        return np.asarray(
            sample_tilted_stable(self.split_key(), char_exponent, tilt)
        )

    def normal(self, size):
        return np.asarray(jrandom.normal(self.split_key(), (size,)))

    def uniform(self, size=()):
        return np.asarray(jrandom.uniform(self.split_key(), size))

    def gamma(self, a, size=()):
        return np.asarray(jrandom.gamma(self.split_key(), a, size))
