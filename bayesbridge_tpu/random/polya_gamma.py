"""Vectorized Polya-Gamma sampler (Devroye's alternating-series method).

TPU-native replacement for the reference's scalar Cython kernel
(reference: bayesbridge/random/polya_gamma/polya_gamma.pyx:15-216) and its
Cephes ``log_ndtr`` dependency (scipy_ndtr.c — replaced here by
``jax.scipy.special.log_ndtr``).

A PG(1, tilt) draw is ``X = J*(|tilt|/2) / 4`` where J* is the tilted
Jacobi distribution; J* is sampled by accept/reject with a proposal that
mixes a left-truncated exponential (right piece) and a right-truncated
inverse-Gaussian (left piece), split at 2/pi, and an alternating-series
acceptance test truncated at 100 terms (polya_gamma.pyx:26-27).

The reference's nested scalar rejection loops (proposal -> truncated
inverse-Gaussian -> truncated chi-squared) are FLATTENED into a single
lane-parallel state machine: each round advances every unfinished lane
by one attempt of whatever stage it is in (the truncated chi-squared
proposal and both acceptance tests of the inverted-chi-squared branch
collapse into one joint accept step). Only the alternating-series test
keeps its own (bounded) inner loop. Rounds run through the
lane-compaction driver (random/rejection.py) so the straggler tail does
not pay full-width VPU math.

Integer shapes > 1 are handled by expanding each lane into ``shape``
unit-shape lanes (``jnp.repeat`` with a static total, since trial counts
are static model data) and summing back with ``segment_sum`` — the
vectorized equivalent of the reference's nested shape loop
(polya_gamma.pyx:70-74).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.ops import segment_sum
from jax.scipy.special import log_ndtr

from .rejection import run_rejection, uniform_open as _uniform

THRESHOLD = 2.0 / np.pi  # proposal split point (polya_gamma.pyx:26)
MAX_SERIES_TERMS = 100   # series truncation (polya_gamma.pyx:27)
_MAX_REJECTION_ROUNDS = 512



def _log_series_term(n, x):
    """log of the n-th term of the Jacobi density alternating series,
    eqs (12)-(13) of Polson, Scott & Windle 2013
    (polya_gamma.pyx:142-148)."""
    n_half = n + 0.5
    log_base = jnp.log(jnp.pi * n_half)
    small_x = log_base - 1.5 * jnp.log(0.5 * x * jnp.pi) \
        - 2.0 * n_half ** 2 / x
    large_x = log_base - 0.5 * x * jnp.pi ** 2 * n_half ** 2
    return jnp.where(x <= THRESHOLD, small_x, large_x)


def _series_term(n, x):
    return jnp.exp(_log_series_term(n, x))


def _prob_right_piece(tilt, exp_rate):
    """Probability that the proposal comes from the exponential (right)
    piece (polya_gamma.pyx:131-140)."""
    log_mass_expo = -jnp.log(exp_rate) - exp_rate * THRESHOLD \
        + jnp.log(0.25 * jnp.pi)
    sqrt_t = np.sqrt(THRESHOLD)
    log_mass_invg_1 = -tilt + log_ndtr((THRESHOLD * tilt - 1.0) / sqrt_t)
    log_mass_invg_2 = tilt + log_ndtr(-(THRESHOLD * tilt + 1.0) / sqrt_t)
    mass_ratio = jnp.exp(log_mass_invg_1 - log_mass_expo) \
        + jnp.exp(log_mass_invg_2 - log_mass_expo)
    return 1.0 / (1.0 + mass_ratio)


def _series_acceptance(u, x, zeroth_term, max_terms):
    """Devroye's alternating-series accept test, truncated at `max_terms`
    (polya_gamma.pyx:150-174): odd partial sums lower-bound the density
    (accept if U <= sum), even ones upper-bound it (reject if U > sum)."""
    dtype = x.dtype
    shape = x.shape

    def cond(s):
        return jnp.logical_and(jnp.any(~s['det']), s['n'] < max_terms)

    def body(s):
        n = s['n']
        term = _series_term(n.astype(dtype), x)
        partial = s['partial'] + s['sign'] * term
        newly_acc = jnp.logical_and(s['sign'] < 0, u <= partial)
        newly_rej = jnp.logical_and(s['sign'] > 0, u > partial)
        hit_cap = n + 1 >= max_terms
        det = s['det'] | newly_acc | newly_rej | hit_cap
        acc = jnp.where(
            ~s['det'],
            jnp.where(newly_acc, True,
                      jnp.where(newly_rej, False,
                                # cap: take the lower bound as the target
                                hit_cap)),
            s['acc'],
        )
        return dict(partial=partial, n=n + 1, sign=-s['sign'],
                    acc=acc, det=det)

    out = lax.while_loop(
        cond, body,
        dict(partial=zeroth_term, n=jnp.int32(1),
             sign=jnp.full(shape, -1.0, dtype),
             acc=jnp.zeros(shape, bool), det=jnp.zeros(shape, bool)),
    )
    return out['acc']


def _invgauss_attempt(key, rate, dtype):
    """One joint attempt at an Inverse-Gaussian(1/rate, shape=1) draw
    truncated to (0, 2/pi) (polya_gamma.pyx:192-216). Branches:

    * mean > threshold: X = 1/E with E ~ chi-sq(1) truncated to
      (pi/2, inf) via an exponential proposal; the chi-squared
      acceptance sqrt(pi/(2E)) and the final exp(-X rate^2/2) test are
      evaluated jointly in one shot (Windle thesis, alg. 3);
    * mean <= threshold: Michael-Schucany-Haas draw accepted while
      X < threshold.

    Returns (candidate, accepted) per lane.
    """
    shape = rate.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mean = 1.0 / rate
    use_chisq = mean > THRESHOLD

    # Branch A: inverted truncated chi-squared, joint acceptance.
    e = 0.5 * jnp.pi - 2.0 * jnp.log1p(-_uniform(k1, shape, dtype))
    x_a = 1.0 / e
    ok_a = jnp.logical_and(
        _uniform(k2, shape, dtype) <= jnp.sqrt(0.5 * jnp.pi / e),
        jnp.log(_uniform(k3, shape, dtype)) < -0.5 * x_a * rate ** 2)

    # Branch B: plain inverse-Gaussian rejection.
    v = jax.random.normal(k4, shape, dtype) ** 2
    x_b = mean + 0.5 * mean * (
        mean * v - jnp.sqrt(4.0 * mean * v + (mean * v) ** 2))
    flip = _uniform(k2, shape, dtype) > mean / (mean + x_b)
    x_b = jnp.where(flip, mean ** 2 / x_b, x_b)
    ok_b = x_b < THRESHOLD

    cand = jnp.where(use_chisq, x_a, x_b)
    ok = jnp.where(use_chisq, ok_a, ok_b)
    return cand, ok


def _rand_tilted_jacobi(key, tilt, max_rounds):
    """Tilted Jacobi J*(tilt) draws (polya_gamma.pyx:103-129), one
    flattened lane-parallel rejection loop. Lane stages: acquiring a
    proposal (possibly over several iterations for the inverse-Gaussian
    piece), then the series test; a failed series test restarts the
    lane."""
    dtype = tilt.dtype
    shape = tilt.shape
    exp_rate = 0.5 * tilt ** 2 + 0.125 * jnp.pi ** 2
    p_right = _prob_right_piece(tilt, exp_rate)
    rate = jnp.maximum(tilt, 1e-7)

    def attempt(k, p, s):
        k_pick, k_exp, k_ig, k_u = jax.random.split(k, 4)
        lanes = p['rate'].shape

        # Stage 1: lanes starting a fresh proposal pick a side.
        fresh = ~s['ig_pending']
        from_right = _uniform(k_pick, lanes, dtype) < p['p_right']
        x_right = THRESHOLD \
            - jnp.log1p(-_uniform(k_exp, lanes, dtype)) / p['exp_rate']

        # Stage 2: one inverse-Gaussian attempt for lanes on that piece
        # (fresh left-side lanes and lanes already pending).
        ig_lane = jnp.logical_or(jnp.logical_and(fresh, ~from_right),
                                 s['ig_pending'])
        ig_cand, ig_ok = _invgauss_attempt(k_ig, p['rate'], dtype)

        have_x = jnp.logical_or(
            jnp.logical_and(fresh, from_right),
            jnp.logical_and(ig_lane, ig_ok))
        x = jnp.where(jnp.logical_and(fresh, from_right), x_right, ig_cand)
        ig_pending = jnp.logical_and(ig_lane, ~ig_ok)

        # Stage 3: alternating-series accept test for lanes holding a
        # fresh proposal this round.
        zeroth = _series_term(jnp.asarray(0.0, dtype), x)
        u = _uniform(k_u, lanes, dtype) * zeroth
        series_ok = _series_acceptance(u, x, zeroth, MAX_SERIES_TERMS)
        ok = jnp.logical_and(have_x, series_ok)
        return dict(ig_pending=ig_pending), x, ok

    # tail_replicas MUST stay 1 here: this chain's acceptance time is
    # correlated with its value (the inverse-Gaussian piece takes a
    # geometric number of rounds, the exponential piece exactly one), so
    # first-finisher replica selection would over-represent the
    # exponential piece. See run_rejection's docstring; the pinned-mean
    # test in tests/test_random_kernels.py guards this.
    x, _ = run_rejection(
        key,
        params=dict(exp_rate=exp_rate, p_right=p_right, rate=rate),
        state=dict(ig_pending=jnp.zeros(shape, bool)),
        attempt=attempt,
        value_init=jnp.zeros(shape, dtype),
        max_rounds=max_rounds,
        tail_replicas=1,
    )
    return x


@functools.partial(jax.jit, static_argnames=('max_rounds',))
def sample_unit_shape_polya_gamma(key, tilt,
                                  max_rounds=_MAX_REJECTION_ROUNDS):
    """PG(1, tilt) draws, one per element of `tilt`
    (polya_gamma.pyx:97-101)."""
    tilt = jnp.asarray(tilt)
    # The compaction driver works on flat lane vectors.
    draws = _rand_tilted_jacobi(key, 0.5 * jnp.abs(tilt).ravel(),
                                max_rounds)
    return 0.25 * draws.reshape(tilt.shape)


def sample_polya_gamma(key, shape, tilt, max_rounds=_MAX_REJECTION_ROUNDS):
    """PG(shape, tilt) draws for integer `shape` (static data).

    Equivalent to summing `shape[i]` unit-shape draws per lane
    (polya_gamma.pyx:61-74), vectorized by statically expanding lanes and
    summing back with segment_sum.
    """
    shape = np.asarray(shape)
    if not np.issubdtype(shape.dtype, np.integer):
        raise ValueError('Shape parameter must be integers.')
    tilt = jnp.asarray(tilt)
    if shape.size != tilt.size:
        raise ValueError('Input arrays must be of the same length.')
    if np.all(shape == 1):
        return sample_unit_shape_polya_gamma(key, tilt, max_rounds)
    segment_ids = np.repeat(np.arange(shape.size), shape)
    expanded = jnp.take(tilt, jnp.asarray(segment_ids))
    draws = sample_unit_shape_polya_gamma(key, expanded, max_rounds)
    return segment_sum(draws, jnp.asarray(segment_ids),
                       num_segments=shape.size)
