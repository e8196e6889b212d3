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

Integer shapes > 1 are handled by expanding each lane into ``shape``
unit-shape lanes (``jnp.repeat`` with a static total, since trial counts
are static model data) and summing back with ``segment_sum`` — the
vectorized equivalent of the reference's nested shape loop
(polya_gamma.pyx:70-74).

Every rejection loop is lane-parallel and masked, as in
:mod:`.tilted_stable`.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.ops import segment_sum
from jax.scipy.special import log_ndtr

THRESHOLD = 2.0 / np.pi  # proposal split point (polya_gamma.pyx:26)
MAX_SERIES_TERMS = 100   # series truncation (polya_gamma.pyx:27)
_MAX_REJECTION_ROUNDS = 256


def _uniform(key, shape, dtype):
    tiny = jnp.finfo(dtype).tiny
    return jax.random.uniform(key, shape, dtype, minval=tiny)


def _left_trunc_exp(u, scale, trunc):
    """Inverse-CDF sample of Exp(scale) truncated to (trunc, inf), from a
    uniform `u` (polya_gamma.pyx:177-178)."""
    return trunc - scale * jnp.log1p(-u)


def _left_trunc_chisq(key, shape, dtype, trunc, max_rounds):
    """Chi-squared(1) truncated to (trunc, inf) via exponential proposals
    (polya_gamma.pyx:180-189; Chung 1998)."""
    def cond(s):
        key, x, accepted, rounds = s
        return jnp.logical_and(jnp.any(~accepted), rounds < max_rounds)

    def body(s):
        key, x, accepted, rounds = s
        key, k1, k2 = jax.random.split(key, 3)
        cand = _left_trunc_exp(_uniform(k1, shape, dtype), 2.0, trunc)
        density_ratio = jnp.sqrt(0.5 * jnp.pi / cand)
        ok = _uniform(k2, shape, dtype) <= density_ratio
        take = jnp.logical_and(~accepted, ok)
        x = jnp.where(take, cand, x)
        accepted = jnp.logical_or(accepted, take)
        return key, x, accepted, rounds + 1

    _, x, _, _ = lax.while_loop(
        cond, body,
        (key, jnp.full(shape, trunc, dtype), jnp.zeros(shape, bool),
         jnp.int32(0)),
    )
    return x


def _unit_shape_invgauss(key, mean, dtype):
    """Inverse-Gaussian(mean, shape=1) via Michael-Schucany-Haas
    (polya_gamma.pyx:211-216)."""
    k_n, k_u = jax.random.split(key)
    v = jax.random.normal(k_n, mean.shape, dtype) ** 2
    x = mean + 0.5 * mean * (
        mean * v - jnp.sqrt(4.0 * mean * v + (mean * v) ** 2)
    )
    u = _uniform(k_u, mean.shape, dtype)
    return jnp.where(u > mean / (mean + x), mean ** 2 / x, x)


def _right_trunc_invgauss(key, rate, trunc, max_rounds):
    """Inverse-Gaussian(1/rate, shape=1) truncated to (0, trunc)
    (polya_gamma.pyx:192-209). Lane-wise algorithm choice: inverted
    truncated chi-squared when the mean exceeds `trunc`, plain rejection
    otherwise. Both masked loops run on the full vector; lanes use the
    result of their own branch."""
    dtype = rate.dtype
    shape = rate.shape
    mean = 1.0 / rate
    use_chisq = mean > trunc

    def cond(s):
        return jnp.logical_and(jnp.any(~s[2]), s[3] < max_rounds)

    # Branch A: X = 1 / LeftTruncChisq(pi/2), accept w.p. exp(-X rate^2/2).
    # Lanes on branch B are given rate 1 (high acceptance) and discarded.
    rate_a = jnp.where(use_chisq, rate, jnp.asarray(1.0, dtype))

    def body_a(s):
        key, x, accepted, rounds = s
        key, k1, k2 = jax.random.split(key, 3)
        inv_cand = _left_trunc_chisq(k1, shape, dtype, 0.5 * jnp.pi,
                                     max_rounds)
        cand = 1.0 / inv_cand
        ok = jnp.log(_uniform(k2, shape, dtype)) < -0.5 * cand * rate_a ** 2
        take = jnp.logical_and(~accepted, ok)
        x = jnp.where(take, cand, x)
        return key, x, jnp.logical_or(accepted, take), rounds + 1

    k_a, k_b = jax.random.split(key)
    _, x_a, _, _ = lax.while_loop(
        cond, body_a,
        (k_a, jnp.zeros(shape, dtype), jnp.zeros(shape, bool), jnp.int32(0)),
    )

    # Branch B: plain rejection, accept while X < trunc. Lanes on branch A
    # are given a small mean so their (discarded) draws accept quickly.
    mean_b = jnp.where(use_chisq, jnp.asarray(0.5 * trunc, dtype), mean)

    def body_b(s):
        key, x, accepted, rounds = s
        key, k1 = jax.random.split(key)
        cand = _unit_shape_invgauss(k1, mean_b, dtype)
        take = jnp.logical_and(~accepted, cand < trunc)
        x = jnp.where(take, cand, x)
        return key, x, jnp.logical_or(accepted, take), rounds + 1

    _, x_b, _, _ = lax.while_loop(
        cond, body_b,
        (k_b, jnp.zeros(shape, dtype), jnp.zeros(shape, bool), jnp.int32(0)),
    )
    return jnp.where(use_chisq, x_a, x_b)


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
    (polya_gamma.pyx:150-174). Runs until every lane's partial sums
    bracket its U."""
    dtype = x.dtype
    shape = x.shape

    # state: (partial_sum, n_summed, sign, accepted, determinate)
    def cond2(s):
        return jnp.logical_and(jnp.any(~s['det']), s['n'] < max_terms)

    def body2(s):
        n = s['n']
        term = _series_term(n.astype(dtype), x)
        partial = s['partial'] + s['sign'] * term
        # sign == -1: odd partial sum is a lower bound -> accept if U <= it
        # sign == +1: even partial sum is an upper bound -> reject if U > it
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
        cond2, body2,
        dict(partial=zeroth_term, n=jnp.int32(1),
             sign=jnp.full(shape, -1.0, dtype),
             acc=jnp.zeros(shape, bool), det=jnp.zeros(shape, bool)),
    )
    return out['acc']


def _rand_tilted_jacobi(key, tilt, max_rounds):
    """Tilted Jacobi J*(tilt) draws, one per lane (polya_gamma.pyx:103-129)."""
    dtype = tilt.dtype
    shape = tilt.shape
    exp_rate = 0.5 * tilt ** 2 + 0.125 * jnp.pi ** 2
    p_right = _prob_right_piece(tilt, exp_rate)

    def cond(s):
        return jnp.logical_and(jnp.any(~s['acc']), s['rounds'] < max_rounds)

    def body(s):
        key, k_pick, k_exp, k_ig, k_u = jax.random.split(s['key'], 5)
        from_right = _uniform(k_pick, shape, dtype) < p_right
        x_right = _left_trunc_exp(
            _uniform(k_exp, shape, dtype), 1.0 / exp_rate, THRESHOLD
        )
        x_left = _right_trunc_invgauss(k_ig, jnp.maximum(tilt, 1e-7),
                                       THRESHOLD, max_rounds)
        x = jnp.where(from_right, x_right, x_left)
        zeroth = _series_term(jnp.asarray(0.0, dtype), x)
        u = _uniform(k_u, shape, dtype) * zeroth
        ok = _series_acceptance(u, x, zeroth, MAX_SERIES_TERMS)
        take = jnp.logical_and(~s['acc'], ok)
        return dict(
            key=key,
            x=jnp.where(take, x, s['x']),
            acc=jnp.logical_or(s['acc'], take),
            rounds=s['rounds'] + 1,
        )

    out = lax.while_loop(
        cond, body,
        dict(key=key, x=jnp.zeros(shape, dtype),
             acc=jnp.zeros(shape, bool), rounds=jnp.int32(0)),
    )
    return out['x']


@functools.partial(jax.jit, static_argnames=('max_rounds',))
def sample_unit_shape_polya_gamma(key, tilt,
                                  max_rounds=_MAX_REJECTION_ROUNDS):
    """PG(1, tilt) draws, one per element of `tilt`
    (polya_gamma.pyx:97-101)."""
    tilt = jnp.asarray(tilt)
    return 0.25 * _rand_tilted_jacobi(key, 0.5 * jnp.abs(tilt), max_rounds)


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
