"""Vectorized exponentially-tilted stable sampler.

TPU-native replacement for the reference's scalar Cython kernel
(reference: bayesbridge/random/tilted_stable/tilted_stable.pyx:44-332).
Samples X with density proportional to ``exp(-tilt * x) * p_stable(x)``
where ``p_stable`` is the positive stable density with characteristic
exponent ``char_exp < 1``, skewness 1 and scale
``cos(char_exp*pi/2)^(1/char_exp)``.

Two algorithms, chosen lane-wise exactly like the reference
(tilted_stable.pyx:103-112):

* divide-and-conquer (Hofert 2011): cheap while ``tilt**char_exp`` is
  small — per-partition acceptance probability is
  ``exp(-tilt**char_exp / m)``;
* double-rejection (Devroye 2009): O(1) expected cost uniformly in the
  tilt.

Instead of scalar accept/reject loops over a PCG64 stream, every lane of
the input vector runs its rejection chain simultaneously on
``jax.random`` (threefry) keys: each round proposes for all unfinished
lanes at once (pure VPU element-wise math). Rounds run through the
lane-compaction driver (see random/rejection.py): as lanes accept, the
stragglers are gathered into geometrically smaller buffers so the tail
of slow lanes does not pay full-width transcendental math. Acceptance
probabilities are bounded below (>= exp(-2) for divide-conquer in the
auto-selected regime, Omega(1) for double-rejection), and a safety cap
bounds the total round count.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .rejection import run_rejection, uniform_open as _uniform

TILT_POWER_THRESHOLD = 2.0  # same crossover as tilted_stable.pyx:52
_MAX_REJECTION_ROUNDS = 256


def _safe_exp(x):
    finfo = jnp.finfo(x.dtype if hasattr(x, 'dtype') else jnp.float32)
    max_arg = 0.9 * np.log(finfo.max)
    return jnp.exp(jnp.clip(x, -max_arg, max_arg))



def _sinc(x):
    """sin(x)/x with a Taylor guard near zero (tilted_stable.pyx:29-37)."""
    x_sq = x * x
    taylor = 1.0 - x_sq / 6.0 * (1.0 - x_sq / 20.0)
    safe_x = jnp.where(jnp.abs(x) < 0.01, jnp.ones_like(x), x)
    return jnp.where(jnp.abs(x) < 0.01, taylor, jnp.sin(safe_x) / safe_x)


def _zolotarev_function(x, alpha):
    """Zolotarev's A(x, alpha) (tilted_stable.pyx:326-332)."""
    val = (
        ((1.0 - alpha) * _sinc((1.0 - alpha) * x)) ** (1.0 - alpha)
        * (alpha * _sinc(alpha * x)) ** alpha
        / _sinc(x)
    )
    return val ** (1.0 / (1.0 - alpha))


def _zolotarev_pdf_exponentiated(x, alpha):
    """Function proportional to a power of the Zolotarev density
    (tilted_stable.pyx:316-324)."""
    denom = _sinc(alpha * x) ** alpha * _sinc((1.0 - alpha) * x) ** (1.0 - alpha)
    return _sinc(x) / denom


def _sample_non_tilted(key, alpha, dtype):
    """One positive-stable draw per lane via Kanter's method
    (tilted_stable.pyx:157-164)."""
    k1, k2 = jax.random.split(key)
    u = _uniform(k1, alpha.shape, dtype)
    v = _uniform(k2, alpha.shape, dtype)
    ratio = -_zolotarev_function(jnp.pi * u, alpha) / jnp.log(v)
    return ratio ** ((1.0 - alpha) / alpha)


# --------------------------------------------------------------------- #
# Divide-and-conquer (Hofert 2011)                                      #
# --------------------------------------------------------------------- #

def _sample_divide_conquer(key, alpha, tilt, max_partition, max_rounds):
    """X = sum over `m = max(1, floor(tilt^alpha))` partitions of scaled
    stable draws, each accepted with probability exp(-tilt * S)
    (tilted_stable.pyx:137-155). All lanes and partitions run in one
    masked while loop: a lane finishes once it has accumulated `m`
    accepted partition draws.

    In the auto-selected regime tilt^alpha < 2 so m == 1; larger m only
    arises when the caller forces this method, and is capped at
    `max_partition`.
    """
    dtype = tilt.dtype
    # Clamp in FLOAT before the integer cast: tilt**alpha >= 2**31 would
    # overflow the int32 floor (saturating to INT_MIN and silently
    # collapsing to m=1).
    m = jnp.maximum(1, jnp.floor(
        jnp.minimum(tilt ** alpha, float(max_partition))
    ).astype(jnp.int32))
    c = (1.0 / m.astype(dtype)) ** (1.0 / alpha)

    def attempt(k, p, s):
        k_s, k_u = jax.random.split(k)
        draw = p['c'] * _sample_non_tilted(k_s, p['alpha'], dtype)
        accept_prob = _safe_exp(-p['tilt'] * draw)
        u = _uniform(k_u, p['tilt'].shape, dtype)
        take = jnp.logical_and(s['n_done'] < p['m'], u < accept_prob)
        total = jnp.where(take, s['total'] + draw, s['total'])
        n_done = jnp.where(take, s['n_done'] + 1, s['n_done'])
        return dict(n_done=n_done, total=total), total, n_done >= p['m']

    total, _ = run_rejection(
        key,
        params=dict(alpha=alpha, tilt=tilt, m=m, c=c),
        state=dict(n_done=jnp.zeros_like(m), total=jnp.zeros_like(tilt)),
        attempt=attempt,
        value_init=jnp.zeros_like(tilt),
        max_rounds=max_rounds,
        # Partial sums accumulate monotonically: a lane capped at
        # max_rounds returns its progress so far, like the uncompacted
        # loop did.
        latch='every_round',
        # Replicated tail chains are unbiased here: each accepted
        # partition value is an iid tilted draw and the geometric wait
        # preceding it is independent of that value, so a lane's total is
        # independent of its finish time (law-tested in
        # tests/test_rejection.py / test_random_kernels.py).
        tail_replicas=8,
    )
    return total


# --------------------------------------------------------------------- #
# Double rejection (Devroye 2009)                                       #
# --------------------------------------------------------------------- #

def _aux2_candidate(key, alpha, gamma, xi, psi, dtype):
    """One candidate for the auxiliary variable U
    (tilted_stable.pyx:210-236)."""
    k_v, k_n, k_w = jax.random.split(key, 3)
    shape = gamma.shape
    v = _uniform(k_v, shape, dtype)
    n = jax.random.normal(k_n, shape, dtype)
    w = _uniform(k_w, shape, dtype)

    w1 = jnp.sqrt(0.5 * jnp.pi / gamma) * xi
    w2 = 2.0 * jnp.sqrt(jnp.pi) * psi
    w3 = xi * jnp.pi

    u_highgamma = jnp.where(
        v < w1 / (w1 + w2),
        jnp.abs(n) / jnp.sqrt(gamma),
        jnp.pi * (1.0 - w * w),
    )
    u_lowgamma = jnp.where(
        v < w3 / (w2 + w3),
        jnp.pi * w,
        jnp.pi * (1.0 - w * w),
    )
    return jnp.where(gamma >= 1.0, u_highgamma, u_lowgamma)


def _aux2_accept_prob(u, alpha, xi, psi, zeta, z, tilt_power, gamma):
    """Acceptance probability for the auxiliary draw
    (tilted_stable.pyx:238-256)."""
    inv_prob = (
        jnp.pi * _safe_exp(-tilt_power * (1.0 - 1.0 / (zeta * zeta)))
        / ((1.0 + jnp.sqrt(0.5 * jnp.pi)) * jnp.sqrt(gamma) / zeta + z)
    )
    d = jnp.zeros_like(u)
    d = d + jnp.where(
        jnp.logical_and(u >= 0.0, gamma >= 1.0),
        xi * _safe_exp(-gamma * u * u / 2.0), 0.0,
    )
    d = d + jnp.where(
        jnp.logical_and(u > 0.0, u < jnp.pi),
        psi / jnp.sqrt(jnp.maximum(jnp.pi - u, jnp.finfo(u.dtype).tiny)),
        0.0,
    )
    d = d + jnp.where(
        jnp.logical_and(jnp.logical_and(u >= 0.0, u <= jnp.pi), gamma < 1.0),
        xi, 0.0,
    )
    return 1.0 / (inv_prob * d)


def _reference_rv(key, u, alpha, tilt_power, z, dtype):
    """Draw X from the 3-piece reference density given U, plus its log
    acceptance probability (tilted_stable.pyx:258-314)."""
    k_v, k_n, k_u, k_e = jax.random.split(key, 4)
    shape = u.shape
    a = _zolotarev_function(u, alpha)
    odds = (1.0 - alpha) / alpha
    left = ((1.0 - alpha) / alpha / a) ** alpha * tilt_power
    right = left + jnp.sqrt(left * alpha / a)
    expo_scale = z / a

    width = right - left
    mass_left = width * jnp.sqrt(0.5 * jnp.pi)
    mass_mid = width
    mass_right = expo_scale
    mass_total = mass_left + mass_mid + mass_right

    v = _uniform(k_v, shape, dtype)
    n = jax.random.normal(k_n, shape, dtype)
    mid_u = _uniform(k_u, shape, dtype)
    e = -jnp.log(_uniform(k_e, shape, dtype))

    in_left = v < mass_left / mass_total
    in_mid = jnp.logical_and(
        jnp.logical_not(in_left), v < (mass_left + mass_mid) / mass_total
    )
    x = jnp.where(
        in_left, left - width * jnp.abs(n),
        jnp.where(in_mid, left + width * mid_u, right + e * expo_scale),
    )

    # Log accept prob; lanes with X < 0 get -inf.
    x_pos = jnp.maximum(x, jnp.finfo(dtype).tiny)
    log_prob = -(
        a * (x_pos - left)
        + _safe_exp(jnp.log(tilt_power) / alpha - odds * jnp.log(left))
        * ((left / x_pos) ** odds - 1.0)
    )
    log_prob = log_prob + jnp.where(jnp.logical_and(in_left, x < left),
                                    n * n / 2.0, 0.0)
    log_prob = log_prob + jnp.where(x > right, e, 0.0)
    log_prob = jnp.where(x < 0, -jnp.inf, log_prob)
    return x, log_prob


def _sample_double_rejection(key, alpha, tilt, max_rounds):
    """Devroye's double-rejection sampler, flattened: each lane carries an
    `have_aux` flag; one loop iteration advances every unfinished lane by
    one auxiliary attempt and (if armed) one final attempt
    (tilted_stable.pyx:166-208)."""
    dtype = tilt.dtype
    shape = tilt.shape
    tilt_power = tilt ** alpha
    gamma = tilt_power * alpha * (1.0 - alpha)
    sqrt_half_pi = jnp.sqrt(0.5 * jnp.pi)
    xi = (1.0 + jnp.sqrt(2.0 * gamma) * (2.0 + sqrt_half_pi)) / jnp.pi
    psi = jnp.sqrt(gamma / jnp.pi) * (2.0 + sqrt_half_pi) \
        * _safe_exp(-gamma * jnp.pi * jnp.pi / 8.0)

    zeros = jnp.zeros(shape, dtype)

    def attempt(k, p, s):
        # Memoryless joint attempt: one auxiliary proposal and, in the
        # same round, one final proposal given it; accept iff both
        # accept. Equivalent to the reference's two-stage chain (the
        # accepted (U, X) has density g(u) * p_aux(u) * ref(x|u) *
        # p_final(x|u) either way), and the memorylessness makes the
        # tail-replica value/time-independence requirement immediate.
        k_aux, k_avp, k_ref = jax.random.split(k, 3)
        alpha, gamma, xi, psi, tilt_power = (
            p['alpha'], p['gamma'], p['xi'], p['psi'], p['tilt_power'])

        # --- auxiliary proposal ----------------------------------------- #
        u_cand = _aux2_candidate(k_aux, alpha, gamma, xi, psi, dtype)
        u_ok = u_cand < jnp.pi
        u_safe = jnp.clip(u_cand, 1e-10, jnp.pi * (1 - 1e-7))
        zeta = jnp.sqrt(_zolotarev_pdf_exponentiated(u_safe, alpha))
        z_cand = 1.0 / (
            1.0 - (1.0 + alpha * zeta / jnp.sqrt(gamma)) ** (-1.0 / alpha)
        )
        accept_prob = _aux2_accept_prob(
            u_safe, alpha, xi, psi, zeta, z_cand, tilt_power, gamma
        )
        v_cand = _uniform(k_avp, gamma.shape, dtype) / accept_prob
        aux_ok = jnp.logical_and(
            jnp.logical_and(u_ok, accept_prob > 0.0), v_cand <= 1.0
        )

        # --- final proposal given the auxiliary draw -------------------- #
        x, log_prob = _reference_rv(k_ref, u_safe, alpha, tilt_power,
                                    z_cand, dtype)
        final_ok = log_prob > jnp.log(v_cand)
        ok = jnp.logical_and(aux_ok, final_ok)
        value = x ** (-(1.0 - alpha) / alpha)
        return s, value, ok

    result, _ = run_rejection(
        key,
        params=dict(alpha=alpha, gamma=gamma, xi=xi, psi=psi,
                    tilt_power=tilt_power),
        state={},
        attempt=attempt,
        value_init=zeros,
        max_rounds=max_rounds,
        # Memoryless iid attempts: the accepted value is independent of
        # the geometric acceptance time, so first-finisher replica
        # selection is unbiased (see run_rejection's docstring).
        tail_replicas=8,
    )
    return result


# --------------------------------------------------------------------- #
# Public entry point                                                    #
# --------------------------------------------------------------------- #

def sample_tilted_stable(key, char_exponent, tilt, method=None,
                         max_rounds=_MAX_REJECTION_ROUNDS,
                         max_partition=4096):
    """Draw one exponentially tilted stable variate per element of `tilt`.

    Parameters
    ----------
    key : jax PRNG key
    char_exponent : scalar or array in (0, 1), broadcastable to tilt
    tilt : array of positive tilting parameters
    method : None, 'divide-conquer' or 'double-rejection'
        None picks the cheaper algorithm lane-wise via the
        ``tilt**char_exp < 2`` crossover (tilted_stable.pyx:103-112).

    Notes
    -----
    Exact zeros in `tilt` (possible when a coefficient underflows) are
    clamped to a tiny positive value; the reference instead raises.
    """
    # Validation must live OUTSIDE the jitted body (a traced
    # char_exponent defeats isinstance checks); the reference raises for
    # both conditions (tilted_stable.pyx:98-99).
    if isinstance(char_exponent, (int, float)) \
            and not 0.0 < char_exponent < 1.0:
        raise ValueError(
            "char_exponent must lie in (0, 1); got "
            f"{char_exponent}. (The alpha = 1 stable is degenerate and "
            "alpha > 1 is not a positive stable.)")
    tilt = jnp.asarray(tilt)
    if not jnp.issubdtype(tilt.dtype, jnp.floating):
        # An integer tilt would otherwise pull char_exponent to int
        # (truncating 0.5 -> 0) and poison every division by alpha.
        tilt = tilt.astype(jnp.result_type(float))
    return _sample_tilted_stable(key, char_exponent, tilt, method,
                                 max_rounds, max_partition)


@functools.partial(
    jax.jit, static_argnames=('method', 'max_rounds', 'max_partition')
)
def _sample_tilted_stable(key, char_exponent, tilt, method,
                          max_rounds, max_partition):
    dtype = tilt.dtype
    out_shape = tilt.shape
    alpha = jnp.broadcast_to(jnp.asarray(char_exponent, dtype), out_shape)
    # The compaction driver works on flat lane vectors.
    tilt = tilt.ravel()
    alpha = alpha.ravel()
    tilt = jnp.maximum(tilt, jnp.asarray(np.finfo(np.float32).tiny, dtype))

    if method is None:
        use_dc = tilt ** alpha < TILT_POWER_THRESHOLD
    elif method == 'divide-conquer':
        use_dc = jnp.ones(tilt.shape, bool)
    elif method == 'double-rejection':
        use_dc = jnp.zeros(tilt.shape, bool)
    else:
        raise ValueError("Unrecognized method name.")

    k_dc, k_dr = jax.random.split(key)
    # Lanes routed to the other algorithm get a benign tilt so their
    # (discarded) rejection chains terminate immediately.
    tilt_dc = jnp.where(use_dc, tilt, jnp.asarray(1e-3, dtype))
    tilt_dr = jnp.where(use_dc, jnp.asarray(2.0, dtype) ** (1.0 / alpha),
                        tilt)
    # Forced divide-conquer can need ~e*m accepted rounds for m =
    # floor(tilt^alpha) partitions; the default cap (sized for the
    # auto-selected m == 1 regime) would silently truncate the partial
    # sum low. The while loop exits as soon as every lane finishes, so
    # the larger bound costs nothing when m is small.
    dc_rounds = max_rounds if method is None \
        else max(max_rounds, 3 * max_partition + 64)
    x_dc = _sample_divide_conquer(k_dc, alpha, tilt_dc, max_partition,
                                  dc_rounds)
    x_dr = _sample_double_rejection(k_dr, alpha, tilt_dr, max_rounds)
    return jnp.where(use_dc, x_dc, x_dr).reshape(out_shape)
