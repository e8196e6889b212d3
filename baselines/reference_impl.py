"""NumPy/SciPy CPU implementation of the bridge-regression Gibbs sampler.

Purpose: the measured performance baseline and statistical-parity oracle.
The upstream reference (OHDSI/bayes-bridge) cannot be built in this
environment (its Cython extensions need Cython); this module implements
the SAME algorithm on the same CPU stack the reference bottoms out in —
scipy CSR matvecs (the reference's non-MKL path,
bayesbridge/design_matrix/sparse_matrix.py:90-101), LAPACK Cholesky, and
scipy.sparse.linalg.cg with the prior preconditioner, warm start,
maxiter=500 and atol=1e-5*sqrt(p) (cg_sampler.py:77-80,
reg_coef_sampler.py:95) — so wall-clock comparisons measure the
algorithmic stack, not build luck.

The Polya-Gamma and tilted-stable draws use vectorized NumPy
accept-reject (same algorithms as bayesbridge_tpu.random, independently
re-expressed with boolean masks). Written for clarity + honest speed;
all hot time goes to the matvecs, as in the reference.
"""

import numpy as np
import scipy.linalg
import scipy.sparse as sps
import scipy.sparse.linalg as spla
from scipy.special import log_ndtr

# --------------------------------------------------------------------- #
# Vectorized NumPy rejection samplers                                   #
# --------------------------------------------------------------------- #

_PG_THRESHOLD = 2.0 / np.pi


def _pg_series_term(n, x):
    n_half = n + 0.5
    with np.errstate(divide='ignore'):
        small = np.log(np.pi * n_half) \
            - 1.5 * np.log(0.5 * np.pi * x) - 2.0 * n_half ** 2 / x
        large = np.log(np.pi * n_half) - 0.5 * x * np.pi ** 2 * n_half ** 2
    return np.exp(np.where(x <= _PG_THRESHOLD, small, large))


def _rand_right_trunc_invgauss(rng, rate, trunc):
    out = np.zeros_like(rate)
    todo = np.ones(rate.shape, bool)
    mean = 1.0 / rate
    use_chisq = mean > trunc
    for _ in range(256):
        if not todo.any():
            break
        idx = np.where(todo)[0]
        r = rate[idx]
        m = mean[idx]
        uc = use_chisq[idx]
        cand = np.empty(len(idx))
        ok = np.zeros(len(idx), bool)
        # Branch A: inverted left-truncated chi-squared.
        if uc.any():
            e = 0.5 * np.pi - 2.0 * np.log1p(-rng.uniform(size=uc.sum()))
            keep = rng.uniform(size=uc.sum()) <= np.sqrt(0.5 * np.pi / e)
            x = 1.0 / e
            acc = np.log(rng.uniform(size=uc.sum())) \
                < -0.5 * x * r[uc] ** 2
            cand[uc] = x
            ok[uc] = keep & acc
        # Branch B: plain inverse-Gaussian rejection.
        ub = ~uc
        if ub.any():
            mb = m[ub]
            v = rng.standard_normal(ub.sum()) ** 2
            x = mb + 0.5 * mb * (mb * v - np.sqrt(4 * mb * v + (mb * v) ** 2))
            flip = rng.uniform(size=ub.sum()) > mb / (mb + x)
            x = np.where(flip, mb ** 2 / x, x)
            cand[ub] = x
            ok[ub] = x < trunc
        take = idx[ok]
        out[take] = cand[ok]
        todo[take] = False
    return out


def polya_gamma_unit(rng, tilt):
    """PG(1, tilt) draws (Devroye), vectorized over lanes."""
    tilt = 0.5 * np.abs(np.asarray(tilt, dtype=np.float64))
    n = tilt.size
    exp_rate = 0.5 * tilt ** 2 + 0.125 * np.pi ** 2
    sqrt_t = np.sqrt(_PG_THRESHOLD)
    log_mass_expo = -np.log(exp_rate) - exp_rate * _PG_THRESHOLD \
        + np.log(0.25 * np.pi)
    lm1 = -tilt + log_ndtr((_PG_THRESHOLD * tilt - 1.0) / sqrt_t)
    lm2 = tilt + log_ndtr(-(_PG_THRESHOLD * tilt + 1.0) / sqrt_t)
    p_right = 1.0 / (1.0 + np.exp(lm1 - log_mass_expo)
                     + np.exp(lm2 - log_mass_expo))

    out = np.zeros(n)
    todo = np.ones(n, bool)
    for _ in range(256):
        if not todo.any():
            break
        idx = np.where(todo)[0]
        k = len(idx)
        from_right = rng.uniform(size=k) < p_right[idx]
        x = np.empty(k)
        x[from_right] = _PG_THRESHOLD - np.log1p(
            -rng.uniform(size=from_right.sum())) / exp_rate[idx][from_right]
        left = ~from_right
        x[left] = _rand_right_trunc_invgauss(
            rng, np.maximum(tilt[idx][left], 1e-7), _PG_THRESHOLD)
        zeroth = _pg_series_term(0, x)
        u = rng.uniform(size=k) * zeroth

        partial = zeroth.copy()
        acc = np.zeros(k, bool)
        det = np.zeros(k, bool)
        sign = -1.0
        for term_i in range(1, 100):
            partial += sign * _pg_series_term(term_i, x)
            if sign < 0:
                newly = ~det & (u <= partial)
                acc |= newly
            else:
                newly = ~det & (u > partial)
            det |= newly
            sign = -sign
            if det.all():
                break
        acc |= ~det  # series cap: accept the lower bound
        take = idx[acc]
        out[take] = 0.25 * x[acc]
        todo[take] = False
    return out


def polya_gamma(rng, shape, tilt):
    """PG(shape, tilt) for integer shapes."""
    shape = np.asarray(shape, dtype=np.int64)
    if np.all(shape == 1):
        return polya_gamma_unit(rng, tilt)
    seg = np.repeat(np.arange(shape.size), shape)
    draws = polya_gamma_unit(rng, np.repeat(np.asarray(tilt), shape))
    return np.bincount(seg, weights=draws, minlength=shape.size)


def _sinc(x):
    out = np.ones_like(x)
    big = np.abs(x) >= 0.01
    out[big] = np.sin(x[big]) / x[big]
    small = ~big
    xs = x[small] ** 2
    out[small] = 1.0 - xs / 6.0 * (1.0 - xs / 20.0)
    return out


def _zolotarev(x, alpha):
    return (((1 - alpha) * _sinc((1 - alpha) * x)) ** (1 - alpha)
            * (alpha * _sinc(alpha * x)) ** alpha
            / _sinc(x)) ** (1.0 / (1 - alpha))


def tilted_stable(rng, alpha, tilt):
    """Exponentially tilted stable draws. Uses the single-partition
    divide-and-conquer sampler with acceptance exp(-tilt * S) for
    tilt^alpha < 2 and clamps larger tilts into repeated partitions
    (Hofert 2011); accuracy-equivalent to the reference's auto path."""
    tilt = np.asarray(tilt, dtype=np.float64)
    n = tilt.size
    m = np.maximum(1, np.floor(tilt ** alpha)).astype(np.int64)
    c = (1.0 / m) ** (1.0 / alpha)
    total = np.zeros(n)
    n_done = np.zeros(n, dtype=np.int64)
    for _ in range(4096):
        todo = n_done < m
        if not todo.any():
            break
        idx = np.where(todo)[0]
        k = len(idx)
        u = rng.uniform(size=k)
        v = np.maximum(rng.uniform(size=k), 1e-300)
        s = c[idx] * (-_zolotarev(np.pi * np.maximum(u, 1e-10), alpha)
                      / np.log(v)) ** ((1 - alpha) / alpha)
        accept = rng.uniform(size=k) < np.exp(-tilt[idx] * s)
        take = idx[accept]
        total[take] += s[accept]
        n_done[take] += 1
    return total


# --------------------------------------------------------------------- #
# The Gibbs sampler                                                     #
# --------------------------------------------------------------------- #

class NumpyBridgeGibbs:
    """Collapsed bridge-regression Gibbs sampler on NumPy/SciPy.

    Supports linear and logistic models with 'cholesky' or 'cg'
    coefficient updates; mirrors the reference's update order and
    conditionals exactly.
    """

    def __init__(self, X, outcome, family='linear', bridge_exp=.5,
                 slab_size=np.inf, add_intercept=True, seed=0):
        self.rng = np.random.default_rng(seed)
        self.family = family
        self.bridge_exp = bridge_exp
        self.slab_size = slab_size
        self.sparse = sps.issparse(X)
        n = X.shape[0]
        if add_intercept:
            if self.sparse:
                X = sps.hstack((np.ones((n, 1)), X)).tocsr()
            else:
                X = np.hstack((np.ones((n, 1)), X))
        self.X = X
        self.n, self.p = X.shape
        if family == 'linear':
            self.y = np.asarray(outcome, dtype=np.float64)
        else:
            n_success, n_trial = outcome
            self.n_success = np.asarray(n_success, dtype=np.float64)
            self.n_trial = np.asarray(n_trial, dtype=np.float64)
        self.n_matvec = 0

    # -- matvecs (scipy CSR / BLAS dense) ------------------------------- #

    def dot(self, v):
        self.n_matvec += 1
        return self.X @ v

    def Tdot(self, u):
        self.n_matvec += 1
        return self.X.T @ u

    # -- conditional updates -------------------------------------------- #

    def _update_obs_prec(self, coef):
        if self.family == 'linear':
            resid = self.y - self.dot(coef)
            return self.rng.gamma(self.n / 2.0) / (np.sum(resid ** 2) / 2)
        return polya_gamma(
            self.rng, self.n_trial.astype(np.int64), self.dot(coef))

    def _update_gscale(self, coef_shrunk):
        shape = len(coef_shrunk) / self.bridge_exp
        rate = np.sum(np.abs(coef_shrunk) ** self.bridge_exp)
        phi = self.rng.gamma(shape) / rate
        return phi ** (-1.0 / self.bridge_exp)

    def _update_lscale(self, gscale, coef_shrunk):
        ts = tilted_stable(self.rng, self.bridge_exp / 2.0,
                           (coef_shrunk / gscale) ** 2 + 1e-300)
        lscale = np.sqrt(0.5 / ts)
        lscale[lscale == 0] = 1e-15
        lscale[np.isinf(lscale)] = 2.0 / gscale
        return lscale

    def _prior_shrunk_scale(self, gscale, lscale):
        scale = gscale * lscale
        return scale / np.sqrt(1.0 + (scale / self.slab_size) ** 2)

    def _sample_coef_cholesky(self, obs_prec_vec, prior_prec_sqrt, z):
        if self.sparse:
            Xd = self.X.toarray()
        else:
            Xd = self.X
        fisher = Xd.T @ (obs_prec_vec[:, None] * Xd)
        prec = fisher + np.diag(prior_prec_sqrt ** 2)
        diag_scale = 1.0 / np.sqrt(np.diag(prec))
        prec_s = diag_scale[:, None] * prec * diag_scale[None, :]
        chol = scipy.linalg.cholesky(prec_s, lower=False)
        mean = scipy.linalg.cho_solve((chol, False), diag_scale * z)
        noise = scipy.linalg.solve_triangular(
            chol, self.rng.standard_normal(self.p), lower=False)
        return diag_scale * (mean + noise)

    def _sample_coef_cg(self, obs_prec_vec, prior_prec_sqrt, z, x0):
        precond_scale = 1.0 / prior_prec_sqrt
        b = precond_scale * (
            z + self.Tdot(np.sqrt(obs_prec_vec)
                          * self.rng.standard_normal(self.n))
            + prior_prec_sqrt * self.rng.standard_normal(self.p))
        precond_prior_prec = (precond_scale * prior_prec_sqrt) ** 2

        def matvec(x):
            return precond_prior_prec * x + precond_scale * self.Tdot(
                obs_prec_vec * self.dot(precond_scale * x))

        op = spla.LinearOperator((self.p, self.p), matvec=matvec)
        n_iter = [0]
        atol = 1e-5 * np.sqrt(self.p)
        x, _ = spla.cg(op, b, x0=x0 / precond_scale, maxiter=500,
                       rtol=atol / np.linalg.norm(b), atol=0.0,
                       callback=lambda _: n_iter.__setitem__(
                           0, n_iter[0] + 1))
        return precond_scale * x, n_iter[0]

    # -- the chain ------------------------------------------------------ #

    def run(self, n_iter, n_burnin=0, method='cg', gscale_init=0.1,
            thin=1, resume=False):
        """Run `n_iter` Gibbs iterations. With resume=True, continue from
        the final state of the previous run() call (steady-state timing)
        instead of restarting the chain from zeros."""
        p, n = self.p, self.n
        if resume:
            (coef, gscale, lscale, obs_prec,
             coef_running_mean, n_averaged) = self._state
        else:
            coef = np.zeros(p)
            gscale = gscale_init
            lscale = np.ones(p - 1)
            obs_prec = np.ones(n) if self.family == 'logit' else 1.0
            coef_running_mean = np.zeros(p)
            n_averaged = 0

        kept_coef, kept_gscale, n_cg_iters = [], [], []
        for it in range(1, n_iter + 1):
            if self.family == 'linear':
                y_gauss = self.y
                obs_prec_vec = obs_prec * np.ones(n)
            else:
                obs_prec_vec = obs_prec
                y_gauss = (self.n_success - self.n_trial / 2) / obs_prec_vec
            z = self.Tdot(obs_prec_vec * y_gauss)
            prior_sd = np.concatenate(
                ([np.inf], self._prior_shrunk_scale(gscale, lscale)))
            prior_prec_sqrt = 1.0 / prior_sd
            prior_prec_sqrt[0] = 0.0

            if method == 'cholesky':
                coef = self._sample_coef_cholesky(
                    obs_prec_vec, prior_prec_sqrt, z)
            else:
                # Warm start from the running mean (the reference's
                # summarizer extrapolation).
                pps = prior_prec_sqrt.copy()
                pps[0] = 1.0  # finite preconditioner for the intercept
                coef, n_cg = self._sample_coef_cg(
                    obs_prec_vec, pps, z, coef_running_mean)
                n_cg_iters.append(n_cg)
            n_averaged += 1
            w = 1.0 / n_averaged
            coef_running_mean = w * coef + (1 - w) * coef_running_mean

            obs_prec = self._update_obs_prec(coef)
            gscale = self._update_gscale(coef[1:])
            lscale = self._update_lscale(gscale, coef[1:])

            if it > n_burnin and (it - n_burnin) % thin == 0:
                kept_coef.append(coef.copy())
                kept_gscale.append(gscale)

        self._state = (coef, gscale, lscale, obs_prec,
                       coef_running_mean, n_averaged)
        return {
            'coef': np.array(kept_coef).T,
            'global_scale': np.array(kept_gscale),
            'n_cg_iter': np.array(n_cg_iters),
            'n_matvec': self.n_matvec,
        }


# --------------------------------------------------------------------- #
# Cox proportional hazards: HMC-within-Gibbs oracle                     #
# --------------------------------------------------------------------- #

class NumpyCoxGibbs:
    """Independent NumPy sampler for the bridge-prior Cox model.

    Statistical-parity oracle for the TPU Cox chain: Breslow partial
    likelihood with the same bridge prior and scale updates, but the
    coefficient conditional is explored by a self-tuning HMC transition
    written from the likelihood's definition (per-event loop collapsed to
    prefix sums; no shared code or PRNG stream with the library).

    Expects observations already ordered events-first (ascending event
    time) then censored (descending censoring time) — feed it the output
    of ``CoxModel.preprocess_data``. Risk-set bounds are re-derived here
    with searchsorted rather than taken from the library.
    """

    def __init__(self, event_time, censoring_time, X, bridge_exp=.5,
                 slab_size=np.inf, seed=0):
        self.rng = np.random.default_rng(seed)
        self.bridge_exp = bridge_exp
        self.slab_size = slab_size
        self.X = X.toarray() if sps.issparse(X) else np.asarray(X)
        self.n, self.p = self.X.shape

        event_time = np.asarray(event_time, dtype=np.float64)
        censoring_time = np.asarray(censoring_time, dtype=np.float64)
        n_event = int(np.sum(np.isfinite(event_time)))
        finite_events = event_time[:n_event]
        finite_censor = np.sort(censoring_time[n_event:])
        # Risk set of event k: everyone whose event/censoring time is
        # >= t_k. Events are time-sorted so that's events k0.. (k0 = first
        # of k's ties) plus censored obs with censoring time >= t_k.
        self.rs_start = np.searchsorted(finite_events, finite_events,
                                        side='left')
        n_dropped = np.searchsorted(finite_censor, finite_events,
                                    side='left')
        self.rs_end = self.n - 1 - n_dropped
        self.n_event = n_event
        # Number of risk sets containing observation j (a prefix of the
        # event list, since starts are nondecreasing and ends
        # nonincreasing): one difference array + cumsum.
        bump = np.zeros(self.n + 1, dtype=np.int64)
        np.add.at(bump, self.rs_start, 1)
        np.add.at(bump, self.rs_end + 1, -1)
        self.n_appearance = np.cumsum(bump[:-1])

    # -- partial likelihood --------------------------------------------- #

    def _loglik_grad(self, coef):
        eta = self.X @ coef
        eta = eta - eta.max()
        haz = np.exp(eta)
        csum = np.concatenate(([0.0], np.cumsum(haz)))
        risk_sums = csum[self.rs_end + 1] - csum[self.rs_start]
        if np.any(risk_sums <= 0.0):
            return -np.inf, np.zeros(self.p)
        loglik = float(np.sum(eta[:self.n_event] - np.log(risk_sums)))
        inv_csum = np.cumsum(1.0 / risk_sums)
        expected = haz * inv_csum[self.n_appearance - 1]
        d = np.zeros(self.n)
        d[:self.n_event] = 1.0
        grad = self.X.T @ (d - expected)
        return loglik, grad

    def _logp_grad(self, coef, prior_prec):
        loglik, grad = self._loglik_grad(coef)
        logp = loglik - 0.5 * np.sum(prior_prec * coef ** 2)
        return logp, grad - prior_prec * coef

    # -- scale updates (shared conditionals with the linear/logit oracle) #

    _update_gscale = NumpyBridgeGibbs._update_gscale
    _update_lscale = NumpyBridgeGibbs._update_lscale
    _prior_shrunk_scale = NumpyBridgeGibbs._prior_shrunk_scale

    # -- HMC transition --------------------------------------------------- #

    def _hmc_step(self, coef, prior_sd, stepsize, n_leapfrog):
        """One MH-corrected leapfrog trajectory in coordinates scaled by
        the prior sd (so the Gaussian conditional is near-isotropic)."""
        scale = prior_sd
        prior_prec = 1.0 / prior_sd ** 2

        def logp_grad_q(q):
            logp, g = self._logp_grad(scale * q, prior_prec)
            return logp, scale * g

        q = coef / scale
        mom = self.rng.standard_normal(self.p)
        logp0, g = logp_grad_q(q)
        ham0 = -logp0 + 0.5 * np.sum(mom ** 2)
        for _ in range(n_leapfrog):
            mom = mom + 0.5 * stepsize * g
            q = q + stepsize * mom
            logp, g = logp_grad_q(q)
            if not np.isfinite(logp):
                return coef, False
            mom = mom + 0.5 * stepsize * g
        ham1 = -logp + 0.5 * np.sum(mom ** 2)
        accept = np.log(self.rng.uniform()) < ham0 - ham1
        return (scale * q if accept else coef), bool(accept)

    # -- the chain ------------------------------------------------------- #

    def run(self, n_iter, n_burnin=0, gscale_init=0.1, thin=1,
            target_accept=0.9, n_leapfrog=16):
        coef = np.zeros(self.p)
        gscale = gscale_init
        lscale = np.ones(self.p)
        log_step = np.log(0.1)

        kept = []
        for it in range(1, n_iter + 1):
            prior_sd = self._prior_shrunk_scale(gscale, lscale)
            coef, accepted = self._hmc_step(
                coef, prior_sd, np.exp(log_step), n_leapfrog)
            # Robbins-Monro drift of the stepsize toward the target
            # acceptance rate, frozen after burn-in.
            if it <= max(n_burnin, 1):
                log_step += (float(accepted) - target_accept) \
                    / max(it ** 0.6, 1.0)
            gscale = self._update_gscale(coef)
            lscale = self._update_lscale(gscale, coef)
            if it > n_burnin and (it - n_burnin) % thin == 0:
                kept.append(coef.copy())
        return {'coef': np.array(kept).T}
