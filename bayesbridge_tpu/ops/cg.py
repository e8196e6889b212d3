"""Prior-preconditioned conjugate-gradient Gaussian sampler.

The core algorithm of Nishimura & Suchard (2022): one draw from
N(Sigma z, Sigma), Sigma^{-1} = Phi = X' diag(obs_prec) X +
diag(prior_prec_sqrt)^2, obtained by CG-solving Phi beta = b with

    b = z + X'(sqrt(obs_prec) eps_1) + prior_prec_sqrt * eps_2,

preconditioned by the prior scale so that heavily shrunk coordinates are
well-conditioned (reference:
bayesbridge/reg_coef_sampler/cg_sampler.py:20-150).

TPU re-design: the whole solve is a jitted ``lax.while_loop`` whose body
is two design matvecs plus vector ops — zero host round-trips — with the
reference's termination rule (atol on the residual norm of the
preconditioned system, maxiter cap) and warm start from the running
posterior-mean extrapolation. The iteration count is carried functionally
and surfaced as `n_cg_iter` (gibbs_util.py:147-149).
"""

import jax
import jax.numpy as jnp
from jax import lax

def choose_preconditioner(prior_prec_sqrt, n_unshrunk, coef_scaled_sd,
                          target_sd_scale=2.0):
    """Prior preconditioner (cg_sampler.py:123-138): shrunk coordinates
    are scaled by their prior sd; unshrunk ones by an inflated estimate of
    their posterior sd (erring toward larger precision)."""
    shrunk_scale = 1.0 / prior_prec_sqrt
    if n_unshrunk == 0:
        return shrunk_scale
    return jnp.concatenate((
        target_sd_scale * coef_scaled_sd[:n_unshrunk],
        shrunk_scale[n_unshrunk:],
    ))


def choose_diag_preconditioner(design, obs_prec, prior_prec_sqrt):
    """Jacobi preconditioner from the full conditional-precision diagonal
    (cg_sampler.py:140-143): 1/sqrt(prior_prec^2 + diag(X'WX)). More
    accurate than the prior preconditioner but costs one weighted
    column-moment pass per draw; exposed for API parity (the Gibbs
    sampler uses the prior preconditioner, reg_coef_sampler.py:93)."""
    diag = prior_prec_sqrt ** 2 \
        + design.compute_fisher_info(weight=obs_prec, diag_only=True)
    return 1.0 / jnp.sqrt(diag)


def sample_gaussian_cg(key, design, obs_prec, prior_prec_sqrt, z,
                       coef_cg_init, precond_scale, maxiter=500, atol=1e-6,
                       perturbation=None, warm_tdot=None, lin_pred0=None,
                       return_lin_pred=False):
    """One CG-sampled draw.

    `perturbation` (optional): the precomputed b-vector noise
    X'(sqrt(obs_prec) eps_1) + prior_prec_sqrt * eps_2. The caller that
    supplies it must draw eps_1/eps_2 from `key` with the same
    split/shape order as below (reg_coef.py does, so the fused
    pre-solve path samples the identical Gaussian); when omitted the
    noise is drawn here.

    `warm_tdot` (optional): the precomputed transpose reduction
    ``X'(obs_prec * (X coef_cg_init))`` in ORIGINAL column order. The
    warm start's initial residual needs the operator applied at
    x0 = coef_cg_init / precond_scale, whose design part depends on
    coef_cg_init alone (the preconditioner scale cancels) — so the
    caller can ride this reduction on the pre-solve multi-RHS dot
    (design.presolve_reductions u4) and the initial residual costs one
    forward pass instead of a dot+Tdot pair. Supply `lin_pred0 =
    X coef_cg_init` alongside when `return_lin_pred` is on.

    `return_lin_pred`: additionally return the draw's linear predictor
    ``X coef``, accumulated inside the loop from the operator's forward
    intermediates (lin_pred = X x0 + sum_k alpha_k X(s p_k)) — exact in
    exact arithmetic, so the Gibbs step's observation-precision and
    log-density updates need no separate design pass.

    Returns (coef, info), or (coef, lin_pred, info) when
    `return_lin_pred`; info = {'n_cg_iter', 'cg_converged'} as traced
    scalars.

    A recycled-basis deflated-PCG variant (Galerkin-projected warm
    start + A-conjugate direction projection against the previous
    draw's Krylov residuals) was built, chip-debugged, and REMOVED
    after flagship measurement: at 100k x 50k the warm start + prior
    preconditioner already capture the slow directions, so deflation
    saved zero iterations while its upkeep cost 31% of throughput
    (k=8: 4.17 vs 6.07 iter/s), and keeping its f32 Galerkin algebra
    stable on-chip required guard rails against projector blow-up that
    k=16 still defeated. The full post-mortem — including the TPU
    numerical lessons (eigenvalue-cutoff calibration, breakdown
    guards, basis self-healing) — is in BASELINE.md and
    baselines/r5_measure_artifact.jsonl; the NumPy prototype whose
    dev-scale iteration savings motivated the build is
    baselines/dev_deflation.py.
    """
    dtype = z.dtype
    n_obs, n_pred = design.shape
    if perturbation is None:
        k1, k2 = jax.random.split(key)
        eps_obs = jax.random.normal(k1, (n_obs,), dtype)
        eps_prior = jax.random.normal(k2, (n_pred,), dtype)
        perturbation = design.Tdot(jnp.sqrt(obs_prec) * eps_obs) \
            + prior_prec_sqrt * eps_prior
    b = precond_scale * (z + perturbation)

    precond_prior_prec = (precond_scale * prior_prec_sqrt) ** 2

    # Block-ordered solve where the design's column layout rewards it
    # (hybrid dtype-split blocks): CG is permutation-equivariant, so
    # conjugating the whole solve by the block permutation turns the
    # operator's per-iteration gather/scatter of the operand into
    # static slices — the p-length vectors reorder once at entry and
    # the draw unpermutes once at exit.
    bo_ctx = design.cg_blockorder_ctx()
    if bo_ctx is not None:
        perm, unperm, offset_bo = bo_ctx
        b = b[perm]
        precond_scale = precond_scale[perm]
        precond_prior_prec = precond_prior_prec[perm]
        coef_cg_init = coef_cg_init[perm]
        if warm_tdot is not None:
            warm_tdot = warm_tdot[perm]

        def matvec_t(x):
            out, t = design.quad_matvec_blockorder(
                precond_scale * x, obs_prec, offset_bo, return_t=True)
            return precond_prior_prec * x + precond_scale * out, t

        def matvec(x):
            return precond_prior_prec * x + precond_scale * \
                design.quad_matvec_blockorder(
                    precond_scale * x, obs_prec, offset_bo)
    else:
        def matvec_t(x):
            out, t = design.quad_matvec(
                precond_scale * x, obs_prec, return_t=True)
            return precond_prior_prec * x + precond_scale * out, t

        def matvec(x):
            # Phi-tilde x = D P D x + s X' (omega X (s x)) with s the
            # preconditioner scale (cg_sampler.py:104-113). quad_matvec
            # evaluates the design part in ONE stored-block HBM sweep
            # on backends with a fused kernel (design/fusedne.py).
            return precond_prior_prec * x + precond_scale * \
                design.quad_matvec(precond_scale * x, obs_prec)

    x0 = coef_cg_init / precond_scale
    if warm_tdot is not None:
        # s * x0 = coef_cg_init exactly (up to one rounding), so the
        # design part of matvec(x0) is the caller-supplied reduction.
        r0 = b - (precond_prior_prec * x0 + precond_scale * warm_tdot)
        t0 = lin_pred0
    elif return_lin_pred:
        Ax0, t0 = matvec_t(x0)
        r0 = b - Ax0
    else:
        r0 = b - matvec(x0)
        t0 = None
    if return_lin_pred and t0 is None:
        raise ValueError("return_lin_pred with warm_tdot requires "
                         "lin_pred0 (= X coef_cg_init)")

    # Termination mirrors scipy.sparse.linalg.cg with tol = atol/||b||:
    # stop when ||r|| <= atol (cg_sampler.py:74-80). In float32 the
    # achievable residual is floored at ~50 eps * ||b||, so the threshold
    # is raised accordingly to avoid grinding to maxiter.
    atol = jnp.maximum(
        jnp.asarray(atol, dtype),
        50.0 * jnp.finfo(dtype).eps * jnp.linalg.norm(b))

    def cond(state):
        return jnp.logical_and(state[3] > atol ** 2, state[4] < maxiter)

    if return_lin_pred:
        def body(state):
            x, r, p, rs, n_iter, yhat = state
            Ap, t_p = matvec_t(p)
            alpha = rs / jnp.vdot(p, Ap)
            x = x + alpha * p
            # The forward intermediate follows the design's compute
            # dtype, which can be wider than the solve dtype (f32 chain
            # over an f64-stored design); keep the carry type-stable.
            yhat = yhat + alpha * t_p.astype(yhat.dtype)
            r = r - alpha * Ap
            rs_new = jnp.vdot(r, r)
            p = r + (rs_new / rs) * p
            return x, r, p, rs_new, n_iter + 1, yhat

        # The loop computes in the residual's dtype (it follows the
        # preconditioner's, which can be wider than the solve inputs'
        # when an x64 session wraps an f32-stored design).
        init = (x0, r0, r0, jnp.vdot(r0, r0), jnp.zeros((), jnp.int32),
                jnp.asarray(t0, r0.dtype))
        x, r, _, rs, n_iter, yhat = lax.while_loop(cond, body, init)
    else:
        def body(state):
            x, r, p, rs, n_iter = state
            Ap = matvec(p)
            alpha = rs / jnp.vdot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = jnp.vdot(r, r)
            p = r + (rs_new / rs) * p
            return x, r, p, rs_new, n_iter + 1

        init = (x0, r0, r0, jnp.vdot(r0, r0), jnp.zeros((), jnp.int32))
        x, r, _, rs, n_iter = lax.while_loop(cond, body, init)
        yhat = None

    coef = precond_scale * x
    if bo_ctx is not None:
        coef = coef[unperm]
    info = {
        'n_cg_iter': n_iter,
        'cg_converged': rs <= atol ** 2,
    }
    if return_lin_pred:
        return coef, yhat, info
    return coef, info
