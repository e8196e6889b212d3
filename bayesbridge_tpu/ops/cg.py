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

import os

import jax
import jax.numpy as jnp
from jax import lax

# Relative eigenvalue cutoff for the deflation projector's Galerkin
# system (see `sample_gaussian_cg`): directions of G = W'AW with
# eigenvalue below _DEFL_EIG_RTOL * lam_max are EXCLUDED from the
# projector. Calibrated ON THE CHIP (baselines/dbg_deflation_nan.py,
# 20k x 10k logit Gibbs, f32): 64*eps (7.6e-6) poisons the chain by
# draw 20 and 3.4e-4 by draw 53 — a noise eigenvalue barely above the
# cutoff turns into a ~1/lam amplification inside the projector and
# blows up a search direction — while 1e-2 ran 100/100 draws clean
# with the deflation benefit intact (early-draw CG iterations 17 -> 11
# at that shape). Read once at import; overridable for sweeps.
_DEFL_EIG_RTOL = float(os.environ.get('BB_DEFL_EIG_RTOL', '0') or 0) \
    or 1e-2

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
                       return_lin_pred=False, recycled_basis=None):
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

    `recycled_basis` ((k, p), original coef space): a deflation basis
    recycled from the PREVIOUS draw's Krylov residuals. The solve maps
    it into this draw's preconditioned space, row-normalizes, builds
    the (k, k) Galerkin system G = W'AW, inverts it through a
    thresholded eigendecomposition (rank-deficient, collapsed, and
    all-zero bases degrade gracefully toward plain PCG — no QR, no
    Cholesky, no NaN path), Galerkin-projects the initial guess
    (x0 += W G^+ W'r0) and A-conjugate-projects every search direction
    (deflated PCG) — the Gibbs chain's conditional-precision operators
    change slowly in their troublesome directions (the data geometry),
    so the recycled subspace removes them from the Krylov iteration.
    Upkeep is ONE multi-RHS dot+Tdot pair per draw
    (`design.quad_matmat*` — the k columns ride a single stored-block
    HBM pass), so the net pass win is (iters_saved - 1) pairs;
    measured at dev sizes the deflated variant saves 2-3 iterations
    (baselines/dev_deflation.py, BASELINE.md). The updated basis is
    returned as info['recycled_basis'] (same shape/space). Requires a
    backend with `has_quad_matmat()` (dense, unsharded hybrid).

    Returns (coef, info), or (coef, lin_pred, info) when
    `return_lin_pred`; info = {'n_cg_iter', 'cg_converged'} as traced
    scalars.
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

    use_basis = recycled_basis is not None
    if use_basis:
        # TPU-first formulation: NO QR, NO Cholesky. The Galerkin
        # system G = W'AW is solved by a thresholded eigendecomposition
        # of the tiny (k, k) matrix instead — an oblique projector
        # P v = v - W (G^+)(AW)'v is exactly idempotent for ANY
        # full-or-deficient-rank W as long as G and AW come from the
        # SAME W with consistent arithmetic, so orthonormalizing the
        # basis buys nothing but an extra (slow-to-compile, bf16-
        # precision) custom call in the hot scan. Rank deficiency, the
        # all-zero first-draw basis, and collapsed residual directions
        # all land in eigenvalues below the threshold, whose projection
        # coefficients are simply zero: deflation degrades toward plain
        # PCG, never corrupts it. All deflation dots run at HIGHEST
        # precision — the default TPU precision chains MXU partials
        # through bf16, which broke the G == W'(AW) consistency
        # on-chip (observed: cho_factor(G) went NaN and poisoned the
        # chain; that Cholesky formulation is retired).
        hiQ = lax.Precision.HIGHEST

        def mm(a, b):
            return jnp.matmul(a, b, precision=hiQ)

        k_basis = recycled_basis.shape[0]
        Wb = jnp.asarray(recycled_basis, r0.dtype)
        if bo_ctx is not None:
            Wb = jnp.take(Wb, perm, axis=1)
        # Rows live in coef space (s_prev * r_prev); this draw's
        # x-space direction for coef w is w / s_new. Normalize rows so
        # G's eigenvalue threshold is scale-free; zero or non-finite
        # rows (empty buffer slots, a poisoned carry) deactivate to 0.
        Wb = Wb / precond_scale[None, :].astype(r0.dtype)
        rnorm = jnp.sqrt(jnp.sum(Wb * Wb, axis=1, keepdims=True))
        row_ok = jnp.isfinite(rnorm) & (rnorm > jnp.finfo(Wb.dtype).tiny)
        W = jnp.where(row_ok, Wb / jnp.where(row_ok, rnorm, 1.0), 0.0)
        Q = W.T  # (p, k) basis columns — NOT orthonormalized

        if bo_ctx is not None:
            def matmat_t(V):
                out, t = design.quad_matmat_blockorder(
                    precond_scale[:, None] * V, obs_prec, offset_bo,
                    return_t=True)
                return (precond_prior_prec[:, None] * V
                        + precond_scale[:, None] * out.astype(V.dtype)), t
        else:
            def matmat_t(V):
                out, t = design.quad_matmat(
                    precond_scale[:, None] * V, obs_prec, return_t=True)
                return (precond_prior_prec[:, None] * V
                        + precond_scale[:, None] * out.astype(V.dtype)), t

        # Upkeep: ONE multi-RHS dot+Tdot pair for all k columns.
        AQ, TQ = matmat_t(Q)
        # A ridge would NOT be a safe alternative to the eigenvalue
        # threshold: it leaves a permanent W-component in the residual
        # that the deflated iteration can never remove, so the solve
        # stalls above atol and destabilizes at maxiter (measured: f64
        # dev case diverged to 1e152 with a 1e-6 ridge). The threshold
        # instead EXCLUDES near-null directions from the projector.
        G = mm(Q.T, AQ)
        G = 0.5 * (G + G.T)
        G = jnp.where(jnp.isfinite(G), G, 0.0)
        evals, evecs = jnp.linalg.eigh(G)
        lam_max = jnp.maximum(evals[-1], 0.0)
        # The cutoff must clear the noise floor of AQ itself (computed
        # by the design's HIGH-precision multi-RHS kernel, not the
        # HIGHEST-precision dots here) — see _DEFL_EIG_RTOL's on-chip
        # calibration note.
        lam_min = _DEFL_EIG_RTOL * lam_max
        inv_evals = jnp.where(evals > lam_min, 1.0 /
                              jnp.where(evals > lam_min, evals, 1.0), 0.0)

        def csolve(v):
            return mm(evecs, inv_evals * mm(evecs.T, v))

        # Galerkin init-projection of the warm start, applied only if
        # every update is finite (x0, r0 and the lin_pred shift must
        # move together or CG solves a different system than x0
        # claims). A non-finite upkeep product (operator overflow)
        # falls back to plain PCG for this draw.
        c0 = csolve(mm(Q.T, r0))
        upd_x = mm(Q, c0)
        upd_r = mm(AQ, c0)
        upd_t = None if t0 is None else mm(TQ, c0.astype(TQ.dtype))
        defl_ok = jnp.isfinite(upd_x).all() & jnp.isfinite(upd_r).all()
        if upd_t is not None:
            defl_ok = defl_ok & jnp.isfinite(upd_t).all()
        x0 = jnp.where(defl_ok, x0 + upd_x, x0)
        r0 = jnp.where(defl_ok, r0 - upd_r, r0)
        if t0 is not None:
            t0 = jnp.asarray(t0)
            t0 = jnp.where(defl_ok, t0 + upd_t.astype(t0.dtype), t0)

        def deflate(v):
            """A-conjugate-project v against the recycled subspace."""
            d = v - mm(Q, csolve(mm(AQ.T, v)))
            return jnp.where(defl_ok, d, v)

        B0 = W  # slots not overwritten keep the recycled directions

    # Termination mirrors scipy.sparse.linalg.cg with tol = atol/||b||:
    # stop when ||r|| <= atol (cg_sampler.py:74-80). In float32 the
    # achievable residual is floored at ~50 eps * ||b||, so the threshold
    # is raised accordingly to avoid grinding to maxiter.
    atol = jnp.maximum(
        jnp.asarray(atol, dtype),
        50.0 * jnp.finfo(dtype).eps * jnp.linalg.norm(b))

    def cond(state):
        return jnp.logical_and(state[3] > atol ** 2, state[4] < maxiter)

    p0 = deflate(r0) if use_basis else r0
    basis_new = None
    if return_lin_pred:
        def body(state):
            if use_basis:
                x, r, p, rs, n_iter, yhat, B = state
            else:
                x, r, p, rs, n_iter, yhat = state
            Ap, t_p = matvec_t(p)
            alpha = rs / jnp.vdot(p, Ap)
            x_n = x + alpha * p
            # The forward intermediate follows the design's compute
            # dtype, which can be wider than the solve dtype (f32 chain
            # over an f64-stored design); keep the carry type-stable.
            yhat_n = yhat + alpha * t_p.astype(yhat.dtype)
            r_n = r - alpha * Ap
            rs_new = jnp.vdot(r_n, r_n)
            if not use_basis:
                p = r_n + (rs_new / rs) * p
                return x_n, r_n, p, rs_new, n_iter + 1, yhat_n
            # Deflation breaks exact conjugacy (the projector is only
            # as accurate as the f32 Galerkin algebra), so the
            # guaranteed-descent property of plain CG no longer holds:
            # a near-null projector direction can blow the iterate up.
            # Guard every update — on a breakdown (non-SPD curvature or
            # a non-finite residual) keep the LAST VALID iterate and
            # exit via n_iter=maxiter, surfacing as cg_converged=False.
            ok = (jnp.vdot(p, Ap) > 0) & jnp.isfinite(rs_new)
            p_n = deflate(r_n + (rs_new / rs) * p)
            B_n = _basis_update(B, r_n, rs_new, n_iter, k_basis)
            return (jnp.where(ok, x_n, x), jnp.where(ok, r_n, r),
                    jnp.where(ok, p_n, p), jnp.where(ok, rs_new, rs),
                    jnp.where(ok, n_iter + 1,
                              jnp.asarray(maxiter, n_iter.dtype)),
                    jnp.where(ok, yhat_n, yhat), jnp.where(ok, B_n, B))

        # The loop computes in the residual's dtype (it follows the
        # preconditioner's, which can be wider than the solve inputs'
        # when an x64 session wraps an f32-stored design).
        init = (x0, r0, p0, jnp.vdot(r0, r0), jnp.zeros((), jnp.int32),
                jnp.asarray(t0, r0.dtype))
        if use_basis:
            init = init + (B0,)
            x, r, _, rs, n_iter, yhat, B_out = \
                lax.while_loop(cond, body, init)
        else:
            x, r, _, rs, n_iter, yhat = lax.while_loop(cond, body, init)
    else:
        def body(state):
            if use_basis:
                x, r, p, rs, n_iter, B = state
            else:
                x, r, p, rs, n_iter = state
            Ap = matvec(p)
            alpha = rs / jnp.vdot(p, Ap)
            x_n = x + alpha * p
            r_n = r - alpha * Ap
            rs_new = jnp.vdot(r_n, r_n)
            if not use_basis:
                p = r_n + (rs_new / rs) * p
                return x_n, r_n, p, rs_new, n_iter + 1
            # Breakdown guard — see the return_lin_pred body.
            ok = (jnp.vdot(p, Ap) > 0) & jnp.isfinite(rs_new)
            p_n = deflate(r_n + (rs_new / rs) * p)
            B_n = _basis_update(B, r_n, rs_new, n_iter, k_basis)
            return (jnp.where(ok, x_n, x), jnp.where(ok, r_n, r),
                    jnp.where(ok, p_n, p), jnp.where(ok, rs_new, rs),
                    jnp.where(ok, n_iter + 1,
                              jnp.asarray(maxiter, n_iter.dtype)),
                    jnp.where(ok, B_n, B))

        init = (x0, r0, p0, jnp.vdot(r0, r0), jnp.zeros((), jnp.int32))
        if use_basis:
            init = init + (B0,)
            x, r, _, rs, n_iter, B_out = lax.while_loop(cond, body, init)
        else:
            x, r, _, rs, n_iter = lax.while_loop(cond, body, init)
        yhat = None

    if use_basis:
        # Back to coef space (w = s * direction), original column order,
        # carry dtype. A draw that hit the breakdown guard or ground to
        # maxiter is evidence AGAINST the recycled subspace — reset the
        # carry to zeros so the next draw self-heals as plain PCG
        # instead of inheriting the directions that caused the stall.
        basis_new = B_out * precond_scale[None, :].astype(B_out.dtype)
        if bo_ctx is not None:
            basis_new = jnp.take(basis_new, unperm, axis=1)
        basis_new = jnp.where(rs <= atol ** 2, basis_new,
                              jnp.zeros_like(basis_new))
        basis_new = basis_new.astype(recycled_basis.dtype)

    coef = precond_scale * x
    if bo_ctx is not None:
        coef = coef[unperm]
    info = {
        'n_cg_iter': n_iter,
        'cg_converged': rs <= atol ** 2,
    }
    if use_basis:
        info['recycled_basis'] = basis_new
    if return_lin_pred:
        return coef, yhat, info
    return coef, info


def _basis_update(B, r, rs_new, n_iter, k_basis):
    """Write the normalized residual into the rolling (k, p) buffer at
    slot n_iter mod k (newest-k window, matching the recycled-basis
    policy measured in baselines/dev_deflation.py)."""
    rnorm = jnp.sqrt(rs_new)
    row = jnp.where(rnorm > 0,
                    r / jnp.maximum(rnorm, jnp.finfo(r.dtype).tiny), 0.0)
    return lax.dynamic_update_slice(
        B, row[None, :].astype(B.dtype),
        (jnp.mod(n_iter, k_basis), jnp.zeros((), n_iter.dtype)))
