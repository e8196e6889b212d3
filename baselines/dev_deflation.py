"""Recycled-deflation PCG prototype for the CG Gibbs sampler (round 4).

Question: on the REAL sequence of conditional-precision systems a
bridge-regression Gibbs chain produces (weights, local scales, and the
Jacobi preconditioner all change every iteration), does a deflation
basis recycled from the previous solves cut the CG iteration count by
enough to pay for its upkeep?

Cost model on the flagship (v5e, BASELINE.md): each CG iteration is a
dot+Tdot pair over the stored design (~17.2 ms); maintaining the basis
costs ONE batched operator application per Gibbs iteration (the k
basis columns ride a single multi-RHS dot+Tdot pair, so ~1 pair
regardless of k <= ~16). Net win therefore needs
(iters_saved - 1) > 0 — this script measures iters_saved on a NumPy
replica of the sampler (Jacobi preconditioner + running-mean warm
start, the library's shipped configuration) at a dev size.

Variants, per coefficient draw (A = this iteration's preconditioned
operator, W = recycled basis from the previous draw's Krylov space):
  none : plain PCG (ships today)
  init : Galerkin init-projection — x0 += W (W'AW)^-1 W' r0, then
         plain PCG. Upkeep: the one batched A W per draw.
  defl : init-projection + A-conjugate projection of every search
         direction against W (classic deflated PCG). Same upkeep; adds
         per-iteration p x k vector work (no design passes).

Basis: the previous solve's normalized Krylov residual basis (the CG
directions), orthonormalized, capped at --k columns. The spectrum's
troublesome directions move slowly across Gibbs iterations because
they are set by the data geometry (X's dominant column clusters), not
by the per-iteration scales.

Usage: python -m baselines.dev_deflation [--n 20000] [--p 10000]
            [--iters 40] [--k 8] [--family logit]
"""

import argparse
import time

import numpy as np
import scipy.sparse as sps

from baselines.reference_impl import NumpyBridgeGibbs


def pcg(matvec, b, x0, atol, maxiter=500, W=None, AW=None, deflate_dirs=False):
    """Plain / deflated PCG recording iteration count.

    With W (p x k) and AW = A @ W: Galerkin init-projection; with
    deflate_dirs additionally A-conjugate-project each new direction
    against W (deflated PCG), keeping the Krylov space orthogonal to
    the recycled subspace."""
    x = x0.copy()
    r = b - matvec(x)
    if W is not None:
        WtAW = W.T @ AW
        # Solve the small Galerkin system; regularize defensively.
        try:
            c = np.linalg.solve(WtAW, W.T @ r)
        except np.linalg.LinAlgError:
            c = np.linalg.lstsq(WtAW, W.T @ r, rcond=None)[0]
        x = x + W @ c
        r = r - AW @ c
    basis = []
    p_dir = r.copy()
    if W is not None and deflate_dirs:
        c = np.linalg.solve(WtAW, AW.T @ p_dir)
        p_dir = p_dir - W @ c
    rs = r @ r
    n_iter = 0
    while np.sqrt(rs) > atol and n_iter < maxiter:
        Ap = matvec(p_dir)
        alpha = rs / (p_dir @ Ap)
        x = x + alpha * p_dir
        r = r - alpha * Ap
        rs_new = r @ r
        beta = rs_new / rs
        p_new = r + beta * p_dir
        if W is not None and deflate_dirs:
            c = np.linalg.solve(WtAW, AW.T @ p_new)
            p_new = p_new - W @ c
        basis.append(r / max(np.sqrt(rs_new), 1e-300))
        p_dir, rs = p_new, rs_new
        n_iter += 1
    return x, n_iter, basis


class DeflationBench(NumpyBridgeGibbs):
    """NumpyBridgeGibbs with the library's Jacobi preconditioner and a
    pluggable CG solver, solving EACH system with all variants from the
    same state so the chains stay identical (the chain advances with
    the plain solution)."""

    def __init__(self, *args, k_defl=8, f32_floor=False, **kwargs):
        super().__init__(*args, **kwargs)
        self.k_defl = k_defl
        self.f32_floor = f32_floor
        self.W = None
        self.counts = {'none': [], 'init': [], 'defl': []}
        if self.sparse:
            self.X2 = self.X.multiply(self.X).tocsr()
        else:
            self.X2 = self.X * self.X

    def _sample_coef_cg(self, obs_prec_vec, prior_prec_sqrt, z, x0):
        # Jacobi preconditioner (the library's shipped default),
        # cf. bayesbridge_tpu/ops/cg.py choose_diag_preconditioner.
        fisher_diag = self.X2.T @ obs_prec_vec
        precond_scale = 1.0 / np.sqrt(prior_prec_sqrt ** 2 + fisher_diag)
        b = precond_scale * (
            z + self.Tdot(np.sqrt(obs_prec_vec)
                          * self.rng.standard_normal(self.n))
            + prior_prec_sqrt * self.rng.standard_normal(self.p))
        precond_prior_prec = (precond_scale * prior_prec_sqrt) ** 2

        def matvec(x):
            return precond_prior_prec * x + precond_scale * self.Tdot(
                obs_prec_vec * self.dot(precond_scale * x))

        atol = 1e-5 * np.sqrt(self.p)
        if self.f32_floor:
            # The shipped f32 sampler raises atol to its achievable
            # floor (ops/cg.py): 50 eps_f32 ||b||. Mirror it so the
            # iteration counts match the flagship regime.
            atol = max(atol, 50 * 1.1920929e-07 * np.linalg.norm(b))
        x0s = x0 / precond_scale

        x_plain, n_plain, basis = pcg(matvec, b, x0s, atol)
        self.counts['none'].append(n_plain)
        if self.W is not None:
            AW = np.column_stack([matvec(w) for w in self.W.T])
            _, n_init, _ = pcg(matvec, b, x0s, atol, W=self.W, AW=AW)
            _, n_defl, _ = pcg(matvec, b, x0s, atol, W=self.W, AW=AW,
                               deflate_dirs=True)
            self.counts['init'].append(n_init)
            self.counts['defl'].append(n_defl)
        # Recycle: orthonormal basis of this solve's residual Krylov
        # directions, newest first, capped at k.
        if basis:
            B = np.column_stack(basis[::-1])[:, :self.k_defl]
            Q, _ = np.linalg.qr(B)
            self.W = Q
        return precond_scale * x_plain, n_plain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=20000)
    ap.add_argument('--p', type=int, default=10000)
    ap.add_argument('--iters', type=int, default=40)
    ap.add_argument('--burn', type=int, default=10,
                    help='Gibbs iterations before counting (the early '
                    'chain is atypical)')
    ap.add_argument('--k', type=int, default=8)
    ap.add_argument('--family', default='logit')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--f32floor', action='store_true',
                    help="raise atol to the f32 sampler's residual "
                    'floor (the flagship regime)')
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    n, p = args.n, args.p
    n_bin = int(0.9 * p)
    X = sps.hstack([
        sps.random(n, n_bin, density=0.1, random_state=args.seed,
                   data_rvs=lambda k: np.ones(k)),
        sps.csr_matrix(rng.standard_normal((n, p - n_bin))),
    ]).tocsr()
    beta_true = np.zeros(p)
    beta_true[rng.choice(p, 20, replace=False)] = \
        rng.standard_normal(20) * 1.5
    logits = X @ beta_true
    y = rng.binomial(1, 1 / (1 + np.exp(-logits))).astype(np.float64)
    outcome = (y, np.ones(n)) if args.family == 'logit' else X @ beta_true

    g = DeflationBench(X, outcome, family=args.family, bridge_exp=.5,
                       slab_size=2.0, seed=args.seed, k_defl=args.k,
                       f32_floor=args.f32floor)
    print(f"n={n} p={p} k={args.k} family={args.family} "
          f"gibbs_iters={args.iters}+{args.burn} burn", flush=True)
    tic = time.time()
    g.run(args.burn, method='cg')
    for c in g.counts.values():
        c.clear()
    g.run(args.iters, method='cg', resume=True)
    print(f"wall {time.time() - tic:.0f}s", flush=True)
    base = np.mean(g.counts['none'])
    for k, v in g.counts.items():
        if not v:
            continue
        m = np.mean(v)
        # Net flagship pass model: each iteration saved is one dot+Tdot
        # pair; 'init'/'defl' pay ~one batched pair per draw for A W.
        upkeep = 0.0 if k == 'none' else 1.0
        print(f"  {k:>5}: mean {m:5.2f}  min/max {np.min(v)}/{np.max(v)}"
              f"  net pairs vs plain {m + upkeep - base:+5.2f}",
              flush=True)


if __name__ == '__main__':
    main()
