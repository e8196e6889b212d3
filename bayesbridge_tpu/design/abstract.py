"""Design-matrix abstraction.

Mirrors the reference's abstract interface (reference:
bayesbridge/design_matrix/abstract_matrix.py:14-107): `dot`, `Tdot`,
Fisher-information products, matvec counters, memoization for the MAP
search, and constant-column scrubbing. Unlike the reference, concrete
subclasses are JAX pytrees whose `dot`/`Tdot` are pure jittable functions
of device-resident arrays, so the whole Gibbs iteration can run under one
`jit` with the design matrix living in HBM.

Matvec counters: inside `lax.scan` the per-iteration CG matvec counts are
carried functionally by the CG sampler; the Python-level counters here
track only eager (host-driven) calls such as the initial MAP search,
matching how the reference uses them (reg_coef_sampler.py:298-306).
"""

import abc
import warnings

import numpy as np
import scipy.sparse as sps


class AbstractDesignMatrix(abc.ABC):

    def __init__(self):
        self.dot_count = 0
        self.Tdot_count = 0
        self.memoized = False
        self._memo_v = None
        self._memo_result = None

    # -- core products ------------------------------------------------- #

    @property
    @abc.abstractmethod
    def shape(self):
        ...

    @abc.abstractmethod
    def dot(self, v):
        """X @ v."""

    @abc.abstractmethod
    def Tdot(self, v):
        """X.T @ v."""

    @property
    @abc.abstractmethod
    def is_sparse(self):
        ...

    @abc.abstractmethod
    def compute_fisher_info(self, weight, diag_only=False):
        """X' diag(weight) X (or its diagonal)."""

    @abc.abstractmethod
    def compute_transposed_fisher_info(self, weight, include_intrcpt=False):
        """X diag(weight) X'."""

    @abc.abstractmethod
    def toarray(self):
        """Materialize as a dense 2-d array (including intercept/centering)."""

    def quad_matvec(self, v, weight, return_t=False):
        """X' (weight * (X v)) — the design part of the CG sampler's
        conditional-precision operator (reference:
        bayesbridge/reg_coef_sampler/cg_sampler.py:20-94, the two matvecs
        at :104-113). The default composes the two products; backends
        with a dense-stored block may override it with a fused
        single-HBM-pass kernel.

        `return_t=True` additionally returns the forward intermediate
        ``t = X v`` (the linear predictor of the operand, intercept and
        centering included): the CG solver accumulates the final draw's
        linear predictor from these intermediates so the Gibbs step's
        observation-precision/log-density predictor costs no extra
        design pass (see ops/cg.sample_gaussian_cg)."""
        t = self.dot(v)
        out = self.Tdot(weight * t)
        return (out, t) if return_t else out

    def cg_blockorder_ctx(self):
        """(perm, unperm, offset_bo) enabling a block-ordered CG solve
        (see SparseDesignMatrix.cg_blockorder_ctx), or None when the
        backend has no dtype-split column layout to exploit."""
        return None

    def fused_ne_mode(self, kind='quad'):
        """Interpret-flag for the fused one-sweep kernel serving the
        `kind` call site ('quad' | 'presolve' | 'link'), else None (the
        composed default). See design/fusedne.dispatch_mode for the
        measured per-site policy."""
        return None

    def fused_link_grad(self, v, a, b, mid):
        """GLM loglik + gradient in one sweep where a fused kernel
        serves this design; None = caller uses its composed
        expressions."""
        return None

    def has_presolve_reductions(self):
        """True when this design serves `presolve_reductions` with a
        batched layout cheaper than the composed per-reduction calls
        (multi-RHS MXU dots or a fused kernel) — the Gibbs CG step
        routes its pre-solve through it when so."""
        return False

    def presolve_reductions(self, u1, u2, u3, u4=None):
        """The Gibbs step's pre-solve design reductions in one call:
        (Tdot(u1), Tdot(u2), fisher_diag(u3)) — the collapsed
        observation, the CG b-vector noise, and the Jacobi
        preconditioner diagonal (reference evaluates these as separate
        CSR passes: reg_coef_sampler.py:60-103 + cg_sampler.py:140-143).
        With `u4` (the CG warm start's weighted linear predictor
        ``obs_prec * X coef_init``) a fourth transpose reduction
        Tdot(u4) is appended: on batched-layout backends it rides the
        same multi-RHS dot, so the warm start's initial-residual
        operator application costs one forward pass instead of a
        dot+Tdot pair. The default composes every reduction; backends
        with dense-stored blocks override with a multi-RHS layout."""
        outs = (self.Tdot(u1), self.Tdot(u2),
                self.compute_fisher_info(u3, diag_only=True))
        if u4 is None:
            return outs
        return outs + (self.Tdot(u4),)

    # -- bookkeeping ---------------------------------------------------- #

    @property
    def n_matvec(self):
        return self.dot_count + self.Tdot_count

    def get_dot_count(self):
        return self.dot_count, self.Tdot_count

    def reset_matvec_count(self, count=0):
        if not hasattr(count, "__len__"):
            count = (count, count)
        self.dot_count, self.Tdot_count = count[0], count[1]

    def memoize_dot(self, flag=True):
        """Cache X @ v for repeated identical v (used during MAP search,
        where line searches re-evaluate the objective at the same point;
        reference: abstract_matrix.py:42-48)."""
        self.memoized = flag
        if not flag:
            self._memo_v = None
            self._memo_result = None

    def _check_memo(self, v):
        if self.memoized and self._memo_v is not None \
                and np.array_equal(self._memo_v, np.asarray(v)):
            return self._memo_result
        return None

    def _store_memo(self, v, result):
        if self.memoized:
            self._memo_v = np.array(v, copy=True)
            self._memo_result = result

    # -- preprocessing helpers ------------------------------------------ #

    @staticmethod
    def remove_intercept_indicator(X):
        """Drop (numerically) constant columns; the intercept is handled
        implicitly by the design classes (reference:
        abstract_matrix.py:92-107)."""
        if sps.issparse(X):
            second_moment = np.squeeze(np.asarray(X.power(2).mean(axis=0)))
            first_moment = np.squeeze(np.asarray(X.mean(axis=0)))
            col_variance = second_moment - first_moment ** 2
        else:
            col_variance = np.var(np.asarray(X), axis=0)
        is_constant = col_variance < X.shape[0] * 2 ** -52
        if np.any(is_constant):
            warnings.warn(
                "Intercept column (or one numerically indistinguishable "
                "from constant) detected. Do not add the intercept "
                "manually; removing the column(s)."
            )
            X = X[:, np.logical_not(is_constant)]
        return X
