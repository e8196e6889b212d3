"""Dense design matrix.

Equivalent of the reference's DenseDesignMatrix (reference:
bayesbridge/design_matrix/dense_matrix.py:7-72): centering is applied and
the intercept column materialized up front, after which every product is a
single jnp matmul that XLA tiles onto the MXU.

Registered as a JAX pytree so instances can be closed over / passed into
jitted step functions with the data resident in HBM.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .abstract import AbstractDesignMatrix
from . import fusedne
from ..utils.dtypes import default_float


@jax.tree_util.register_pytree_node_class
class DenseDesignMatrix(AbstractDesignMatrix):

    def __init__(self, X, center_predictor=False, add_intercept=True,
                 copy_array=False, dtype=None, fused=None,
                 _skip_preprocess=False, _n_rows=None):
        super().__init__()
        self.intercept_added = add_intercept
        self.centered = center_predictor
        # Per-design fused-kernel policy ('auto'|'full'|'1'|'0'); None
        # defers to the BB_FUSED_NE env var at call time (see
        # design/fusedne.dispatch_mode).
        self.fused_policy = fused
        self._sharded = False
        if _skip_preprocess:
            self.X = X  # pytree unflatten path: already processed
            self._n_rows = _n_rows if _n_rows is not None else X.shape[0]
            return
        dtype = dtype or default_float()
        X = np.array(np.asarray(X), dtype=dtype, copy=True)
        X = self.remove_intercept_indicator(X)
        if center_predictor:
            X = X - X.mean(axis=0, keepdims=True)
        if add_intercept:
            X = np.hstack((np.ones((X.shape[0], 1), dtype=dtype), X))
        self.X = jnp.asarray(X)
        self._n_rows = X.shape[0]

    # -- pytree protocol ------------------------------------------------ #

    def tree_flatten(self):
        aux = (self.intercept_added, self.centered, self._n_rows,
               self._sharded, getattr(self, 'fused_policy', None))
        return (self.X,), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls(children[0], center_predictor=aux[1], add_intercept=aux[0],
                  fused=aux[4] if len(aux) > 4 else None,
                  _skip_preprocess=True, _n_rows=aux[2])
        obj._sharded = aux[3]
        return obj

    # -- interface ------------------------------------------------------ #

    # The stored X may carry zero-padded observation rows (added by
    # parallel.sharding._put_pad so an uneven row count still shards
    # evenly over a mesh): products slice the padding back off / zero-pad
    # operand vectors, so the padding is semantically inert.

    @property
    def shape(self):
        return (self._n_rows, self.X.shape[1])

    @property
    def dtype(self):
        return self.X.dtype

    @property
    def is_sparse(self):
        return False

    def _pad_obs(self, u):
        pad = self.X.shape[0] - u.shape[0]
        return u if pad == 0 else jnp.pad(u, (0, pad))

    def dot(self, v):
        memo = self._check_memo(v)
        if memo is not None:
            return memo
        result = (self.X @ jnp.asarray(v, self.X.dtype))[:self._n_rows]
        # Key the memo on the caller's value, not the converted device
        # array (whose host round-trip is lossy on emulated-f64
        # backends and would never match).
        self._store_memo(v, result)
        self.dot_count += 1
        return result

    def Tdot(self, v):
        self.Tdot_count += 1
        return self.X.T @ self._pad_obs(jnp.asarray(v, self.X.dtype))

    def fused_ne_mode(self, kind='quad'):
        """Interpret-flag for the fused one-sweep kernel serving the
        `kind` call site, else None (composed dot/Tdot). The default
        policy fuses nothing — see design/fusedne.dispatch_mode for
        the measured argument."""
        interpret = fusedne.dispatch_mode(kind, self.fused_policy)
        if interpret is None or self._sharded \
                or self.X.dtype != jnp.float32:
            return None
        return interpret

    def quad_matvec(self, v, weight, return_t=False):
        """X' (weight * (X v)) in one HBM sweep of the stored matrix via
        the fused normal-equations kernel (design/fusedne.py); the
        intercept/centering are already materialized in X, so the
        kernel's per-row offset is zero. `return_t` (the composed
        path's forward intermediate) routes through the composed
        expressions — the fused kernel returns the weighted residual,
        not the raw predictor."""
        interpret = self.fused_ne_mode('quad')
        if interpret is None or return_t:
            return super().quad_matvec(v, weight, return_t)
        v = jnp.asarray(v, jnp.float32)
        weight = jnp.asarray(weight, jnp.float32)
        out, _ = fusedne.fused_ne_matvec(
            self.X, v, jnp.zeros(self._n_rows, jnp.float32), weight,
            interpret=interpret)
        self.dot_count += 1
        self.Tdot_count += 1
        return out

    def fused_link_grad(self, v, a, b, mid):
        """GLM loglik + gradient in ONE sweep of the stored matrix
        (design/fusedne.py fused_link_matvec); None when ineligible."""
        interpret = self.fused_ne_mode('link')
        if interpret is None:
            return None
        f32 = jnp.float32
        n = self._n_rows
        outs, u, logp = fusedne.fused_link_matvec(
            (self.X[:n],), (jnp.asarray(v, f32),),
            None, jnp.asarray(a, f32), jnp.asarray(b, f32), mid,
            with_logp=True, interpret=interpret)
        self.dot_count += 1
        self.Tdot_count += 1
        return logp, outs[0]

    def has_presolve_reductions(self):
        return True

    def presolve_reductions(self, u1, u2, u3, u4=None):
        """(Tdot(u1), Tdot(u2), fisher_diag(u3)[, Tdot(u4)]) in one
        batched layout: one multi-RHS MXU dot ``X' @ [u1 u2 u3 (u4)]``
        plus the squared-column matvec ``(X.X)'u3`` (the measured
        default — the square fuses into the dot's operand read), or ONE
        sweep via the fused reduction kernel under a 'full'/'1' policy
        (design/fusedne.py fused_tdots; `u4` then composes as a
        separate Tdot — the kernel's reduction set is fixed).
        Intercept/centering are already materialized in X so the
        outputs need no corrections. The wide dot requests HIGH
        precision: on TPU the DEFAULT emitter chains MXU partials
        through bf16 (~2e-3 rel err); HIGH restores f32-grade accuracy
        at less cost than HIGHEST (measured in
        baselines/dev_ne_variants.py --presolve)."""
        interpret = self.fused_ne_mode('presolve')
        dt = self.X.dtype
        us = [jnp.asarray(u, dt) for u in (u1, u2, u3)
              + ((u4,) if u4 is not None else ())]
        if interpret is None:
            # Operate on the full stored X (its padded rows are genuine
            # zeros) with row-padded operands, as Tdot does — slicing a
            # row-sharded X would break the even sharding.
            U = jnp.stack([self._pad_obs(u) for u in us], axis=1)
            R = jax.lax.dot_general(
                self.X, U, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGH,
                preferred_element_type=dt)
            sq = (self.X * self.X).T @ U[:, 2]
            self.Tdot_count += 2
            if u4 is None:
                return R[:, 0], R[:, 1], sq
            self.Tdot_count += 1
            return R[:, 0], R[:, 1], sq, R[:, 3]
        (o1, o2, _, sq), = fusedne.fused_tdots(
            (self.X[:self._n_rows],), us[0], us[1], us[2],
            interpret=interpret)
        self.Tdot_count += 2
        if u4 is None:
            return o1, o2, sq
        return o1, o2, sq, self.Tdot(us[3])

    def compute_fisher_info(self, weight, diag_only=False):
        weight = self._pad_obs(jnp.asarray(weight, self.X.dtype))
        if diag_only:
            return jnp.sum(weight[:, None] * self.X ** 2, axis=0)
        # Wide f32 dots at DEFAULT precision chain partials through
        # bf16 on TPU; the Fisher product feeds the Cholesky sampler's
        # precision matrix, so force the f32 decomposition.
        return jnp.matmul(self.X.T, weight[:, None] * self.X,
                          precision=jax.lax.Precision.HIGHEST)

    def compute_transposed_fisher_info(self, weight, include_intrcpt=False):
        """X diag(weight) X' where `weight` runs over predictors (the
        intercept weight first when include_intrcpt). The reference leaves
        this unimplemented for dense designs (dense_matrix.py:60-65);
        provided here for parity with the sparse class."""
        weight = jnp.asarray(weight, self.X.dtype)
        X_main = self.X[:self._n_rows, 1:] if self.intercept_added \
            else self.X[:self._n_rows]
        weight_main = weight[1:] if include_intrcpt else weight
        result = jnp.matmul(X_main * weight_main[None, :], X_main.T,
                            precision=jax.lax.Precision.HIGHEST)
        if include_intrcpt:
            result = result + weight[0]
        return result

    def toarray(self):
        return np.asarray(self.X[:self._n_rows])

    def extract_matrix(self, order=None):
        return self.X[:self._n_rows]
