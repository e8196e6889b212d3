"""Finite-difference checks of gradients and Hessian matvecs
(reference: tests/derivative_tester.py:3-68)."""

import numpy as np


def numerical_grad_is_close(f, x, atol=1e-5, rtol=1e-5, dx=1e-6,
                            subset_index=None, return_grad=False):
    """Compare f's analytic gradient to centered finite differences."""
    x = np.array(x, ndmin=1, dtype=np.float64)
    if subset_index is None:
        subset_index = np.arange(len(x))
    grad_est = np.zeros(len(subset_index))
    for out_i, i in enumerate(subset_index):
        x_minus, x_plus = x.copy(), x.copy()
        x_minus[i] -= dx
        x_plus[i] += dx
        f_minus, _ = f(x_minus)
        f_plus, _ = f(x_plus)
        grad_est[out_i] = (float(f_plus) - float(f_minus)) / (2 * dx)
    _, grad = f(x)
    grad = np.asarray(grad)
    is_close = np.allclose(grad[subset_index], grad_est, atol=atol, rtol=rtol)
    if return_grad:
        return is_close, grad[subset_index], grad_est
    return is_close


def numerical_direc_deriv_is_close(f, x, hess_matvec, n_direction=10,
                                   atol=1e-5, rtol=1e-5, dx=1e-6, seed=None):
    """Compare Hessian matvecs to finite-difference directional
    derivatives of the gradient."""
    x = np.array(x, ndmin=1, dtype=np.float64)
    rng = np.random.default_rng(seed)
    for _ in range(n_direction):
        v = rng.standard_normal(len(x))
        v /= np.sqrt(np.sum(v ** 2))
        _, grad_minus = f(x - dx * v)
        _, grad_plus = f(x + dx * v)
        direc_deriv_est = (np.asarray(grad_plus) - np.asarray(grad_minus)) \
            / (2 * dx)
        direc_deriv = np.asarray(hess_matvec(v))
        if not np.allclose(direc_deriv, direc_deriv_est, atol=atol,
                           rtol=rtol):
            return False
    return True
