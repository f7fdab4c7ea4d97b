"""Math helpers, including the brute-force Jacobian oracle used by tests.

The reference's test oracle computes flow Jacobians by repeated autograd
passes (/root/reference/tfep/utils/math.py:141-216). In JAX the idiomatic
equivalent is a single ``jacfwd`` (or ``jacrev``) vmapped over the batch,
followed by ``slogdet`` — no graph bookkeeping needed.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    'batchwise_dot', 'batchwise_outer', 'cov',
    'batch_jacobian', 'batch_log_abs_det_J',
]


def batchwise_dot(x, y, keepdim: bool = False):
    """Row-wise dot product of two (batch, n) arrays."""
    out = jnp.sum(x * y, axis=-1)
    if keepdim:
        out = out[..., None]
    return out


def batchwise_outer(x, y):
    """Row-wise outer product: (batch, n) x (batch, m) -> (batch, n, m)."""
    return x[..., :, None] * y[..., None, :]


def cov(x, ddof: int = 1, dim_sample: int = 0, inplace: bool = False):
    """Covariance matrix of data ``x``.

    ``dim_sample`` selects which axis indexes samples (0: rows are samples,
    like ``numpy.cov(x.T)``). Mirrors /root/reference/tfep/utils/math.py:67-139.
    """
    if dim_sample == 0:
        data = x
    else:
        data = x.T
    mean = jnp.mean(data, axis=0, keepdims=True)
    centered = data - mean
    n = data.shape[0]
    return centered.T @ centered / (n - ddof)


def batch_jacobian(fn: Callable, x: jnp.ndarray) -> jnp.ndarray:
    """Jacobian of a batched function, one (n_out, n_in) block per sample.

    ``fn`` maps ``(batch, n_in) -> (batch, n_out)`` with batch elements
    independent; returns shape ``(batch, n_out, n_in)``.
    """

    def single(xi):
        return fn(xi[None])[0]

    return jax.vmap(jax.jacfwd(single))(x)


def batch_log_abs_det_J(fn: Callable, x: jnp.ndarray) -> jnp.ndarray:
    """log|det J| of a batched bijection — the test oracle for every flow.

    ``fn`` maps ``(batch, n) -> (batch, n)``; returns shape ``(batch,)``.
    Reference oracle: /root/reference/tfep/utils/math.py:178-216.
    """
    jac = batch_jacobian(fn, x)
    return jnp.linalg.slogdet(jac)[1]


#: Reference-compatible aliases (/root/reference/tfep/utils/math.py:141-216);
#: the "autograd" here is jacfwd + slogdet rather than torch autograd.
batch_autograd_jacobian = batch_jacobian
batch_autograd_log_abs_det_J = batch_log_abs_det_J

__all__ += ['batch_autograd_jacobian', 'batch_autograd_log_abs_det_J']
