"""(T)FEP free-energy estimator, bootstrap-compatible and device-vectorized.

``Δf = -kT * logsumexp(-w/kT + log_weights)`` over work values ``w``; biased
sampling enters through per-sample bias potentials (log-softmax weights) and
Bayesian bootstrap through explicit weights. The vectorized path maps over a
leading resample axis on-device, so the whole bootstrap distribution is one
XLA computation. Reference behavior:
/root/reference/tfep/analysis/estimator.py:24-86.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ['fep_estimator']


def fep_estimator(data, kT: float = 1.0, weights: Optional[jnp.ndarray] = None,
                  vectorized: bool = False) -> jnp.ndarray:
    """FEP estimator over work values (optionally with sample log-weights).

    Parameters
    ----------
    data : array
        Shape ``(n_samples,)`` (work values, kT units) or ``(2, n_samples)``
        (``data[0]`` work, ``data[1]`` log-weights/bias). With
        ``vectorized=True`` an extra leading ``n_bootstraps`` axis is expected
        (``(n_bootstraps, n_samples)`` or ``(n_bootstraps, n_samples, 2)``).
    kT : float, optional
        Set if the work/bias values are not already in kT units.
    weights : array, optional
        Shape ``(n_bootstraps, n_samples)`` Bayesian-bootstrap weights
        (sum to 1 along the sample axis). Unbiased data only.
    vectorized : bool, optional

    Returns
    -------
    df : scalar, or shape ``(n_bootstraps,)`` when vectorized.
    """
    data = jnp.asarray(data)
    if vectorized:
        if data.ndim == 2:
            work, bias = data, None
        else:
            # (n_bootstraps, n_samples, 2) -> two (n_bootstraps, n_samples).
            work, bias = data[..., 0], data[..., 1]
    else:
        if data.ndim == 1:
            work, bias = data, None
        else:
            work, bias = data[0], data[1]

    if bias is None:
        if weights is None:
            log_weights = -jnp.log(jnp.asarray(work.shape[-1],
                                               dtype=work.dtype))
        else:
            log_weights = jnp.log(weights)
    elif weights is not None:
        raise NotImplementedError(
            'Bayesian bootstrapping is not supported with biased data.')
    else:
        log_weights = jax.nn.log_softmax(bias / kT, axis=-1)

    return -kT * jax.scipy.special.logsumexp(-work / kT + log_weights,
                                             axis=-1)
