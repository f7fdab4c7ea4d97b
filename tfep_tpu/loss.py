"""TFEP loss: KL divergence between Boltzmann distributions.

``loss = mean_i [ u_B(M(x_i)) - log|det J_M(x_i)| - u_A(x_i) ]`` in kT units,
optionally softmax-weighted by per-sample log-weights (biased sampling) and
NaN-tolerant (failed engine evaluations propagate NaN energies). Reference
behavior: /root/reference/tfep/loss.py:26-140.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tfep_tpu.nn.module import Module, static

__all__ = ['boltzmann_kl_div_loss', 'BoltzmannKLDivLoss']


def boltzmann_kl_div_loss(
        target_potentials: jnp.ndarray,
        log_det_J: Optional[jnp.ndarray] = None,
        log_weights: Optional[jnp.ndarray] = None,
        ref_potentials: Optional[jnp.ndarray] = None,
        ignore_nan: bool = False,
) -> jnp.ndarray:
    """Compute the TFEP training loss (all inputs in kT units, shape (batch,)).

    With ``log_weights``, computes ``sum(softmax(log_weights) * work)``;
    otherwise the plain mean. ``ignore_nan`` switches to NaN-ignoring
    reductions so failed potential evaluations don't poison the batch.

    Parameters
    ----------
    target_potentials : ndarray, shape (batch,)
        Reduced target potentials ``u_B(M(x_i)) / kT`` of the mapped samples.
    log_det_J : ndarray, shape (batch,), optional
        Log absolute determinant of the map's Jacobian at each sample,
        subtracted from the work. ``None`` means a volume-preserving map.
    log_weights : ndarray, shape (batch,), optional
        Per-sample log-weights for biased/reweighted sampling (e.g. a
        metadynamics bias over kT). The loss becomes the
        softmax(log_weights)-weighted sum instead of the mean.
    ref_potentials : ndarray, shape (batch,), optional
        Reduced reference potentials ``u_A(x_i) / kT``. They do not affect
        gradients (constant in the map parameters) but shift the loss to the
        actual KL divergence value.
    ignore_nan : bool, optional
        If ``True``, NaN work values (failed engine evaluations) are ignored
        by the reduction (``nanmean``/``nansum``) instead of propagating.

    Returns
    -------
    loss : ndarray, shape ()
        The scalar KL-divergence loss in kT units.
    """
    reduced_work = target_potentials
    if log_det_J is not None:
        reduced_work = reduced_work - log_det_J
    if ref_potentials is not None:
        reduced_work = reduced_work - ref_potentials

    if log_weights is not None:
        weights = jax.nn.softmax(log_weights)
        if ignore_nan:
            return jnp.nansum(weights * reduced_work)
        return jnp.sum(weights * reduced_work)

    if ignore_nan:
        return jnp.nanmean(reduced_work)
    return jnp.mean(reduced_work)


class BoltzmannKLDivLoss(Module):
    """Module wrapper over :func:`boltzmann_kl_div_loss`.

    Drop-in counterpart of the reference's ``tfep.loss.BoltzmannKLDivLoss``
    (/root/reference/tfep/loss.py:26): calling the instance with per-sample
    reduced potentials, log-det-Jacobians, and optional log-weights returns
    the scalar TFEP loss.

    Parameters
    ----------
    ignore_nan : bool, optional
        If ``True``, NaN work values are ignored by the batch reduction
        (default ``False``).
    """

    ignore_nan: bool = static(default=False)

    def __call__(self, target_potentials, log_det_J=None, log_weights=None,
                 ref_potentials=None):
        return boltzmann_kl_div_loss(
            target_potentials, log_det_J=log_det_J, log_weights=log_weights,
            ref_potentials=ref_potentials, ignore_nan=self.ignore_nan)
