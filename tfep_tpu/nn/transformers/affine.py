"""Affine and volume-preserving-shift transformers.

``y = exp(a) * x + b`` (affine) and ``y = x + b`` (shift, optionally wrapped
into a periodic interval). Parameter layout follows the reference so MADE
degree lifting is identical: the first ``n_features`` parameters are shifts,
the next ``n_features`` are log-scales
(/root/reference/tfep/nn/transformers/affine.py:28-274).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from tfep_tpu.nn.module import buffer, static
from tfep_tpu.nn.transformers.transformer import MAFTransformer

__all__ = [
    'AffineTransformer', 'VolumePreservingShiftTransformer',
    'affine_transformer', 'affine_transformer_inverse',
    'volume_preserving_shift_transformer',
    'volume_preserving_shift_transformer_inverse',
]


class AffineTransformer(MAFTransformer):
    """Affine transformer: ``y_i = exp(a_i) * x_i + b_i``.

    The conditioner supplies two parameters per feature — the shift ``b``
    followed by the log-scale ``a`` — flattened as
    ``parameters[:, :n_features] = shifts`` and
    ``parameters[:, n_features:] = log_scales`` (same layout as the
    reference, /root/reference/tfep/nn/transformers/affine.py:28-141, so
    :meth:`get_degrees_out` lifts MADE degrees identically). Stateless:
    create with ``AffineTransformer()``.

    Methods follow the :class:`~tfep_tpu.nn.transformers.MAFTransformer`
    contract: ``forward(x, parameters) -> (y, log_det_J)`` with
    ``log_det_J = sum_i a_i``, the analytic inverse, identity parameters
    (all zeros), and degree lifting by tiling.
    """

    n_parameters_per_feature = 2

    def _split(self, parameters):
        batch = parameters.shape[0]
        parameters = parameters.reshape(batch, 2, -1)
        return parameters[:, 0], parameters[:, 1]

    def forward(self, x, parameters):
        shift, log_scale = self._split(parameters)
        return affine_transformer(x, shift, log_scale)

    def inverse(self, y, parameters):
        shift, log_scale = self._split(parameters)
        return affine_transformer_inverse(y, shift, log_scale)

    def get_identity_parameters(self, n_features: int) -> np.ndarray:
        return np.zeros(self.n_parameters_per_feature * n_features)

    def get_degrees_out(self, degrees_in: np.ndarray) -> np.ndarray:
        return np.tile(np.asarray(degrees_in), self.n_parameters_per_feature)

    def slice_features(self, feature_indices) -> 'AffineTransformer':
        """Feature-subset view (stateless: the transformer itself)."""
        return self


class VolumePreservingShiftTransformer(MAFTransformer):
    """Volume-preserving shift ``y_i = x_i + b_i`` with optional periodic wrap.

    Used for constant roto-translational DOFs in the mixed map (reference:
    affine.py:148-274). ``periodic_indices`` selects features wrapped into
    ``[periodic_limits[0], periodic_limits[1])`` after shifting.

    Parameters
    ----------
    periodic_indices : ndarray of int, optional
        Feature indices treated as periodic: after shifting they are wrapped
        back into the periodic interval (and likewise on inversion).
    periodic_limits : ndarray, shape (2,), optional
        Lower and upper limit of the periodic interval. Required when
        ``periodic_indices`` is given.

    Notes
    -----
    The Jacobian is the identity, so ``log_det_J`` is exactly zero in both
    directions regardless of wrapping.
    """

    n_parameters_per_feature = 1

    periodic_indices: Optional[jnp.ndarray] = buffer(default=None)
    periodic_limits: Optional[jnp.ndarray] = buffer(default=None)

    def forward(self, x, parameters):
        return volume_preserving_shift_transformer(
            x, parameters, self.periodic_indices, self.periodic_limits)

    def inverse(self, y, parameters):
        return volume_preserving_shift_transformer_inverse(
            y, parameters, self.periodic_indices, self.periodic_limits)

    def get_identity_parameters(self, n_features: int) -> np.ndarray:
        return np.zeros(self.n_parameters_per_feature * n_features)

    def get_degrees_out(self, degrees_in: np.ndarray) -> np.ndarray:
        return np.tile(np.asarray(degrees_in), self.n_parameters_per_feature)


# =============================================================================
# Functional API
# =============================================================================

def affine_transformer(x, shift, log_scale):
    """``y = exp(log_scale) * x + shift``; log_det_J = sum(log_scale).

    Functional counterpart of :class:`AffineTransformer` (reference:
    /root/reference/tfep/nn/transformers/affine.py:281).

    Parameters
    ----------
    x : ndarray, shape (batch, n_features)
        Input features.
    shift, log_scale : ndarray, shape (batch, n_features)
        Per-feature shift ``b`` and log-scale ``a``.

    Returns
    -------
    y : ndarray, shape (batch, n_features)
        Transformed features.
    log_det_J : ndarray, shape (batch,)
        ``sum_i log_scale_i``.
    """
    y = x * jnp.exp(log_scale) + shift
    return y, jnp.sum(log_scale, axis=-1)


def affine_transformer_inverse(y, shift, log_scale):
    """Inverse of :func:`affine_transformer`: ``x = (y - b) * exp(-a)``.

    Returns ``(x, -sum(log_scale, axis=-1))``.
    """
    x = (y - shift) * jnp.exp(-log_scale)
    return x, -jnp.sum(log_scale, axis=-1)


def _periodic_wrap(x, periodic_indices, periodic_limits):
    if periodic_indices is None:
        return x
    x = jnp.asarray(x)  # .at[] indexing below requires a jax array
    lo, hi = periodic_limits[0], periodic_limits[1]
    wrapped = (x[:, periodic_indices] - lo) % (hi - lo) + lo
    return x.at[:, periodic_indices].set(wrapped)


def volume_preserving_shift_transformer(x, shift, periodic_indices=None,
                                        periodic_limits=None):
    """``y = x + shift`` (unit Jacobian), periodic features wrapped.

    Note: the reference wraps with ``y % period + lo`` (affine.py:410) which
    is only a true wrap into ``[lo, hi)`` when ``lo == 0``; here the wrap is
    done relative to ``lo`` so any interval is handled correctly.

    Parameters
    ----------
    x : ndarray, shape (batch, n_features)
        Input features.
    shift : ndarray, shape (batch, n_features)
        Per-feature shift.
    periodic_indices : ndarray of int, optional
        Features to wrap into the periodic interval after shifting.
    periodic_limits : ndarray, shape (2,), optional
        ``(lo, hi)`` of the periodic interval.

    Returns
    -------
    y : ndarray, shape (batch, n_features)
        Shifted (and wrapped) features.
    log_det_J : ndarray, shape (batch,)
        Always zero (unit Jacobian).
    """
    y = _periodic_wrap(x + shift, periodic_indices, periodic_limits)
    return y, jnp.zeros(x.shape[0], dtype=x.dtype)


def volume_preserving_shift_transformer_inverse(y, shift, periodic_indices=None,
                                                periodic_limits=None):
    """Inverse of :func:`volume_preserving_shift_transformer`."""
    x = _periodic_wrap(y - shift, periodic_indices, periodic_limits)
    return x, jnp.zeros(y.shape[0], dtype=y.dtype)
