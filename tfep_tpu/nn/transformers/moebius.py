"""Moebius and symmetrized-Moebius sphere transformers.

Moebius transformations expand/contract distributions on spheres (Kato &
McCullagh; Rezende et al. "Normalizing Flows on Tori and Spheres"),
generalized to the sphere of radius ``|x|``; the symmetrized variant (Köhler
et al. "Rigid body flows") is invertible in closed form with an analytic
log-det. Parameter vectors ``w`` of any norm are auto-rescaled below
``max_radius * |x|``. Reference behaviors:
/root/reference/tfep/nn/transformers/moebius.py:27-629.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tfep_tpu.nn.module import static
from tfep_tpu.nn.transformers.transformer import MAFTransformer
from tfep_tpu.utils.math import batchwise_dot, batchwise_outer

__all__ = [
    'MoebiusTransformer', 'SymmetrizedMoebiusTransformer',
    'moebius_transformer', 'symmetrized_moebius_transformer',
    'symmetrized_moebius_transformer_inverse',
]


class MoebiusTransformer(MAFTransformer):
    """Moebius transformer on spheres of radius ``|x|`` (vector-wise).

    Features are grouped into consecutive ``dimension``-vectors; each
    vector is transformed on its own sphere (its norm is preserved), so
    the transformer suits unit vectors such as bond directions in
    internal-coordinate maps. The conditioner provides one parameter
    vector ``w`` per input vector; ``w`` is rescaled to
    ``max_radius * |x|`` to keep the map invertible, and the inverse is
    the same transform with ``-w``.

    Attributes
    ----------
    dimension : int
        Vector size (3 for 3D directions).
    max_radius : float
        Upper bound on ``|w| / |x|`` (invertibility margin).
    unit_sphere : bool
        Assume inputs already unit-norm (skips the radial factor).
    """

    dimension: int = static(default=3)
    max_radius: float = static(default=0.99)
    unit_sphere: bool = static(default=False)

    def forward(self, x, parameters):
        batch_size, n_features = x.shape
        xv = x.reshape(batch_size, -1, self.dimension)
        wv = parameters.reshape(batch_size, -1, self.dimension)
        y, log_det_J = moebius_transformer(
            xv, wv, max_radius=self.max_radius,
            unit_sphere=self.unit_sphere)
        return y.reshape(batch_size, n_features), log_det_J

    def inverse(self, y, parameters):
        """The inverse of the Moebius transform is the transform with -w."""
        batch_size, n_features = y.shape
        yv = y.reshape(batch_size, -1, self.dimension)
        wv = parameters.reshape(batch_size, -1, self.dimension)
        x, log_det_J = moebius_transformer(
            yv, -wv, max_radius=self.max_radius,
            unit_sphere=self.unit_sphere)
        return x.reshape(batch_size, n_features), log_det_J

    def get_identity_parameters(self, n_features: int) -> np.ndarray:
        return np.zeros(n_features)

    def get_degrees_out(self, degrees_in: np.ndarray) -> np.ndarray:
        return np.asarray(degrees_in).copy()


class SymmetrizedMoebiusTransformer(MAFTransformer):
    """Symmetrized Moebius transformer (closed-form inverse, analytic log-det).

    Symmetrizing the Moebius transform over ``+w``/``-w`` (Köhler et al.,
    "Rigid body flows", arXiv:2301.11355) makes the inverse available in
    closed form with an analytic volume element, avoiding the plain
    transformer's slogdet (reference: moebius.py:193-373).

    Parameters
    ----------
    dimension : int, optional
        Size of each transformed vector (default 3).
    max_radius : float, optional
        Invertibility margin: the conditioner's ``w`` is rescaled below
        ``max_radius * |x|`` (default 0.99).
    identity_eps, identity_seed : float, int, optional
        Scale and seed of the near-zero random identity parameters.

    Notes
    -----
    ``get_identity_parameters`` returns a tiny random vector instead of exact
    zeros: at ``w = 0`` the parameter gradient vanishes and training stalls
    (reference rationale: moebius.py:211-217).
    """

    dimension: int = static(default=3)
    max_radius: float = static(default=0.99)
    identity_eps: float = static(default=1e-9)
    identity_seed: int = static(default=0)

    def forward(self, x, parameters):
        batch_size, n_features = x.shape
        xv = x.reshape(batch_size, -1, self.dimension)
        wv = parameters.reshape(batch_size, -1, self.dimension)
        y, log_det_J = symmetrized_moebius_transformer(
            xv, wv, max_radius=self.max_radius)
        return y.reshape(batch_size, n_features), log_det_J

    def inverse(self, y, parameters):
        batch_size, n_features = y.shape
        yv = y.reshape(batch_size, -1, self.dimension)
        wv = parameters.reshape(batch_size, -1, self.dimension)
        x, log_det_J = symmetrized_moebius_transformer_inverse(
            yv, wv, max_radius=self.max_radius)
        return x.reshape(batch_size, n_features), log_det_J

    def get_identity_parameters(self, n_features: int) -> np.ndarray:
        rng = np.random.default_rng(self.identity_seed)
        return (2 * rng.random(n_features) - 1) * self.identity_eps

    def get_degrees_out(self, degrees_in: np.ndarray) -> np.ndarray:
        return np.asarray(degrees_in).copy()


# =============================================================================
# Functional API
# =============================================================================

def moebius_transformer(x, w, max_radius: float = 0.99,
                        unit_sphere: bool = False,
                        return_log_det_J: bool = True):
    """``y = (|x|^2 - |w|^2) / |x - w|^2 * (x - w) - w`` with ``|w| < |x|``.

    Functional Moebius transform (reference: moebius.py:374-480).

    Parameters
    ----------
    x : ndarray, shape (batch, n_vectors, dimension)
        Input vectors; each is transformed on the sphere of its own norm.
    w : ndarray, shape (batch, n_vectors, dimension)
        Raw parameter vectors; rescaled to ``max_radius * |x|`` internally.
    max_radius : float, optional
        Invertibility margin for the rescaling.
    unit_sphere : bool, optional
        Assume ``|x| = 1`` (skips the radial projection factor).
    return_log_det_J : bool, optional
        If ``False``, return only ``y``.

    Returns
    -------
    y : ndarray, shape (batch, n_vectors, dimension)
        Transformed vectors (same norms as ``x``).
    log_det_J : ndarray, shape (batch,)
        Via slogdet of the per-vector Jacobian blocks (only if requested).
    """
    batch_size, n_vectors, dimension = x.shape

    w_norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
    rescaling = max_radius / (1 + w_norm)
    if not unit_sphere:
        x_norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        rescaling = x_norm * rescaling
    w = rescaling * w
    w_norm = rescaling * w_norm

    if unit_sphere:
        numerator = 1 - w_norm ** 2
    else:
        numerator = x_norm ** 2 - w_norm ** 2
    diff = x - w
    diff_norm = jnp.linalg.norm(diff, axis=-1, keepdims=True)
    y = numerator / diff_norm ** 2 * diff - w

    if not return_log_det_J:
        return y

    numerator_e = numerator[..., None]
    diff_norm_e = diff_norm[..., None]
    dd_outer = batchwise_outer(diff, diff)
    eye = jnp.broadcast_to(jnp.eye(dimension, dtype=x.dtype), dd_outer.shape)
    jac = numerator_e * (eye / diff_norm_e ** 2
                         - 2 / diff_norm_e ** 4 * dd_outer)

    if not unit_sphere:
        x_norm_e = x_norm[..., None]
        jac2 = eye - batchwise_outer(x, x) / x_norm_e ** 2
        jac = jnp.einsum('...ij,...jk->...ik', jac, jac2)
        jac = batchwise_outer(y, x) / x_norm_e ** 2 + jac

    log_det_J = jnp.linalg.slogdet(jac)[1].sum(axis=-1)
    return y, log_det_J


def symmetrized_moebius_transformer(x, w, max_radius: float = 0.99):
    """``y = |x| * (f(x;w) + f(x;-w)) / |f(x;w) + f(x;-w)|``.

    Same shapes/rescaling as :func:`moebius_transformer`; returns
    ``(y, log_det_J)`` with the analytic spherical volume element
    (reference: moebius.py:481-553).
    """
    batch_size, n_vectors, dimension = x.shape

    f_w = moebius_transformer(x, w, max_radius, unit_sphere=False,
                              return_log_det_J=False)
    f_iw = moebius_transformer(x, -w, max_radius, unit_sphere=False,
                               return_log_det_J=False)
    f_sym = f_w + f_iw

    x_norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    f_sym_norm = jnp.linalg.norm(f_sym, axis=-1, keepdims=True)
    y = x_norm / f_sym_norm * f_sym

    w_norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
    rescaling = max_radius / (1 + w_norm)
    w = rescaling * w
    w_norm = rescaling * w_norm
    log_det_J = _symmetrized_moebius_log_det_J(x / x_norm, w, w_norm ** 2)
    return y, log_det_J


def symmetrized_moebius_transformer_inverse(x, w, max_radius: float = 0.99):
    """Closed-form inverse (Köhler et al., arXiv:2301.11355).

    Solves for the pre-image in the 2D plane spanned by ``w`` and the
    orthogonal component of ``x``; same shapes as
    :func:`symmetrized_moebius_transformer`, returning ``(x, log_det_J)``
    with the negated volume element evaluated at the recovered point
    (reference: moebius.py:554-607).
    """
    x_norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    x_unit = x / x_norm

    w_norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
    rescaling = max_radius / (1 + w_norm)
    w_unit = rescaling * w
    w_unit_norm = rescaling * w_norm

    # Work in the 2D frame spanned by (w, x - proj(x, w)).
    da = w_unit / w_unit_norm
    a = batchwise_dot(x_unit, da, keepdim=True)
    db = x_unit - a * da
    b = jnp.linalg.norm(db, axis=-1, keepdims=True)
    db = db / b

    r2 = w_unit_norm ** 2
    numer = -a * (r2 + 1.0)
    denom = jnp.sqrt(1 + r2 ** 2 + r2 * (4 * a ** 2 - 2))
    a_inv = numer / denom
    b_inv = -jnp.sqrt(1 - a_inv ** 2)

    x_unit_inv = -(a_inv * da + b_inv * db)
    log_det_J = -_symmetrized_moebius_log_det_J(x_unit_inv, w_unit, r2)
    return x_norm * x_unit_inv, log_det_J


def _symmetrized_moebius_log_det_J(x, w, r2):
    """Analytic log-det on the unit sphere (Köhler et al. Eq. for dV)."""
    dimension = x.shape[-1]
    qy2 = r2 - batchwise_dot(x, w, keepdim=True) ** 2
    numer = (1 - r2) * (1 + r2) ** (dimension - 1)
    denom = (4 * qy2 + (1 - r2) ** 2) ** (dimension / 2)
    dV = numer / denom
    return jnp.log(dV)[..., 0].sum(axis=1)
