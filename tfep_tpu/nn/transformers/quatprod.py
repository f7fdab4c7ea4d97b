"""Quaternion-product transformer: volume-preserving rigid rotations.

Each input quaternion (xyzw convention, vector part first — matching the
roma library used by the reference) is multiplied by a normalized parameter
quaternion; the inverse multiplies by its conjugate. Unit Jacobian.
Quaternion algebra is implemented natively (the reference depends on roma,
/root/reference/tfep/nn/transformers/quatprod.py:26-130).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tfep_tpu.nn.transformers.transformer import MAFTransformer

__all__ = ['QuaternionProductTransformer', 'quat_product', 'quat_normalize',
           'quat_conjugate']


def quat_normalize(q):
    """Normalize quaternions along the last axis."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_conjugate(q):
    """Conjugate in xyzw layout: negate the vector part."""
    return jnp.concatenate([-q[..., :3], q[..., 3:]], axis=-1)


def quat_product(p, q):
    """Hamilton product ``p * q`` in xyzw layout (vector first, scalar last).

    Parameters
    ----------
    p, q : ndarray, shape (..., 4)
        Quaternions, broadcastable against each other.

    Returns
    -------
    ndarray, shape (..., 4)
        The composed rotation quaternion (rotating by ``q`` then ``p``).
    """
    pv, pw = p[..., :3], p[..., 3:]
    qv, qw = q[..., :3], q[..., 3:]
    vector = pw * qv + qw * pv + jnp.cross(pv, qv)
    scalar = pw * qw - jnp.sum(pv * qv, axis=-1, keepdims=True)
    return jnp.concatenate([vector, scalar], axis=-1)


class QuaternionProductTransformer(MAFTransformer):
    """Rotate each input quaternion by a (normalized) parameter quaternion.

    Features are grouped in fours (xyzw quaternions); each group is
    left-multiplied by the conditioner's quaternion after normalization.
    Rotations of unit quaternions preserve volume, so ``log_det_J`` is
    exactly zero in both directions, and the inverse multiplies by the
    conjugate. One parameter per feature (4 per quaternion). Stateless:
    create with ``QuaternionProductTransformer()``. Reference:
    /root/reference/tfep/nn/transformers/quatprod.py:26-130 (roma replaced
    by native quaternion algebra).
    """

    n_parameters_per_feature = 1

    def forward(self, x, parameters):
        batch_size = x.shape[0]
        xq = x.reshape(-1, 4)
        pq = parameters.reshape(-1, 4)
        y = quat_product(quat_normalize(pq), xq)
        return (y.reshape(batch_size, -1),
                jnp.zeros(batch_size, dtype=x.dtype))

    def inverse(self, y, parameters):
        batch_size = y.shape[0]
        yq = y.reshape(-1, 4)
        pq = parameters.reshape(-1, 4)
        x = quat_product(quat_conjugate(quat_normalize(pq)), yq)
        return (x.reshape(batch_size, -1),
                jnp.zeros(batch_size, dtype=y.dtype))

    def get_identity_parameters(self, n_features: int) -> np.ndarray:
        """Identity quaternion (0, 0, 0, 1) per input quaternion."""
        if n_features % 4 != 0:
            raise ValueError('n_features must be divisible by 4.')
        params = np.zeros((n_features // 4, 4))
        params[:, 3] = 1.0
        return params.reshape(-1)

    def get_degrees_out(self, degrees_in: np.ndarray) -> np.ndarray:
        return np.asarray(degrees_in).copy()
