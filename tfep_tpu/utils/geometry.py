"""Geometry utilities: distances, angles, rotations, frame fixing, polar maps.

Pure-jnp, fully batched and jit/vmap-friendly (no boolean-mask indexing; all
conditionals are ``where`` selects so shapes stay static on TPU). Reference
behaviors: /root/reference/tfep/utils/geometry.py:28-472.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from tfep_tpu.utils.math import batchwise_dot, batchwise_outer

__all__ = [
    'pdist', 'vector_vector_angle', 'vector_plane_angle',
    'proper_dihedral_angle', 'rotation_matrix_3d', 'batchwise_rotate',
    'get_axis_from_name', 'reference_frame_rotation_matrix',
    'cartesian_to_polar', 'polar_to_cartesian',
]


def pdist(x, pairs=None, return_diff: bool = False):
    """Euclidean distances between particle pairs, batched.

    ``x``: (batch, n_particles, D); ``pairs``: (2, n_pairs) or None (all
    unique pairs). Returns (batch, n_pairs) distances (+ optional diffs
    ``p1 - p0`` of shape (batch, n_pairs, D)).
    """
    n_particles = x.shape[-2]
    if pairs is None:
        pairs = np.stack(np.triu_indices(n_particles, k=1))
    diff = x[:, pairs[1]] - x[:, pairs[0]]
    distances = jnp.sqrt(jnp.sum(diff ** 2, axis=-1))
    if return_diff:
        return distances, diff
    return distances


def vector_vector_angle(x1, x2):
    """Angle in [0, pi] between vectors, batched over leading dims."""
    x1_norm = jnp.linalg.norm(x1, axis=-1)
    x2_norm = jnp.linalg.norm(x2, axis=-1)
    cos_theta = batchwise_dot(x1, x2) / (x1_norm * x2_norm)
    return jnp.arccos(jnp.clip(cos_theta, -1.0, 1.0))


def vector_plane_angle(x, plane):
    """Angle between vectors and a plane given by its normal vector."""
    x_norm = jnp.linalg.norm(x, axis=-1)
    plane_norm = jnp.linalg.norm(plane, axis=-1)
    cos_theta = batchwise_dot(x, plane) / (x_norm * plane_norm)
    return jnp.arcsin(jnp.clip(cos_theta, -1.0, 1.0))


def proper_dihedral_angle(x1, x2, x3):
    """Proper dihedral angle (in (-pi, pi]) from three bond vectors.

    ``x1 = p1-p0``, ``x2 = p2-p1``, ``x3 = p3-p2`` with shapes ``(*, 3)``.
    """
    x1 = -x1
    x2 = x2 / jnp.linalg.norm(x2, axis=-1, keepdims=True)
    v = x1 - batchwise_dot(x1, x2, keepdim=True) * x2
    w = x3 - batchwise_dot(x3, x2, keepdim=True) * x2
    x = batchwise_dot(v, w)
    y = batchwise_dot(jnp.cross(x2, v), w)
    return jnp.arctan2(y, x)


def rotation_matrix_3d(angles, directions):
    """Rodrigues rotation matrices: rotate by ``angles`` about ``directions``.

    ``angles``: (batch,), ``directions``: (batch, 3) or (3,). Returns
    (batch, 3, 3).
    """
    angles = jnp.asarray(angles)
    directions = jnp.asarray(directions)
    if directions.ndim < 2:
        directions = jnp.broadcast_to(directions[None], (angles.shape[0], 3))
    sina = jnp.sin(angles)
    cosa = jnp.cos(angles)
    norms = jnp.linalg.norm(directions, axis=-1, keepdims=True)
    k = directions / jnp.where(norms > 0, norms, 1.0)

    eye = jnp.eye(3, dtype=angles.dtype)
    R = cosa[:, None, None] * eye[None]
    R = R + (1 - cosa)[:, None, None] * batchwise_outer(k, k)
    sk = sina[:, None] * k
    zeros = jnp.zeros_like(angles)
    cross = jnp.stack([
        jnp.stack([zeros, -sk[:, 2], sk[:, 1]], axis=-1),
        jnp.stack([sk[:, 2], zeros, -sk[:, 0]], axis=-1),
        jnp.stack([-sk[:, 1], sk[:, 0], zeros], axis=-1),
    ], axis=-2)
    return R + cross


def batchwise_rotate(x, rotation_matrices, inverse: bool = False):
    """Rotate (batch, n_vectors, 3) points by per-sample (batch, 3, 3) matrices."""
    if inverse:
        return jnp.einsum('bij,bkj->bik', x, rotation_matrices.transpose(0, 2, 1))
    return jnp.einsum('bij,bkj->bik', x, rotation_matrices)


_AXIS_NAME_TO_VECTOR = {
    'x': (1.0, 0.0, 0.0),
    'y': (0.0, 1.0, 0.0),
    'z': (0.0, 0.0, 1.0),
}


def get_axis_from_name(name: str) -> jnp.ndarray:
    """Unit vector for an axis name ('x' | 'y' | 'z')."""
    return jnp.asarray(_AXIS_NAME_TO_VECTOR[name])


def reference_frame_rotation_matrix(
        axis_atom_positions, plane_atom_positions, axis, plane_axis,
        plane_normal: Optional[jnp.ndarray] = None,
        project_on_positive_axis: bool = False):
    """Rotation matrices fixing the frame: axis atom onto ``axis``, plane atom
    onto the ``axis``-``plane_axis`` plane.

    With ``project_on_positive_axis=False`` (default) the axis atom rotates to
    whichever half-axis is closer, keeping the map invertible. Reference:
    geometry.py:296-411.
    """
    axis = jnp.asarray(axis, dtype=axis_atom_positions.dtype)
    plane_axis = jnp.asarray(plane_axis, dtype=axis_atom_positions.dtype)
    if plane_normal is None:
        plane_normal = jnp.cross(axis, plane_axis)

    rotation_vectors = jnp.cross(axis_atom_positions, axis[None, :])
    # Degenerate case: axis atom already on the axis -> any perpendicular.
    is_parallel = jnp.all(
        jnp.isclose(rotation_vectors, 0.0), axis=1, keepdims=True)
    fallback = jnp.cross(plane_axis, axis)
    rotation_vectors = jnp.where(is_parallel, fallback[None, :],
                                 rotation_vectors)

    r1_angles = vector_vector_angle(axis_atom_positions, axis)
    if not project_on_positive_axis:
        r1_angles = r1_angles - jnp.pi * (r1_angles > jnp.pi / 2).astype(
            r1_angles.dtype)
    r1 = rotation_matrix_3d(r1_angles, rotation_vectors)

    plane_points = batchwise_rotate(plane_atom_positions[:, None], r1)[:, 0]
    plane_points = plane_points - axis[None, :] * batchwise_dot(
        plane_points, axis, keepdim=True)
    r2_angles = vector_plane_angle(plane_points, plane_normal)
    r2_sign = -jnp.sign(batchwise_dot(plane_points, plane_axis))
    r2 = rotation_matrix_3d(r2_sign * r2_angles, axis)

    return jnp.einsum('bij,bjk->bik', r2, r1)


def cartesian_to_polar(x, y, return_log_det_J: bool = False):
    """(x, y) -> (r, angle); log|det J| = -log r."""
    r = jnp.sqrt(x ** 2 + y ** 2)
    angle = jnp.arctan2(y, x)
    if return_log_det_J:
        return r, angle, -jnp.log(r)
    return r, angle


def polar_to_cartesian(r, angle, return_log_det_J: bool = False):
    """(r, angle) -> (x, y); log|det J| = log r."""
    x = r * jnp.cos(angle)
    y = r * jnp.sin(angle)
    if return_log_det_J:
        return x, y, jnp.log(r)
    return x, y
