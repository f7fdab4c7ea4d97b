"""Cartesian <-> internal (Z-matrix) coordinates with exact log-det.

Native replacement for bgflow's ``RelativeInternalCoordinateTransformation``
(used by the reference at /root/reference/tfep/app/mixedmaf.py:1000-1028).
Each Z-matrix row ``[i, j, k, l]`` describes atom ``i`` by its bond length
to ``j``, the angle i-j-k, and the proper dihedral i-j-k-l, where the
reference atoms are either Cartesian-represented atoms or earlier Z-matrix
atoms.

TPU mapping: the measurement direction (Cartesian -> IC) is fully
vectorized gathers + trigonometry; the reconstruction direction is a
NeRF-style placement rolled as a ``lax.scan`` over Z-matrix rows (each atom
may depend on previously placed ones), with per-row indices fed as scan
inputs so the compiled program is O(1) in molecule size.

The per-row volume element is ``r^2 sin(theta)``, so
``log|det d(ic)/d(cart)| = sum_rows [-2 log r - log sin(theta)]`` plus the
normalization factors: with ``normalize_angles=True`` angles map to
``theta/pi`` and torsions to ``(phi+pi)/(2 pi)``, contributing
``-log(pi) - log(2 pi)`` per row.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tfep_tpu.utils.geometry import (
    proper_dihedral_angle, vector_vector_angle,
)

__all__ = [
    'cartesian_to_internal', 'internal_to_cartesian',
    'normalize_angles_fn', 'unnormalize_angles_fn',
    'normalize_torsions_fn', 'unnormalize_torsions_fn',
]


# =============================================================================
# Angle normalization (bgflow-compatible conventions)
# =============================================================================

def normalize_angles_fn(angles):
    """[0, pi] -> [0, 1]; per-element log-det = -log(pi)."""
    ldj = -np.log(np.pi) * angles.shape[-1]
    return angles / jnp.pi, jnp.full(angles.shape[:-1], ldj,
                                     dtype=angles.dtype)


def unnormalize_angles_fn(angles):
    ldj = np.log(np.pi) * angles.shape[-1]
    return angles * jnp.pi, jnp.full(angles.shape[:-1], ldj,
                                     dtype=angles.dtype)


def normalize_torsions_fn(torsions):
    """(-pi, pi] -> [0, 1]; per-element log-det = -log(2 pi)."""
    ldj = -np.log(2 * np.pi) * torsions.shape[-1]
    return (torsions + jnp.pi) / (2 * jnp.pi), jnp.full(
        torsions.shape[:-1], ldj, dtype=torsions.dtype)


def unnormalize_torsions_fn(torsions):
    ldj = np.log(2 * np.pi) * torsions.shape[-1]
    return torsions * (2 * jnp.pi) - jnp.pi, jnp.full(
        torsions.shape[:-1], ldj, dtype=torsions.dtype)


# =============================================================================
# Measurement: Cartesian -> internal
# =============================================================================

def cartesian_to_internal(x_atoms: jnp.ndarray, z_matrix: np.ndarray,
                          normalize_angles: bool = True):
    """Measure bonds/angles/torsions for every Z-matrix row.

    Parameters
    ----------
    x_atoms : (batch, n_atoms, 3)
        All atom positions (Cartesian + IC atoms, original indexing).
    z_matrix : (n_ic, 4) int array
        Rows ``[i, j, k, l]``.
    normalize_angles : bool
        Normalize angles/torsions to [0, 1] (bgflow ``normalize_angles``).

    Returns
    -------
    bonds, angles, torsions : (batch, n_ic)
    log_det_J : (batch,)
        log|det| of the (cart -> ic) map restricted to the IC atoms' DOFs.
    """
    z = jnp.asarray(z_matrix)
    p_i = x_atoms[:, z[:, 0]]
    p_j = x_atoms[:, z[:, 1]]
    p_k = x_atoms[:, z[:, 2]]
    p_l = x_atoms[:, z[:, 3]]

    v_ij = p_i - p_j
    bonds = jnp.linalg.norm(v_ij, axis=-1)
    angles = vector_vector_angle(v_ij, p_k - p_j)
    # Dihedral i-j-k-l: x1 = p_j - p_i, x2 = p_k - p_j, x3 = p_l - p_k.
    torsions = proper_dihedral_angle(p_j - p_i, p_k - p_j, p_l - p_k)

    log_det_J = jnp.sum(-2.0 * jnp.log(bonds) - jnp.log(jnp.sin(angles)),
                        axis=-1)

    if normalize_angles:
        angles, ldj_a = normalize_angles_fn(angles)
        torsions, ldj_t = normalize_torsions_fn(torsions)
        log_det_J = log_det_J + ldj_a + ldj_t

    return bonds, angles, torsions, log_det_J


# =============================================================================
# Reconstruction: internal -> Cartesian (NeRF placement via lax.scan)
# =============================================================================

def _place_atom(p_j, p_k, p_l, r, theta, phi):
    """NeRF placement of one atom from its three reference positions.

    Chosen so that measuring (bond, angle, dihedral) of the placed atom with
    :func:`cartesian_to_internal` conventions recovers (r, theta, phi).
    """
    # Frame at p_j: e1 along (j->towards i axis base), built from j-k-l.
    v_jk = p_k - p_j
    v_kl = p_l - p_k

    e1 = v_jk / jnp.linalg.norm(v_jk, axis=-1, keepdims=True)
    n = jnp.cross(v_kl, v_jk)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    m = jnp.cross(n, e1)

    # Local displacement: angle theta from the j->k direction, dihedral phi
    # about it. The -cos(phi) makes the measured proper dihedral (with the
    # i-j-k-l sign convention of ``proper_dihedral_angle``) equal phi.
    d = (r[..., None]
         * (jnp.cos(theta)[..., None] * e1
            + jnp.sin(theta)[..., None] * (-jnp.cos(phi)[..., None] * m
                                           + jnp.sin(phi)[..., None] * n)))
    return p_j + d


def internal_to_cartesian(bonds: jnp.ndarray, angles: jnp.ndarray,
                          torsions: jnp.ndarray,
                          positions_init: jnp.ndarray,
                          z_matrix: np.ndarray,
                          normalize_angles: bool = True):
    """Reconstruct IC atom positions given the Cartesian reference atoms.

    Parameters
    ----------
    bonds, angles, torsions : (batch, n_ic)
        In the same (possibly normalized) convention as
        :func:`cartesian_to_internal`.
    positions_init : (batch, n_atoms, 3)
        Full positions array with the Cartesian atoms' rows filled in
        (IC atoms' rows are ignored/overwritten).
    z_matrix : (n_ic, 4)

    Returns
    -------
    positions : (batch, n_atoms, 3)
    log_det_J : (batch,)
    """
    z = jnp.asarray(z_matrix)
    batch = bonds.shape[0]
    dtype = positions_init.dtype

    log_det_J = jnp.zeros(batch, dtype=dtype)
    if normalize_angles:
        angles, ldj_a = unnormalize_angles_fn(angles)
        torsions, ldj_t = unnormalize_torsions_fn(torsions)
        log_det_J = log_det_J + ldj_a + ldj_t

    # Volume element of (r, theta, phi) -> (x, y, z): r^2 sin(theta).
    log_det_J = log_det_J + jnp.sum(
        2.0 * jnp.log(bonds) + jnp.log(jnp.sin(angles)), axis=-1)

    def body(positions, row):
        idx_i, idx_j, idx_k, idx_l, r, theta, phi = row
        idx_i = idx_i.astype(jnp.int32)
        p_j = positions[:, idx_j.astype(jnp.int32)]
        p_k = positions[:, idx_k.astype(jnp.int32)]
        p_l = positions[:, idx_l.astype(jnp.int32)]
        p_i = _place_atom(p_j, p_k, p_l, r, theta, phi)
        positions = positions.at[:, idx_i].set(p_i)
        return positions, None

    rows = (z[:, 0].astype(dtype), z[:, 1].astype(dtype),
            z[:, 2].astype(dtype), z[:, 3].astype(dtype),
            bonds.T, angles.T, torsions.T)

    positions, _ = jax.lax.scan(
        lambda pos, xs: body(pos, xs), positions_init, rows)
    return positions, log_det_J
