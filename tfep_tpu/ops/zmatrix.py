"""Cartesian <-> internal (Z-matrix) coordinates with exact log-det.

Native replacement for bgflow's ``RelativeInternalCoordinateTransformation``
(used by the reference at /root/reference/tfep/app/mixedmaf.py:1000-1028).
Each Z-matrix row ``[i, j, k, l]`` describes atom ``i`` by its bond length
to ``j``, the angle i-j-k, and the proper dihedral i-j-k-l, where the
reference atoms are either Cartesian-represented atoms or earlier Z-matrix
atoms.

TPU mapping: the measurement direction (Cartesian -> IC) is fully
vectorized gathers + trigonometry; the reconstruction direction is a
NeRF-style placement scheduled by *dependency level*: rows whose reference
atoms are all already placed are grouped host-side and placed together,
so the ``lax.scan`` runs over levels (the depth of the placement DAG), not
over rows. A solvated system with thousands of independent solvent
molecules reconstructs in ~3 sequential steps instead of ~3N; a linear
chain grown outward from its center halves its sequential depth. The
compiled program stays O(1) in molecule size (indices are scan inputs).

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

#: Placement schedules at most this deep are unrolled into straight-line
#: code instead of a ``lax.scan`` (faster backward; bounded compile time).
_UNROLL_MAX_LEVELS = 128


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


def build_placement_schedule(z_matrix: np.ndarray, n_atoms: int):
    """Precompute the level-scheduled placement plan (host side).

    Returns ``(targets, refs, cols)``: for each dependency level, the atom
    index each slot writes (``n_atoms`` for padded slots, dropped by the
    scatter), the three reference-atom indices, and the Z-matrix column the
    slot's (bond, angle, torsion) live in. Must be built while the
    Z-matrix is concrete (flow construction) — under jit the Z-matrix
    buffer is traced and the row grouping cannot be derived.
    """
    z = np.asarray(z_matrix)
    schedule = _level_schedule(z)
    padded = schedule < 0
    safe_rows = np.where(padded, 0, schedule)
    # Padded slots write out of bounds (dropped); distinct OOB indices keep
    # every level's target list duplicate-free so the scatter can assert
    # unique_indices.
    oob = n_atoms + np.cumsum(padded, axis=1) - 1
    targets = np.where(padded, np.maximum(oob, n_atoms), z[safe_rows][..., 0])
    refs = z[safe_rows][..., 1:]
    return (jnp.asarray(targets), jnp.asarray(refs),
            jnp.asarray(safe_rows))


def internal_to_cartesian(bonds: jnp.ndarray, angles: jnp.ndarray,
                          torsions: jnp.ndarray,
                          positions_init: jnp.ndarray,
                          z_matrix: np.ndarray,
                          normalize_angles: bool = True,
                          schedule=None):
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

    # Level schedule: all rows of one level place concurrently. Padded
    # slots write out of bounds and are dropped by the scatter. The
    # schedule is host-side control flow, so a traced z_matrix cannot be
    # scheduled here — pass a precomputed ``schedule`` in that case (as
    # CartesianToMixedFlow does at construction).
    if schedule is None:
        if isinstance(z_matrix, jax.core.Tracer):
            raise ValueError(
                'internal_to_cartesian received a traced z_matrix without '
                'a precomputed schedule. The placement schedule is built '
                'from the Z-matrix host-side; call build_placement_schedule '
                'on the concrete Z-matrix outside jit and pass schedule=.')
        schedule = build_placement_schedule(np.asarray(z_matrix),
                                            positions_init.shape[1])
    level_targets, level_refs, level_cols = schedule

    def body(positions, xs):
        targets, refs, cols = xs
        p_j = positions[:, refs[:, 0]]                       # (batch, W, 3)
        p_k = positions[:, refs[:, 1]]
        p_l = positions[:, refs[:, 2]]
        p_i = _place_atom(p_j, p_k, p_l, bonds[:, cols], angles[:, cols],
                          torsions[:, cols])
        positions = positions.at[:, targets].set(
            p_i, mode='drop', unique_indices=True)
        return positions, None

    n_levels = level_targets.shape[0]
    if n_levels <= _UNROLL_MAX_LEVELS:
        # Unrolled placement: reverse-mode AD through lax.scan stacks a
        # per-level residual pytree and replays the loop machinery, which
        # dominates the backward at chain-like depths (measured 2.3 ms ->
        # 1.6 ms fwd+bwd for a 29-level chain at batch 4096 on v5e). The
        # level count is a static shape, so a Python loop is jit-safe.
        positions = positions_init
        for level in range(n_levels):
            positions, _ = body(positions, (level_targets[level],
                                            level_refs[level],
                                            level_cols[level]))
        return positions, log_det_J

    positions, _ = jax.lax.scan(
        body, positions_init, (level_targets, level_refs, level_cols))
    return positions, log_det_J


def _level_schedule(z_matrix: np.ndarray) -> np.ndarray:
    """Group Z-matrix rows by placement-dependency level (host side).

    A row's level is one more than the deepest of its reference atoms
    (Cartesian references have level 0). Returns an (n_levels, width)
    array of row indices, padded with -1.

    Raises
    ------
    ValueError
        If a row references an atom that a *later* row places (rows must
        be in dependency order) — otherwise the reconstruction would read
        an uninitialized position and return garbage silently.
    """
    z = np.asarray(z_matrix)
    if len(z) == 0:
        return np.zeros((0, 0), dtype=np.int64)
    placed_by_row = {int(row[0]): row_idx for row_idx, row in enumerate(z)}
    atom_level: dict = {}
    row_level = np.zeros(len(z), dtype=np.int64)
    for row_idx, (i, j, k, l) in enumerate(z):
        for ref in (int(j), int(k), int(l)):
            if placed_by_row.get(ref, -1) >= row_idx:
                raise ValueError(
                    f'Z-matrix row {row_idx} (atom {int(i)}) references '
                    f'atom {ref}, which is placed by the later row '
                    f'{placed_by_row[ref]}; rows must be in dependency '
                    'order (references are Cartesian atoms or earlier '
                    'rows).')
        level = 1 + max(atom_level.get(int(j), 0), atom_level.get(int(k), 0),
                        atom_level.get(int(l), 0))
        atom_level[int(i)] = level
        row_level[row_idx] = level

    groups = [np.nonzero(row_level == level)[0]
              for level in range(1, int(row_level.max()) + 1)]
    width = max(len(g) for g in groups)
    schedule = np.full((len(groups), width), -1, dtype=np.int64)
    for level_idx, group in enumerate(groups):
        schedule[level_idx, :len(group)] = group
    return schedule
