"""Direct unit tests for utils.misc and utils.geometry (round 1 exercised
these only indirectly through the flows that use them)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfep_tpu.utils import geometry
from tfep_tpu.utils.math import batch_autograd_log_abs_det_J
from tfep_tpu.utils.misc import (
    atom_to_flattened, atom_to_flattened_indices, clear_directory,
    ensure_int_array, flattened_to_atom, remove_and_shift_sorted_indices,
    temporary_cd,
)

rng = np.random.default_rng(11)


# =============================================================================
# misc
# =============================================================================

def test_atom_flattened_roundtrip():
    positions = rng.normal(size=(4, 5, 3))
    flat = atom_to_flattened(positions)
    assert flat.shape == (4, 15)
    np.testing.assert_array_equal(flattened_to_atom(flat), positions)


def test_atom_to_flattened_indices():
    np.testing.assert_array_equal(
        atom_to_flattened_indices(np.asarray([1, 3])),
        [3, 4, 5, 9, 10, 11])
    # jnp input stays jnp.
    out = atom_to_flattened_indices(jnp.asarray([0]))
    assert isinstance(out, jnp.ndarray)
    np.testing.assert_array_equal(np.asarray(out), [0, 1, 2])


def test_ensure_int_array():
    assert ensure_int_array(None) is None
    np.testing.assert_array_equal(ensure_int_array(3), [3])
    np.testing.assert_array_equal(ensure_int_array([1.0, 2.0]), [1, 2])
    assert ensure_int_array([1])[0].dtype == np.int64


@pytest.mark.parametrize('indices,removed,expected', [
    # Elements removed by value, survivors shifted into the reduced space.
    ([0, 2, 4, 6], [2, 3], [0, 2, 4]),
    ([5, 6, 7], [0, 1, 2, 3, 4], [0, 1, 2]),
    ([0, 1, 2], [5, 6], [0, 1, 2]),   # removals after: no shift
    ([1, 2, 3], [1, 2, 3], []),       # everything removed
])
def test_remove_and_shift_sorted_indices(indices, removed, expected):
    out = remove_and_shift_sorted_indices(
        np.asarray(indices), np.asarray(removed))
    np.testing.assert_array_equal(out, expected)


def test_remove_and_shift_flags():
    indices = np.asarray([0, 2, 4])
    removed = np.asarray([2])
    # remove=False keeps removed values (shifted positions of survivors).
    out = remove_and_shift_sorted_indices(indices, removed, remove=False)
    assert 1 in out.tolist() or 2 in out.tolist()
    # shift=False only filters.
    out = remove_and_shift_sorted_indices(indices, removed, shift=False)
    np.testing.assert_array_equal(out, [0, 4])


def test_temporary_cd(tmp_path):
    start = os.getcwd()
    with temporary_cd(str(tmp_path)):
        assert os.path.realpath(os.getcwd()) == os.path.realpath(
            str(tmp_path))
    assert os.getcwd() == start
    with temporary_cd(None):
        assert os.getcwd() == start


def test_clear_directory(tmp_path):
    (tmp_path / 'f.txt').write_text('x')
    (tmp_path / 'sub').mkdir()
    (tmp_path / 'sub' / 'g.txt').write_text('y')
    os.symlink(str(tmp_path / 'sub'), str(tmp_path / 'link'))
    clear_directory(str(tmp_path))
    assert os.listdir(tmp_path) == []


# =============================================================================
# geometry
# =============================================================================

def test_pdist_values():
    x = jnp.asarray([[[0.0, 0, 0], [3.0, 0, 0], [0, 4.0, 0]]])
    distances = geometry.pdist(x)
    np.testing.assert_allclose(np.asarray(distances)[0], [3.0, 4.0, 5.0])
    sub, diff = geometry.pdist(x, pairs=jnp.asarray([[0], [2]]),
                               return_diff=True)
    np.testing.assert_allclose(np.asarray(sub)[0], [4.0])
    np.testing.assert_allclose(np.asarray(diff)[0, 0], [0.0, 4.0, 0.0])


def test_angles():
    x = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
    y = jnp.asarray([[0.0, 1, 0], [0, 1.0, 0]])
    angles = geometry.vector_vector_angle(x, y)
    np.testing.assert_allclose(np.asarray(angles), [np.pi / 2, 0.0],
                               atol=1e-7)
    # Angle to the z-normal plane: a vector in the plane -> 0.
    plane = jnp.asarray([0.0, 0, 1.0])
    in_plane = geometry.vector_plane_angle(jnp.asarray([[1.0, 2.0, 0.0]]),
                                           plane)
    np.testing.assert_allclose(np.asarray(in_plane), [0.0], atol=1e-7)


def test_proper_dihedral():
    # Trans (180 deg) and 90 deg configurations, IUPAC bond vectors
    # b1 = p1-p0, b2 = p2-p1, b3 = p3-p2.
    p = jnp.asarray([
        [[0.0, 1, 0], [0, 0, 0], [1, 0, 0], [1, -1, 0]],
        [[0.0, 1, 0], [0, 0, 0], [1, 0, 0], [1, 0, 1]],
    ])
    b1 = p[:, 1] - p[:, 0]
    b2 = p[:, 2] - p[:, 1]
    b3 = p[:, 3] - p[:, 2]
    dihedrals = geometry.proper_dihedral_angle(b1, b2, b3)
    np.testing.assert_allclose(np.abs(np.asarray(dihedrals)),
                               [np.pi, np.pi / 2], atol=1e-6)


def test_rotation_matrix_properties():
    angles = jnp.asarray(rng.uniform(-np.pi, np.pi, 5))
    directions = jnp.asarray(rng.normal(size=(5, 3)))
    matrices = geometry.rotation_matrix_3d(angles, directions)
    identity = jnp.einsum('bij,bkj->bik', matrices, matrices)
    np.testing.assert_allclose(np.asarray(identity),
                               np.tile(np.eye(3), (5, 1, 1)), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(np.asarray(matrices)), 1.0,
                               atol=1e-12)
    # Rotation about the axis keeps the axis fixed.
    rotated = geometry.batchwise_rotate(directions[:, None], matrices)[:, 0]
    np.testing.assert_allclose(np.asarray(rotated), np.asarray(directions),
                               atol=1e-10)


def test_batchwise_rotate_inverse():
    angles = jnp.asarray(rng.uniform(-np.pi, np.pi, 3))
    directions = jnp.asarray(rng.normal(size=(3, 3)))
    matrices = geometry.rotation_matrix_3d(angles, directions)
    x = jnp.asarray(rng.normal(size=(3, 7, 3)))
    y = geometry.batchwise_rotate(x, matrices)
    back = geometry.batchwise_rotate(y, matrices, inverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-12)


@pytest.mark.parametrize('project_positive', [False, True])
def test_reference_frame_rotation(project_positive):
    """The frame-fixing rotation puts the axis atom on x and the plane atom
    in the xy-plane with positive y."""
    axis_atoms = jnp.asarray(rng.normal(size=(6, 3)))
    plane_atoms = jnp.asarray(rng.normal(size=(6, 3)))
    matrices = geometry.reference_frame_rotation_matrix(
        axis_atoms, plane_atoms, geometry.get_axis_from_name('x'),
        geometry.get_axis_from_name('y'),
        project_on_positive_axis=project_positive)

    rotated_axis = geometry.batchwise_rotate(axis_atoms[:, None],
                                             matrices)[:, 0]
    rotated_plane = geometry.batchwise_rotate(plane_atoms[:, None],
                                              matrices)[:, 0]
    np.testing.assert_allclose(np.asarray(rotated_axis[:, 1:]), 0.0,
                               atol=1e-8)
    if project_positive:
        assert np.all(np.asarray(rotated_axis[:, 0]) > 0)
    # Plane atom lands in the xy-plane; its y hemisphere is preserved (not
    # forced positive) so the map stays invertible without a flip seam.
    np.testing.assert_allclose(np.asarray(rotated_plane[:, 2]), 0.0,
                               atol=1e-8)
    # Distances preserved.
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rotated_axis), axis=1),
                               np.linalg.norm(np.asarray(axis_atoms), axis=1),
                               atol=1e-10)


def test_polar_log_det_vs_autograd():
    """Polar map log-dets match the brute-force autograd oracle."""
    xy = jnp.asarray(rng.normal(size=(16, 2)) + 2.0)

    def fwd(v):
        r, angle, ldj = geometry.cartesian_to_polar(
            v[:, 0], v[:, 1], return_log_det_J=True)
        return jnp.stack([r, angle], axis=-1), ldj

    out, ldj = fwd(xy)
    oracle = batch_autograd_log_abs_det_J(lambda v: fwd(v)[0], xy)
    np.testing.assert_allclose(np.asarray(ldj), np.asarray(oracle),
                               atol=1e-8)

    # Inverse round-trip and opposite log-det.
    x, y, ldj_inv = geometry.polar_to_cartesian(
        out[:, 0], out[:, 1], return_log_det_J=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(xy[:, 0]),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(ldj + ldj_inv), 0.0, atol=1e-10)


# =============================================================================
# Math helpers (cf. reference tests/utils/test_math.py)
# =============================================================================

def test_batchwise_dot_outer():
    from tfep_tpu.utils.math import batchwise_dot, batchwise_outer

    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 3))
    y = rng.normal(size=(4, 3))
    np.testing.assert_allclose(
        np.asarray(batchwise_dot(jnp.asarray(x), jnp.asarray(y))),
        np.einsum('bi,bi->b', x, y), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(batchwise_dot(jnp.asarray(x), jnp.asarray(y),
                                 keepdim=True)),
        np.einsum('bi,bi->b', x, y)[:, None], atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(batchwise_outer(jnp.asarray(x), jnp.asarray(y))),
        np.einsum('bi,bj->bij', x, y), atol=1e-12)


def test_cov_matches_numpy():
    from tfep_tpu.utils.math import cov

    rng = np.random.default_rng(1)
    x = rng.normal(size=(50, 4))
    np.testing.assert_allclose(np.asarray(cov(jnp.asarray(x))),
                               np.cov(x.T), atol=1e-10)
    # Sample axis last (dim_sample=1) == numpy's default row-variable layout.
    np.testing.assert_allclose(
        np.asarray(cov(jnp.asarray(x.T), dim_sample=1)),
        np.cov(x.T), atol=1e-10)
    # Biased estimator.
    np.testing.assert_allclose(np.asarray(cov(jnp.asarray(x), ddof=0)),
                               np.cov(x.T, ddof=0), atol=1e-10)


def test_vector_plane_angle_axes():
    from tfep_tpu.utils.geometry import vector_plane_angle

    plane = jnp.asarray([0.0, 0.0, 1.0])  # xy-plane (normal = z)
    # A vector in the plane has angle 0; parallel to the normal, pi/2.
    v = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 2.0],
                     [0.0, 1.0, 1.0]])
    angles = np.asarray(vector_plane_angle(v, plane))
    np.testing.assert_allclose(angles, [0.0, np.pi / 2, np.pi / 4],
                               atol=1e-12)


def test_get_axis_from_name():
    from tfep_tpu.utils.geometry import get_axis_from_name

    np.testing.assert_array_equal(np.asarray(get_axis_from_name('x')),
                                  [1.0, 0.0, 0.0])
    np.testing.assert_array_equal(np.asarray(get_axis_from_name('y')),
                                  [0.0, 1.0, 0.0])
    np.testing.assert_array_equal(np.asarray(get_axis_from_name('z')),
                                  [0.0, 0.0, 1.0])


def test_energies_forces_array_to_numpy():
    from tfep_tpu.units import ureg
    from tfep_tpu.utils.misc import (
        energies_array_to_numpy, forces_array_to_numpy,
    )

    energies = np.array([1.0, 2.0]) * ureg.hartree
    out = energies_array_to_numpy(energies, energy_unit=ureg.hartree)
    np.testing.assert_allclose(out, [1.0, 2.0])

    forces = np.ones((2, 3, 3)) * ureg.hartree / ureg.bohr
    out = forces_array_to_numpy(forces, distance_unit=ureg.bohr,
                                energy_unit=ureg.hartree)
    assert out.shape == (2, 9)
    np.testing.assert_allclose(out, 1.0)

    with pytest.raises(ValueError, match='Both or neither'):
        forces_array_to_numpy(forces, energy_unit=ureg.hartree)


def test_units_division_idioms():
    """ndarray / unit and scalar-or-array / Quantity produce inverse-unit
    Quantities (symmetric with the multiplication idiom)."""
    from tfep_tpu.units import Quantity, ureg

    arr = np.array([2.0, 4.0])
    q = arr / ureg.nanometer
    assert isinstance(q, Quantity)
    np.testing.assert_allclose(
        q.to(1.0 / ureg.angstrom).magnitude, arr / 10.0)

    t = Quantity(np.array([2.0, 4.0]), ureg.picosecond)
    inv = 1.0 / t
    assert isinstance(inv, Quantity)
    np.testing.assert_allclose(inv.magnitude, [0.5, 0.25])
    np.testing.assert_allclose(
        inv.to(1.0 / ureg.femtosecond).magnitude, [0.0005, 0.00025])

    inv_arr = np.array([1.0, 2.0]) / t
    assert isinstance(inv_arr, Quantity)
    np.testing.assert_allclose(inv_arr.magnitude, [0.5, 0.5])
