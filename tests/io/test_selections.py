"""Selection-grammar tests, focused on the geometric keywords.

The reference accepts full MDAnalysis selection strings
(/root/reference/tfep/app/base.py:906-944); the canonical solvated-system
workflow partitions atoms with distance selections ("solvent within X A of
the ligand"). These tests pin the PBC-aware semantics of this framework's
counterparts: around / within..of / sphzone / point / byres.
"""

import numpy as np
import pytest

from tfep_tpu.io.topology import Topology, _min_image_distances
from tfep_tpu.io.traj import System


def _solvated_system():
    """A 10 A cubic box: 3-atom LIG near the +x face, 3 waters.

    Water W1 sits across the periodic boundary (0.4 A in x), 1.1 A from
    the ligand through the wall but 8.9 A away in open space. W2 is in the
    middle of the box, W3 is adjacent to the ligand on the inside.
    """
    names = ['C1', 'C2', 'O1',
             'OW', 'HW1', 'HW2',
             'OW', 'HW1', 'HW2',
             'OW', 'HW1', 'HW2']
    resnames = ['LIG'] * 3 + ['SOL'] * 9
    resids = [1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4]
    positions = np.array([
        [9.5, 5.0, 5.0], [9.0, 5.5, 5.0], [9.0, 4.5, 5.0],   # LIG
        [0.4, 5.0, 5.0], [0.9, 5.3, 5.0], [0.9, 4.7, 5.0],   # W1 (PBC)
        [5.0, 5.0, 5.0], [5.5, 5.3, 5.0], [5.5, 4.7, 5.0],   # W2 (far)
        [8.0, 5.0, 5.0], [7.5, 5.3, 5.0], [7.5, 4.7, 5.0],   # W3 (near)
    ])
    dimensions = np.array([[10.0, 10.0, 10.0, 90.0, 90.0, 90.0]])
    topology = Topology(names=names, resnames=resnames, resids=resids)
    return System(topology, positions[None], dimensions=dimensions)


def test_around_is_periodic():
    system = _solvated_system()
    # W1's O is 0.9 A from LIG C1 through the boundary; naive distance 9.1.
    got = system.select_atoms('resname SOL and around 1.0 resname LIG')
    np.testing.assert_array_equal(got, [3])
    # Without the box the same selection finds nothing (W1 appears 9.1 A
    # away and W3's O is 1.12 A from C2 — outside 1.0).
    no_box = System(system.topology, np.asarray(system.positions))
    got = no_box.select_atoms('resname SOL and around 1.0 resname LIG')
    assert len(got) == 0


def test_around_excludes_reference_within_includes_it():
    system = _solvated_system()
    around = system.select_atoms('around 2.0 resname LIG')
    assert not set(around) & {0, 1, 2}          # MDAnalysis semantics
    within = system.select_atoms('within 2.0 of resname LIG')
    assert set(within) >= {0, 1, 2}             # VMD semantics
    np.testing.assert_array_equal(
        np.sort(np.concatenate([around, [0, 1, 2]])), within)


def test_byres_expands_to_whole_molecules():
    system = _solvated_system()
    # Only W1's O is within 1.0 A, but the flow needs whole waters.
    got = system.select_atoms('byres (resname SOL and around 1.0 resname LIG)')
    np.testing.assert_array_equal(got, [3, 4, 5])


def test_sphzone_and_point():
    system = _solvated_system()
    got = system.select_atoms('sphzone 1.2 resname LIG')
    # Center of LIG geometry is (9.167, 5, 5): all LIG atoms within 1.2 A.
    assert set(got) >= {0, 1, 2}
    np.testing.assert_array_equal(
        system.select_atoms('point 5.0 5.0 5.0 0.4'), [6])
    # point is periodic too: a point just inside the -x face picks up
    # W1's O (0.05 A away) but not LIG C1 (0.95 A through the wall).
    got = system.select_atoms('point 0.45 5.0 5.0 0.3')
    np.testing.assert_array_equal(got, [3])


def test_sphzone_empty_reference_matches_nothing():
    system = _solvated_system()
    # An empty inner selection has no center of geometry: match the
    # around/within semantics (empty result), without a NaN-mean warning.
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        got = system.select_atoms('sphzone 5.0 resname TYPO')
    assert len(got) == 0


def test_single_frame_1d_dimensions_normalized():
    base = _solvated_system()
    # The single-frame (6,) spelling of dimensions must behave like (1, 6).
    system = System(base.topology, np.asarray(base.positions),
                    dimensions=np.array([10.0, 10, 10, 90, 90, 90]))
    assert system.dimensions.shape == (1, 6)
    got = system.select_atoms('resname SOL and around 1.0 resname LIG')
    np.testing.assert_array_equal(got, [3])   # periodic: box was applied


def test_plain_selections_do_not_decode_frames():
    base = _solvated_system()

    class _NoTouchStore:
        """Lazy-store stand-in that forbids any frame decode."""
        def __init__(self, arr):
            self.shape = arr.shape
        def _load_frames(self, indices):
            raise AssertionError('frame decode')
        def __getitem__(self, idx):
            raise AssertionError('frame decode')

    system = System(base.topology, _NoTouchStore(np.asarray(base.positions)),
                    dimensions=base.dimensions)
    # Attribute-only selections must not force a decode on a lazy store...
    assert len(system.select_atoms('resname SOL and not name OW')) == 6
    # ...while geometric ones do read the frame.
    with pytest.raises(AssertionError, match='frame decode'):
        system.select_atoms('resname SOL and around 1.0 resname LIG')


def test_geometric_selection_requires_coordinates():
    topology = _solvated_system().topology
    with pytest.raises(ValueError, match='coordinates'):
        topology.select_atoms('around 5.0 resname LIG')
    # Non-geometric selections still work without positions.
    assert len(topology.select_atoms('resname SOL')) == 9


def test_geometric_selection_parse_errors():
    system = _solvated_system()
    with pytest.raises(ValueError, match="'around' expects a number"):
        system.select_atoms('around LIG resname SOL')
    with pytest.raises(ValueError, match="Expected 'of'"):
        system.select_atoms('within 5.0 resname LIG')


def test_selection_uses_chosen_frame():
    system = _solvated_system()
    pos0 = np.asarray(system.positions[0])
    pos1 = pos0.copy()
    pos1[6] = [9.0, 6.0, 5.0]   # W2's O moves next to the ligand
    two_frames = System(system.topology, np.stack([pos0, pos1]),
                        dimensions=np.tile(system.dimensions, (2, 1)))
    sel = 'resname SOL and around 1.0 resname LIG'
    np.testing.assert_array_equal(two_frames.select_atoms(sel, frame=0), [3])
    np.testing.assert_array_equal(
        two_frames.select_atoms(sel, frame=1), [3, 6])


def test_min_image_distances_triclinic():
    # A 60-degree monoclinic cell: the shortest image of a point near the
    # far corner goes through the slanted boundary.
    dims = np.array([10.0, 10.0, 10.0, 90.0, 90.0, 60.0])
    from tfep_tpu.io.traj import dimensions_to_box_vectors
    cell = dimensions_to_box_vectors(dims)
    ref = np.array([[0.5, 0.5, 0.5]])
    # The same point displaced by exact lattice vectors must be at ~0.
    for shift in ([1, 0, 0], [0, 1, 0], [1, 1, 1], [-1, 2, 0]):
        point = ref + np.asarray(shift, dtype=float) @ cell
        dist = _min_image_distances(point, ref, dims)
        np.testing.assert_allclose(dist, 0.0, atol=1e-9)
    # And a genuinely distant point stays distant.
    far = ref + 0.5 * (cell[0] + cell[1])
    assert _min_image_distances(far, ref, dims)[0] > 3.0


def test_min_image_matches_brute_force_triclinic():
    rng = np.random.default_rng(11)
    dims = np.array([9.0, 10.0, 11.0, 80.0, 95.0, 110.0])
    from tfep_tpu.io.traj import dimensions_to_box_vectors
    cell = dimensions_to_box_vectors(dims)
    points = rng.uniform(-5, 15, (30, 3))
    ref = rng.uniform(-5, 15, (5, 3))
    got = _min_image_distances(points, ref, dims)
    shifts = np.array([[i, j, k] for i in range(-2, 3)
                       for j in range(-2, 3)
                       for k in range(-2, 3)], dtype=float) @ cell
    brute = np.min(np.linalg.norm(
        points[:, None, None, :] - (ref[None, :, None, :] + shifts),
        axis=-1), axis=(1, 2))
    np.testing.assert_allclose(got, brute, atol=1e-9)


def test_min_image_matches_brute_force_orthorhombic():
    rng = np.random.default_rng(3)
    dims = np.array([8.0, 11.0, 9.0, 90.0, 90.0, 90.0])
    points = rng.uniform(0, 12, (40, 3))
    ref = rng.uniform(0, 12, (7, 3))
    got = _min_image_distances(points, ref, dims)
    shifts = np.array([[i, j, k] for i in (-2, -1, 0, 1, 2)
                       for j in (-2, -1, 0, 1, 2)
                       for k in (-2, -1, 0, 1, 2)]) * dims[:3]
    brute = np.min(np.linalg.norm(
        points[:, None, None, :] - (ref[None, :, None, :] + shifts),
        axis=-1), axis=(1, 2))
    np.testing.assert_allclose(got, brute, atol=1e-9)
