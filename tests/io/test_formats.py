"""Trajectory-format tests: XTC/TRR codecs, lazy frame stores, prmtop and
GROMACS .top topologies, triclinic boxes, and a MixedMAFMap training run
fed from an XTC + prmtop pair (the reference covers these formats through
MDAnalysis; here they are native).
"""

import numpy as np
import pytest

from tfep_tpu.io.frames import (
    TrrFrameStore, XtcFrameStore, open_frame_store,
)
from tfep_tpu.io.native import native_available
from tfep_tpu.io.topfiles import guess_bonds, read_gromacs_top, read_prmtop
from tfep_tpu.io.topology import Topology
from tfep_tpu.io.traj import (
    System, box_vectors_to_dimensions, dimensions_to_box_vectors, read_gro,
)
from tfep_tpu.io.xdr import read_trr, read_xtc, write_trr, write_xtc

rng = np.random.default_rng(7)


def clustered_traj(n_frames=4, n_mol=20, atoms_per_mol=3):
    """Clustered coordinates (like waters) exercise the XTC run-length path."""
    centers = rng.uniform(0, 4.0, (n_frames, n_mol, 1, 3))
    local = rng.normal(0, 0.05, (n_frames, n_mol, atoms_per_mol, 3))
    return (centers + local).reshape(n_frames, n_mol * atoms_per_mol, 3)


# =============================================================================
# XTC / TRR codecs
# =============================================================================

@pytest.mark.parametrize('n_mol', [1, 2, 20])
def test_xtc_roundtrip(tmp_path, n_mol):
    pos = clustered_traj(n_mol=n_mol)
    boxes = np.tile(np.diag([4.0, 4.0, 4.0]), (4, 1, 1))
    times = np.arange(4) * 0.002
    path = str(tmp_path / 't.xtc')
    write_xtc(path, pos, boxes, times, precision=1000.0)
    rpos, rbox, rtimes = read_xtc(path)
    # Quantization error bounded by half a precision unit.
    assert np.abs(rpos - pos).max() <= 0.5 / 1000.0 + 1e-6
    np.testing.assert_allclose(rbox, boxes, atol=1e-6)
    np.testing.assert_allclose(rtimes, times, atol=1e-6)


def test_xtc_wide_coordinate_range(tmp_path):
    """Axes spanning >2^24 quantization units use per-axis bit widths."""
    pos = rng.uniform(-9000, 9000, (2, 20, 3))
    path = str(tmp_path / 't.xtc')
    write_xtc(path, pos, precision=1000.0)
    rpos, _, _ = read_xtc(path)
    assert np.abs(rpos - pos).max() <= 0.5 / 1000.0 + 1e-3


@pytest.mark.parametrize('double', [False, True])
def test_trr_roundtrip(tmp_path, double):
    pos = clustered_traj(n_mol=4)
    boxes = np.tile(np.diag([4.0, 4.0, 4.0]), (4, 1, 1))
    path = str(tmp_path / 't.trr')
    write_trr(path, pos, boxes, velocities_nm_ps=np.zeros_like(pos),
              double=double)
    rpos, rbox, _ = read_trr(path)
    np.testing.assert_allclose(rpos, pos, atol=1e-12 if double else 1e-5)
    np.testing.assert_allclose(rbox, boxes, atol=1e-6)


@pytest.mark.parametrize('double', [False, True])
def test_trr_force_only_frame(tmp_path, double):
    """Force-only frames without a box (double-precision gmx_d -rerun
    writes these) must detect the real width from the force block size."""
    import struct

    from tfep_tpu.io.xdr import TRR_MAGIC, iter_trr_frames

    n_atoms = 5
    forces = rng.normal(size=(n_atoms, 3))
    real, real_size = ('>d', 8) if double else ('>f', 4)
    f_size = n_atoms * 3 * real_size
    title = b'GMX_trn_file'
    path = str(tmp_path / 'forces.trr')
    with open(path, 'wb') as f:
        f.write(struct.pack('>ii', TRR_MAGIC, len(title) + 1))
        f.write(struct.pack('>i', len(title)))
        f.write(title + b'\x00' * (-len(title) % 4))
        # No box, no positions, no velocities: only the force block.
        f.write(struct.pack('>13i', 0, 0, 0, 0, 0, 0, 0,
                            0, 0, f_size, n_atoms, 7, 0))
        f.write(struct.pack(real, 0.25))  # time
        f.write(struct.pack(real, 0.0))   # lambda
        f.write(struct.pack(real.replace('>', '>%d' % forces.size),
                            *forces.reshape(-1)))

    (frame,) = list(iter_trr_frames(path))
    assert frame['positions'] is None
    np.testing.assert_allclose(frame['forces'], forces,
                               atol=1e-12 if double else 1e-6)
    np.testing.assert_allclose(frame['time'], 0.25, atol=1e-6)
    assert frame['step'] == 7


# =============================================================================
# Lazy frame stores
# =============================================================================

def test_native_decoder_available():
    """g++ is in this image; the fast path must actually be exercised."""
    assert native_available()


@pytest.mark.parametrize('fmt,store_cls', [('xtc', XtcFrameStore),
                                           ('trr', TrrFrameStore)])
def test_lazy_frame_store(tmp_path, fmt, store_cls):
    pos_nm = clustered_traj(n_frames=6, n_mol=5)
    boxes = np.tile(np.diag([4.0, 4.0, 4.0]), (6, 1, 1))
    times = np.arange(6) * 0.004
    path = str(tmp_path / f't.{fmt}')
    (write_xtc if fmt == 'xtc' else write_trr)(path, pos_nm, boxes, times)

    store = open_frame_store(path)
    assert isinstance(store, store_cls)
    assert store.shape == (6, 15, 3)
    # Dimensions/times parsed from headers (nm -> angstrom for lengths).
    np.testing.assert_allclose(store.dimensions[:, :3], 40.0, atol=1e-4)
    np.testing.assert_allclose(store.dimensions[:, 3:], 90.0, atol=1e-4)
    np.testing.assert_allclose(store.times, times, atol=1e-6)

    # Random access in angstrom, consistent with the full read.
    atol = 0.006 if fmt == 'xtc' else 1e-4
    np.testing.assert_allclose(store[3], pos_nm[3] * 10.0, atol=atol)
    np.testing.assert_allclose(store[-1], pos_nm[5] * 10.0, atol=atol)
    # Cache hit returns the same array object.
    assert store[3] is store[3]
    # Full materialization.
    np.testing.assert_allclose(np.asarray(store), pos_nm * 10.0, atol=atol)


def test_system_from_xtc_lazy(tmp_path):
    """System.from_file with topology + lazy XTC feeds the dataset without
    materializing the trajectory."""
    pos_nm = clustered_traj(n_frames=5, n_mol=2)
    xtc = str(tmp_path / 'waters.xtc')
    write_xtc(xtc, pos_nm, np.tile(np.eye(3) * 4.0, (5, 1, 1)))
    top = tmp_path / 'waters.top'
    top.write_text("""
[ moleculetype ]
SOL 2
[ atoms ]
1 OW 1 SOL OW 1 -0.8 15.999
2 HW 1 SOL HW1 1 0.4 1.008
3 HW 1 SOL HW2 1 0.4 1.008
[ settles ]
1 1 0.1 0.16
[ system ]
waters
[ molecules ]
SOL 2
""")
    system = System.from_file(xtc, topology_path=str(top), lazy=True)
    assert system.n_frames == 5 and system.n_atoms == 6
    assert list(system.topology.elements) == ['O', 'H', 'H', 'O', 'H', 'H']
    # settles expanded to O-H bonds per molecule.
    assert system.topology.bonds.tolist() == [[0, 1], [0, 2], [3, 4], [3, 5]]

    from tfep_tpu.io.traj import TrajectoryDataset
    dataset = TrajectoryDataset(system)
    sample = dataset[2]
    np.testing.assert_allclose(
        sample['positions'].reshape(-1, 3), pos_nm[2] * 10.0, atol=0.006)
    assert sample['dimensions'].shape == (6,)


def test_get_batch_matches_itemwise(tmp_path):
    """The vectorized batch fetch equals stacked per-sample access, for
    both eager arrays and lazy stores."""
    from tfep_tpu.io.traj import TrajectoryDataset

    pos_nm = clustered_traj(n_frames=6, n_mol=2)
    xtc = str(tmp_path / 't.xtc')
    write_xtc(xtc, pos_nm, np.tile(np.eye(3) * 4.0, (6, 1, 1)))
    top = Topology(names=['C'] * 6)

    eager = System(top, np.asarray(open_frame_store(xtc)),
                   dimensions=np.tile([40.0, 40, 40, 90, 90, 90], (6, 1)))
    store = open_frame_store(xtc)
    lazy = System(top, store, dimensions=store.dimensions)

    for system in (eager, lazy):
        dataset = TrajectoryDataset(system)
        dataset.add_aux('logw', np.arange(6.0))
        batch = dataset.get_batch([4, 1, 3])
        stacked = {k: np.stack([dataset[i][k] for i in (4, 1, 3)])
                   for k in dataset[0]}
        assert set(batch) == set(stacked)
        for key in stacked:
            np.testing.assert_allclose(batch[key], stacked[key], atol=1e-6)

    # Atom selection applies in the batched path too.
    dataset = TrajectoryDataset(lazy)
    dataset.select_atoms([0, 2])
    batch = dataset.get_batch([0])
    assert batch['positions'].shape == (1, 6)


def test_atom_count_mismatch_raises(tmp_path):
    write_xtc(str(tmp_path / 't.xtc'), clustered_traj(n_mol=2))
    top = tmp_path / 'bad.top'
    top.write_text("""
[ moleculetype ]
X 2
[ atoms ]
1 C 1 MOL C1 1
[ system ]
x
[ molecules ]
X 1
""")
    with pytest.raises(ValueError, match='atoms'):
        System.from_file(str(tmp_path / 't.xtc'), topology_path=str(top))


# =============================================================================
# Topology files
# =============================================================================

PRMTOP = """%VERSION  VERSION_STAMP = V0001.000
%FLAG POINTERS
%FORMAT(10I8)
       5       2       2       1       0       0       0       0       0       0
       6       2
%FLAG ATOM_NAME
%FORMAT(20a4)
C1  C2  O1  H1  H2
%FLAG ATOMIC_NUMBER
%FORMAT(10I8)
       6       6       8       1       1
%FLAG MASS
%FORMAT(5E16.8)
  1.20110000E+01  1.20110000E+01  1.59990000E+01  1.00800000E+00  1.00800000E+00
%FLAG RESIDUE_LABEL
%FORMAT(20a4)
MOL WAT
%FLAG RESIDUE_POINTER
%FORMAT(10I8)
       1       3
%FLAG BONDS_INC_HYDROGEN
%FORMAT(10I8)
       6       9       1       6      12       1
%FLAG BONDS_WITHOUT_HYDROGEN
%FORMAT(10I8)
       0       3       1
"""


def test_read_prmtop(tmp_path):
    path = tmp_path / 'sys.prmtop'
    path.write_text(PRMTOP)
    top = read_prmtop(str(path))
    assert top.n_atoms == 5
    assert list(top.names) == ['C1', 'C2', 'O1', 'H1', 'H2']
    assert list(top.elements) == ['C', 'C', 'O', 'H', 'H']
    assert list(top.resnames) == ['MOL', 'MOL', 'WAT', 'WAT', 'WAT']
    assert list(top.resids) == [1, 1, 2, 2, 2]
    # Bond indices are coordinate-array offsets divided by 3.
    assert top.bonds.tolist() == [[0, 1], [2, 3], [2, 4]]
    np.testing.assert_allclose(top.masses[2], 15.999)


def test_read_prmtop_element_from_mass(tmp_path):
    """Old prmtops without ATOMIC_NUMBER fall back to mass matching."""
    content = PRMTOP.split('%FLAG ATOMIC_NUMBER')[0] + \
        PRMTOP.split('%FORMAT(10I8)\n       6       6       8       1       1\n')[1]
    path = tmp_path / 'old.prmtop'
    path.write_text(content)
    top = read_prmtop(str(path))
    assert list(top.elements) == ['C', 'C', 'O', 'H', 'H']


def test_read_gromacs_top_multi_molecule(tmp_path):
    solute = tmp_path / 'mol.itp'
    solute.write_text("""
[ moleculetype ]
MOL 3
[ atoms ]
1 c3 1 MOL C1 1 -0.1 12.011
2 c3 1 MOL C2 1 -0.1 12.011
3 hc 1 MOL H1 1 0.05 1.008
[ bonds ]
1 2 1
1 3 1
""")
    top_file = tmp_path / 'system.top'
    top_file.write_text("""
#include "amber99.ff/forcefield.itp"
#include "mol.itp"
[ moleculetype ]
SOL 2
[ atoms ]
1 OW 1 SOL OW 1
2 HW 1 SOL HW1 1
3 HW 1 SOL HW2 1
[ settles ]
1 1 0.09572 0.15139
[ system ]
Solvated MOL
[ molecules ]
MOL 1
SOL 2
""")
    top = read_gromacs_top(str(top_file))
    assert top.n_atoms == 9
    assert list(top.names) == ['C1', 'C2', 'H1', 'OW', 'HW1', 'HW2',
                               'OW', 'HW1', 'HW2']
    assert list(top.resids) == [1, 1, 1, 2, 2, 2, 3, 3, 3]
    assert top.bonds.tolist() == [[0, 1], [0, 2], [3, 4], [3, 5],
                                  [6, 7], [6, 8]]
    # Elements: masses where declared, names otherwise.
    assert list(top.elements) == ['C', 'C', 'H', 'O', 'H', 'H',
                                  'O', 'H', 'H']


def test_read_gromacs_top_missing_moleculetype(tmp_path):
    top_file = tmp_path / 'bad.top'
    top_file.write_text('[ system ]\nx\n[ molecules ]\nGHOST 3\n')
    with pytest.raises(ValueError, match='GHOST'):
        read_gromacs_top(str(top_file))


def test_guess_bonds_water():
    positions = np.array([[0.0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0],
                          [5.0, 5, 5]])
    bonds = guess_bonds(positions, ['O', 'H', 'H', 'O'])
    assert bonds.tolist() == [[0, 1], [0, 2]]


# =============================================================================
# Boxes
# =============================================================================

def test_box_vectors_roundtrip():
    dims = np.array([[20.0, 30.0, 40.0, 80.0, 95.0, 120.0],
                     [10.0, 10.0, 10.0, 90.0, 90.0, 90.0]])
    vectors = dimensions_to_box_vectors(dims)
    back = box_vectors_to_dimensions(vectors)
    np.testing.assert_allclose(back, dims, atol=1e-8)


def test_gro_triclinic_box(tmp_path):
    """A 9-field GRO box line parses to true lengths + angles (the round-1
    reader silently treated it as orthorhombic)."""
    vectors_nm = np.array([[2.0, 0.0, 0.0],
                           [0.5, 1.9, 0.0],
                           [0.3, 0.2, 2.1]])
    gro = tmp_path / 'tri.gro'
    gro.write_text(
        'triclinic\n'
        '    2\n'
        '    1MOL     C1    1   0.100   0.200   0.300\n'
        '    1MOL     C2    2   0.400   0.500   0.600\n'
        f'   {vectors_nm[0,0]:.5f}   {vectors_nm[1,1]:.5f}'
        f'   {vectors_nm[2,2]:.5f}   {vectors_nm[0,1]:.5f}'
        f'   {vectors_nm[0,2]:.5f}   {vectors_nm[1,0]:.5f}'
        f'   {vectors_nm[1,2]:.5f}   {vectors_nm[2,0]:.5f}'
        f'   {vectors_nm[2,1]:.5f}\n')
    system = read_gro(str(gro))
    expected = box_vectors_to_dimensions(vectors_nm[None] * 10.0)[0]
    np.testing.assert_allclose(system.dimensions[0], expected, atol=1e-3)
    # Angles genuinely non-rectangular.
    assert np.abs(system.dimensions[0][3:] - 90.0).max() > 1.0


# =============================================================================
# End-to-end: MixedMAFMap from an XTC + prmtop pair
# =============================================================================

CHAIN_PRMTOP = """%VERSION  VERSION_STAMP = V0001.000
%FLAG POINTERS
%FORMAT(10I8)
       8       2       4       3
%FLAG ATOM_NAME
%FORMAT(20a4)
C1  C2  C3  C4  H1  H2  H3  H4
%FLAG ATOMIC_NUMBER
%FORMAT(10I8)
       6       6       6       6       1       1       1       1
%FLAG MASS
%FORMAT(5E16.8)
  1.20110000E+01  1.20110000E+01  1.20110000E+01  1.20110000E+01  1.00800000E+00
  1.00800000E+00  1.00800000E+00  1.00800000E+00
%FLAG RESIDUE_LABEL
%FORMAT(20a4)
MOL
%FLAG RESIDUE_POINTER
%FORMAT(10I8)
       1
%FLAG BONDS_INC_HYDROGEN
%FORMAT(10I8)
       0      12       1       3      15       1       6      18       1
       9      21       1
%FLAG BONDS_WITHOUT_HYDROGEN
%FORMAT(10I8)
       0       3       1       3       6       1       6       9       1
"""


def test_mixedmaf_trains_from_xtc_prmtop(tmp_path):
    """The flagship map builds its Z-matrix from a prmtop bond graph and
    trains on XTC frames (VERDICT round-1 'done' criterion)."""
    import jax.numpy as jnp
    from tfep_tpu.app import MixedMAFMap, Trainer
    from tfep_tpu.units import ureg

    prmtop = tmp_path / 'chain.prmtop'
    prmtop.write_text(CHAIN_PRMTOP)

    # A bent C4H4 chain (same geometry as the mixedmaf unit tests), in nm.
    base = 0.1 * np.array([
        [0.0, 0.0, 0.0], [1.5, 0.0, 0.0], [2.25, 1.3, 0.0],
        [1.5, 2.2, 1.1],
        [-0.5, -0.7, 0.6], [1.9, -0.6, 0.8], [3.3, 1.4, 0.4],
        [1.0, 3.0, 0.4]])
    pos_nm = base[None] + 0.005 * rng.normal(size=(12, 8, 3))
    xtc = str(tmp_path / 'chain.xtc')
    write_xtc(xtc, pos_nm, precision=100000.0)

    system = System.from_file(xtc, topology_path=str(prmtop), lazy=True)
    assert system.topology.bonds.tolist() == [
        [0, 1], [0, 4], [1, 2], [1, 5], [2, 3], [2, 6], [3, 7]]

    class MockPotential:
        energy_unit = None

        def __call__(self, x, cell=None):
            return jnp.sum(x, axis=-1)

    tfep_map = MixedMAFMap(
        potential_energy_func=MockPotential(),
        temperature=300.0 * ureg.kelvin,
        system=system,
        batch_size=6,
        tfep_logger_dir_path=str(tmp_path / 'logs'),
        n_maf_layers=1)
    trainer = Trainer(save_dir=None, max_epochs=1, shuffle=False)
    trainer.fit(tfep_map)
    assert trainer.global_step == 2
    logged = tfep_map.tfep_logger.read_train_tensors(epoch_idx=0)
    assert np.all(np.isfinite(logged['potential']))


# =============================================================================
# Writers (tfep_tpu/io/writers.py): round trips through our own readers
# =============================================================================

def _writer_system(n_frames=3, n_atoms=5, seed=7, triclinic=False):
    from tfep_tpu.io.topology import Topology
    from tfep_tpu.io.traj import System

    rng = np.random.default_rng(seed)
    topology = Topology(
        names=['C1', 'O1', 'H1', 'H2', 'N1'][:n_atoms],
        elements=['C', 'O', 'H', 'H', 'N'][:n_atoms],
        resnames=['MOL'] * n_atoms,
        resids=[1] * n_atoms,
        bonds=[(0, 1), (0, 2), (1, 3)],
    )
    positions = rng.uniform(0.0, 9.0, size=(n_frames, n_atoms, 3))
    if triclinic:
        dims = np.tile([20.0, 22.0, 25.0, 80.0, 95.0, 100.0], (n_frames, 1))
    else:
        dims = np.tile([20.0, 22.0, 25.0, 90.0, 90.0, 90.0], (n_frames, 1))
    return System(topology, positions, dims)


def test_write_pdb_round_trip(tmp_path):
    from tfep_tpu.io.traj import read_pdb
    from tfep_tpu.io.writers import write_pdb

    system = _writer_system()
    path = str(tmp_path / 'out.pdb')
    write_pdb(path, system)
    back = read_pdb(path)
    assert back.n_frames == system.n_frames
    np.testing.assert_allclose(back.positions, system.positions, atol=1e-3)
    np.testing.assert_array_equal(back.topology.names, system.topology.names)
    np.testing.assert_array_equal(back.topology.elements,
                                  system.topology.elements)
    # CONECT bonds survive (order-normalized).
    got = {tuple(sorted(b)) for b in back.topology.bonds.tolist()}
    want = {tuple(sorted(b)) for b in system.topology.bonds.tolist()}
    assert got == want
    np.testing.assert_allclose(back.dimensions[0], system.dimensions[0],
                               atol=1e-2)


@pytest.mark.parametrize('triclinic', [False, True])
def test_write_gro_round_trip(tmp_path, triclinic):
    from tfep_tpu.io.traj import read_gro
    from tfep_tpu.io.writers import write_gro

    system = _writer_system(triclinic=triclinic)
    path = str(tmp_path / 'out.gro')
    write_gro(path, system)
    back = read_gro(path)
    assert back.n_frames == system.n_frames
    # GRO stores nm at 1e-3 precision -> 1e-2 angstrom tolerance.
    np.testing.assert_allclose(back.positions, system.positions, atol=2e-2)
    np.testing.assert_array_equal(back.topology.names, system.topology.names)
    np.testing.assert_allclose(back.dimensions, system.dimensions, atol=0.3)


def test_write_xyz_round_trip(tmp_path):
    from tfep_tpu.io.traj import read_xyz
    from tfep_tpu.io.writers import write_xyz

    system = _writer_system()
    path = str(tmp_path / 'out.xyz')
    write_xyz(path, system)
    back = read_xyz(path)
    assert back.n_frames == system.n_frames
    np.testing.assert_allclose(back.positions, system.positions, atol=1e-6)
    np.testing.assert_array_equal(back.topology.elements,
                                  system.topology.elements)


def test_system_save_dispatch_and_mapped_override(tmp_path):
    """System.save writes any extension; a flattened positions override
    (the flow's output layout) is reshaped and written."""
    from tfep_tpu.io.traj import System, read_xyz

    system = _writer_system()
    mapped = np.asarray(system.positions, np.float64).reshape(
        system.n_frames, -1) + 1.5
    path = str(tmp_path / 'mapped.xyz')
    system.save(path, positions=mapped)
    back = read_xyz(path)
    np.testing.assert_allclose(
        back.positions, mapped.reshape(system.n_frames, -1, 3), atol=1e-6)

    with pytest.raises(ValueError, match='Unsupported'):
        system.save(str(tmp_path / 'out.nope'))


def test_write_xtc_via_save(tmp_path):
    from tfep_tpu.io.traj import System

    system = _writer_system()
    path = str(tmp_path / 'out.xtc')
    system.save(path)
    # XTC needs a topology to re-load as a System; read raw instead.
    from tfep_tpu.io.xdr import read_xtc
    positions_nm, boxes_nm, _ = read_xtc(path)
    np.testing.assert_allclose(positions_nm * 10.0, system.positions,
                               atol=2e-2)
    from tfep_tpu.io.traj import box_vectors_to_dimensions
    np.testing.assert_allclose(
        box_vectors_to_dimensions(boxes_nm * 10.0), system.dimensions,
        atol=0.2)


def test_write_pdb_four_char_resname(tmp_path):
    """4-character residue names (e.g. lipids) survive the round trip."""
    from tfep_tpu.io.topology import Topology
    from tfep_tpu.io.traj import System, read_pdb
    from tfep_tpu.io.writers import write_pdb

    topology = Topology(names=['C1', 'C2'], elements=['C', 'C'],
                        resnames=['POPC', 'POPC'], resids=[1, 1])
    system = System(topology, np.ones((1, 2, 3)))
    path = str(tmp_path / 'lipid.pdb')
    write_pdb(path, system)
    back = read_pdb(path)
    np.testing.assert_array_equal(back.topology.resnames, ['POPC', 'POPC'])


def test_write_single_frame_2d_positions(tmp_path):
    """A (n_atoms, 3) positions override is one frame (the System
    convention), not n_atoms frames of flattened triples."""
    from tfep_tpu.io.traj import read_xyz

    system = _writer_system(n_frames=1)
    one_frame = np.asarray(system.positions[0], np.float64)  # (n_atoms, 3)
    path = str(tmp_path / 'one.xyz')
    system.save(path, positions=one_frame + 0.5)
    back = read_xyz(path)
    assert back.n_frames == 1
    assert back.n_atoms == system.n_atoms
    np.testing.assert_allclose(back.positions[0], one_frame + 0.5,
                               atol=1e-6)

    with pytest.raises(ValueError, match='positions'):
        system.save(str(tmp_path / 'bad.xyz'),
                    positions=np.ones((7, 11)))


def test_write_single_box_many_frames(tmp_path):
    """A single-structure system's one box pairs with every frame of a
    mapped batch (the documented mapped-ensemble export)."""
    from tfep_tpu.io.traj import read_gro

    system = _writer_system(n_frames=1)
    assert system.dimensions.shape == (1, 6)
    mapped = np.tile(np.asarray(system.positions[0]).reshape(1, -1),
                     (3, 1)) + np.arange(3)[:, None]
    path = str(tmp_path / 'mapped.gro')
    system.save(path, positions=mapped)
    back = read_gro(path)
    assert back.n_frames == 3
    np.testing.assert_allclose(back.dimensions,
                               np.tile(system.dimensions, (3, 1)), atol=0.3)

    with pytest.raises(ValueError, match='boxes'):
        system.save(str(tmp_path / 'bad.gro'), positions=mapped,
                    dimensions=np.tile(system.dimensions, (2, 1)))


# =============================================================================
# MDAnalysis Universe interop (duck-typed)
# =============================================================================

class _FakeTimestep:
    def __init__(self, positions, dimensions, time):
        self.positions = positions
        self.dimensions = dimensions
        self.time = time


class _FakeBonds:
    def __init__(self, indices):
        self._indices = np.asarray(indices)

    def to_indices(self):
        return self._indices


class _FakeAtoms:
    """Mimics an MDAnalysis AtomGroup: missing attributes raise."""

    def __init__(self, n, **attrs):
        self._n = n
        self._attrs = attrs

    def __len__(self):
        return self._n

    def __getattr__(self, name):
        try:
            return self._attrs[name]
        except KeyError:
            raise AttributeError(name)  # NoDataError is an AttributeError


class _FakeUniverse:
    def __init__(self, atoms, trajectory, bonds=None):
        self.atoms = atoms
        self.trajectory = trajectory
        if bonds is not None:
            self.bonds = bonds


def test_system_from_universe():
    pos = rng.normal(0, 1, (3, 4, 3)).astype(np.float32)
    box = np.array([10.0, 11.0, 12.0, 90.0, 90.0, 90.0], np.float32)
    traj = [_FakeTimestep(pos[i], box, 0.5 * i) for i in range(3)]
    atoms = _FakeAtoms(
        4,
        names=np.array(['O', 'H1', 'H2', 'C'], object),
        elements=np.array(['O', 'H', 'H', 'C'], object),
        resnames=np.array(['SOL', 'SOL', 'SOL', 'MOL'], object),
        resids=np.array([1, 1, 1, 2]),
        masses=np.array([15.999, 1.008, 1.008, 12.011]),
    )
    u = _FakeUniverse(atoms, traj, bonds=_FakeBonds([[0, 1], [0, 2]]))

    system = System.from_universe(u)
    assert system.n_frames == 3 and system.n_atoms == 4
    np.testing.assert_allclose(system.positions, pos)
    np.testing.assert_allclose(system.dimensions, np.tile(box, (3, 1)))
    np.testing.assert_allclose(system.times, [0.0, 0.5, 1.0])
    assert list(system.topology.elements) == ['O', 'H', 'H', 'C']
    np.testing.assert_array_equal(system.topology.bonds, [[0, 1], [0, 2]])
    np.testing.assert_array_equal(system.select_atoms('resname MOL'), [3])


def test_system_from_universe_shared_timestep_buffer():
    # Real MDAnalysis readers reuse ONE Timestep and mutate its position
    # buffer in place during iteration; from_universe must copy per frame
    # or every stored frame aliases the last one.
    pos = rng.normal(0, 1, (3, 4, 3)).astype(np.float32)
    box = np.array([[10, 11, 12, 90, 90, 90],
                    [13, 14, 15, 90, 90, 90],
                    [16, 17, 18, 90, 90, 90]], np.float32)

    class _ReusedTimestepTraj:
        """Iterates by mutating a single shared Timestep in place."""

        def __init__(self):
            self._ts = _FakeTimestep(np.empty((4, 3), np.float32),
                                     np.empty(6, np.float32), 0.0)

        def __iter__(self):
            for i in range(3):
                self._ts.positions[:] = pos[i]
                self._ts.dimensions[:] = box[i]
                self._ts.time = float(i)
                yield self._ts

    atoms = _FakeAtoms(4, elements=np.array(['O', 'H', 'H', 'C'], object))
    system = System.from_universe(_FakeUniverse(atoms, _ReusedTimestepTraj()))
    np.testing.assert_allclose(system.positions, pos)
    np.testing.assert_allclose(system.dimensions, box)


def test_system_from_universe_zero_box_and_errors():
    # zeros(6) dimensions (older MDAnalysis "no box" spelling) → None.
    pos = rng.normal(0, 1, (2, 2, 3)).astype(np.float32)
    atoms = _FakeAtoms(2, elements=np.array(['C', 'H'], object))
    zero_box = np.zeros(6, np.float32)
    u = _FakeUniverse(atoms, [_FakeTimestep(p, zero_box, i)
                              for i, p in enumerate(pos)])
    assert System.from_universe(u).dimensions is None

    # The [0, 0, 0, 90, 90, 90] spelling (zero lengths, default angles)
    # also means "no box" — and must not trip the mixed-box error when
    # combined with plain zeros(6) frames.
    degenerate = np.array([0, 0, 0, 90, 90, 90], np.float32)
    u = _FakeUniverse(atoms, [_FakeTimestep(pos[0], degenerate, 0),
                              _FakeTimestep(pos[1], zero_box, 1)])
    assert System.from_universe(u).dimensions is None

    # Empty trajectory → clear error naming from_universe.
    with pytest.raises(ValueError, match='from_universe.*empty'):
        System.from_universe(_FakeUniverse(atoms, []))

    # Mixed with/without box → loud error, not silent box drop.
    box = np.array([10, 10, 10, 90, 90, 90], np.float32)
    u = _FakeUniverse(atoms, [_FakeTimestep(pos[0], box, 0.0),
                              _FakeTimestep(pos[1], None, 1.0)])
    with pytest.raises(ValueError, match='mixes frames'):
        System.from_universe(u)


def test_system_from_universe_minimal():
    # Only elements + positions: names are synthesized, masses looked up,
    # no bonds/box/time attributes anywhere.
    pos = rng.normal(0, 1, (2, 2, 3)).astype(np.float32)

    class _BareTimestep:
        def __init__(self, p):
            self.positions = p
            self.dimensions = None

    atoms = _FakeAtoms(2, elements=np.array(['C', 'H'], object))
    u = _FakeUniverse(atoms, [_BareTimestep(p) for p in pos])

    system = System.from_universe(u)
    assert system.dimensions is None
    assert list(system.topology.names) == ['C1', 'H2']
    np.testing.assert_allclose(system.topology.masses, [12.011, 1.008])
    assert system.topology.bonds.shape == (0, 2)
    np.testing.assert_allclose(system.times, [0.0, 1.0])


def test_gromacs_top_ifdef_takes_one_branch(tmp_path):
    """#ifndef/#else blocks are mutually exclusive: the standard flexible-
    water pattern must not yield both the settles-implied and the flexible
    bonds (duplicate edges would corrupt the Z-matrix bond graph)."""
    body = """
[ moleculetype ]
SOL 2
[ atoms ]
1 OW 1 SOL OW 1 -0.8 15.999
2 HW 1 SOL HW1 1 0.4 1.008
3 HW 1 SOL HW2 1 0.4 1.008
#ifndef FLEXIBLE
[ settles ]
1 1 0.1 0.16
#else
[ bonds ]
1 2
1 3
#endif
[ system ]
water
[ molecules ]
SOL 1
"""
    top = tmp_path / 'water.top'
    top.write_text(body)
    topology = read_gromacs_top(str(top))
    assert topology.bonds.tolist() == [[0, 1], [0, 2]]

    # With the symbol defined, the #else branch must be skipped instead.
    top.write_text('#define FLEXIBLE\n' + body)
    topology = read_gromacs_top(str(top))
    assert topology.bonds.tolist() == [[0, 1], [0, 2]]


def test_gromacs_top_bare_if_elif(tmp_path):
    """Bare #if/#elif directives must push/advance a conditional frame:
    before this was handled, a '#if SYMBOL' line left the stack
    unbalanced so a later #else flipped an unrelated enclosing
    conditional and #endif popped the wrong frame."""
    body = """
[ moleculetype ]
MOL 2
[ atoms ]
1 C 1 MOL C1 1 0.0 12.011
2 C 1 MOL C2 1 0.0 12.011
3 C 1 MOL C3 1 0.0 12.011
#ifndef OUTER
#if VARIANT_A
[ bonds ]
1 2
#elif defined(VARIANT_B)
[ bonds ]
1 3
#else
[ bonds ]
2 3
#endif
#endif
[ system ]
mol
[ molecules ]
MOL 1
"""
    top = tmp_path / 'mol.top'

    # No symbols defined: #if false, #elif false -> the #else branch.
    top.write_text(body)
    assert read_gromacs_top(str(top)).bonds.tolist() == [[1, 2]]

    # VARIANT_A defined: the #if branch, and only it.
    top.write_text('#define VARIANT_A\n' + body)
    assert read_gromacs_top(str(top)).bonds.tolist() == [[0, 1]]

    # VARIANT_B defined: the #elif branch.
    top.write_text('#define VARIANT_B\n' + body)
    assert read_gromacs_top(str(top)).bonds.tolist() == [[0, 2]]

    # OUTER defined: the whole inner conditional is inactive — and the
    # inner #else must NOT reactivate anything (the pre-fix failure mode).
    top.write_text('#define OUTER\n#define VARIANT_A\n' + body)
    assert read_gromacs_top(str(top)).bonds.tolist() == []

    # An unsupported expression warns and includes the block.
    top.write_text(body.replace('#if VARIANT_A', '#if (X + 1) > 2'))
    with pytest.warns(UserWarning, match='Unsupported #if'):
        assert read_gromacs_top(str(top)).bonds.tolist() == [[0, 1]]

    # ... but NOT when the enclosing region is inactive: the block is
    # excluded by the outer gate, so no misleading warning may fire.
    import warnings as _warnings
    top.write_text('#define OUTER\n'
                   + body.replace('#if VARIANT_A', '#if (X + 1) > 2'))
    with _warnings.catch_warnings():
        _warnings.simplefilter('error')
        assert read_gromacs_top(str(top)).bonds.tolist() == []

    # Numeric literals follow C semantics: '#if 1' includes, '#if 0'
    # takes the #else chain (a '#if 1' block silently dropped would
    # corrupt the bond graph with no diagnostic).
    top.write_text(body.replace('#if VARIANT_A', '#if 1'))
    assert read_gromacs_top(str(top)).bonds.tolist() == [[0, 1]]
    top.write_text(body.replace('#if VARIANT_A', '#if 0'))
    assert read_gromacs_top(str(top)).bonds.tolist() == [[1, 2]]


def test_pdb_conect_five_digit_serials(tmp_path):
    """CONECT serials >= 10000 fill their fixed 5-char columns with no
    separator; whitespace splitting would drop or miswire those bonds."""
    from tfep_tpu.io.topology import Topology
    from tfep_tpu.io.traj import read_pdb

    n_atoms = 10002
    bonds = [(9998, 9999), (9999, 10000), (10000, 10001)]
    topology = Topology(names=['C'] * n_atoms, bonds=bonds)
    positions = np.zeros((1, n_atoms, 3), dtype=np.float32)
    path = str(tmp_path / 'big.pdb')
    System(topology, positions).save(path)
    # The file really exercises the abutting-column case.
    conect_lines = [line for line in open(path) if line.startswith('CONECT')]
    assert any(len(line.split()) < 3 for line in conect_lines)
    system = read_pdb(path)
    assert sorted(map(tuple, system.topology.bonds.tolist())) == bonds


def test_get_subsampled_indices_time_step_edges():
    from tfep_tpu.io.traj import get_subsampled_indices
    from tfep_tpu.units import ureg

    times = np.array([0.0, 1.0, 2.0, 3.0])
    # A step overshooting the last frame time must stay in range.
    got = get_subsampled_indices(4, times=times, step=3.5 * ureg.picosecond)
    assert got.tolist() == [0]
    # A step below the frame spacing must not produce duplicates.
    got = get_subsampled_indices(3, times=times[:3],
                                 step=0.4 * ureg.picosecond)
    assert got.tolist() == [0, 1, 2]
