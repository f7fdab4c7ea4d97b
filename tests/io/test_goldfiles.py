"""Gold-file validation: parse real engine-produced files shipped as test
data by the reference (/root/reference/tfep/tests/data) — actual GROMACS
TRR/GRO output, a real AMBER prmtop, a real CPMD input deck, and the
reference's own 5-frame PDB — through this framework's from-scratch parsers.

Every other format test in the suite round-trips files this framework wrote
itself; these tests are the independent check that the readers agree with
what the real engines emit. They are skipped when the reference checkout is
not present (the data is read in place, never copied into this repo).
"""

import os

import numpy as np
import pytest

REF_DATA = '/root/reference/tfep/tests/data'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA),
    reason='reference test-data checkout not available')


# =============================================================================
# TRR: real `gmx mdrun -rerun` force output (1528-atom acetone-in-water box)
# =============================================================================

@pytest.mark.parametrize('filename', [
    'mimic/equilibrated-forces-gromacs-only.trr',
    'mimic/mimic-forces-gromacs-only.trr',
])
def test_trr_real_gromacs_force_frames(filename):
    """Force-only TRR frames written by real GROMACS parse correctly."""
    from tfep_tpu.io.xdr import iter_trr_frames

    frames = list(iter_trr_frames(os.path.join(REF_DATA, filename)))
    assert len(frames) >= 1
    frame = frames[0]
    # mdrun -rerun with forces-only output: no coordinates/velocities.
    assert frame['positions'] is None
    assert frame['velocities'] is None
    assert frame['forces'].shape == (1528, 3)
    assert np.isfinite(frame['forces']).all()
    # A physical force field produces a wide dynamic range, not junk.
    magnitudes = np.linalg.norm(frame['forces'], axis=1)
    assert magnitudes.max() > 100.0           # kJ/mol/nm, condensed phase
    assert np.median(magnitudes) < 1e5
    # The box block is present and orthorhombic (cubic water box).
    box = frame['box']
    assert box.shape == (3, 3)
    assert np.allclose(box, np.diag(np.diag(box)), atol=1e-6)
    assert (np.diag(box) > 1.0).all()          # nm


def test_trr_real_gromacs_vs_mimic_forces_differ():
    """The two real force sets (MM-only vs QM/MM) share layout, not values."""
    from tfep_tpu.io.xdr import iter_trr_frames

    def first_forces(name):
        frame = next(iter_trr_frames(os.path.join(REF_DATA, name)))
        return frame['forces']

    f_mm = first_forces('mimic/equilibrated-forces-gromacs-only.trr')
    f_qmmm = first_forces('mimic/mimic-forces-gromacs-only.trr')
    assert f_mm.shape == f_qmmm.shape
    assert not np.allclose(f_mm, f_qmmm)


def test_read_trr_skips_coordinate_less_frames():
    """The positions-oriented reader reports no frames for force-only files
    instead of misparsing them."""
    from tfep_tpu.io.xdr import read_trr

    positions, boxes, times = read_trr(
        os.path.join(REF_DATA, 'mimic/equilibrated-forces-gromacs-only.trr'))
    assert positions.shape[0] == 0


# =============================================================================
# GRO: real equilibrated configuration, cross-checked against the TRR box
# =============================================================================

def test_gro_real_equilibrated_box_matches_trr():
    from tfep_tpu.io.traj import read_gro
    from tfep_tpu.io.xdr import iter_trr_frames

    system = read_gro(os.path.join(REF_DATA, 'mimic/equilibrated.gro'))
    assert system.positions.shape == (1, 1528, 3)
    assert np.isfinite(np.asarray(system.positions)).all()
    # Box: angstrom + degrees here, nm vectors in the TRR written from the
    # same system. Two independent decoders, one physical box.
    trr_box_nm = next(iter_trr_frames(os.path.join(
        REF_DATA, 'mimic/equilibrated-forces-gromacs-only.trr')))['box']
    assert system.dimensions is not None
    np.testing.assert_allclose(system.dimensions[0, :3],
                               np.diag(trr_box_nm) * 10.0, rtol=1e-5)
    np.testing.assert_allclose(system.dimensions[0, 3:], 90.0)
    # Solvated box: every coordinate inside the box.
    positions = np.asarray(system.positions)[0]
    assert positions.min() >= -1.0
    assert (positions.max(axis=0) <= system.dimensions[0, :3] + 1.0).all()


# =============================================================================
# AMBER prmtop: the reference's real water.prmtop
# =============================================================================

def test_prmtop_real_water():
    from tfep_tpu.io.topfiles import read_prmtop

    topology = read_prmtop(os.path.join(REF_DATA, 'amber/water.prmtop'))
    assert len(topology.names) == 6            # two rigid waters
    assert list(topology.elements) == ['O', 'H', 'H', 'O', 'H', 'H']
    # AMBER rigid water: O-H, O-H plus the H-H constraint bond, per residue.
    bonds = {tuple(sorted(b)) for b in topology.bonds}
    assert bonds == {(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5)}


# =============================================================================
# GROMACS .top: real acetone topology (engine-shipped includes are absent)
# =============================================================================

def test_top_real_acetone_missing_system_include():
    """The real acetone.top pulls force-field .itp files from the GROMACS
    installation; without them the parser must fail loudly about the
    unresolvable molecule, not silently drop solvent."""
    from tfep_tpu.io.topfiles import read_gromacs_top

    with pytest.raises(ValueError, match='SOL'):
        read_gromacs_top(os.path.join(REF_DATA, 'mimic/acetone.top'))


def test_itp_real_acetone_moleculetype(tmp_path):
    """The real amber03 acetone.itp parses through a minimal wrapper .top
    (absolute #include, as users point at files outside the .top's dir)."""
    from tfep_tpu.io.topfiles import read_gromacs_top

    itp_path = os.path.join(REF_DATA, 'mimic/acetone.itp')
    top_path = tmp_path / 'acetone_only.top'
    top_path.write_text(
        f'#include "{itp_path}"\n'
        '[ system ]\nacetone\n'
        '[ molecules ]\nACT 1\n')
    topology = read_gromacs_top(str(top_path))
    assert list(topology.names) == [
        'C1', 'C2', 'C3', 'O1', 'H1', 'H2', 'H3', 'H4', 'H5', 'H6']
    assert list(topology.elements) == [
        'C', 'C', 'C', 'O', 'H', 'H', 'H', 'H', 'H', 'H']
    assert len(topology.bonds) == 9            # acyclic 10-atom molecule
    # Bond graph is connected and centered on C1 (the carbonyl carbon).
    assert sorted(b for bond in topology.bonds for b in bond).count(0) == 3


# =============================================================================
# PDB: the reference's own 5-frame test trajectory (two fragments)
# =============================================================================

def test_pdb_real_chlorofluoromethane():
    from tfep_tpu.io.traj import read_pdb

    system = read_pdb(os.path.join(REF_DATA, 'chloro-fluoromethane.pdb'))
    assert system.positions.shape == (5, 6, 3)
    assert list(system.topology.elements) == ['C', 'Cl', 'H', 'H', 'H', 'F']
    # CONECT bonds: chloromethane fragment only; the F is a free fragment.
    bonds = {tuple(sorted(b)) for b in system.topology.bonds}
    assert bonds == {(0, 1), (0, 2), (0, 3), (0, 4)}
    # Frames genuinely differ (it is a trajectory, not a repeated model).
    assert not np.allclose(system.positions[0], system.positions[1])


def test_mixedmaf_trains_on_reference_pdb(tmp_path):
    """End-to-end on the exact file the reference app tests train on:
    Z-matrix from the CONECT graph + a free Cartesian fragment."""
    import jax.numpy as jnp

    from tfep_tpu.app import MixedMAFMap, Trainer
    from tfep_tpu.io.traj import read_pdb
    from tfep_tpu.units import ureg

    class MockPotential:
        energy_unit = ureg.kilocalorie_per_mole
        positions_unit = ureg.angstrom

        def __call__(self, x, cell=None):
            return jnp.sum(x, axis=-1)

    system = read_pdb(os.path.join(REF_DATA, 'chloro-fluoromethane.pdb'))
    tfep_map = MixedMAFMap(
        potential_energy_func=MockPotential(),
        temperature=300.0 * ureg.kelvin,
        system=system,
        batch_size=5,
        n_maf_layers=2,
        tfep_logger_dir_path=str(tmp_path / 'logs'))
    trainer = Trainer(max_epochs=1, save_dir=None)
    flow = trainer.fit(tfep_map)
    assert len(trainer.loss_history) == 1
    assert np.isfinite(trainer.loss_history[0])
    # Round trip through the trained map on real frames.
    batch = {k: jnp.asarray(v)
             for k, v in tfep_map.dataset.get_batch([0, 1, 2]).items()}
    result = tfep_map.forward(batch)
    back = tfep_map.inverse({**batch, 'positions': result['positions']})
    np.testing.assert_allclose(np.asarray(back['positions']),
                               np.asarray(batch['positions']), atol=1e-4)


# =============================================================================
# Benzoic acid npz: the reference's real aromatic test molecule
# =============================================================================

def test_zmatrix_on_real_benzoic_acid(tmp_path):
    """Z-matrix construction + training on the reference's benzoic acid
    (aromatic ring + carboxyl: cyclic bond graph, 15 atoms)."""
    import jax.numpy as jnp

    from tfep_tpu.app import MixedMAFMap, Trainer
    from tfep_tpu.io.topology import Topology
    from tfep_tpu.io.traj import System
    from tfep_tpu.units import ureg

    npz = np.load(os.path.join(REF_DATA, 'benzoic_acid.npz'))
    names = [str(n) for n in npz['names']]
    elements = [('H' if n.startswith('H') else
                 'O' if n.startswith('O') else 'C') for n in names]
    rng = np.random.default_rng(42)
    positions = (npz['positions'][None]
                 + 0.03 * rng.normal(size=(8, 15, 3)))

    class MockPotential:
        energy_unit = ureg.kilocalorie_per_mole
        positions_unit = ureg.angstrom

        def __call__(self, x, cell=None):
            return jnp.sum(x, axis=-1)

    system = System(
        Topology(names=names, elements=elements,
                 bonds=[tuple(b) for b in npz['bonds']]),
        positions)
    tfep_map = MixedMAFMap(
        potential_energy_func=MockPotential(),
        temperature=300.0 * ureg.kelvin,
        system=system,
        batch_size=4,
        n_maf_layers=2,
        tfep_logger_dir_path=str(tmp_path / 'logs'))
    tfep_map.setup()
    # One Z-matrix covering all 15 atoms of the single connected fragment.
    batch = {k: jnp.asarray(v)
             for k, v in tfep_map.dataset.get_batch([0, 1]).items()}
    result = tfep_map.forward(batch)
    assert np.isfinite(np.asarray(result['log_det_J'])).all()
    back = tfep_map.inverse({**batch, 'positions': result['positions']})
    np.testing.assert_allclose(np.asarray(back['positions']),
                               np.asarray(batch['positions']), atol=1e-4)


# =============================================================================
# CPMD input deck + PLUMED-style xvg
# =============================================================================

def test_cpmd_real_input_deck():
    from tfep_tpu.potentials.mimic import _parse_cpmd_input

    lines, paths_row, box_row, overlap_map, coord_rows = _parse_cpmd_input(
        os.path.join(REF_DATA, 'mimic/cpmd.inp'))
    assert paths_row is not None and box_row is not None
    assert lines[paths_row].strip().startswith('/')   # scratch path row
    assert len(lines[box_row].split()) == 3           # cubic box, bohr
    assert len(overlap_map) == 10              # OVERLAPS block declares 10
    assert len(coord_rows) == 10               # acetone QM region
    for row in coord_rows:
        fields = lines[row].split()
        assert len(fields) >= 3
        float(fields[0])


def test_xvg_real_auxiliary_table():
    from tfep_tpu.utils.plumed import read_table, read_table_field_names

    path = os.path.join(REF_DATA, 'auxiliary.xvg')
    assert read_table_field_names(path) == ['time', 'col1', 'col2']
    data = read_table(path)
    assert set(data) == {'time', 'col1', 'col2'}
    np.testing.assert_allclose(data['col1'], data['time'] + 1.0)
    np.testing.assert_allclose(data['time'][:3], [0.0, 1.0, 2.0])
