"""MixedMAFMap tests: Z-matrix construction, conversion invertibility,
end-to-end training (reference: tests/app/test_mixedmaf.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfep_tpu.app import MixedMAFMap, Trainer
from tfep_tpu.app.mixedmaf import check_independent, is_collinear
from tfep_tpu.io.topology import Topology
from tfep_tpu.io.traj import System
from tfep_tpu.units import ureg
from tfep_tpu.utils.math import batch_log_abs_det_J

N_FRAMES = 12


class MockPotential:
    energy_unit = None

    def __call__(self, x, cell=None):
        return jnp.sum(x, axis=-1)


def make_butane_like_system(n_frames=N_FRAMES, seed=0, with_water=False):
    """A C4H4 chain (one bonded fragment), optionally plus a water."""
    rng = np.random.default_rng(seed)
    # C-C backbone along x with H substituents.
    names = ['C1', 'C2', 'C3', 'C4', 'H1', 'H2', 'H3', 'H4']
    elements = ['C', 'C', 'C', 'C', 'H', 'H', 'H', 'H']
    bonds = [(0, 1), (1, 2), (2, 3), (0, 4), (1, 5), (2, 6), (3, 7)]
    # A strongly bent chain so no angle/dihedral triplet is collinear.
    base = np.array([
        [0.0, 0.0, 0.0], [1.5, 0.0, 0.0], [2.25, 1.3, 0.0],
        [1.5, 2.2, 1.1],
        [-0.5, -0.7, 0.6], [1.9, -0.6, 0.8], [3.3, 1.4, 0.4],
        [1.0, 3.0, 0.4],
    ])
    resnames = ['MOL'] * 8
    resids = [1] * 8
    if with_water:
        names += ['OW', 'HW1', 'HW2']
        elements += ['O', 'H', 'H']
        bonds += [(8, 9), (8, 10)]
        base = np.concatenate([base, np.array(
            [[8.0, 8.0, 8.0], [8.8, 8.3, 8.0], [7.5, 8.7, 8.2]])])
        resnames += ['SOL'] * 3
        resids += [2] * 3

    positions = base[None] + 0.05 * rng.normal(
        size=(n_frames, len(names), 3))
    topology = Topology(names=names, elements=elements, resnames=resnames,
                        resids=resids, bonds=bonds)
    return System(topology, positions)


def make_map(tmp_path, with_water=False, **kwargs):
    kwargs.setdefault('n_maf_layers', 2)
    return MixedMAFMap(
        potential_energy_func=MockPotential(),
        temperature=300.0 * ureg.kelvin,
        system=make_butane_like_system(with_water=with_water),
        batch_size=6,
        tfep_logger_dir_path=str(tmp_path / 'logs'),
        **kwargs)


def test_check_independent():
    check_independent([[3, 0, 1, 2], [4, 3, 0, 1]])  # fine
    with pytest.raises(RuntimeError, match='not independent'):
        check_independent([[3, 0, 1, 2], [4, 0, 1, 2], [5, 0, 2, 1]])


def test_is_collinear():
    line = np.array([[[0, 0, 0], [1, 0, 0], [2, 0, 0.001]]], dtype=float)
    assert is_collinear(line)
    tri = np.array([[[0, 0, 0], [1, 0, 0], [1, 1, 0]]], dtype=float)
    assert not is_collinear(tri)


def test_z_matrix_construction(tmp_path):
    tfep_map = make_map(tmp_path)
    tfep_map.setup()
    flow = tfep_map.flow
    # The conversion flow sits at the top (no fixed atoms here).
    from tfep_tpu.nn.flows import CartesianToMixedFlow
    assert isinstance(flow, CartesianToMixedFlow)
    # 8 atoms, one fragment: 3 Cartesian reference + 5 IC atoms.
    assert flow.n_ic_atoms == 5
    assert flow.n_cartesian_atoms == 3
    # Z-matrix rows reference already-placed atoms only.
    z = np.asarray(flow.z_matrix)
    placed = set(np.asarray(flow.cartesian_atom_indices).tolist())
    for row in z:
        assert set(row[1:]).issubset(placed)
        placed.add(row[0])
    # Auto-selected reference atoms are heavy (carbon) atoms.
    assert tfep_map._origin_atom_idx is not None


def test_conversion_round_trip_and_jacobian(tmp_path):
    tfep_map = make_map(tmp_path)
    tfep_map.setup()
    flow = tfep_map.flow

    batch = tfep_map.dataset.get_batch(list(range(4)))
    x = jnp.asarray(batch['positions'])

    y, ldj = flow.forward(x)
    # Identity-initialized MAF: mixed-coordinate roundtrip => y ~= x.
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ldj), 0.0, atol=1e-6)

    x_back, ldj_inv = flow.inverse(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ldj + ldj_inv), 0.0, atol=1e-6)


def test_conversion_jacobian_oracle_after_training(tmp_path):
    """After a few training steps the flow is non-trivial: check ldj."""
    tfep_map = make_map(tmp_path)
    trainer = Trainer(save_dir=None, max_steps=4, shuffle=True)
    import optax
    trainer.optimizer = optax.adamw(1e-3)
    flow = trainer.fit(tfep_map)

    x = jnp.asarray(tfep_map.dataset.get_batch([0, 1])['positions'])
    y, ldj = flow.forward(x)
    assert np.any(np.abs(np.asarray(y) - np.asarray(x)) > 1e-6)

    oracle = batch_log_abs_det_J(lambda z: flow.forward(z)[0], x)
    np.testing.assert_allclose(np.asarray(ldj), np.asarray(oracle),
                               atol=1e-5)

    x_back, ldj_inv = flow.inverse(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-5)


def test_mixedmaf_with_solvent_and_conditioning(tmp_path):
    """Two fragments: MOL mapped, water conditioning (stays Cartesian)."""
    tfep_map = make_map(tmp_path, with_water=True,
                        mapped_atoms='resname MOL',
                        conditioning_atoms='resname SOL')
    tfep_map.setup()
    flow = tfep_map.flow
    # Water (3 atoms) is conditioning: all Cartesian. MOL: 3 ref + 5 IC.
    assert flow.n_ic_atoms == 5
    assert flow.n_cartesian_atoms == 6

    batch = tfep_map.dataset.get_batch([0, 1, 2])
    x = jnp.asarray(batch['positions'])
    y, ldj = flow.forward(x)
    x_back, _ = flow.inverse(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-6)

    # Conditioning atoms are propagated unchanged.
    cond_dofs = tfep_map.get_conditioning_indices(idx_type='dof',
                                                  remove_fixed=True)
    np.testing.assert_allclose(np.asarray(y[:, cond_dofs]),
                               np.asarray(x[:, cond_dofs]), atol=1e-10)


def test_mixedmaf_solvent_partition_by_distance_selection(tmp_path):
    """The canonical solvated workflow: conditioning = solvent shell
    selected with a periodic distance selection; far solvent is fixed."""
    rng = np.random.default_rng(1)
    base_system = make_butane_like_system(with_water=True)
    topology = base_system.topology
    # Append a second water right next to the MOL fragment (< 4 A) so the
    # distance selection distinguishes near from far solvent; the original
    # water sits at ~(8, 8, 8), >9 A away.
    names = list(topology.names) + ['OW', 'HW1', 'HW2']
    elements = list(topology.elements) + ['O', 'H', 'H']
    resnames = list(topology.resnames) + ['SOL'] * 3
    resids = list(topology.resids) + [3] * 3
    bonds = np.concatenate([topology.bonds, [[11, 12], [11, 13]]])
    near_water = np.array([[3.5, 3.0, 1.0], [4.3, 3.3, 1.0],
                           [3.0, 3.7, 1.2]])
    positions = np.concatenate(
        [np.asarray(base_system.positions),
         near_water[None] + 0.05 * rng.normal(size=(N_FRAMES, 3, 3))],
        axis=1)
    system = System(
        Topology(names=names, elements=elements, resnames=resnames,
                 resids=resids, bonds=bonds),
        positions,
        dimensions=np.tile([20.0, 20.0, 20.0, 90.0, 90.0, 90.0],
                           (N_FRAMES, 1)))

    tfep_map = MixedMAFMap(
        potential_energy_func=MockPotential(),
        temperature=300.0 * ureg.kelvin,
        system=system,
        batch_size=6,
        n_maf_layers=2,
        mapped_atoms='resname MOL',
        conditioning_atoms='byres (resname SOL and around 4.0 resname MOL)',
        tfep_logger_dir_path=str(tmp_path / 'logs'))
    tfep_map.setup()

    # Only the near water (atoms 11-13) is conditioning; the far water
    # (atoms 8-10) is neither mapped nor conditioning -> fixed.
    np.testing.assert_array_equal(
        tfep_map.get_conditioning_indices(idx_type='atom',
                                          remove_fixed=False),
        [11, 12, 13])
    np.testing.assert_array_equal(
        tfep_map.get_fixed_indices(idx_type='atom'), [8, 9, 10])
    np.testing.assert_array_equal(
        tfep_map.get_nonfixed_indices(idx_type='atom', remove_fixed=False),
        list(range(8)) + [11, 12, 13])

    # MOL: 3 Cartesian reference + 5 IC atoms; near water all-Cartesian.
    flow = tfep_map.flow
    batch = tfep_map.dataset.get_batch([0, 1, 2])
    x = jnp.asarray(batch['positions'])
    y, ldj = flow.forward(x)
    x_back, _ = flow.inverse(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-6)
    # Fixed (far-water) DOFs pass through the map untouched.
    fixed_dofs = tfep_map.get_fixed_indices(idx_type='dof')
    np.testing.assert_array_equal(np.asarray(y[:, fixed_dofs]),
                                  np.asarray(x[:, fixed_dofs]))


def test_mixedmaf_degrees_repeats_round_trip(tmp_path):
    """Coupling-style degree blocks keep the mixed map exactly invertible."""
    tfep_map = make_map(tmp_path, degrees_repeats=4)
    tfep_map.setup()
    x = jnp.asarray(tfep_map.dataset.get_batch([0, 1, 2])['positions'])
    y, ldj = tfep_map.flow.forward(x)
    x_back, ldj_inv = tfep_map.flow.inverse(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ldj + ldj_inv), 0.0, atol=1e-6)


def test_mixedmaf_trains_and_logs(tmp_path):
    tfep_map = make_map(tmp_path)
    trainer = Trainer(save_dir=str(tmp_path / 'ckpt'), max_epochs=1,
                      shuffle=True)
    trainer.fit(tfep_map)
    assert trainer.global_step == 2  # 12 frames / batch 6
    logged = tfep_map.tfep_logger.read_train_tensors(epoch_idx=0)
    assert len(logged['potential']) == N_FRAMES


def make_two_fragment_system(n_frames=N_FRAMES, seed=3):
    """Two bonded C4H4 fragments, BOTH mapped — two Z-matrices.

    Each connected fragment gets its own 3 Cartesian reference atoms and
    its own internal-coordinate rows (reference behavior:
    /root/reference/tfep/app/mixedmaf.py:359-466 iterates connected
    components).
    """
    rng = np.random.default_rng(seed)
    names, elements, bonds, resnames, resids, base = [], [], [], [], [], []
    chain = np.array([
        [0.0, 0.0, 0.0], [1.5, 0.0, 0.0], [2.25, 1.3, 0.0],
        [1.5, 2.2, 1.1],
        [-0.5, -0.7, 0.6], [1.9, -0.6, 0.8], [3.3, 1.4, 0.4],
        [1.0, 3.0, 0.4],
    ])
    for frag in range(2):
        off = len(names)
        names += [f'{n}{frag}' for n in
                  ['C1', 'C2', 'C3', 'C4', 'H1', 'H2', 'H3', 'H4']]
        elements += ['C', 'C', 'C', 'C', 'H', 'H', 'H', 'H']
        bonds += [(a + off, b + off) for a, b in
                  [(0, 1), (1, 2), (2, 3), (0, 4), (1, 5), (2, 6), (3, 7)]]
        resnames += ['MOL'] * 8
        resids += [frag + 1] * 8
        base.append(chain + np.array([8.0, 6.0, 7.0]) * frag)
    base = np.concatenate(base)
    positions = base[None] + 0.05 * rng.normal(
        size=(n_frames, len(names), 3))
    topology = Topology(names=names, elements=elements, resnames=resnames,
                        resids=resids, bonds=bonds)
    return System(topology, positions)


def test_two_mapped_fragments_round_trip_and_jacobian(tmp_path):
    """Both fragments mapped: per-fragment Z-matrices, exact Jacobian."""
    tfep_map = MixedMAFMap(
        potential_energy_func=MockPotential(),
        temperature=300.0 * ureg.kelvin,
        system=make_two_fragment_system(),
        batch_size=6,
        n_maf_layers=2,
        tfep_logger_dir_path=str(tmp_path / 'logs'),
    )
    tfep_map.setup()

    # Two fragments: each contributes 3 Cartesian reference atoms; the
    # other 2 * 5 atoms are internal-coordinate rows.
    flow = tfep_map.flow
    z_matrix = np.asarray(flow.z_matrix)
    cart_atoms = set(np.asarray(flow.cartesian_atom_indices).tolist())
    assert len(z_matrix) == 10
    assert len(cart_atoms) == 6
    # Reference atoms must come from both fragments.
    assert any(a < 8 for a in cart_atoms) and any(a >= 8 for a in cart_atoms)
    x = jnp.asarray(tfep_map.dataset.get_batch(list(range(3)))['positions'])
    y, ldj = flow.forward(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    # Train a few steps, then the Jacobian must still match the oracle.
    trainer = Trainer(save_dir=None, max_steps=3, shuffle=True)
    import optax
    trainer.optimizer = optax.adamw(1e-3)
    flow = trainer.fit(tfep_map)
    y, ldj = flow.forward(x)
    oracle = batch_log_abs_det_J(lambda z: flow.forward(z)[0], x)
    np.testing.assert_allclose(np.asarray(ldj), np.asarray(oracle),
                               atol=1e-5)
    x_back, _ = flow.inverse(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-5)


def test_small_fragments_diatomic_and_ion(tmp_path):
    """Fragments with fewer than 3 atoms (a diatomic + a monatomic ion)
    have no complete internal frame: they stay (partly) Cartesian. The
    map must remain exactly invertible with an oracle-exact log-det
    (the reference's BFS Z-matrix covers >=3-atom fragments only;
    /root/reference/tfep/app/mixedmaf.py:482-566)."""
    rng = np.random.default_rng(0)
    names = ['O1', 'O2', 'NA', 'C1', 'C2', 'C3', 'C4',
             'H1', 'H2', 'H3', 'H4']
    elements = ['O', 'O', 'Na', 'C', 'C', 'C', 'C', 'H', 'H', 'H', 'H']
    bonds = [(0, 1), (3, 4), (4, 5), (5, 6), (3, 7), (4, 8), (5, 9),
             (6, 10)]
    base = np.array([
        [5.0, 5.0, 5.0], [6.2, 5.0, 5.0],
        [-3.0, -3.0, -3.0],
        [0.0, 0.0, 0.0], [1.5, 0.0, 0.0], [2.25, 1.3, 0.0],
        [1.5, 2.2, 1.1],
        [-0.5, -0.7, 0.6], [1.9, -0.6, 0.8], [3.3, 1.4, 0.4],
        [1.0, 3.0, 0.4]])
    positions = base[None] + 0.05 * rng.normal(size=(N_FRAMES, 11, 3))
    system = System(Topology(names=names, elements=elements, bonds=bonds),
                    positions)

    tfep_map = MixedMAFMap(
        potential_energy_func=MockPotential(),
        temperature=300.0 * ureg.kelvin,
        system=system, batch_size=8, n_maf_layers=2,
        tfep_logger_dir_path=None)
    tfep_map.setup()

    batch = {k: jnp.asarray(v)
             for k, v in tfep_map.dataset.get_batch(list(range(8))).items()}
    out = tfep_map.forward(batch)
    back = tfep_map.inverse({**batch, 'positions': out['positions']})
    np.testing.assert_allclose(np.asarray(back['positions']),
                               np.asarray(batch['positions']), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(out['log_det_J'] + back['log_det_J']), 0.0, atol=1e-12)

    x = batch['positions']
    oracle = batch_log_abs_det_J(
        lambda z: tfep_map.forward({**batch, 'positions': z})['positions'],
        x)
    np.testing.assert_allclose(np.asarray(out['log_det_J']),
                               np.asarray(oracle), atol=1e-12)
