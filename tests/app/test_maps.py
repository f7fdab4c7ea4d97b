"""App-layer integration tests: real training runs with a mock potential.

Mirrors the reference integration tests (tests/app/test_maps.py): error
paths for bad selections, end-to-end training for the Cartesian MAF map with
and without reference-frame atoms, and the crash/mid-epoch-resume invariant
(union of visited samples across a crash = one full epoch, no repeats).
"""

import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfep_tpu.app import CartesianMAFMap, TFEPMapBase, Trainer
from tfep_tpu.io.topology import Topology
from tfep_tpu.io.traj import System
from tfep_tpu.units import ureg

N_FRAMES, N_ATOMS = 10, 6


class MockPotential:
    """u(x) = sum(x) — the reference's MockPotential (tests/__init__.py:31)."""
    energy_unit = ureg.kilocalorie_per_mole
    positions_unit = ureg.angstrom

    def __call__(self, x, cell=None):
        return jnp.sum(x, axis=-1)


def make_system(n_frames=N_FRAMES, n_atoms=N_ATOMS, seed=0):
    rng = np.random.default_rng(seed)
    topology = Topology(
        names=[f'C{i}' for i in range(n_atoms)],
        elements=['C'] * n_atoms,
        resnames=['MOL'] * (n_atoms // 2) + ['SOL'] * (n_atoms - n_atoms // 2),
        resids=[1] * (n_atoms // 2) + [2] * (n_atoms - n_atoms // 2),
    )
    positions = rng.normal(0, 1, size=(n_frames, n_atoms, 3))
    return System(topology, positions)


def make_map(tmp_path, name='logs', **kwargs):
    kwargs.setdefault('n_maf_layers', 2)
    return CartesianMAFMap(
        potential_energy_func=MockPotential(),
        temperature=300.0 * ureg.kelvin,
        system=make_system(),
        batch_size=5,
        tfep_logger_dir_path=str(tmp_path / name),
        **kwargs)


def test_overlapping_selections_raise(tmp_path):
    tfep_map = make_map(tmp_path, mapped_atoms=[0, 1, 2],
                        conditioning_atoms=[2, 3])
    with pytest.raises(ValueError, match='overlapping'):
        tfep_map.setup()


def test_origin_must_be_conditioning(tmp_path):
    tfep_map = make_map(tmp_path, mapped_atoms=[0, 1, 2],
                        conditioning_atoms=[3], origin_atom=0)
    with pytest.raises(ValueError, match='conditioning'):
        tfep_map.setup()


def test_fixed_axes_atoms_raise(tmp_path):
    tfep_map = make_map(tmp_path, mapped_atoms=[0, 1],
                        conditioning_atoms=[2], axes_atoms=[4, 5])
    with pytest.raises(ValueError, match='axis and plane'):
        tfep_map.setup()


def test_system_and_file_path_mutually_exclusive(tmp_path):
    # Both sources would train on `system` while the checkpoint recorded
    # only the (unread) file path — a restored map would silently differ.
    with pytest.raises(ValueError, match='not both'):
        make_map(tmp_path, coordinates_file_path='traj.pdb')


def test_no_mapped_atoms_raise(tmp_path):
    tfep_map = make_map(tmp_path, conditioning_atoms='all')
    with pytest.raises(ValueError, match='no atoms to map'):
        tfep_map.setup()


@pytest.mark.parametrize('selections', [
    dict(),
    dict(mapped_atoms=[0, 1, 2, 3]),
    dict(mapped_atoms='resname MOL', conditioning_atoms=[3]),
    dict(mapped_atoms=[0, 1, 2], conditioning_atoms=[3],
         origin_atom=3, axes_atoms=[0, 1]),
])
def test_cartesian_maf_map_trains(tmp_path, selections):
    tfep_map = make_map(tmp_path, **selections)
    trainer = Trainer(save_dir=str(tmp_path / 'ckpt'), max_epochs=2,
                      shuffle=True)
    flow = trainer.fit(tfep_map)
    assert trainer.global_step == 4  # 10 samples / batch 5 * 2 epochs

    # Mapped positions differ from input; fixed atoms don't move.
    batch = {k: jnp.asarray(v)
             for k, v in tfep_map.dataset.get_batch([0, 1]).items()}
    out = tfep_map.forward(batch)
    assert out['positions'].shape == batch['positions'].shape
    assert np.all(np.isfinite(np.asarray(out['positions'])))
    if tfep_map.n_fixed_atoms > 0:
        from tfep_tpu.utils.misc import atom_to_flattened_indices
        fixed_dofs = atom_to_flattened_indices(
            tfep_map._fixed_atom_indices)
        np.testing.assert_array_equal(
            np.asarray(out['positions'][:, fixed_dofs]),
            np.asarray(batch['positions'][:, fixed_dofs]))

    # Logger recorded per-sample potentials for both epochs.
    logged = tfep_map.tfep_logger.read_train_tensors(epoch_idx=1)
    assert len(logged['potential']) == N_FRAMES
    assert set(logged['dataset_sample_index'].tolist()) == set(range(N_FRAMES))


def test_pca_whitening_trains(tmp_path):
    """CartesianMAFMap(pca_whitening=True) fits the whitening on the
    MAF-level coordinates and trains end-to-end with exact log-dets."""
    tfep_map = CartesianMAFMap(
        potential_energy_func=MockPotential(),
        temperature=300.0 * ureg.kelvin,
        system=make_system(n_frames=64),
        batch_size=16,
        tfep_logger_dir_path=str(tmp_path / 'logs'),
        n_maf_layers=2,
        pca_whitening=True,
        mapped_atoms=[1, 2, 3, 4, 5], conditioning_atoms=[0],
        origin_atom=0, axes_atoms=[1, 2])
    trainer = Trainer(save_dir=None, max_epochs=1, shuffle=False)
    trainer.fit(tfep_map)
    assert np.all(np.isfinite(trainer.loss_history))

    # The composed flow's log-det stays exact (oracle check).
    from tfep_tpu.utils.math import batch_autograd_log_abs_det_J
    batch = {k: jnp.asarray(v)
             for k, v in tfep_map.dataset.get_batch([0, 1, 2]).items()}
    out = tfep_map.forward(batch)
    oracle = batch_autograd_log_abs_det_J(
        lambda x: tfep_map.flow.forward(x)[0], batch['positions'])
    np.testing.assert_allclose(np.asarray(out['log_det_J']),
                               np.asarray(oracle), atol=1e-7)


def test_pca_whitening_needs_enough_frames(tmp_path):
    tfep_map = make_map(tmp_path, pca_whitening=True)  # 10 frames, 18 dofs
    with pytest.raises(ValueError, match='more frames'):
        tfep_map.setup()


def test_crash_resume_invariant(tmp_path):
    """Union of visited samples across a crash = one epoch, no repeats."""
    visited = []

    class RecordingMap(CartesianMAFMap):
        def log_train_tensors(self, aux, epoch_idx, batch_idx):
            visited.append((epoch_idx,
                            np.asarray(aux['dataset_sample_index']).tolist()))
            super().log_train_tensors(aux, epoch_idx, batch_idx)

    def new_map(name):
        return RecordingMap(
            potential_energy_func=MockPotential(),
            temperature=300.0 * ureg.kelvin,
            system=make_system(),
            batch_size=5,
            n_maf_layers=2,
            tfep_logger_dir_path=str(tmp_path / name))

    ckpt = str(tmp_path / 'ckpt')

    # "Crash" after 3 steps (1.5 epochs at 2 batches/epoch).
    t1 = Trainer(save_dir=ckpt, max_steps=3, shuffle=True)
    t1.fit(new_map('logs1'))
    assert t1.global_step == 3

    # Resume and complete epoch 1 + run epoch 2.
    t2 = Trainer(save_dir=ckpt, max_steps=6, shuffle=True)
    t2.fit(new_map('logs1'), resume=True)
    assert t2.global_step == 6

    # Epoch 1's two halves (pre- and post-crash) partition the dataset.
    epoch1_batches = [s for e, s in visited if e == 1]
    assert len(epoch1_batches) == 2
    all_epoch1 = [i for b in epoch1_batches for i in b]
    assert sorted(all_epoch1) == list(range(N_FRAMES))


def test_checkpoint_restores_parameters(tmp_path):
    tfep_map = make_map(tmp_path, name='logs_a')
    trainer = Trainer(save_dir=str(tmp_path / 'ckpt'), max_steps=3,
                      shuffle=False)
    flow = trainer.fit(tfep_map)

    tfep_map2 = make_map(tmp_path, name='logs_b')
    trainer2 = Trainer(save_dir=str(tmp_path / 'ckpt'), max_steps=3,
                       shuffle=False)
    tfep_map2.setup()
    flow2, _ = trainer2._load_checkpoint(
        tfep_map2.flow, trainer2.optimizer.init(
            __import__('tfep_tpu.nn.module', fromlist=['partition']
                       ).partition(tfep_map2.flow)[0]), _DummySampler())
    l1 = jax.tree_util.tree_leaves(flow)
    l2 = jax.tree_util.tree_leaves(flow2)
    assert all(np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(l1, l2))


class _DummySampler:
    def load_state_dict(self, sd):
        pass

    def state_dict(self):
        return {}


def test_degrees_repeats_coupling_blocks(tmp_path):
    """degrees_repeats=k at the map level: the inverse needs ceil(n/k)
    conditioner passes instead of n, and stays exact."""
    from tfep_tpu.nn.flows.autoregressive import AutoregressiveFlow

    def maf_layers_of(flow):
        found = []

        def visit(node):
            if isinstance(node, AutoregressiveFlow):
                found.append(node)
            for child in getattr(node, '__dict__', {}).values():
                if hasattr(child, '__dict__'):
                    visit(child)
            for child in getattr(node, 'flows', ()) or ():
                visit(child)

        visit(flow)
        return found

    n_dofs = N_ATOMS * 3   # 18 mapped DOFs, no conditioning
    for repeats, expected_groups in [(1, n_dofs), (6, 3)]:
        tfep_map = make_map(tmp_path, name=f'logs_rep{repeats}',
                            degrees_repeats=repeats)
        tfep_map.setup()
        layers = maf_layers_of(tfep_map.flow)
        assert layers, 'no MAF layers found in the flow tree'
        for layer in layers:
            assert layer.inverse_masks.shape[0] == expected_groups

        x = jnp.asarray(tfep_map.dataset.get_batch([0, 1])['positions'])
        y, ldj = tfep_map.flow.forward(x)
        x_back, ldj_inv = tfep_map.flow.inverse(y)
        np.testing.assert_allclose(np.asarray(x_back), np.asarray(x),
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(ldj + ldj_inv), 0.0,
                                   atol=1e-8)


def test_degrees_repeats_trains(tmp_path):
    tfep_map = make_map(tmp_path, name='logs_rep_train', degrees_repeats=4)
    trainer = Trainer(save_dir=None, max_steps=3, shuffle=False)
    flow = trainer.fit(tfep_map)
    assert np.isfinite(trainer.loss_history).all()
    x = jnp.asarray(tfep_map.dataset.get_batch([0, 1])['positions'])
    y, _ = flow.forward(x)
    x_back, _ = flow.inverse(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-6)


def test_epoch_boundary_checkpoint_resume_adds_no_extra_epoch(tmp_path):
    """A checkpoint written on the last step of an epoch must store the
    *next* epoch: resuming a finished run trains zero extra steps."""
    tfep_map = make_map(tmp_path, name='logs_eb')
    trainer = Trainer(save_dir=str(tmp_path / 'eb'), max_epochs=2,
                      shuffle=False)
    trainer.fit(tfep_map)
    assert trainer.global_step == 4        # 10 frames / batch 5 * 2 epochs

    map2 = make_map(tmp_path, name='logs_eb2')
    t2 = Trainer(save_dir=str(tmp_path / 'eb'), max_epochs=2, shuffle=False)
    t2.fit(map2, resume=True)
    assert t2.global_step == 4             # not 6: no replayed epoch
    assert t2.current_epoch == 2


def test_finished_max_steps_resume_trains_zero_steps(tmp_path):
    """Resuming a run that already hit max_steps must not overshoot the
    budget (and must not overwrite the checkpoint with extra updates)."""
    tfep_map = make_map(tmp_path, name='logs_ms')
    trainer = Trainer(save_dir=str(tmp_path / 'ms'), max_steps=3,
                      shuffle=False)
    flow = trainer.fit(tfep_map)
    leaves_before = [np.asarray(l) for l in jax.tree_util.tree_leaves(flow)]

    map2 = make_map(tmp_path, name='logs_ms2')
    t2 = Trainer(save_dir=str(tmp_path / 'ms'), max_steps=3, shuffle=False)
    flow2 = t2.fit(map2, resume=True)
    assert t2.global_step == 3
    for a, b in zip(leaves_before, jax.tree_util.tree_leaves(flow2)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_checkpoint_acknowledged_steps_have_logged_rows(tmp_path):
    """The per-sample log rows of every checkpointed (acknowledged) step
    are flushed before the checkpoint is written: a crash right after a
    save cannot lose work values for batches a resume will skip."""

    class CrashAfterSave(Trainer):
        def _save_checkpoint(self, *args, **kwargs):
            super()._save_checkpoint(*args, **kwargs)
            if self.global_step == 2:
                raise RuntimeError('crash right after the save')

    tfep_map = make_map(tmp_path, name='logs_fl')
    trainer = CrashAfterSave(save_dir=str(tmp_path / 'fl'), max_epochs=1,
                             shuffle=False)
    with pytest.raises(RuntimeError, match='right after the save'):
        trainer.fit(tfep_map)
    # Both acknowledged batches (steps 1 and 2) are fully logged.
    logged = tfep_map.tfep_logger.read_train_tensors(epoch_idx=0)
    assert set(logged['dataset_sample_index'].tolist()) == set(range(10))


def test_self_contained_checkpoint_round_trip(tmp_path):
    """A trained map is reconstructed from the checkpoint file alone —
    no live map object, no hand-rebuilt configuration (the reference gets
    this from Lightning save_hyperparameters, app/base.py:196)."""
    from tfep_tpu.app import load_map_from_checkpoint

    tfep_map = make_map(tmp_path, name='logs_sc', remat=False,
                        mapped_atoms='resname MOL', conditioning_atoms=[3])
    trainer = Trainer(save_dir=str(tmp_path / 'ckpt_sc'), max_steps=3,
                      shuffle=False)
    flow = trainer.fit(tfep_map)
    x = jnp.asarray(tfep_map.dataset.get_batch([0, 1])['positions'])
    y_ref, ldj_ref = flow.forward(x)

    # Reconstruct from the file alone (both the functional and the
    # classmethod spelling).
    for loader in (
            lambda p: load_map_from_checkpoint(p),
            lambda p: CartesianMAFMap.load_from_checkpoint(p)):
        restored = loader(str(tmp_path / 'ckpt_sc' / 'last.ckpt'))
        assert isinstance(restored, CartesianMAFMap)
        assert restored.n_maf_layers == tfep_map.n_maf_layers
        assert restored._mapped_atoms == 'resname MOL'
        y, ldj = restored.flow.forward(x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(ldj), np.asarray(ldj_ref),
                                   atol=1e-12)

    # Wrong expected class raises clearly.
    from tfep_tpu.app import MixedMAFMap
    with pytest.raises(ValueError, match='not a MixedMAFMap'):
        MixedMAFMap.load_from_checkpoint(
            str(tmp_path / 'ckpt_sc' / 'last.ckpt'))


def test_checkpoint_unpicklable_hparams_need_override(tmp_path):
    """Unpicklable hyperparameters are recorded by name; the loader
    demands them as overrides instead of failing opaquely."""
    from tfep_tpu.app import load_map_from_checkpoint

    class UnpicklablePotential:
        energy_unit = ureg.kilocalorie_per_mole
        positions_unit = ureg.angstrom

        def __init__(self):
            self._handle = lambda x: x   # closures do not pickle

        def __call__(self, x, cell=None):
            return jnp.sum(x, axis=-1)

    tfep_map = CartesianMAFMap(
        potential_energy_func=UnpicklablePotential(),
        temperature=300.0 * ureg.kelvin,
        system=make_system(),
        batch_size=5,
        n_maf_layers=2,
        tfep_logger_dir_path=str(tmp_path / 'logs_unp'))
    trainer = Trainer(save_dir=str(tmp_path / 'ckpt_unp'), max_steps=2,
                      shuffle=False)
    trainer.fit(tfep_map)

    path = str(tmp_path / 'ckpt_unp' / 'last.ckpt')
    with pytest.raises(ValueError, match='potential_energy_func'):
        load_map_from_checkpoint(path)
    restored = load_map_from_checkpoint(
        path, potential_energy_func=MockPotential())
    assert isinstance(restored.flow, type(tfep_map.flow))


def test_checkpoint_version_mismatch_raises(tmp_path):
    import pickle

    from tfep_tpu.app import load_map_from_checkpoint
    from tfep_tpu.app.trainer import CHECKPOINT_FORMAT_VERSION

    path = str(tmp_path / 'future.ckpt')
    with open(path, 'wb') as f:
        pickle.dump({'format_version': CHECKPOINT_FORMAT_VERSION + 1,
                     'flow_leaves': [], 'opt_leaves': [],
                     'global_step': 0, 'current_epoch': 0,
                     'sampler_state': {}}, f)
    with pytest.raises(ValueError, match='format version'):
        load_map_from_checkpoint(path)

    # The resume path rejects it too.
    tfep_map = make_map(tmp_path, name='logs_ver')
    trainer = Trainer(save_dir=str(tmp_path), max_steps=1, shuffle=False)
    os.replace(path, trainer.checkpoint_path)
    with pytest.raises(ValueError, match='format version'):
        trainer.fit(tfep_map, resume=True)


def test_pre_versioning_checkpoint_not_self_contained(tmp_path):
    """A leaves-only (format 0) checkpoint loads for resume but refuses
    load_map_from_checkpoint with a clear message."""
    import pickle

    from tfep_tpu.app import load_map_from_checkpoint

    path = str(tmp_path / 'old.ckpt')
    with open(path, 'wb') as f:
        pickle.dump({'flow_leaves': [], 'opt_leaves': [],
                     'global_step': 0, 'current_epoch': 0,
                     'sampler_state': {}}, f)
    with pytest.raises(ValueError, match='does not embed'):
        load_map_from_checkpoint(path)


def test_run_evaluation(tmp_path):
    tfep_map = make_map(tmp_path, name='logs_eval')
    trainer = Trainer(save_dir=None, max_steps=2, shuffle=False)
    trainer.fit(tfep_map)

    tensors = tfep_map.run_evaluation(step_idx=trainer.global_step,
                                      batch_size=4)  # 10 % 4 != 0: pad path
    assert len(tensors['potential']) == N_FRAMES
    assert sorted(tensors['dataset_sample_index'].tolist()) == \
        list(range(N_FRAMES))

    # Read back through the logger's eval channel.
    logged = tfep_map.tfep_logger.read_eval_tensors(
        step_idx=trainer.global_step, sort_by='dataset_sample_index')
    np.testing.assert_array_equal(logged['dataset_sample_index'],
                                  np.arange(N_FRAMES))
    assert np.all(np.isfinite(logged['log_det_J']))


class ContinuousTFEPMap(TFEPMapBase):
    """CNF + EGNN dynamics through the app layer.

    The reference exercises this combination with an inline map in its
    integration tests (tests/app/test_maps.py:68-93); here the EGNN node
    types come from the topology elements of the non-fixed atoms and the
    Finlay regularization channel flows into the training loss.
    """

    def configure_flow(self):
        from tfep_tpu.nn.dynamics import EGNNDynamics
        from tfep_tpu.nn.flows import ContinuousFlow

        elements = np.asarray(self._system.topology.elements)
        if self.n_fixed_atoms > 0:
            nonfixed = np.setdiff1d(np.arange(len(elements)),
                                    np.asarray(self._fixed_atom_indices))
            elements = elements[nonfixed]
        unique = {e: i for i, e in enumerate(sorted(set(elements)))}
        node_types = [unique[e] for e in elements]

        dynamics = EGNNDynamics.create(
            jax.random.key(self.seed), node_types=node_types, r_cutoff=6.0,
            time_feat_dim=4, node_feat_dim=8, distance_feat_dim=4,
            n_layers=2)
        return ContinuousFlow.create(
            dynamics, trace_estimator='hutchinson', solver='rk4',
            n_steps=4, regularization=True)


def test_continuous_map_trains(tmp_path):
    """CNF+EGNN map: end-to-end training with the regularization channel."""
    tfep_map = ContinuousTFEPMap(
        potential_energy_func=MockPotential(),
        temperature=300.0 * ureg.kelvin,
        system=make_system(),
        batch_size=5,
        tfep_logger_dir_path=str(tmp_path / 'logs'))
    trainer = Trainer(save_dir=None, max_epochs=1, shuffle=False)
    trainer.fit(tfep_map)
    assert trainer.global_step == 2
    assert len(trainer.loss_history) == 2
    assert np.all(np.isfinite(trainer.loss_history))

    # Forward exposes the regularization channel; positions change and
    # the inverse recovers the inputs (identity-init keeps drift small,
    # training has moved the field slightly).
    batch = {k: jnp.asarray(v)
             for k, v in tfep_map.dataset.get_batch([0, 1, 2]).items()}
    out = tfep_map.forward(batch)
    assert 'regularization' in out
    assert np.all(np.isfinite(np.asarray(out['regularization'])))
    back = tfep_map.inverse({**batch, 'positions': out['positions']})
    np.testing.assert_allclose(np.asarray(back['positions']),
                               np.asarray(batch['positions']), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out['log_det_J'] + back['log_det_J']), 0.0, atol=1e-6)

    # Per-sample logging worked for the CNF map too.
    logged = tfep_map.tfep_logger.read_train_tensors(epoch_idx=0)
    assert set(logged['dataset_sample_index'].tolist()) == set(range(N_FRAMES))


def test_reference_frame_index_arithmetic(tmp_path):
    """get_mapped/conditioning_indices with remove_reference: the origin
    atom loses 3 DOFs, the axis atom 2 (x,y), the plane atom 1 (y) —
    mirrors the reference's _remove_reference_indices arithmetic
    (/root/reference/tfep/app/cartesianmaf.py:324-367)."""
    tfep_map = make_map(tmp_path, mapped_atoms=[0, 1, 2],
                        conditioning_atoms=[3, 4, 5],
                        origin_atom=3, axes_atoms=[4, 5])
    tfep_map.setup()

    # Atom indices (remove_fixed=True is a no-op here: nothing is fixed).
    np.testing.assert_array_equal(
        tfep_map.get_mapped_indices(idx_type='atom'), [0, 1, 2])
    np.testing.assert_array_equal(
        tfep_map.get_conditioning_indices(idx_type='atom'), [3, 4, 5])

    # DOF indices without reference removal: straight x3 expansion.
    np.testing.assert_array_equal(
        tfep_map.get_mapped_indices(idx_type='dof'), np.arange(9))
    np.testing.assert_array_equal(
        tfep_map.get_conditioning_indices(idx_type='dof'),
        np.arange(9, 18))

    # With remove_reference: origin atom 3 loses DOFs 9-11 entirely; axis
    # atom 4 loses x,y (12, 13); plane atom 5 loses y (16). Remaining
    # conditioning DOFs shift down by the removals before them.
    np.testing.assert_array_equal(
        tfep_map.get_mapped_indices(idx_type='dof', remove_reference=True),
        np.arange(9))
    np.testing.assert_array_equal(
        tfep_map.get_conditioning_indices(idx_type='dof',
                                          remove_reference=True),
        [9, 10, 11])

    # Atom indices with remove_reference: the three reference atoms are
    # removed; only the mapped atoms remain (shifted by nothing here).
    np.testing.assert_array_equal(
        tfep_map.get_mapped_indices(idx_type='atom', remove_reference=True),
        [0, 1, 2])
    cond = tfep_map.get_conditioning_indices(idx_type='atom',
                                             remove_reference=True)
    assert len(cond) == 0


def test_reference_frame_flow_dof_count(tmp_path):
    """The wrapped flow must see n_dofs - 6 features when origin+axes atoms
    are set (3 origin + 2 axis + 1 plane constrained DOFs)."""
    tfep_map = make_map(tmp_path, mapped_atoms=[0, 1, 2],
                        conditioning_atoms=[3, 4, 5],
                        origin_atom=3, axes_atoms=[4, 5])
    tfep_map.setup()
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, N_ATOMS * 3)))
    out = tfep_map.forward({'positions': x})
    y, ldj = out['positions'], out['log_det_J']
    assert y.shape == x.shape
    # The constrained frame makes exactly 6 DOFs non-learnable: moving the
    # whole system rigidly changes y only through the frame restore.
    assert np.all(np.isfinite(np.asarray(ldj)))


def test_app_forward_inverse_round_trip(tmp_path):
    """map.inverse(map.forward(x)) == x through the full app stack
    (PartialFlow + Oriented + Centroid wrapping), with cancelling
    log-dets — the reference forward/inverse dict contract
    (/root/reference/tfep/app/base.py:731-778)."""
    tfep_map = make_map(tmp_path, mapped_atoms=[0, 1, 2],
                        conditioning_atoms=[3, 4, 5],
                        origin_atom=3, axes_atoms=[4, 5])
    tfep_map.setup()
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(4, N_ATOMS * 3)))
    fwd = tfep_map.forward({'positions': x})
    back = tfep_map.inverse({'positions': fwd['positions']})
    np.testing.assert_allclose(np.asarray(back['positions']),
                               np.asarray(x), atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(fwd['log_det_J'] + back['log_det_J']), 0.0, atol=1e-8)


# ---------------------------------------------------------------------- #
# Batch prefetch
# ---------------------------------------------------------------------- #

def _train_two_epochs(tmp_path, name, prefetch):
    tfep_map = make_map(tmp_path, name=name)
    trainer = Trainer(save_dir=None, max_epochs=2, shuffle=True,
                      shuffle_seed=11, prefetch=prefetch)
    trainer.fit(tfep_map)
    from tfep_tpu.nn.module import partition
    leaves = jax.tree_util.tree_leaves(partition(tfep_map.flow)[0])
    return trainer.loss_history, [np.asarray(l) for l in leaves]


def test_prefetch_trains_identically(tmp_path):
    """prefetch=True changes when the host read happens, not the math:
    same seeded shuffle, same loss history, bit-identical parameters."""
    losses_sync, params_sync = _train_two_epochs(tmp_path, 'sync', False)
    losses_pre, params_pre = _train_two_epochs(tmp_path, 'pre', True)
    assert losses_sync == losses_pre
    for a, b in zip(params_sync, params_pre):
        np.testing.assert_array_equal(a, b)


def test_prefetch_early_exit_max_steps(tmp_path):
    """Stopping mid-epoch (max_steps) must release the prefetch worker
    and train exactly max_steps batches."""
    tfep_map = make_map(tmp_path, name='early')
    trainer = Trainer(save_dir=None, max_steps=3, shuffle=True,
                      shuffle_seed=5, prefetch=True)
    trainer.fit(tfep_map)
    assert trainer.global_step == 3
    assert len(trainer.loss_history) == 3


def test_prefetch_crash_resume_invariant(tmp_path):
    """The mid-epoch resume contract holds under prefetch: the union of
    visited samples across the crash is exactly one epoch, no repeats."""
    save_dir = str(tmp_path / 'ckpt_prefetch')

    tfep_map = make_map(tmp_path, name='pf_a')
    trainer = Trainer(save_dir=save_dir, max_steps=1, shuffle=True,
                      shuffle_seed=3, prefetch=True)
    trainer.fit(tfep_map)                      # "crash" after 1 of 2 batches

    tfep_map2 = make_map(tmp_path, name='pf_a')
    trainer2 = Trainer(save_dir=save_dir, max_epochs=1, shuffle=True,
                       shuffle_seed=3, prefetch=True)
    trainer2.fit(tfep_map2, resume=True)
    assert trainer2.global_step == 2

    data = tfep_map2.tfep_logger.read_train_tensors(epoch_idx=0)
    visited = np.sort(np.asarray(data['dataset_sample_index']))
    np.testing.assert_array_equal(visited, np.arange(N_FRAMES))
