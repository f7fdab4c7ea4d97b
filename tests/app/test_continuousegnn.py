"""ContinuousEGNNMap tests: the first-class CNF app map.

The reference only exercises CNF+EGNN through an inline test map
(tests/app/test_maps.py:68-93); this framework promotes it to a supported
map. These tests pin the app-level contract: training, invertibility,
conditioning-as-velocity-masking (influence without transport), exact-trace
agreement with the autograd oracle, per-batch Hutchinson probes, and
self-contained checkpointing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfep_tpu.app import ContinuousEGNNMap, Trainer, load_map_from_checkpoint
from tfep_tpu.io.topology import Topology
from tfep_tpu.io.traj import System
from tfep_tpu.units import ureg
from tfep_tpu.utils.math import batch_log_abs_det_J

N_FRAMES, N_ATOMS = 10, 6


class MockPotential:
    energy_unit = ureg.kilocalorie_per_mole
    positions_unit = ureg.angstrom

    def __call__(self, x, cell=None):
        return jnp.sum(x, axis=-1)


def make_system(n_frames=N_FRAMES, n_atoms=N_ATOMS, seed=0):
    rng = np.random.default_rng(seed)
    topology = Topology(
        names=[f'C{i}' for i in range(n_atoms)],
        elements=['C', 'O', 'C', 'H', 'H', 'C'][:n_atoms],
    )
    return System(topology, rng.normal(0, 1, size=(n_frames, n_atoms, 3)))


def make_map(tmp_path, **kwargs):
    kwargs.setdefault('n_egnn_layers', 2)
    kwargs.setdefault('node_feat_dim', 8)
    kwargs.setdefault('distance_feat_dim', 4)
    kwargs.setdefault('time_feat_dim', 4)
    kwargs.setdefault('solver', 'rk4')
    kwargs.setdefault('n_steps', 4)
    return ContinuousEGNNMap(
        potential_energy_func=MockPotential(),
        temperature=300.0 * ureg.kelvin,
        system=make_system(),
        batch_size=5,
        tfep_logger_dir_path=str(tmp_path / 'logs'),
        **kwargs)


def test_trains_and_round_trips(tmp_path):
    tfep_map = make_map(tmp_path)
    trainer = Trainer(save_dir=None, max_epochs=1, shuffle=False)
    trainer.fit(tfep_map)
    assert trainer.global_step == 2
    assert np.all(np.isfinite(trainer.loss_history))

    batch = {k: jnp.asarray(v)
             for k, v in tfep_map.dataset.get_batch([0, 1, 2]).items()}
    out = tfep_map.forward(batch)
    assert 'regularization' in out
    back = tfep_map.inverse({**batch, 'positions': out['positions']})
    np.testing.assert_allclose(np.asarray(back['positions']),
                               np.asarray(batch['positions']), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out['log_det_J'] + back['log_det_J']), 0.0, atol=1e-6)

    logged = tfep_map.tfep_logger.read_train_tensors(epoch_idx=0)
    assert set(logged['dataset_sample_index'].tolist()) == set(range(N_FRAMES))


def test_conditioning_atoms_condition_but_do_not_move(tmp_path):
    tfep_map = make_map(tmp_path, mapped_atoms=[0, 1, 2],
                        conditioning_atoms=[3, 4])
    trainer = Trainer(save_dir=None, max_epochs=1, shuffle=False)
    trainer.fit(tfep_map)

    batch = {k: jnp.asarray(v)
             for k, v in tfep_map.dataset.get_batch([0, 1, 2]).items()}
    out = tfep_map.forward(batch)
    x = np.asarray(batch['positions'])
    y = np.asarray(out['positions'])
    moved = np.abs(y - x).reshape(len(x), N_ATOMS, 3).max(axis=(0, 2))
    # Conditioning atoms 3,4 and fixed atom 5 are transported in place...
    np.testing.assert_allclose(moved[3:], 0.0, atol=1e-12)
    # ...while the mapped atoms moved (one epoch of training, nonzero field).
    assert moved[:3].max() > 1e-6

    # Conditioning coordinates influence the map: perturbing atom 3
    # changes the mapped atoms' images.
    perturbed = x.copy()
    perturbed[:, 9:12] += 0.3
    out2 = tfep_map.forward({**batch, 'positions': jnp.asarray(perturbed)})
    y2 = np.asarray(out2['positions'])
    assert np.abs(y2[:, :9] - y[:, :9]).max() > 1e-8


def test_exact_trace_matches_autograd_oracle(tmp_path):
    tfep_map = make_map(tmp_path, trace_estimator='exact', n_steps=8,
                        conditioning_atoms=[4], mapped_atoms=[0, 1, 2, 3])
    trainer = Trainer(save_dir=None, max_epochs=2, shuffle=False)
    trainer.fit(tfep_map)

    batch = {k: jnp.asarray(v)
             for k, v in tfep_map.dataset.get_batch([0, 1, 2]).items()}
    out = tfep_map.forward(batch)

    def positions_map(x):
        return tfep_map.forward({**batch, 'positions': x})['positions']

    oracle = batch_log_abs_det_J(positions_map, batch['positions'])
    # The trace integral and the autograd log-det of the discrete map
    # agree to the solver's order (rk4, near-identity trained field).
    np.testing.assert_allclose(np.asarray(out['log_det_J']),
                               np.asarray(oracle), atol=1e-5)


def test_hutchinson_probes_vary_per_batch(tmp_path):
    tfep_map = make_map(tmp_path)
    tfep_map.setup()
    batch = {k: jnp.asarray(v)
             for k, v in tfep_map.dataset.get_batch([0, 1, 2]).items()}
    # Nudge the field off identity so the trace estimate is probe-dependent.
    leaves, treedef = jax.tree_util.tree_flatten(tfep_map.flow)
    rngs = jax.random.split(jax.random.key(7), len(leaves))
    tfep_map.flow = jax.tree_util.tree_unflatten(
        treedef, [l + 0.05 * jax.random.normal(r, l.shape, l.dtype)
                  if hasattr(l, 'shape') and np.issubdtype(l.dtype, np.floating)
                  else l for l, r in zip(leaves, rngs)])

    ldj_a = np.asarray(tfep_map.forward(batch)['log_det_J'])
    # Same positions, different sample indices -> different probes.
    other = {**batch,
             'dataset_sample_index': batch['dataset_sample_index'] + 3}
    ldj_b = np.asarray(tfep_map.forward(other)['log_det_J'])
    assert np.abs(ldj_a - ldj_b).max() > 1e-10
    # Same batch -> identical estimate (evaluation reproducibility).
    ldj_c = np.asarray(tfep_map.forward(dict(batch))['log_det_J'])
    np.testing.assert_array_equal(ldj_a, ldj_c)

    # Same batch at a different global step -> fresh probes (the trainer
    # injects the step so probes refresh every epoch even with
    # shuffle=False, where the same batches recur).
    step0 = {**batch, 'global_step': jnp.asarray(0, dtype=jnp.uint32)}
    step7 = {**batch, 'global_step': jnp.asarray(7, dtype=jnp.uint32)}
    ldj_s0 = np.asarray(tfep_map.forward(step0)['log_det_J'])
    ldj_s7 = np.asarray(tfep_map.forward(step7)['log_det_J'])
    assert np.abs(ldj_s0 - ldj_s7).max() > 1e-10
    # And the same step reproduces exactly (crash/resume determinism).
    np.testing.assert_array_equal(
        ldj_s0, np.asarray(tfep_map.forward(dict(step0))['log_det_J']))


def test_hutchinson_probes_refresh_across_epochs_without_shuffle(tmp_path):
    """With shuffle=False the same batches recur every epoch; the trainer
    must still refresh the probes (via the injected global step) so trace
    noise is not a fixed per-sample offset the optimizer can exploit."""
    import optax

    tfep_map = make_map(tmp_path)
    # Zero learning rate: parameters are frozen, so any epoch-to-epoch
    # difference in the logged log_det_J comes from the probes alone.
    trainer = Trainer(save_dir=None, max_epochs=2, shuffle=False,
                      optimizer=optax.sgd(0.0))
    # Nudge the field off identity (identity field has zero divergence
    # everywhere, making the trace probe-independent).
    tfep_map.setup()
    leaves, treedef = jax.tree_util.tree_flatten(tfep_map.flow)
    rngs = jax.random.split(jax.random.key(11), len(leaves))
    tfep_map.flow = jax.tree_util.tree_unflatten(
        treedef, [l + 0.05 * jax.random.normal(r, l.shape, l.dtype)
                  if hasattr(l, 'shape') and np.issubdtype(l.dtype,
                                                           np.floating)
                  else l for l, r in zip(leaves, rngs)])
    trainer.fit(tfep_map)

    e0 = tfep_map.tfep_logger.read_train_tensors(epoch_idx=0)
    e1 = tfep_map.tfep_logger.read_train_tensors(epoch_idx=1)
    order0 = np.argsort(e0['dataset_sample_index'])
    order1 = np.argsort(e1['dataset_sample_index'])
    assert np.abs(e0['log_det_J'][order0]
                  - e1['log_det_J'][order1]).max() > 1e-10


def test_reference_frame_atoms_rejected(tmp_path):
    tfep_map = make_map(tmp_path, mapped_atoms=[0, 1, 2, 4, 5],
                        conditioning_atoms=[3], origin_atom=3)
    with pytest.raises(ValueError, match='equivariant'):
        tfep_map.setup()


def test_self_contained_checkpoint_round_trip(tmp_path):
    tfep_map = make_map(tmp_path, conditioning_atoms=[5])
    trainer = Trainer(save_dir=str(tmp_path / 'ckpt'), max_epochs=1,
                      shuffle=False)
    trainer.fit(tfep_map)

    restored = load_map_from_checkpoint(
        str(tmp_path / 'ckpt' / 'last.ckpt'),
        expected_class=ContinuousEGNNMap,
        potential_energy_func=MockPotential())
    batch = {k: jnp.asarray(v)
             for k, v in tfep_map.dataset.get_batch([0, 1]).items()}
    np.testing.assert_allclose(
        np.asarray(restored.forward(batch)['positions']),
        np.asarray(tfep_map.forward(batch)['positions']), atol=1e-12)
