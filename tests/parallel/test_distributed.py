"""Multi-device path tests on the virtual 8-device CPU mesh.

Covers what the driver's dryrun alone cannot: sharding helper placement
semantics, a fully sharded ``Trainer.fit`` (replicated params + frame-axis
batches) including the mid-epoch crash/resume invariant under sharding,
per-host frame splits, the per-host-logger -> ``all_hosts_work_values``
round trip, and a weak-scaling harness smoke run.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfep_tpu.io.log import TFEPLogger
from tfep_tpu.parallel.distributed import (
    all_hosts_work_values, host_frame_indices, host_logger_dir,
)
from tfep_tpu.parallel.sharding import (
    batch_sharding, make_mesh, replicate, replicated_sharding, shard_batch,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason='needs the 8-device virtual CPU mesh')


# =============================================================================
# Host frame splits
# =============================================================================

@pytest.mark.parametrize('n_frames,n_hosts', [
    (16, 4),   # even split
    (17, 4),   # remainder dropped so every host holds 4 frames
    (1, 1),
])
def test_host_frame_indices_partition(n_frames, n_hosts):
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        shards = [host_frame_indices(n_frames, h, n_hosts)
                  for h in range(n_hosts)]
    # Equal-sized, disjoint, in-order contiguous shards: unequal shards
    # would desynchronize the hosts' per-epoch batch counts.
    per_host = n_frames // n_hosts
    all_indices = np.concatenate(shards)
    np.testing.assert_array_equal(all_indices,
                                  np.arange(per_host * n_hosts))
    assert {len(s) for s in shards} == {per_host}
    for shard in shards:
        np.testing.assert_array_equal(
            shard, np.arange(shard[0], shard[0] + len(shard)))


def test_host_frame_indices_remainder_warns_and_drops():
    # 10 frames over 4 hosts: equal shards of 2, the last 2 dropped loudly.
    with pytest.warns(UserWarning, match='dropping the trailing 2'):
        sizes = [len(host_frame_indices(10, h, 4)) for h in range(4)]
    assert sizes == [2, 2, 2, 2]
    # More hosts than frames is a configuration error, not empty shards.
    with pytest.raises(ValueError, match='at least one frame'):
        host_frame_indices(3, 0, 4)


# =============================================================================
# Per-host logger round trip
# =============================================================================

def test_all_hosts_work_values_roundtrip(tmp_path):
    base = str(tmp_path / 'logs')
    n_frames, n_hosts = 9, 3
    for host in range(n_hosts):
        frames = host_frame_indices(n_frames, host, n_hosts)
        logger = TFEPLogger(save_dir_path=host_logger_dir(base, host),
                            batch_size=len(frames),
                            n_samples_per_epoch=len(frames))
        logger.save_train_tensors({
            'dataset_sample_index': frames,
            'potential': frames * 1.5,
            'log_det_J': np.zeros(len(frames)),
        }, epoch_idx=0, batch_idx=0)

    # n_hosts discovered from the host-* directories.
    merged = all_hosts_work_values(base, epoch_idx=0)
    order = np.argsort(merged['dataset_sample_index'])
    np.testing.assert_array_equal(
        merged['dataset_sample_index'][order], np.arange(n_frames))
    np.testing.assert_allclose(merged['potential'][order],
                               np.arange(n_frames) * 1.5)


# =============================================================================
# Sharding helper placement semantics
# =============================================================================

def test_mesh_and_batch_placement():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)

    batch = {'positions': np.zeros((16, 6)), 'index': np.arange(16)}
    sharded = shard_batch(batch, mesh)
    for value in sharded.values():
        assert value.sharding == batch_sharding(mesh)
        # Frame axis split: each device holds 16/8 = 2 rows.
        shard_shapes = {s.data.shape[0] for s in value.addressable_shards}
        assert shard_shapes == {2}

    params = {'w': jnp.ones((3, 3)), 'b': jnp.zeros(3)}
    replicated = replicate(params, mesh)
    for value in jax.tree_util.tree_leaves(replicated):
        assert value.sharding == replicated_sharding(mesh)
        assert value.sharding.is_fully_replicated


def test_smaller_mesh_uses_prefix_of_devices():
    mesh = make_mesh(4)
    assert list(mesh.devices) == jax.devices()[:4]


# =============================================================================
# Sharded end-to-end training
# =============================================================================

def _make_sharded_map_and_trainer(tmp_path, mesh, name='logs', max_epochs=2,
                                  map_cls=None, **trainer_kwargs):
    from tests.app.test_maps import MockPotential, make_system
    from tfep_tpu.app import CartesianMAFMap, Trainer
    from tfep_tpu.units import ureg

    map_cls = map_cls or CartesianMAFMap
    tfep_map = map_cls(
        potential_energy_func=MockPotential(),
        temperature=300.0 * ureg.kelvin,
        system=make_system(n_frames=16, n_atoms=4),
        batch_size=8,
        tfep_logger_dir_path=str(tmp_path / name),
        n_maf_layers=2)
    trainer = Trainer(save_dir=str(tmp_path / f'{name}-ckpt'),
                      max_epochs=max_epochs,
                      shuffle=True,
                      sharding=batch_sharding(mesh),
                      **trainer_kwargs)
    return tfep_map, trainer


def test_sharded_trainer_fit(tmp_path):
    """Full Trainer.fit with frame-sharded batches on the 8-device mesh."""
    mesh = make_mesh(8)
    tfep_map, trainer = _make_sharded_map_and_trainer(tmp_path, mesh)
    flow = trainer.fit(tfep_map)
    assert trainer.global_step == 4  # 16 frames / batch 8 * 2 epochs

    # The logged epoch is complete and finite despite device sharding.
    logged = tfep_map.tfep_logger.read_train_tensors(epoch_idx=1)
    assert set(logged['dataset_sample_index'].tolist()) == set(range(16))
    assert np.all(np.isfinite(logged['potential']))

    # A forward pass on a sharded batch keeps the batch sharding.
    batch = tfep_map.dataset.get_batch(list(range(8)))
    batch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
    out = tfep_map.forward(batch)
    assert out['positions'].sharding.spec == batch_sharding(mesh).spec


def test_sharded_continuous_egnn_map_fit(tmp_path):
    """The CNF+EGNN map trains over frame-sharded batches: the per-batch
    Hutchinson key derivation and the velocity-masked dynamics must both
    trace cleanly under GSPMD."""
    from tests.app.test_maps import MockPotential, make_system
    from tfep_tpu.app import ContinuousEGNNMap, Trainer
    from tfep_tpu.units import ureg

    mesh = make_mesh(8)
    tfep_map = ContinuousEGNNMap(
        potential_energy_func=MockPotential(),
        temperature=300.0 * ureg.kelvin,
        system=make_system(n_frames=16, n_atoms=4),
        batch_size=8,
        conditioning_atoms=[3],
        tfep_logger_dir_path=str(tmp_path / 'cnf_logs'),
        n_egnn_layers=2, node_feat_dim=8, distance_feat_dim=4,
        time_feat_dim=4, solver='rk4', n_steps=4)
    trainer = Trainer(save_dir=None, max_epochs=1, shuffle=False,
                      sharding=batch_sharding(mesh))
    trainer.fit(tfep_map)
    assert trainer.global_step == 2
    assert np.all(np.isfinite(trainer.loss_history))
    logged = tfep_map.tfep_logger.read_train_tensors(epoch_idx=0)
    assert set(logged['dataset_sample_index'].tolist()) == set(range(16))


def test_sharded_crash_resume_invariant(tmp_path):
    """Mid-epoch crash/resume under sharding: one epoch, no repeats."""
    from tests.app.test_maps import MockPotential, make_system
    from tfep_tpu.app import CartesianMAFMap, Trainer
    from tfep_tpu.units import ureg

    mesh = make_mesh(4)  # batch 4 must divide the device count
    visited = []

    class CrashingMap(CartesianMAFMap):
        crash_at_step = None

        def log_train_tensors(self, aux, epoch_idx, batch_idx):
            super().log_train_tensors(aux, epoch_idx, batch_idx)
            visited.append(
                np.asarray(aux['dataset_sample_index']).tolist())

    def build(name):
        tfep_map = CrashingMap(
            potential_energy_func=MockPotential(),
            temperature=300.0 * ureg.kelvin,
            system=make_system(n_frames=16, n_atoms=4),
            batch_size=4,
            tfep_logger_dir_path=str(tmp_path / name),
            n_maf_layers=2)
        trainer = Trainer(save_dir=str(tmp_path / 'ckpt'), max_epochs=1,
                          shuffle=True, sharding=batch_sharding(mesh))
        return tfep_map, trainer

    # First run: stop after 2 of 4 batches (simulated crash).
    tfep_map, trainer = build('logs-a')
    trainer.max_steps = 2
    trainer.fit(tfep_map)
    assert trainer.global_step == 2

    # Resume: same checkpoint dir, run to the end of the epoch.
    tfep_map, trainer = build('logs-b')
    trainer.fit(tfep_map, resume=True)
    assert trainer.global_step == 4

    seen = [i for batch in visited for i in batch]
    assert len(seen) == 16, 'crash+resume must visit each sample once'
    assert set(seen) == set(range(16))


# =============================================================================
# Weak-scaling harness smoke test
# =============================================================================

def test_weak_scaling_smoke():
    repo_root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    script = os.path.join(repo_root, 'benchmarks', 'weak_scaling.py')
    env = dict(os.environ, PYTHONPATH=repo_root)
    env.pop('XLA_FLAGS', None)  # script sets its own device-count flag
    result = subprocess.run(
        [sys.executable, script, '--force-cpu-devices', '8',
         '--per-device-batch', '16', '--n-atoms', '4', '--n-layers', '2',
         '--steps', '2'],
        capture_output=True, text=True, timeout=480, env=env)
    assert result.returncode == 0, result.stderr[-2000:]
    records = [json.loads(line) for line in result.stdout.splitlines()
               if line.startswith('{')]
    assert [r['n_devices'] for r in records] == [1, 2, 4, 8]
    for record in records:
        assert record['frames_per_s'] > 0
        assert record['virtual_devices'] is True


# =============================================================================
# Tensor parallelism over MADE conditioners
# =============================================================================

def _make_spline_maf(key, dim=24, n_layers=2, hidden_layers=(96, 96)):
    from tfep_tpu.nn.conditioners.made import generate_degrees
    from tfep_tpu.nn.flows import MAF, SequentialFlow
    from tfep_tpu.nn.transformers import NeuralSplineTransformer

    keys = jax.random.split(key, n_layers)
    layers = []
    for i in range(n_layers):
        transformer = NeuralSplineTransformer.create(
            x0=-3.0 * jnp.ones(dim, jnp.float32),
            xf=3.0 * jnp.ones(dim, jnp.float32), n_bins=4)
        layers.append(MAF.create(
            keys[i],
            generate_degrees(dim, order='ascending' if i % 2 == 0
                             else 'descending'),
            transformer=transformer, dtype=jnp.float32,
            hidden_layers=list(hidden_layers)))
    return SequentialFlow.create(*layers)


def _train_losses(flow, x, n_steps=3):
    import optax

    from tfep_tpu.nn.module import (
        apply_updates, filter_value_and_grad, partition,
    )

    optimizer = optax.adamw(1e-3)

    @jax.jit
    def train_step(flow, opt_state, x):
        def loss_fn(f):
            y, ldj = f.forward(x)
            return jnp.mean(0.5 * jnp.sum(y ** 2, axis=-1) - ldj)

        loss, grads = filter_value_and_grad(loss_fn)(flow)
        trainable, _ = partition(flow)
        updates, new_opt_state = optimizer.update(grads, opt_state, trainable)
        return apply_updates(flow, updates), new_opt_state, loss

    from tfep_tpu.nn.module import partition as _partition
    opt_state = optimizer.init(_partition(flow)[0])
    losses = []
    for _ in range(n_steps):
        flow, opt_state, loss = train_step(flow, opt_state, x)
        losses.append(float(loss))
    return flow, losses


def test_tensor_parallel_matches_replicated():
    """dp x tp training reproduces the single-device loss trajectory, and the
    MADE weights are (and stay) split over the model axis."""
    from jax.sharding import PartitionSpec as P

    from tfep_tpu.parallel.sharding import shard_module

    flow = _make_spline_maf(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (16, 24), jnp.float32)

    _, losses_ref = _train_losses(flow, x)

    mesh = make_mesh(8, model_axis_size=2)
    assert mesh.axis_names == ('dp', 'tp')
    flow_tp = shard_module(flow, mesh)

    made = flow_tp.flows[0].conditioner
    assert made.layers[0].weight.sharding.spec == P('tp', None)   # column
    assert made.layers[-1].weight.sharding.spec == P(None, 'tp')  # row
    assert made.layers[0].bias.sharding.spec == P('tp')

    x_tp = shard_batch({'x': x}, mesh)['x']
    flow_tp, losses_tp = _train_losses(flow_tp, x_tp)

    np.testing.assert_allclose(losses_ref, losses_tp, rtol=2e-5)
    # The optimizer update must not silently gather the weights back.
    made = flow_tp.flows[0].conditioner
    assert made.layers[0].weight.sharding.spec == P('tp', None)


def test_tensor_parallel_forward_equals_replicated_forward():
    """Same (y, log_det_J) from the TP-sharded and the unsharded flow."""
    from tfep_tpu.parallel.sharding import shard_module

    flow = _make_spline_maf(jax.random.key(2))
    x = jax.random.normal(jax.random.key(3), (8, 24), jnp.float32)
    y_ref, ldj_ref = jax.jit(lambda f, x: f.forward(x))(flow, x)

    mesh = make_mesh(8, model_axis_size=4)
    flow_tp = shard_module(flow, mesh)
    x_tp = shard_batch({'x': x}, mesh)['x']
    y_tp, ldj_tp = jax.jit(lambda f, x: f.forward(x))(flow_tp, x_tp)

    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_tp),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ldj_ref), np.asarray(ldj_tp),
                               rtol=1e-5, atol=1e-6)


def test_tensor_parallel_nondivisible_widths_fall_back_to_replication():
    """Hidden widths not divisible by the model axis stay replicated
    (device_put cannot pad uneven shards) instead of erroring out."""
    from jax.sharding import PartitionSpec as P

    from tfep_tpu.parallel.sharding import shard_module

    flow = _make_spline_maf(jax.random.key(4), hidden_layers=(85,))
    mesh = make_mesh(8, model_axis_size=2)
    flow_tp = shard_module(flow, mesh)
    made = flow_tp.flows[0].conditioner
    assert made.layers[0].weight.sharding.spec == P()
    # Output layer input axis (85) is equally non-divisible -> replicated.
    assert made.layers[-1].weight.sharding.spec == P()
    # Still trains.
    x = shard_batch(
        {'x': jax.random.normal(jax.random.key(5), (16, 24), jnp.float32)},
        mesh)['x']
    _, losses = _train_losses(flow_tp, x, n_steps=1)
    assert np.isfinite(losses[0])


def test_shard_module_on_data_only_mesh_replicates():
    from tfep_tpu.parallel.sharding import shard_module

    flow = _make_spline_maf(jax.random.key(6))
    mesh = make_mesh(8)
    flow_rep = shard_module(flow, mesh)
    weight = flow_rep.flows[0].conditioner.layers[0].weight
    assert weight.sharding.is_fully_replicated


def test_make_mesh_model_axis_must_divide():
    with pytest.raises(ValueError, match='must divide'):
        make_mesh(6, model_axis_size=4)


def test_tensor_parallel_trainer_fit(tmp_path):
    """Trainer.fit composes with a TP-sharded flow: the user shards
    ``tfep_map.flow`` on the 2-D mesh before ``fit`` and the trainer keeps
    the placement (it never re-replicates the module)."""
    from jax.sharding import PartitionSpec as P

    from tests.app.test_maps import MockPotential, make_system
    from tfep_tpu.app import CartesianMAFMap, Trainer
    from tfep_tpu.nn.conditioners.made import MADE
    from tfep_tpu.parallel.sharding import shard_module
    from tfep_tpu.units import ureg

    mesh = make_mesh(8, model_axis_size=2)
    tfep_map = CartesianMAFMap(
        potential_energy_func=MockPotential(),
        temperature=300.0 * ureg.kelvin,
        system=make_system(n_frames=8, n_atoms=4),
        batch_size=8,
        tfep_logger_dir_path=str(tmp_path / 'logs'),
        n_maf_layers=2,
        flow_kwargs={'hidden_layers': [32, 32]})
    trainer = Trainer(save_dir=str(tmp_path / 'ckpt'), max_epochs=2,
                      shuffle=False, sharding=batch_sharding(mesh))
    tfep_map.setup()
    tfep_map.flow = shard_module(tfep_map.flow, mesh)

    flow = trainer.fit(tfep_map)

    mades = [m for m in jax.tree_util.tree_leaves(
                 flow, is_leaf=lambda x: isinstance(x, MADE))
             if isinstance(m, MADE)]
    assert mades
    assert mades[0].layers[0].weight.sharding.spec == P('tp', None)
    logged = tfep_map.tfep_logger.read_train_tensors(epoch_idx=1)
    assert np.all(np.isfinite(logged['potential']))


def test_tensor_parallel_sharding_survives_resume(tmp_path):
    """Checkpoint resume restores leaves onto the live pytree's shardings:
    a TP-split flow stays split after ``fit(..., resume=True)``."""
    from jax.sharding import PartitionSpec as P

    from tests.app.test_maps import MockPotential, make_system
    from tfep_tpu.app import CartesianMAFMap, Trainer
    from tfep_tpu.nn.conditioners.made import MADE
    from tfep_tpu.parallel.sharding import shard_module
    from tfep_tpu.units import ureg

    mesh = make_mesh(8, model_axis_size=2)

    def build():
        tfep_map = CartesianMAFMap(
            potential_energy_func=MockPotential(),
            temperature=300.0 * ureg.kelvin,
            system=make_system(n_frames=8, n_atoms=4),
            batch_size=8,
            tfep_logger_dir_path=str(tmp_path / 'logs'),
            n_maf_layers=2,
            flow_kwargs={'hidden_layers': [32, 32]})
        tfep_map.setup()
        tfep_map.flow = shard_module(tfep_map.flow, mesh)
        trainer = Trainer(save_dir=str(tmp_path / 'ckpt'), max_epochs=1,
                          shuffle=False, sharding=batch_sharding(mesh))
        return tfep_map, trainer

    tfep_map, trainer = build()
    trainer.fit(tfep_map)

    tfep_map, trainer = build()
    flow = trainer.fit(tfep_map, resume=True)
    mades = [m for m in jax.tree_util.tree_leaves(
                 flow, is_leaf=lambda x: isinstance(x, MADE))
             if isinstance(m, MADE)]
    assert mades[0].layers[0].weight.sharding.spec == P('tp', None)


def test_incompatible_checkpoint_raises_clear_error(tmp_path):
    """A checkpoint from a different model configuration fails with a
    message naming the checkpoint, not a deep tree_unflatten error."""
    from tests.app.test_maps import MockPotential, make_system
    from tfep_tpu.app import CartesianMAFMap, Trainer
    from tfep_tpu.units import ureg

    def build(n_maf_layers):
        tfep_map = CartesianMAFMap(
            potential_energy_func=MockPotential(),
            temperature=300.0 * ureg.kelvin,
            system=make_system(n_frames=8, n_atoms=4),
            batch_size=8,
            tfep_logger_dir_path=str(tmp_path / f'logs{n_maf_layers}'),
            n_maf_layers=n_maf_layers)
        trainer = Trainer(save_dir=str(tmp_path / 'ckpt'), max_epochs=1,
                          shuffle=False)
        return tfep_map, trainer

    tfep_map, trainer = build(2)
    trainer.fit(tfep_map)

    tfep_map, trainer = build(3)   # different architecture, same save_dir
    with pytest.raises(ValueError, match='incompatible'):
        trainer.fit(tfep_map, resume=True)
