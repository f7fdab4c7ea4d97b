"""Engine-overlap (pipelined) trainer tests.

Pins three properties of Trainer(engine_overlap=True):
1. Gradient correctness: a single pipelined step equals a single standard
   step exactly (the force-linearized surrogate has the same gradient).
2. Overlap: with a slow engine AND slow device step, wall time approaches
   N*max(engine, device), not N*(engine + device).
3. Bookkeeping: full-epoch logging, loss history, and mid-run stop.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.app.test_maps import make_system
from tfep_tpu.app import CartesianMAFMap, Trainer
from tfep_tpu.potentials.engine import EnginePotential
from tfep_tpu.units import ureg


class QuadraticEngine(EnginePotential):
    """u(x) = 0.5 * |x|^2 (eV, angstrom) with exact forces; optional
    host-side latency to emulate an external engine."""

    DEFAULT_ENERGY_UNIT = 'eV'
    DEFAULT_POSITIONS_UNIT = 'angstrom'
    ENGINE_ENERGY_UNIT = 'eV'
    ENGINE_POSITIONS_UNIT = 'angstrom'

    def __init__(self, sleep_s: float = 0.0, **kwargs):
        super().__init__(**kwargs)
        self.sleep_s = sleep_s
        self.calls = []

    def _compute_batch(self, positions, cell, compute_forces):
        start = time.perf_counter()
        if self.sleep_s:
            time.sleep(self.sleep_s)
        energies = 0.5 * np.sum(positions ** 2, axis=-1)
        forces = -positions if compute_forces else None
        self.calls.append((start, time.perf_counter()))
        return energies, forces


def make_map(tmp_path, name, potential, **kwargs):
    kwargs.setdefault('n_maf_layers', 2)
    return CartesianMAFMap(
        potential_energy_func=potential,
        temperature=300.0 * ureg.kelvin,
        system=make_system(),
        batch_size=5,
        tfep_logger_dir_path=str(tmp_path / name),
        **kwargs)


def _flow_leaves(flow):
    return [np.asarray(leaf) for leaf in jax.tree_util.tree_leaves(flow)]


def test_single_step_matches_standard_path(tmp_path):
    """One pipelined update == one standard update (exact surrogate
    gradient at the same parameters)."""
    flows = {}
    for overlap in (False, True):
        tfep_map = make_map(tmp_path, f'logs-{overlap}', QuadraticEngine())
        trainer = Trainer(save_dir=None, max_steps=1, shuffle=False,
                          engine_overlap=overlap)
        flows[overlap] = trainer.fit(tfep_map)
        assert trainer.global_step == 1
    for a, b in zip(_flow_leaves(flows[False]), _flow_leaves(flows[True])):
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)


def test_multistep_delayed_gradient_contract(tmp_path):
    """Pipelined steps apply the exact gradient at the parameters the
    engine saw (one-step delay): theta_{k+1} = theta_k - opt(grad L(b_k,
    theta_{k-1})). Verified against a manual replay with the standard
    (non-pipelined) loss — a single-step test cannot catch a snapshot
    taken after the update."""
    import optax

    from tfep_tpu.app.trainer import _dealias
    from tfep_tpu.nn.module import (
        apply_updates, filter_value_and_grad, partition,
    )

    def build_map(name):
        # 4 batches per epoch: no epoch-boundary drain within the first 3
        # steps, so the pipeline stays exactly one step deep throughout.
        return CartesianMAFMap(
            potential_energy_func=QuadraticEngine(),
            temperature=300.0 * ureg.kelvin,
            system=make_system(n_frames=20),
            batch_size=5,
            tfep_logger_dir_path=str(tmp_path / name),
            n_maf_layers=2)

    n_steps = 3
    tfep_map = build_map('logs-pipe')
    trainer = Trainer(save_dir=None, max_steps=n_steps, shuffle=False,
                      engine_overlap=True)
    pipelined_flow = trainer.fit(tfep_map)

    # Manual replay: same batches, standard loss, delayed gradients.
    replay_map = build_map('logs-replay')
    replay_map.setup()
    optimizer = trainer.optimizer  # same optimizer as the pipelined run

    flow = _dealias(replay_map.flow)
    trainable, _ = partition(flow)
    opt_state = optimizer.init(trainable)

    def true_loss(f, batch):
        loss, _ = replay_map.training_step_fn(f, batch)
        return loss

    batches = []
    n_batches = (len(replay_map.dataset) + replay_map.batch_size - 1) \
        // replay_map.batch_size
    for k in range(n_steps):
        start = (k % n_batches) * replay_map.batch_size
        indices = list(range(start, start + replay_map.batch_size))
        batches.append({k2: jnp.asarray(v) for k2, v in
                        replay_map.dataset.get_batch(indices).items()})

    history = [flow]
    for k in range(n_steps):
        # Gradient at the parameters the engine saw: theta_{k-1} (the
        # forward for batch k ran before update k-1 was applied).
        snap = history[max(0, k - 1)]
        _, grads = filter_value_and_grad(
            lambda f: true_loss(f, batches[k]))(snap)
        trainable, _ = partition(flow)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        flow = apply_updates(flow, updates)
        history.append(flow)

    for a, b in zip(_flow_leaves(pipelined_flow), _flow_leaves(flow)):
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-11)


def test_pipelined_epoch_bookkeeping(tmp_path):
    tfep_map = make_map(tmp_path, 'logs', QuadraticEngine())
    trainer = Trainer(save_dir=str(tmp_path / 'ckpt'), max_epochs=2,
                      shuffle=True, engine_overlap=True)
    trainer.fit(tfep_map)
    assert trainer.global_step == 4  # 10 frames / batch 5 * 2 epochs
    assert len(trainer.loss_history) == 4
    assert np.all(np.isfinite(trainer.loss_history))
    logged = tfep_map.tfep_logger.read_train_tensors(epoch_idx=1)
    assert set(logged['dataset_sample_index'].tolist()) == set(range(10))
    assert np.all(np.isfinite(logged['potential']))


@pytest.mark.parametrize('overlap', [False, True])
def test_profiler_hook_captures_trace(tmp_path, overlap):
    """Trainer(profile_dir=...) writes an XPlane trace and synced step
    times for the configured window — on both training paths."""
    import glob

    tfep_map = make_map(tmp_path, 'logs', QuadraticEngine())
    trainer = Trainer(save_dir=None, max_epochs=2, shuffle=False,
                      engine_overlap=overlap,
                      profile_dir=str(tmp_path / 'profile'),
                      profile_steps=(1, 3))
    trainer.fit(tfep_map)
    assert len(trainer.profiled_step_times) == 2
    assert all(t > 0 for t in trainer.profiled_step_times)
    traces = glob.glob(str(tmp_path / 'profile' / '**' / '*.xplane.pb'),
                       recursive=True)
    assert traces, 'no xplane trace written'


def test_loss_history_on_standard_path(tmp_path, capsys):
    tfep_map = make_map(tmp_path, 'logs', QuadraticEngine())
    trainer = Trainer(save_dir=None, max_epochs=1, shuffle=False,
                      log_every_n_steps=1)
    trainer.fit(tfep_map)
    assert len(trainer.loss_history) == 2
    assert np.all(np.isfinite(trainer.loss_history))
    out = capsys.readouterr().out
    assert 'loss=' in out and 'epoch 0' in out


class SlowDeviceMap(CartesianMAFMap):
    """Injects host latency into the jitted forward via io_callback,
    emulating a heavy device graph with a controllable duration."""

    device_sleep_s = 0.0

    def forward_step_fn(self, flow, batch):
        result = super().forward_step_fn(flow, batch)
        if self.device_sleep_s:
            def stall(x):
                time.sleep(self.device_sleep_s)
                return np.asarray(x)

            result['positions'] = jax.pure_callback(
                stall,
                jax.ShapeDtypeStruct(result['positions'].shape,
                                     result['positions'].dtype),
                result['positions'])
        return result

    def pipelined_update_fn(self, flow, batch, potentials, forces):
        # The update recompute stays fast (no stall): the stall models
        # the *forward* latency being hidden behind the engine.
        return super().pipelined_update_fn(flow, batch, potentials, forces)


def test_overlap_hides_device_time_behind_engine(tmp_path):
    """Steady-state step time ~ max(engine, device), not engine + device.

    Asserts on the engine's start-to-start intervals past the compile
    window (the sleeps dominate them), so the check is insensitive to
    machine load and jit-compile latency — a total-wall bound is not.
    """
    engine_s, device_s = 0.15, 0.10
    n_steps = 10

    potential = QuadraticEngine(sleep_s=engine_s)
    tfep_map = SlowDeviceMap(
        potential_energy_func=potential,
        temperature=300.0 * ureg.kelvin,
        system=make_system(n_frames=60),
        batch_size=5,
        tfep_logger_dir_path=str(tmp_path / 'logs'),
        n_maf_layers=2)
    tfep_map.device_sleep_s = device_s

    trainer = Trainer(save_dir=None, max_steps=n_steps, shuffle=False,
                      engine_overlap=True)
    trainer.fit(tfep_map)

    # The engine genuinely ran once per step.
    assert len(potential.calls) == n_steps

    # Skip the first 3 calls: the fwd jit compiles before call 1 and the
    # update jit before call 3. A serial loop would put the full device
    # stall between consecutive engine calls (interval >= engine+device);
    # the pipeline hides it inside the engine window.
    starts = np.array([start for start, _ in potential.calls])
    intervals = np.diff(starts[3:])
    median = float(np.median(intervals))
    assert median < engine_s + 0.5 * device_s, (
        f'no overlap: median engine start-to-start {median:.3f}s vs '
        f'serial >= {engine_s + device_s:.3f}s')


def test_pipelined_crash_resume_invariant(tmp_path):
    """The mid-epoch resume invariant holds in pipelined mode too: the
    union of visited samples across an engine crash partitions each epoch
    with no repeats, and the resumed run picks up from the acknowledged
    global step."""
    visited = []

    class CrashingEngine(QuadraticEngine):
        def __init__(self, crash_on_call=None, **kwargs):
            super().__init__(**kwargs)
            self.crash_on_call = crash_on_call

        def _compute_batch(self, positions, cell, compute_forces):
            if self.crash_on_call is not None and \
                    len(self.calls) + 1 == self.crash_on_call:
                raise RuntimeError('engine died mid-run')
            return super()._compute_batch(positions, cell, compute_forces)

    class RecordingMap(CartesianMAFMap):
        def log_train_tensors(self, aux, epoch_idx, batch_idx):
            visited.append((epoch_idx,
                            np.asarray(aux['dataset_sample_index']).tolist()))
            super().log_train_tensors(aux, epoch_idx, batch_idx)

    ckpt = str(tmp_path / 'ckpt')

    # The engine dies evaluating its 4th batch: steps 1-3 are applied and
    # checkpointed (the pipeline runs the engine one batch ahead).
    engine = CrashingEngine(crash_on_call=4)
    tfep_map = RecordingMap(
        potential_energy_func=engine,
        temperature=300.0 * ureg.kelvin,
        system=make_system(), batch_size=5, n_maf_layers=2,
        tfep_logger_dir_path=str(tmp_path / 'logs1'))
    t1 = Trainer(save_dir=ckpt, max_epochs=3, shuffle=True,
                 engine_overlap=True)
    with pytest.raises(RuntimeError, match='engine died'):
        t1.fit(tfep_map)
    assert t1.global_step == 3      # 1.5 epochs at 2 batches/epoch

    # Resume with a healthy engine and finish all 3 epochs.
    tfep_map2 = RecordingMap(
        potential_energy_func=CrashingEngine(crash_on_call=None),
        temperature=300.0 * ureg.kelvin,
        system=make_system(), batch_size=5, n_maf_layers=2,
        tfep_logger_dir_path=str(tmp_path / 'logs1'))
    t2 = Trainer(save_dir=ckpt, max_epochs=3, shuffle=True,
                 engine_overlap=True)
    t2.fit(tfep_map2, resume=True)
    assert t2.global_step == 6

    # Every epoch's visited batches partition the dataset exactly —
    # including epoch 1, split across the crash.
    for epoch in range(3):
        batches = [s for e, s in visited if e == epoch]
        flat = [i for b in batches for i in b]
        assert sorted(flat) == list(range(10)), (epoch, batches)

    # And the on-disk log agrees (no lost acknowledged rows).
    for epoch in range(3):
        logged = tfep_map2.tfep_logger.read_train_tensors(epoch_idx=epoch)
        assert set(logged['dataset_sample_index'].tolist()) == set(range(10))
