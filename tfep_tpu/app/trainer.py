"""Minimal training loop with exact mid-epoch resume (Lightning replacement).

The trainer owns: the optimization loop (optax), checkpointing of model
parameters + optimizer state + sampler seed + global step, per-step TFEP
logging, and the jitted training step. Device work is one compiled function
per step (flow forward + potential callback + loss + grad + optimizer
update); the host only moves batches and writes logs.

Resume semantics follow the reference invariant
(/root/reference/tfep/app/base.py:842-904, tests/app/test_maps.py:202-303):
restarting from a mid-epoch checkpoint replays the same epoch permutation and
visits exactly the unseen batches.
"""

from __future__ import annotations

import functools
import os
import pickle
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tfep_tpu.app.base import _host_local_rows
from tfep_tpu.io.sampler import StatefulBatchSampler
from tfep_tpu.nn.module import (
    apply_updates, combine, filter_value_and_grad, partition,
)

__all__ = ['Trainer', 'load_map_from_checkpoint']

# Bump when the checkpoint layout changes incompatibly. Loaders accept
# any version <= current; newer files raise a clear error. Version 0 =
# pre-versioning checkpoints (leaves only, no embedded map config).
CHECKPOINT_FORMAT_VERSION = 1


class Trainer:
    """Train a TFEP map.

    Parameters
    ----------
    save_dir : str, optional
        Directory for checkpoints. ``None`` disables checkpointing.
    max_epochs, max_steps : int, optional
        Stop conditions (whichever comes first).
    optimizer : optax.GradientTransformation, optional
        Defaults to AdamW(lr=1e-4) — the reference default
        (app/base.py:277-286).
    checkpoint_every_n_steps : int, optional
        Write ``last.ckpt`` every N steps (default 1, like the reference's
        per-step ModelCheckpoint).
    shuffle : bool, optional
        Shuffle batches each epoch through the stateful sampler.
    shuffle_seed : int, optional
        Base seed for the per-epoch shuffles. ``None`` (default) draws
        each epoch's permutation from OS entropy — every run differs; an
        int makes the whole batch-order sequence reproducible run-to-run
        (see :class:`tfep_tpu.io.sampler.StatefulBatchSampler`).
    prefetch : bool, optional
        Read the next batch on a background thread while the device runs
        the current step (the counterpart of the reference's
        ``DataLoader(num_workers>0)``). Worth turning on with
        ``lazy_trajectory=True`` datasets, where ``get_batch`` is a disk
        seek + decode; identical math and resume semantics either way.
        Ignored by the ``engine_overlap`` pipeline, which already
        overlaps host work with device compute.
    sharding : optional
        A ``jax.sharding.Sharding`` for the batch (data parallelism over the
        frames axis). Parameters are replicated.
    log_every_n_steps : int, optional
        Print ``epoch/step/loss`` (plus any extra scalar the step returns)
        every N optimization steps; 0 disables console output. The loss of
        every step is recorded in :attr:`loss_history` regardless — the
        reference's Lightning ``self.log`` channel (app/base.py:832-838).
    engine_overlap : bool, optional
        Pipeline the target-potential engine against device compute
        (SURVEY §7 double-buffering): the flow forward of batch k+1 runs
        while the host engine evaluates batch k, and each update applies
        the exact loss gradient at the parameters the engine saw (one-step
        delayed, standard pipelined SGD). Step time approaches
        max(device, engine) instead of their sum. Requires the map to
        implement the ``forward_step_fn`` / ``host_engine_eval`` /
        ``pipelined_update_fn`` contract (TFEPMapBase does).
    profile_dir : str, optional
        Capture a JAX profiler trace (XPlane, viewable in TensorBoard /
        Perfetto) of steps ``profile_steps`` into this directory. Per-step
        host wall-clock times for the profiled window are also recorded in
        :attr:`profiled_step_times`.
    profile_steps : (int, int), optional
        Half-open ``[start, stop)`` global-step window to trace (default
        ``(2, 5)`` — past the compile, a handful of steady-state steps).
    """

    CHECKPOINT_NAME = 'last.ckpt'

    def __init__(self, save_dir: Optional[str] = None,
                 max_epochs: Optional[int] = None,
                 max_steps: Optional[int] = None,
                 optimizer: Optional[optax.GradientTransformation] = None,
                 checkpoint_every_n_steps: int = 1,
                 shuffle: bool = True,
                 shuffle_seed: Optional[int] = None,
                 prefetch: bool = False,
                 drop_last: bool = False,
                 sharding=None,
                 log_every_n_steps: int = 0,
                 engine_overlap: bool = False,
                 profile_dir: Optional[str] = None,
                 profile_steps: tuple = (2, 5)):
        if max_epochs is None and max_steps is None:
            raise ValueError('Set at least one of max_epochs/max_steps.')
        self.save_dir = save_dir
        self.max_epochs = max_epochs
        self.max_steps = max_steps
        self.optimizer = optimizer if optimizer is not None else optax.adamw(1e-4)
        self.checkpoint_every_n_steps = checkpoint_every_n_steps
        self.shuffle = shuffle
        self.shuffle_seed = shuffle_seed
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.sharding = sharding
        self.log_every_n_steps = log_every_n_steps
        self.engine_overlap = engine_overlap

        self.profile_dir = profile_dir
        self.profile_steps = tuple(profile_steps)

        self.global_step = 0
        self.current_epoch = 0
        self.loss_history: list = []
        self.profiled_step_times: list = []
        self._sampler_state_to_restore = None
        self._profiling = False

    # ------------------------------------------------------------------ #
    @property
    def checkpoint_path(self) -> Optional[str]:
        """Full path of ``last.ckpt``, or ``None`` when checkpointing is
        disabled."""
        if self.save_dir is None:
            return None
        return os.path.join(self.save_dir, self.CHECKPOINT_NAME)

    def fit(self, tfep_map, resume: bool = False):
        """Run the optimization loop on ``tfep_map``.

        ``tfep_map`` must implement the app contract:
        ``setup()``, ``dataset``, ``batch_size``, ``flow`` (pytree, settable),
        ``training_step_fn(flow, batch) -> (loss, aux_dict)`` and optionally
        ``log_train_tensors(aux, epoch_idx, batch_idx)``.
        """
        tfep_map.setup()
        if getattr(tfep_map, 'trainer', None) is None:
            tfep_map.trainer = self
        # The embedded map config is immutable across a fit; test-pickling
        # it (which may include an in-memory System) once, not per step.
        self._map_config = _map_config_entries(tfep_map)

        sampler = StatefulBatchSampler(
            tfep_map.dataset, batch_size=tfep_map.batch_size,
            shuffle=self.shuffle, drop_last=self.drop_last, trainer=self,
            shuffle_seed=self.shuffle_seed)
        n_batches = len(sampler)

        # Modules may share arrays between leaves (e.g. one transformer
        # reused across MAF layers); buffer donation requires each donated
        # buffer to appear once, so duplicate leaves are copied here.
        flow = _dealias(tfep_map.flow)
        trainable, _ = partition(flow)
        opt_state = self.optimizer.init(trainable)

        if resume:
            flow, opt_state = self._load_checkpoint(flow, opt_state, sampler)

        if self.engine_overlap:
            try:
                flow = self._fit_pipelined(tfep_map, sampler, flow,
                                           opt_state, n_batches)
            finally:
                self._stop_profiler()
            tfep_map.flow = flow
            return flow

        step_fn = self._build_step_fn(tfep_map)
        pending_log = None  # (aux, epoch_idx, batch_idx) of the prior step.

        try:
            flow, opt_state, pending_log = self._fit_loop(
                tfep_map, sampler, flow, opt_state, n_batches, step_fn,
                pending_log)
        finally:
            self._stop_profiler()

        if pending_log is not None:
            self._consume_aux(tfep_map, *pending_log)

        tfep_map.flow = flow
        return flow

    def _fit_loop(self, tfep_map, sampler, flow, opt_state, n_batches,
                  step_fn, pending_log):
        stop = False
        while not stop:
            if self.max_epochs is not None and \
                    self.current_epoch >= self.max_epochs:
                break
            # Pre-check so resuming an already-finished run trains zero
            # extra steps (the in-loop check only fires after a step).
            if self.max_steps is not None and \
                    self.global_step >= self.max_steps:
                break
            epoch_idx = self.current_epoch
            for batch_indices, host_batch in self._epoch_batches(
                    tfep_map, sampler):
                batch_idx = self.global_step % n_batches
                batch = self._device_batch(tfep_map, batch_indices,
                                           step=self.global_step,
                                           host_batch=host_batch)

                tick = self._profile_tick()
                flow, opt_state, loss, aux = step_fn(flow, opt_state, batch)
                self._profile_tock(tick, loss)

                # Per-sample TFEP logging + scalar channel, deferred by one
                # step: the host materializes the *previous* step's aux
                # while the device runs the current one (jax dispatch is
                # asynchronous).
                if pending_log is not None:
                    self._consume_aux(tfep_map, *pending_log)
                pending_log = (aux, epoch_idx, batch_idx)

                self.global_step += 1
                # Derived, not incremented at the epoch boundary: an
                # epoch-boundary checkpoint must store the *next* epoch or
                # a resume replays a full extra epoch (and re-logs its
                # epoch_idx).
                self.current_epoch = self.global_step // n_batches

                if (self.checkpoint_path is not None
                        and self.global_step % self.checkpoint_every_n_steps == 0):
                    # Flush this step's log rows first: the checkpoint
                    # acknowledges the step, so a crash right after must
                    # not lose its per-sample work values (resume skips
                    # the batch).
                    if pending_log is not None:
                        self._consume_aux(tfep_map, *pending_log)
                        pending_log = None
                    self._save_checkpoint(flow, opt_state, sampler, tfep_map)

                if self.max_steps is not None and \
                        self.global_step >= self.max_steps:
                    stop = True
                    break
            else:
                continue
            break

        return flow, opt_state, pending_log

    # ------------------------------------------------------------------ #
    # Profiler hooks: capture an XPlane trace (+ synced per-step wall
    # times) over the configured global-step window.
    # ------------------------------------------------------------------ #
    def _profile_tick(self):
        if self.profile_dir is None or not (
                self.profile_steps[0] <= self.global_step
                < self.profile_steps[1]):
            return None
        if not self._profiling:
            jax.profiler.start_trace(self.profile_dir)
            self._profiling = True
        import time
        return time.perf_counter()

    def _profile_tock(self, tick, loss):
        if tick is not None:
            import time
            jax.block_until_ready(loss)
            self.profiled_step_times.append(time.perf_counter() - tick)
        if self._profiling and \
                self.global_step + 1 >= self.profile_steps[1]:
            self._stop_profiler()

    def _stop_profiler(self):
        if self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False

    # ------------------------------------------------------------------ #
    def _epoch_batches(self, tfep_map, sampler):
        """Yield ``(batch_indices, host_batch)`` for one epoch.

        With ``prefetch=False`` (default) ``host_batch`` is None and the
        dataset read happens synchronously in :meth:`_device_batch` — the
        reference's single-process DataLoader behavior. With
        ``prefetch=True`` a background thread reads one batch ahead
        (``dataset.get_batch``: the disk seek + decode of a lazy
        trajectory), overlapping host IO with the device step — the
        counterpart of the reference's ``DataLoader(num_workers>0)``
        pipeline. Batch order, contents, and resume semantics are
        identical either way; only *when* the host read happens changes.
        """
        if not self.prefetch:
            for batch_indices in sampler:
                yield batch_indices, None
            return

        from concurrent.futures import ThreadPoolExecutor

        # One-ahead: submit batch k+1's read before yielding batch k. The
        # sampler iterates on THIS thread (seed-draw timing identical to
        # the synchronous path); only dataset.get_batch runs on the
        # worker. Futures propagate read errors natively, and an early
        # exit (max_steps mid-epoch closes the generator) drains at most
        # the one in-flight read via the executor's shutdown.
        with ThreadPoolExecutor(
                max_workers=1,
                thread_name_prefix='tfep-batch-prefetch') as pool:
            pending = None          # (indices, future) of the next batch
            for indices in sampler:
                future = pool.submit(tfep_map.dataset.get_batch, indices)
                if pending is not None:
                    yield pending[0], pending[1].result()
                pending = (indices, future)
            if pending is not None:
                yield pending[0], pending[1].result()

    def _device_batch(self, tfep_map, batch_indices, step=None,
                      host_batch=None):
        batch = (host_batch if host_batch is not None
                 else tfep_map.dataset.get_batch(batch_indices))
        if self.sharding is None:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
        else:
            # Sharded: each process's rows are its shard of the global batch
            # (under multi-host, every host runs the same loop over its own
            # frames and the arrays are assembled globally).
            from tfep_tpu.parallel.distributed import global_rows_from_local
            batch = {name: global_rows_from_local(np.asarray(value),
                                                  self.sharding)
                     for name, value in batch.items()}
        if step is not None and getattr(tfep_map, 'needs_global_step', False):
            # Host scalar (identical on every process), traced by jit so
            # per-step values don't retrigger compilation. Kept as numpy —
            # NOT device_put — so under multi-host sharding jit replicates
            # it itself instead of receiving a process-local committed
            # array mixed with the batch's global arrays. Maps opt in to
            # fold it into stochastic state (e.g. Hutchinson probe keys).
            batch['global_step'] = np.uint32(step)
        return batch

    def _consume_aux(self, tfep_map, aux, epoch_idx, batch_idx):
        """Materialize a finished step's aux: TFEP logging + loss channel."""
        if hasattr(tfep_map, 'log_train_tensors'):
            tfep_map.log_train_tensors(aux, epoch_idx=epoch_idx,
                                       batch_idx=batch_idx)
        scalars = {name: float(value) for name, value in aux.items()
                   if np.ndim(value) == 0}
        loss = scalars.get('loss')
        if loss is not None:
            self.loss_history.append(loss)
        if self.log_every_n_steps and loss is not None and \
                len(self.loss_history) % self.log_every_n_steps == 0:
            extras = ' '.join(f'{k}={v:.6g}' for k, v in scalars.items()
                              if k != 'loss')
            print(f'[tfep] epoch {epoch_idx} step '
                  f'{len(self.loss_history)} loss={loss:.6g}'
                  + (f' {extras}' if extras else ''), flush=True)

    # ------------------------------------------------------------------ #
    def _fit_pipelined(self, tfep_map, sampler, flow, opt_state, n_batches):
        """Engine-overlap loop: device fwd of batch k+1 runs while the host
        engine evaluates batch k; each update applies the exact gradient at
        the parameters the engine saw (one-step-delayed SGD).

        Parameter buffers are not donated here — the snapshot the gradient
        differentiates is the previous step's flow, whose buffers must
        stay alive across the update.
        """
        import concurrent.futures

        optimizer = self.optimizer

        fwd_fn = jax.jit(
            lambda f, batch: tfep_map.forward_step_fn(f, batch))

        @jax.jit
        def update_fn(flow_cur, opt_state, flow_snap, batch, potentials,
                      forces):
            def loss_fn(f):
                return tfep_map.pipelined_update_fn(f, batch, potentials,
                                                    forces)

            (loss, aux), grads = filter_value_and_grad(
                loss_fn, has_aux=True)(flow_snap)
            trainable, _ = partition(flow_cur)
            updates, new_opt_state = optimizer.update(grads, opt_state,
                                                      trainable)
            return apply_updates(flow_cur, updates), new_opt_state, aux

        executor = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        # In-flight work: (future, flow_snapshot, batch, epoch, batch_idx).
        pending = None
        stop = False

        def _globalize(local_rows):
            """Engine results (this host's rows) -> device array matching
            the batch sharding; global assembly under multi-host."""
            if self.sharding is not None:
                from tfep_tpu.parallel.distributed import (
                    global_rows_from_local,
                )
                return global_rows_from_local(np.asarray(local_rows),
                                              self.sharding)
            return jnp.asarray(local_rows)

        def apply_pending(flow, opt_state):
            future, flow_snap, batch, epoch_idx, batch_idx = pending
            potentials, forces = future.result()
            tick = self._profile_tick()
            flow, opt_state, aux = update_fn(
                flow, opt_state, flow_snap, batch,
                _globalize(potentials), _globalize(forces))
            self._profile_tock(tick, aux.get('loss', flow))
            self._consume_aux(tfep_map, aux, epoch_idx, batch_idx)
            self.global_step += 1
            # Derived like in _fit_loop: checkpoints written at an epoch
            # boundary must store the next epoch.
            self.current_epoch = self.global_step // n_batches
            if (self.checkpoint_path is not None and
                    self.global_step % self.checkpoint_every_n_steps == 0):
                self._save_checkpoint(flow, opt_state, sampler, tfep_map)
            return flow, opt_state

        # Forward passes run one batch ahead of applied updates.
        fwd_count = self.global_step
        try:
            while not stop:
                if self.max_epochs is not None and \
                        self.current_epoch >= self.max_epochs:
                    break
                if self.max_steps is not None and \
                        self.global_step >= self.max_steps:
                    break
                epoch_idx = self.current_epoch
                for batch_indices in sampler:
                    batch_idx = fwd_count % n_batches
                    fwd_count += 1
                    batch = self._device_batch(tfep_map, batch_indices,
                                               step=fwd_count - 1)

                    # Phase A (device): flow forward, dispatched async.
                    # The snapshot MUST be the parameters this forward (and
                    # hence the engine) sees — apply_pending below advances
                    # `flow` to the next step's parameters, and the delayed
                    # gradient is only exact at the snapshot.
                    flow_snap = flow
                    result = fwd_fn(flow, batch)
                    # Phase B (host thread): engine on the mapped frames
                    # (this host's rows only, under multi-host sharding).
                    future = executor.submit(
                        tfep_map.host_engine_eval,
                        _host_local_rows(result['positions']), batch)
                    # Phase C: finish the *previous* batch while the
                    # engine chews on this one.
                    if pending is not None:
                        flow, opt_state = apply_pending(flow, opt_state)
                    pending = (future, flow_snap, batch, epoch_idx, batch_idx)

                    if self.max_steps is not None and \
                            self.global_step + 1 >= self.max_steps:
                        stop = True
                        break
                else:
                    # Drain before the sampler restarts: its resume
                    # arithmetic (and the derived current_epoch) come from
                    # global_step, which must not lag at the boundary.
                    if pending is not None:
                        flow, opt_state = apply_pending(flow, opt_state)
                        pending = None
                    continue
                break

            if pending is not None:
                flow, opt_state = apply_pending(flow, opt_state)
                pending = None
        finally:
            executor.shutdown(wait=False, cancel_futures=True)
        return flow

    # ------------------------------------------------------------------ #
    def _build_step_fn(self, tfep_map) -> Callable:
        optimizer = self.optimizer

        def loss_fn(flow, batch):
            return tfep_map.training_step_fn(flow, batch)

        # Donating the parameter/optimizer buffers lets XLA update them
        # in place instead of allocating fresh arrays every step.
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(flow, opt_state, batch):
            (loss, aux), grads = filter_value_and_grad(
                loss_fn, has_aux=True)(flow, batch)
            trainable, _ = partition(flow)
            updates, new_opt_state = optimizer.update(grads, opt_state,
                                                      trainable)
            new_flow = apply_updates(flow, updates)
            return new_flow, new_opt_state, loss, aux

        return step

    # ------------------------------------------------------------------ #
    def _save_checkpoint(self, flow, opt_state, sampler, tfep_map=None):
        os.makedirs(self.save_dir, exist_ok=True)
        leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(flow)]
        opt_leaves = [np.asarray(l)
                      for l in jax.tree_util.tree_leaves(opt_state)]
        state = {
            'format_version': CHECKPOINT_FORMAT_VERSION,
            'flow_leaves': leaves,
            'opt_leaves': opt_leaves,
            'global_step': self.global_step,
            'current_epoch': self.current_epoch,
            'sampler_state': sampler.state_dict(),
        }
        config = getattr(self, '_map_config', None)
        state.update(_map_config_entries(tfep_map)
                     if config is None else config)
        tmp_path = self.checkpoint_path + '.tmp'
        with open(tmp_path, 'wb') as f:
            pickle.dump(state, f)
        os.replace(tmp_path, self.checkpoint_path)

    @staticmethod
    def _restore_leaves(current, saved_leaves, what: str):
        """Rebuild ``current``'s pytree from checkpointed leaves, keeping
        each live leaf's device placement (a TP/replicated sharding set up
        before ``fit`` must survive resume — loading onto the default
        device would undo the sharding or OOM at exactly the model sizes
        sharding exists for)."""
        leaves, treedef = jax.tree_util.tree_flatten(current)
        if len(leaves) != len(saved_leaves):
            raise ValueError(
                f'Checkpoint is incompatible with the current {what}: it '
                f'holds {len(saved_leaves)} arrays, the live pytree has '
                f'{len(leaves)}. This usually means the checkpoint was '
                'written by a different model configuration or an older '
                'version of the library.')
        restored = []
        for live, saved in zip(leaves, saved_leaves):
            if (isinstance(live, jax.Array)
                    and isinstance(live.sharding,
                                   jax.sharding.NamedSharding)):
                # Mesh-placed (replicated or TP-split) parameters keep
                # their placement. Plain single-device arrays stay
                # uncommitted so jit remains free to place them with the
                # batch.
                restored.append(jax.device_put(saved, live.sharding))
            else:
                restored.append(jnp.asarray(saved))
        return jax.tree_util.tree_unflatten(treedef, restored)

    def _load_checkpoint(self, flow, opt_state, sampler):
        path = self.checkpoint_path
        if path is None or not os.path.isfile(path):
            return flow, opt_state
        with open(path, 'rb') as f:
            state = pickle.load(f)
        _check_checkpoint_version(state, path)
        new_flow = self._restore_leaves(flow, state['flow_leaves'], 'flow')
        new_opt_state = self._restore_leaves(
            opt_state, state['opt_leaves'], 'optimizer state')
        self.global_step = state['global_step']
        self.current_epoch = state['current_epoch']
        sampler.load_state_dict(state['sampler_state'])
        return new_flow, new_opt_state


def _map_config_entries(tfep_map) -> Dict[str, Any]:
    """Checkpoint entries embedding the map's constructor config.

    Each hyperparameter is test-pickled individually; values that cannot
    be serialized (e.g. live engine handles) are recorded by name so the
    loader can demand them as overrides instead of failing opaquely.
    """
    hparams = getattr(tfep_map, 'hparams', None)
    if tfep_map is None or hparams is None:
        return {}
    saved, unsaved = {}, []
    for name, value in hparams.items():
        try:
            pickle.dumps(value)
        except Exception:
            unsaved.append(name)
        else:
            saved[name] = value
    map_class = type(tfep_map)
    return {
        'map_class': f'{map_class.__module__}:{map_class.__qualname__}',
        'map_hparams': saved,
        'unsaved_hparams': unsaved,
    }


def _check_checkpoint_version(state: Dict[str, Any], path: str):
    version = state.get('format_version', 0)
    if not isinstance(version, int) or version > CHECKPOINT_FORMAT_VERSION:
        raise ValueError(
            f'Checkpoint {path!r} has format version {version!r}, but this '
            f'version of tfep_tpu reads at most '
            f'{CHECKPOINT_FORMAT_VERSION}. Upgrade the library to load it.')
    return version


def load_map_from_checkpoint(checkpoint_path: str, expected_class=None,
                             **override_hparams):
    """Reconstruct a trained TFEP map from a self-contained checkpoint.

    The checkpoint embeds the map's class and constructor configuration
    (the counterpart of Lightning ``save_hyperparameters``,
    /root/reference/tfep/app/base.py:196), so a fresh process needs only
    the checkpoint file (plus the trajectory files if the map was built
    from paths). The map is rebuilt, ``setup()`` is run to recreate the
    flow structure, and the trained parameters are restored into it.

    Parameters
    ----------
    checkpoint_path : str
        Path to a ``last.ckpt`` written by :class:`Trainer`.
    expected_class : type, optional
        Raise if the stored class is not this class or a subclass
        (used by ``TFEPMapBase.load_from_checkpoint``).
    **override_hparams
        Replace stored hyperparameters; required for any listed in the
        checkpoint's ``unsaved_hparams`` (values that could not be
        pickled at save time).

    Returns
    -------
    tfep_map
        The reconstructed map with trained parameters in ``.flow``.
    """
    import importlib

    with open(checkpoint_path, 'rb') as f:
        state = pickle.load(f)
    _check_checkpoint_version(state, checkpoint_path)
    if 'map_class' not in state:
        raise ValueError(
            f'Checkpoint {checkpoint_path!r} does not embed the map '
            'configuration (written before format version 1, or by a map '
            'without hparams). Rebuild the map manually and use '
            'Trainer(..., save_dir=...).fit(map, resume=True).')

    module_name, _, qualname = state['map_class'].partition(':')
    map_class = importlib.import_module(module_name)
    for attr in qualname.split('.'):
        map_class = getattr(map_class, attr)
    if expected_class is not None and not issubclass(map_class,
                                                     expected_class):
        raise ValueError(
            f'Checkpoint {checkpoint_path!r} holds a '
            f'{state["map_class"]}, not a {expected_class.__qualname__}.')

    missing = [name for name in state.get('unsaved_hparams', ())
               if name not in override_hparams]
    if missing:
        raise ValueError(
            f'Checkpoint {checkpoint_path!r} could not serialize the '
            f'hyperparameters {missing}; pass them as keyword overrides, '
            f'e.g. load_map_from_checkpoint(path, {missing[0]}=...).')

    hparams = {**state['map_hparams'], **override_hparams}
    tfep_map = map_class(**hparams)
    tfep_map.setup()
    tfep_map.flow = Trainer._restore_leaves(tfep_map.flow,
                                            state['flow_leaves'], 'flow')
    return tfep_map


def _dealias(tree):
    """Copy every array leaf of the pytree into fresh, unaliased buffers.

    Buffer donation requires each donated buffer to appear exactly once,
    and it consumes the buffers — which may still be referenced by objects
    the user holds (a transformer reused across maps, the map's own flow
    attribute). Copying up front makes donation safe in both directions.
    """
    def fix(leaf):
        if isinstance(leaf, jax.Array):
            return jnp.array(leaf, copy=True)
        return leaf

    return jax.tree_util.tree_map(fix, tree)
