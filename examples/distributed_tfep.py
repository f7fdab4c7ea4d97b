"""Distributed multimap TFEP: frames sharded across hosts, engine in the loop.

BASELINE config 5: the full production topology at toy scale. The script
launches itself as a 2-process ``jax.distributed`` cluster (CPU backend, one
device per process — the same code runs unchanged on a multi-host TPU pod
slice, where each process owns that host's chips):

- every host feeds its own disjoint shard of the trajectory frames
  (`host_frame_indices`) into a global GSPMD batch sharded on the frames
  axis (`make_array_from_process_local_data`);
- the target potential is an external engine evaluated *on each host* for
  its local frames only, double-buffered against device compute
  (``Trainer(engine_overlap=True)`` — step time ~ max(device, engine));
- per-sample work values go to per-host TFEP loggers
  (`host_logger_dir`), keyed by global trajectory sample index;
- after training, host 0 merges every host's logs across the estimation
  epochs (`all_hosts_work_values`) into the *multimap* free-energy
  estimate (arXiv:2302.07683: every logged sample, each visited by a
  progressively better map) with a bootstrap confidence interval.

The system is the analytic Gaussian pair (reference state sigma_A, target
sigma_B), so the merged estimate is asserted against the exact answer.

Run: python examples/distributed_tfep.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import socket
import subprocess
import sys
import time

N_PROCESSES = 2
N_FRAMES_GLOBAL = int(os.environ.get('DIST_TFEP_FRAMES', 2048))
LOCAL_BATCH = int(os.environ.get('DIST_TFEP_BATCH', 128))
N_EPOCHS = int(os.environ.get('DIST_TFEP_EPOCHS', 12))
N_ESTIMATION_EPOCHS = max(1, N_EPOCHS - 4)
N_ATOMS = 2
SIGMA_A, SIGMA_B = 1.0, 0.7
ENGINE_LATENCY_S = 5e-4   # fake engine's per-frame single-point cost


def analytic_df():
    import numpy as np
    return -3 * N_ATOMS * np.log(SIGMA_B / SIGMA_A)


# ===========================================================================
# Worker (one "host" of the cluster)
# ===========================================================================

def worker(coordinator: str, process_id: int, workdir: str):
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ.pop('XLA_FLAGS', None)   # one CPU device per process
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=N_PROCESSES,
                               process_id=process_id)

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.experimental import multihost_utils

    from tfep_tpu.analysis import bootstrap, fep_estimator
    from tfep_tpu.app import Trainer
    from tfep_tpu.app.base import TFEPMapBase
    from tfep_tpu.io.topology import Topology
    from tfep_tpu.io.traj import System
    from tfep_tpu.nn.conditioners import generate_degrees
    from tfep_tpu.nn.flows import MAF, SequentialFlow
    from tfep_tpu.parallel.distributed import (
        all_hosts_work_values, host_frame_indices, host_logger_dir,
    )
    from tfep_tpu.parallel.sharding import (
        batch_sharding, make_mesh, replicate,
    )
    from tfep_tpu.potentials.engine import EnginePotential
    from tfep_tpu.units import ureg

    # Reference-ensemble frames, identical on every host; each host feeds
    # only its own shard.
    rng = np.random.default_rng(7)
    positions = rng.normal(0.0, SIGMA_A,
                           size=(N_FRAMES_GLOBAL, N_ATOMS, 3))
    system = System(Topology(names=['C'] * N_ATOMS), positions)
    host_frames = host_frame_indices(N_FRAMES_GLOBAL, process_id,
                                     N_PROCESSES)

    class FakeQMPotential(EnginePotential):
        """Gaussian 'QM' target evaluated frame-by-frame on this host."""

        DEFAULT_ENERGY_UNIT = 'eV'
        DEFAULT_POSITIONS_UNIT = 'angstrom'
        ENGINE_ENERGY_UNIT = 'eV'
        ENGINE_POSITIONS_UNIT = 'angstrom'

        def _compute_batch(self, pos, cell, compute_forces):
            energies, forces = [], []
            for frame in pos:
                time.sleep(ENGINE_LATENCY_S)
                energies.append(np.sum(frame ** 2) / (2 * SIGMA_B ** 2))
                forces.append(-frame / SIGMA_B ** 2)
            return (np.asarray(energies),
                    np.stack(forces) if compute_forces else None)

    class DistributedGaussianMap(TFEPMapBase):
        def create_dataset(self):
            dataset = super().create_dataset()
            # This host feeds only its (contiguous) shard of the frames.
            dataset.subsample(start=int(host_frames[0]),
                              stop=int(host_frames[-1]))
            return dataset

        def configure_flow(self):
            n_dofs = self.dataset.n_atoms * 3
            return SequentialFlow.create(
                MAF.create(jax.random.key(self.seed),
                           generate_degrees(n_dofs, order='ascending')),
                MAF.create(jax.random.key(self.seed + 1),
                           generate_degrees(n_dofs, order='descending')),
            )

    # kT == 1 eV: reduced potentials equal raw engine energies.
    tfep_map = DistributedGaussianMap(
        potential_energy_func=FakeQMPotential(),
        temperature=11604.518121550082 * ureg.kelvin,
        system=system,
        batch_size=LOCAL_BATCH,   # local rows -> global batch = 2x this
        tfep_logger_dir_path=host_logger_dir(workdir, process_id))
    tfep_map.setup()

    mesh = make_mesh()            # all processes' devices
    tfep_map.flow = replicate(
        jax.tree_util.tree_map(np.asarray, tfep_map.flow), mesh)

    trainer = Trainer(save_dir=None, max_epochs=N_EPOCHS, shuffle=False,
                      engine_overlap=True, sharding=batch_sharding(mesh))
    trainer.optimizer = optax.adamw(5e-3)
    t0 = time.perf_counter()
    trainer.fit(tfep_map)
    wall = time.perf_counter() - t0

    result = {'process_id': process_id, 'global_step': trainer.global_step,
              'wall_s': round(wall, 2),
              'loss_history': [round(v, 10) for v in trainer.loss_history]}

    # Host 0 merges every host's per-sample work values into the multimap
    # estimate once all processes have flushed their logs.
    multihost_utils.sync_global_devices('tfep-logs-written')
    if process_id == 0:
        u_a_all = np.sum(positions.reshape(N_FRAMES_GLOBAL, -1) ** 2,
                         axis=-1) / (2 * SIGMA_A ** 2)
        work = []
        for epoch in range(N_EPOCHS - N_ESTIMATION_EPOCHS, N_EPOCHS):
            merged = all_hosts_work_values(
                workdir, epoch_idx=epoch, n_hosts=N_PROCESSES,
                names=('potential', 'log_det_J', 'trajectory_sample_index'))
            u_a = u_a_all[merged['trajectory_sample_index'].astype(int)]
            work.append(merged['potential'] - merged['log_det_J'] - u_a)
        work = np.concatenate(work)

        df = float(fep_estimator(jnp.asarray(work)))
        boot = bootstrap(
            jnp.asarray(work),
            lambda d, vectorized=False, weights=None:
                fep_estimator(d, weights=weights, vectorized=vectorized),
            n_resamples=500, seed=1)
        result.update(
            df_multimap=df,
            ci_low=float(boot['confidence_interval']['low']),
            ci_high=float(boot['confidence_interval']['high']),
            n_work_values=int(work.size),
            df_analytic=float(analytic_df()))

    with open(os.path.join(workdir, f'result-{process_id}.json'), 'w') as f:
        json.dump(result, f)
    print(f'worker {process_id} done in {wall:.1f}s', flush=True)


# ===========================================================================
# Launcher
# ===========================================================================

def main(workdir=None):
    import tempfile

    # Every host must feed the same local row count, or the global-batch
    # assembly sees inconsistent shapes across processes.
    assert N_FRAMES_GLOBAL % N_PROCESSES == 0, \
        'DIST_TFEP_FRAMES must be divisible by the number of processes.'

    workdir = workdir or tempfile.mkdtemp(prefix='dist_tfep_')
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        coordinator = f'127.0.0.1:{s.getsockname()[1]}'

    # Workers log to files (reading pipes sequentially could deadlock the
    # cluster if one worker fills its pipe while the other is being read).
    logs = [os.path.join(workdir, f'worker-{pid}.log')
            for pid in range(N_PROCESSES)]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), '--worker',
             coordinator, str(pid), workdir],
            env=dict(os.environ, PYTHONPATH=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))),
            stdout=open(log, 'w'), stderr=subprocess.STDOUT)
        for pid, log in zip(range(N_PROCESSES), logs)
    ]
    for proc, log in zip(procs, logs):
        try:
            proc.wait(timeout=900)
        finally:
            if proc.poll() is None:
                proc.kill()
        if proc.returncode != 0:
            with open(log) as f:
                raise RuntimeError(f'worker failed:\n{f.read()[-4000:]}')

    results = {}
    for pid in range(N_PROCESSES):
        with open(os.path.join(workdir, f'result-{pid}.json')) as f:
            results[pid] = json.load(f)

    # GSPMD: the loss is a global reduction — identical on every host.
    assert results[0]['loss_history'] == results[1]['loss_history']

    r0 = results[0]
    print(f"steps: {r0['global_step']} "
          f"(walls: {[results[p]['wall_s'] for p in range(N_PROCESSES)]}s)")
    print(f"work values merged across hosts+epochs: {r0['n_work_values']}")
    print(f"analytic df      = {r0['df_analytic']:.4f} kT")
    print(f"multimap TFEP df = {r0['df_multimap']:.4f} kT   "
          f"CI=[{r0['ci_low']:.4f}, {r0['ci_high']:.4f}]")
    assert r0['ci_low'] - 0.15 <= r0['df_analytic'] <= r0['ci_high'] + 0.15, \
        'distributed multimap TFEP estimate misses the analytic value'
    print('DISTRIBUTED TFEP OK')
    return results


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == '--worker':
        worker(sys.argv[2], int(sys.argv[3]), sys.argv[4])
    else:
        main()
