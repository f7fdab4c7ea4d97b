"""One process of the real 2-process distributed training test.

Launched by tests/parallel/test_multihost.py: initializes jax.distributed
(CPU backend, 1 device per process), trains a CartesianMAFMap over the
global 2-device mesh with each host feeding its own frame shard, logs to a
per-host TFEP logger, and writes its loss history (plus, on process 0, the
cross-host merged work values) as JSON for the parent to assert on.
"""

import json
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.pop('XLA_FLAGS', None)

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)


def main():
    coordinator, process_id, n_processes, workdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=n_processes,
                               process_id=process_id)
    assert jax.process_count() == n_processes
    assert jax.device_count() == n_processes

    import numpy as np
    from jax.experimental import multihost_utils

    from tfep_tpu.app import CartesianMAFMap, Trainer
    from tfep_tpu.io.topology import Topology
    from tfep_tpu.io.traj import System
    from tfep_tpu.parallel.distributed import (
        all_hosts_work_values, host_frame_indices, host_logger_dir,
    )
    from tfep_tpu.parallel.sharding import (
        batch_sharding, make_mesh, replicate,
    )
    from tfep_tpu.units import ureg

    # Deterministic data: identical on every host.
    n_frames_global, n_atoms = 16, 4
    rng = np.random.default_rng(123)
    positions = rng.normal(0.0, 1.0, size=(n_frames_global, n_atoms, 3))
    system = System(Topology(names=[f'C{i}' for i in range(n_atoms)]),
                    positions)

    host_frames = host_frame_indices(n_frames_global, process_id,
                                     n_processes)

    import jax.numpy as jnp

    class MockPotential:
        energy_unit = None

        def __call__(self, x, cell=None):
            return jnp.sum(x ** 2, axis=-1)

    class HostShardMap(CartesianMAFMap):
        """Each host's dataset is its shard of the global frames (the
        trajectory sample indices stay global for the logger)."""

        def create_dataset(self):
            dataset = super().create_dataset()
            dataset.subsample(start=int(host_frames[0]),
                              stop=int(host_frames[-1]))
            return dataset

    tfep_map = HostShardMap(
        potential_energy_func=MockPotential(),
        temperature=300.0 * ureg.kelvin,
        system=system,
        batch_size=4,  # local rows per host -> global batch 8
        n_maf_layers=2,
        tfep_logger_dir_path=host_logger_dir(workdir, process_id))
    tfep_map.setup()

    mesh = make_mesh()  # all (global) devices
    tfep_map.flow = replicate(
        jax.tree_util.tree_map(np.asarray, tfep_map.flow), mesh)

    trainer = Trainer(save_dir=None, max_epochs=2, shuffle=False,
                      sharding=batch_sharding(mesh))
    trainer.fit(tfep_map)

    result = {
        'process_id': process_id,
        'global_step': trainer.global_step,
        'loss_history': [round(v, 12) for v in trainer.loss_history],
        'host_frames': np.asarray(host_frames).tolist(),
    }

    # Host 0 merges every host's logged work values once all have written.
    multihost_utils.sync_global_devices('tfep-logs-written')
    if process_id == 0:
        merged = all_hosts_work_values(
            workdir, epoch_idx=1,
            names=('potential', 'log_det_J', 'trajectory_sample_index'))
        result['merged_trajectory_indices'] = sorted(
            merged['trajectory_sample_index'].astype(int).tolist())
        result['merged_finite'] = bool(
            np.all(np.isfinite(merged['potential'])))

    with open(os.path.join(workdir, f'result-{process_id}.json'), 'w') as f:
        json.dump(result, f)
    print(f'worker {process_id} done', flush=True)


if __name__ == '__main__':
    main()
