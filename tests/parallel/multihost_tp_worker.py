"""One process of the real 4-process tensor-parallel training test.

Launched by tests/parallel/test_multihost.py: initializes jax.distributed
(CPU backend, 1 device per process, 4 processes), builds a 2x2 ``(dp, tp)``
mesh, TP-shards the MADE conditioners over real process boundaries
(column-parallel hidden layers / row-parallel output), trains for two
epochs with each dp group feeding its own frame shard — and then re-runs
the identical training single-device (the whole global batch, no
distribution) to assert the cross-process collectives compute the same
math. A TP collective that deadlocks or reduces wrongly across processes
fails here.
"""

import json
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ.pop('XLA_FLAGS', None)

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

N_FRAMES, N_ATOMS = 32, 4
LOCAL_BATCH = 4          # rows per dp group member -> global batch 8
N_DP, N_TP = 2, 2


def main():
    coordinator, process_id, n_processes, workdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=n_processes,
                               process_id=process_id)
    assert jax.process_count() == n_processes == N_DP * N_TP
    assert jax.device_count() == n_processes

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec

    from tfep_tpu.app import CartesianMAFMap, Trainer
    from tfep_tpu.io.dataset import Subset
    from tfep_tpu.io.topology import Topology
    from tfep_tpu.io.traj import System
    from tfep_tpu.nn.conditioners.made import MADE
    from tfep_tpu.parallel.sharding import (
        batch_sharding, make_mesh, shard_module,
    )
    from tfep_tpu.units import ureg

    # Deterministic data: identical on every host.
    rng = np.random.default_rng(321)
    positions = rng.normal(0.0, 1.0, size=(N_FRAMES, N_ATOMS, 3))
    system = System(Topology(names=[f'C{i}' for i in range(N_ATOMS)]),
                    positions)

    class MockPotential:
        energy_unit = None

        def __call__(self, x, cell=None):
            return jnp.sum(x ** 2, axis=-1)

    def build_map(host_frames=None, batch_size=LOCAL_BATCH):
        class ShardedMap(CartesianMAFMap):
            def create_dataset(self):
                dataset = super().create_dataset()
                if host_frames is not None:
                    dataset = Subset(dataset, host_frames)
                return dataset

        tfep_map = ShardedMap(
            potential_energy_func=MockPotential(),
            temperature=300.0 * ureg.kelvin,
            system=system,
            batch_size=batch_size,
            n_maf_layers=2,
            # Hidden widths divisible by tp=2 for even TP shards.
            flow_kwargs={'hidden_layers': [32, 32]},
            tfep_logger_dir_path=None,
            seed=7)
        tfep_map.setup()
        return tfep_map

    # The 2x2 mesh lays devices out [[p0, p1], [p2, p3]] (contiguous TP
    # groups): process p sits in dp group p // N_TP. Global batch rows are
    # assembled dp-group-major, so for the distributed batches to equal
    # the single-device batches [8k, 8k+8), dp group g must own the
    # alternating 4-frame blocks starting at 8k + 4g.
    dp_idx = process_id // N_TP
    host_frames = np.arange(N_FRAMES).reshape(-1, N_DP * LOCAL_BATCH)[
        :, dp_idx * LOCAL_BATCH:(dp_idx + 1) * LOCAL_BATCH].reshape(-1)

    # --- Distributed run: 2x2 (dp, tp) over 4 processes. ----------------
    tfep_map = build_map(host_frames=host_frames)
    mesh = make_mesh(model_axis_size=N_TP)
    assert mesh.shape == {'dp': N_DP, 'tp': N_TP}
    tfep_map.flow = shard_module(
        jax.tree_util.tree_map(np.asarray, tfep_map.flow), mesh)

    # The conditioners really are TP-split across process boundaries.
    mades = [m for m in jax.tree_util.tree_leaves(
                 tfep_map.flow, is_leaf=lambda x: isinstance(x, MADE))
             if isinstance(m, MADE)]
    assert mades
    hidden = mades[0].layers[0].weight
    assert hidden.sharding.spec == PartitionSpec('tp', None)
    assert not hidden.is_fully_addressable      # spans remote devices
    assert (mades[0].layers[-1].weight.sharding.spec
            == PartitionSpec(None, 'tp'))

    trainer = Trainer(save_dir=None, max_epochs=2, shuffle=False,
                      sharding=batch_sharding(mesh))
    trainer.fit(tfep_map)
    tp_losses = [float(v) for v in trainer.loss_history]

    # --- Control: identical math, one local device, no distribution. ----
    control_map = build_map(host_frames=None,
                            batch_size=N_DP * LOCAL_BATCH)
    control_trainer = Trainer(save_dir=None, max_epochs=2, shuffle=False)
    control_trainer.fit(control_map)
    control_losses = [float(v) for v in control_trainer.loss_history]

    result = {
        'process_id': process_id,
        'global_step': trainer.global_step,
        'tp_losses': tp_losses,
        'control_losses': control_losses,
        'max_abs_diff': max(abs(a - b) for a, b in
                            zip(tp_losses, control_losses)),
        'host_frames': host_frames.tolist(),
    }
    with open(os.path.join(workdir, f'tp-result-{process_id}.json'),
              'w') as f:
        json.dump(result, f)
    print(f'tp worker {process_id} done', flush=True)


if __name__ == '__main__':
    main()
