"""Seed-ensemble TFEP: K maps trained simultaneously via vmap.

Trains K=4 independently seeded affine-MAF maps on the toy Gaussian
system (analytic df = -3 log(sigma_B/sigma_A)) in ONE vmapped training
loop (``tfep_tpu.nn.ensemble``), then estimates df per member. The
member spread is a direct map-uncertainty estimate that a single
training run cannot provide; on TPU at engine-bound batch sizes the K
members cost ~3x less than K sequential runs (docs/PERFORMANCE.md,
benchmarks/ensemble_bench.py). No reference equivalent: the reference
trains one torch module per process
(/root/reference/tfep/app/base.py:780-840).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp
import numpy as np
import optax

from tfep_tpu.analysis import fep_estimator
from tfep_tpu.app.base import TFEPMapBase
from tfep_tpu.io.topology import Topology
from tfep_tpu.io.traj import System
from tfep_tpu.nn.conditioners import generate_degrees
from tfep_tpu.nn.ensemble import (
    ensemble_init, ensemble_map, make_ensemble_train_step, stack_modules,
    unstack_module,
)
from tfep_tpu.nn.flows import MAF, SequentialFlow
from tfep_tpu.nn.module import partition
from tfep_tpu.units import ureg

rng = np.random.default_rng(0)
N_FRAMES, N_ATOMS = 2048, 1
K_MEMBERS = 4
BATCH = 256
N_EPOCHS = 30
SIGMA_A, SIGMA_B = 1.0, 0.7
DF_ANALYTIC = -3 * np.log(SIGMA_B / SIGMA_A)

positions = rng.normal(0.0, SIGMA_A, size=(N_FRAMES, N_ATOMS, 3))
system = System(Topology(names=['C'] * N_ATOMS), positions)


class GaussianPotential:
    energy_unit = None

    def __call__(self, x, cell=None):
        return jnp.sum(x ** 2, axis=-1) / (2 * SIGMA_B ** 2)


class ToyMap(TFEPMapBase):
    def configure_flow(self):
        n_dofs = self.dataset.n_atoms * 3
        return SequentialFlow.create(
            MAF.create(jax.random.key(self.seed),
                       generate_degrees(n_dofs, order='ascending')),
            MAF.create(jax.random.key(self.seed + 1),
                       generate_degrees(n_dofs, order='descending')),
        )


# One map provides the dataset + training_step_fn; the K member flows come
# from the map's own configure_flow at K different seeds.
tfep_map = ToyMap(
    potential_energy_func=GaussianPotential(),
    temperature=300.0 * ureg.kelvin,
    system=system, batch_size=BATCH, tfep_logger_dir_path=None)
tfep_map.setup()

members = []
for k in range(K_MEMBERS):
    tfep_map.seed = 100 * k
    members.append(tfep_map.configure_flow())
stacked = stack_modules(members)

optimizer = optax.adamw(5e-3)
opt_state = ensemble_init(optimizer, stacked)
step = jax.jit(make_ensemble_train_step(
    lambda flow, batch: tfep_map.training_step_fn(flow, batch),
    optimizer, has_aux=True))

# Plain epoch loop: every member sees the same shuffled batches (only the
# initialization seeds differ).
shuffle_rng = np.random.default_rng(7)
losses = None
for epoch in range(N_EPOCHS):
    perm = shuffle_rng.permutation(N_FRAMES)
    for start in range(0, N_FRAMES, BATCH):
        idx = perm[start:start + BATCH]
        batch = {key: jnp.asarray(v)
                 for key, v in tfep_map.dataset.get_batch(idx.tolist()).items()}
        stacked, opt_state, losses, _ = step(stacked, opt_state, batch)
print('final per-member losses:', np.round(np.asarray(losses), 4))

# --- Per-member df over the full dataset (vmapped forward). --------------
x = jnp.asarray(positions.reshape(N_FRAMES, -1))
u_a = jnp.sum(x ** 2, axis=-1) / (2 * SIGMA_A ** 2)


def member_work(flow, x):
    out = tfep_map.forward_step_fn(flow, {'positions': x})
    u_b = GaussianPotential()(out['positions'])
    return u_b - out['log_det_J'] - u_a


works = ensemble_map(member_work, stacked, x)          # (K, N_FRAMES)
dfs = np.array([float(fep_estimator(w)) for w in works])
spread = dfs.std()
print(f'analytic df      = {DF_ANALYTIC:.4f} kT')
print(f'per-member df    = {np.round(dfs, 4)}')
print(f'ensemble mean df = {dfs.mean():.4f} kT  (member spread std '
      f'{spread:.4f})')

# Every member must land near the analytic answer, and the spread must be
# small (all members saw the same data; only the init seeds differ).
assert np.all(np.abs(dfs - DF_ANALYTIC) < 0.1), (dfs, DF_ANALYTIC)
assert spread < 0.05, spread

# Members are genuinely different models (different seeds)...
p0 = jax.tree_util.tree_leaves(partition(unstack_module(stacked, 0))[0])
p1 = jax.tree_util.tree_leaves(partition(unstack_module(stacked, 1))[0])
assert any(not np.array_equal(np.asarray(a), np.asarray(b))
           for a, b in zip(p0, p1))
# ...and each extracted member reproduces its vmapped work values.
w0 = member_work(unstack_module(stacked, 0), x)
np.testing.assert_allclose(np.asarray(w0), np.asarray(works[0]),
                           rtol=1e-9, atol=1e-12)

print('ENSEMBLE TFEP OK')
