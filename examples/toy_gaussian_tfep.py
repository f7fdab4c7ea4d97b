"""End-to-end drive of tfep_tpu through its public API.

Full TFEP workflow on a toy system with a known analytic answer:
samples from a 3D Gaussian A (std sigma_A), target potential B a Gaussian
with std sigma_B => analytic reduced free-energy difference
  df = -3 * log(sigma_B / sigma_A)   (in kT units)
Train an affine-MAF map, log per-sample work, estimate df with the FEP
estimator + bootstrap CI, and exercise checkpoint/mid-epoch-resume.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import shutil

import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np
import jax.numpy as jnp

import tfep_tpu
from tfep_tpu.app.base import TFEPMapBase
from tfep_tpu.app.trainer import Trainer
from tfep_tpu.analysis import fep_estimator, bootstrap
from tfep_tpu.io.topology import Topology
from tfep_tpu.io.traj import System
from tfep_tpu.nn.conditioners import generate_degrees
from tfep_tpu.nn.flows import MAF, SequentialFlow
from tfep_tpu.units import ureg

rng = np.random.default_rng(0)
N_FRAMES, N_ATOMS = 2048, 1
SIGMA_A, SIGMA_B = 1.0, 0.7
DF_ANALYTIC = -3 * np.log(SIGMA_B / SIGMA_A)

positions = rng.normal(0.0, SIGMA_A, size=(N_FRAMES, N_ATOMS, 3))
topology = Topology(names=['C'] * N_ATOMS)
system = System(topology, positions)


class GaussianPotential:
    """Target potential B in kT units (energy_unit None => kT = 1)."""
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


logdir = '/tmp/verify_tfep_logs'
ckptdir = '/tmp/verify_tfep_ckpt'
for d in (logdir, ckptdir):
    shutil.rmtree(d, ignore_errors=True)

tfep_map = ToyMap(
    potential_energy_func=GaussianPotential(),
    temperature=300.0 * ureg.kelvin,
    system=system,
    batch_size=256,
)

trainer = Trainer(save_dir=ckptdir, max_epochs=40, optimizer=None,
                  shuffle=True)
import optax
trainer.optimizer = optax.adamw(5e-3)
flow = trainer.fit(tfep_map)
print('trained steps:', trainer.global_step)

# --- Read back logged per-sample quantities from the last epoch. ---------
logger = tfep_map.tfep_logger
data = logger.read_train_tensors(epoch_idx=trainer.current_epoch - 1)
# Reference reduced potential u_A for the logged samples.
sample_idx = data['dataset_sample_index'].astype(int)
u_a = np.sum(positions.reshape(N_FRAMES, -1)[sample_idx] ** 2,
             axis=-1) / (2 * SIGMA_A ** 2)
work = data['potential'] - data['log_det_J'] - u_a
df_tfep = float(fep_estimator(jnp.asarray(work)))
boot = bootstrap(jnp.asarray(work),
                 lambda d, vectorized=False, weights=None:
                     fep_estimator(d, weights=weights,
                                   vectorized=vectorized),
                 n_resamples=500, seed=1)
lo, hi = float(boot['confidence_interval']['low']), \
         float(boot['confidence_interval']['high'])

# The one-call API assembles the same work values from the logger.
from tfep_tpu.analysis import estimate_from_logger
u_a_full = np.sum(positions.reshape(N_FRAMES, -1) ** 2,
                  axis=-1) / (2 * SIGMA_A ** 2)
one_call = estimate_from_logger(
    tfep_map.tfep_logger, epoch_idx=trainer.current_epoch - 1,
    reference_potentials=u_a_full, n_resamples=500, seed=1)
assert abs(one_call['df'] - df_tfep) < 1e-6, (one_call['df'], df_tfep)
print(f'analytic df  = {DF_ANALYTIC:.4f} kT')
print(f'TFEP df      = {df_tfep:.4f} kT   CI=[{lo:.4f}, {hi:.4f}]')

# Untrained (identity-flow) standard FEP estimate for comparison.
x = jnp.asarray(positions.reshape(N_FRAMES, -1))
u_b = GaussianPotential()(x)
u_a_all = jnp.sum(x ** 2, axis=-1) / (2 * SIGMA_A ** 2)
df_fep = float(fep_estimator(u_b - u_a_all))
print(f'standard FEP = {df_fep:.4f} kT (identity map)')

assert lo - 0.15 <= DF_ANALYTIC <= hi + 0.15, \
    f'TFEP estimate {df_tfep} (CI [{lo},{hi}]) misses analytic {DF_ANALYTIC}'

# --- Crash/resume through the public checkpoint path. --------------------
shutil.rmtree(ckptdir, ignore_errors=True)
shutil.rmtree(logdir, ignore_errors=True)

map2 = ToyMap(potential_energy_func=GaussianPotential(),
              temperature=300.0 * ureg.kelvin, system=system,
              batch_size=256, tfep_logger_dir_path=None)
t1 = Trainer(save_dir=ckptdir, max_steps=5, shuffle=True)
t1.fit(map2)
print('pre-crash steps:', t1.global_step)

map3 = ToyMap(potential_energy_func=GaussianPotential(),
              temperature=300.0 * ureg.kelvin, system=system,
              batch_size=256, tfep_logger_dir_path=None)
t2 = Trainer(save_dir=ckptdir, max_steps=8, shuffle=True)
t2.fit(map3, resume=True)
print('post-resume steps:', t2.global_step, '(resumed from 5)')
assert t2.global_step == 8

print('VERIFY OK')
