"""Multimap targeted free energy perturbation on a triatomic toy molecule.

Reproduces the reference tutorial workflow (docs/intro_to_MTFEP.ipynb,
arXiv:2302.07683) natively: a linear triatomic with two harmonic bonds and a
harmonic angle, reference state A (equilibrium bond length r0A) sampled by
Metropolis Monte Carlo, target state B with a longer r0B. The TFEP map is a
CartesianMAFMap with the central atom pinned at the origin and the outer
atoms fixing the axes. The *multimap* estimator uses every per-sample work
value logged during training (each visited by a progressively better map)
and bootstrap with ``take_first_only``.

The exact answer comes from 1D quadrature of the internal-coordinate
partition functions (no engine needed):
  Z = [int r^2 e^{-beta k (r-r0)^2 / 2} dr]^2 * int sin(t) e^{-beta kt (t-t0)^2/2} dt

Run: python examples/multimap_tfep_triatomic.py
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
import optax

from tfep_tpu.app import CartesianMAFMap, Trainer
from tfep_tpu.analysis import bootstrap, fep_estimator
from tfep_tpu.io.topology import Topology
from tfep_tpu.io.traj import System
from tfep_tpu.units import ureg

# System parameters (the tutorial's, in kT units at 300 K).
KT_KCAL = 0.5961615
K_R = 290.1 / KT_KCAL      # bond constant [1/kT/A^2]
K_A = 900.0 / KT_KCAL      # angle constant [1/kT/rad^2]
R0_A = 1.278               # reference equilibrium bond length [A]
R0_B = 1.5                 # target equilibrium bond length [A]
THETA0 = 2.038             # equilibrium angle [rad]

N_SAMPLES = 4096
N_EPOCHS = 40
N_ESTIMATION_EPOCHS = 20  # use the last (best-trained) epochs
BATCH_SIZE = 256


def reduced_potential(x, r0):
    """u/kT for flattened (batch, 9) coordinates of atoms [0, 1, 2]."""
    pos = x.reshape(x.shape[0], 3, 3)
    r10 = pos[:, 0] - pos[:, 1]
    r12 = pos[:, 2] - pos[:, 1]
    d10 = jnp.linalg.norm(r10, axis=-1)
    d12 = jnp.linalg.norm(r12, axis=-1)
    cos_t = jnp.sum(r10 * r12, axis=-1) / (d10 * d12)
    theta = jnp.arccos(jnp.clip(cos_t, -1.0, 1.0))
    return (0.5 * K_R * ((d10 - r0) ** 2 + (d12 - r0) ** 2)
            + 0.5 * K_A * (theta - THETA0) ** 2)


class TargetPotential:
    """State-B potential in kT units (energy_unit None => kT = 1)."""
    energy_unit = None

    def __call__(self, x, cell=None):
        return reduced_potential(x, R0_B)


def _u_numpy(pos, r0):
    """Reduced potential for (walkers, 3, 3) positions, pure numpy."""
    r10 = pos[:, 0] - pos[:, 1]
    r12 = pos[:, 2] - pos[:, 1]
    d10 = np.linalg.norm(r10, axis=-1)
    d12 = np.linalg.norm(r12, axis=-1)
    cos_t = np.sum(r10 * r12, axis=-1) / (d10 * d12)
    theta = np.arccos(np.clip(cos_t, -1.0, 1.0))
    return (0.5 * K_R * ((d10 - r0) ** 2 + (d12 - r0) ** 2)
            + 0.5 * K_A * (theta - THETA0) ** 2)


def sample_reference(n_samples, seed=0, n_burn=500, thin=20, n_walkers=64):
    """Metropolis MC in Cartesian coordinates of state A (vectorized)."""
    rng = np.random.default_rng(seed)
    pos0 = np.array([[R0_A * np.sin(THETA0 / 2), R0_A * np.cos(THETA0 / 2),
                      0.0],
                     [0.0, 0.0, 0.0],
                     [-R0_A * np.sin(THETA0 / 2), R0_A * np.cos(THETA0 / 2),
                      0.0]])
    pos = np.tile(pos0[None], (n_walkers, 1, 1))
    pos += 0.01 * rng.normal(size=pos.shape)
    u = _u_numpy(pos, R0_A)

    samples = []
    step_size = 0.03
    n_rounds = n_burn + (n_samples // n_walkers + 1) * thin
    for it in range(n_rounds):
        prop = pos + step_size * rng.normal(size=pos.shape)
        u_prop = _u_numpy(prop, R0_A)
        accept = np.log(rng.random(n_walkers)) < u - u_prop
        pos[accept] = prop[accept]
        u[accept] = u_prop[accept]
        if it >= n_burn and (it - n_burn) % thin == 0:
            samples.append(pos.copy())
    return np.concatenate(samples)[:n_samples]


def analytic_df():
    """Exact reduced free-energy difference by quadrature."""
    r = np.linspace(0.5, 3.0, 20001)
    t = np.linspace(0.5, np.pi, 20001)

    def z(r0):
        zr = np.trapezoid(r ** 2 * np.exp(-0.5 * K_R * (r - r0) ** 2), r)
        zt = np.trapezoid(np.sin(t) * np.exp(-0.5 * K_A * (t - THETA0) ** 2),
                          t)
        return zr ** 2 * zt

    return -np.log(z(R0_B) / z(R0_A))


def main():
    print('Sampling reference ensemble (Metropolis MC)...')
    positions = sample_reference(N_SAMPLES)
    topology = Topology(names=['O1', 'O2', 'O3'], elements=['O', 'O', 'O'],
                        bonds=[(0, 1), (1, 2)])
    system = System(topology, positions)

    df_exact = analytic_df()
    print(f'analytic df     = {df_exact:.4f} kT')

    # Standard FEP on the raw samples (degrades as r0B moves away).
    x = jnp.asarray(positions.reshape(N_SAMPLES, -1))
    work_fep = reduced_potential(x, R0_B) - reduced_potential(x, R0_A)
    print(f'standard FEP df = {float(fep_estimator(work_fep)):.4f} kT')

    # TFEP map: central atom at the origin, outer atoms fixing the axes.
    logdir = '/tmp/mtfep_triatomic_logs'
    shutil.rmtree(logdir, ignore_errors=True)
    tfep_map = CartesianMAFMap(
        potential_energy_func=TargetPotential(),
        temperature=300.0 * ureg.kelvin,
        system=system,
        batch_size=BATCH_SIZE,
        mapped_atoms=[0, 2],
        conditioning_atoms=[1],
        origin_atom=1,
        axes_atoms=[0, 2],
        n_maf_layers=4,
        flow_kwargs=dict(hidden_layers=[64, 64]),
        tfep_logger_dir_path=logdir,
    )
    trainer = Trainer(save_dir=None, max_epochs=N_EPOCHS, shuffle=True)
    trainer.optimizer = optax.adamw(2e-3)
    trainer.fit(tfep_map)

    # Multimap estimator: concatenate the per-sample work from every epoch
    # (each sample mapped by a progressively better map).
    logger = tfep_map.tfep_logger
    u_a = np.asarray(reduced_potential(x, R0_A))
    works = []
    for epoch in range(N_EPOCHS - N_ESTIMATION_EPOCHS, N_EPOCHS):
        data = logger.read_train_tensors(epoch_idx=epoch)
        idx = data['dataset_sample_index'].astype(int)
        works.append(data['potential'] - data['log_det_J'] - u_a[idx])
    work_mtfep = np.concatenate(works)

    df_mtfep = float(fep_estimator(jnp.asarray(work_mtfep)))
    boot = bootstrap(
        jnp.asarray(work_mtfep),
        lambda d, vectorized=False, weights=None: fep_estimator(
            d, weights=weights, vectorized=vectorized),
        n_resamples=1000, seed=1)
    lo = float(boot['confidence_interval']['low'])
    hi = float(boot['confidence_interval']['high'])
    print(f'multimap TFEP df = {df_mtfep:.4f} kT   CI=[{lo:.4f}, {hi:.4f}]')
    print(f'|error| = {abs(df_mtfep - df_exact):.4f} kT')

    assert lo - 0.2 < df_exact < hi + 0.2, 'TFEP estimate missed the target'
    print('MULTIMAP TFEP OK')


if __name__ == '__main__':
    main()
