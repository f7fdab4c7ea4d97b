"""Engine-in-the-loop TFEP: EnginePotential + process pool + overlap.

BASELINE config 3: ``Trainer.fit`` with the target potential evaluated by
an *external engine on the host* — per-frame single points fanned out over
a ``multiprocessing`` pool (``ProcessPoolStrategy``), bridged into the
jitted training step, and double-buffered against device compute
(``Trainer(engine_overlap=True)``).

When ``tblite`` is importable the engine is a real GFN2-xTB water dimer;
otherwise a fake QM engine (host-side numpy with per-point latency) stands
in so the example runs anywhere. Either way the pipeline is identical —
the engine sees one frame per task, exactly like psi4/tblite production
runs. With the fake engine the system is the analytic Gaussian pair, so
the TFEP estimate is checked against the exact answer.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import multiprocessing
import shutil
import time

import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp
import numpy as np
import optax

from tfep_tpu.analysis import bootstrap, fep_estimator
from tfep_tpu.app import Trainer
from tfep_tpu.app.base import TFEPMapBase
from tfep_tpu.io.topology import Topology
from tfep_tpu.io.traj import System
from tfep_tpu.nn.conditioners import generate_degrees
from tfep_tpu.nn.flows import MAF, SequentialFlow
from tfep_tpu.parallel.strategies import ProcessPoolStrategy
from tfep_tpu.potentials.engine import EnginePotential
from tfep_tpu.units import ureg

rng = np.random.default_rng(5)
N_FRAMES, N_ATOMS = 2048, 2
SIGMA_A, SIGMA_B = 1.0, 0.7
DF_ANALYTIC = -3 * N_ATOMS * np.log(SIGMA_B / SIGMA_A)
ENGINE_LATENCY_S = 0.002  # per-frame single-point cost of the fake engine


def _fake_qm_single_point(positions, sigma_b, compute_forces):
    """One frame's 'QM' single point (module-level: must pickle into the
    pool workers). positions: (n_atoms, 3) angstrom; energy in eV."""
    time.sleep(ENGINE_LATENCY_S)
    energy = float(np.sum(positions ** 2) / (2 * sigma_b ** 2))
    forces = -positions / sigma_b ** 2 if compute_forces else None
    return energy, forces


class FakeQMPotential(EnginePotential):
    """Gaussian 'QM' engine evaluated frame-by-frame on the host."""

    DEFAULT_ENERGY_UNIT = 'eV'
    DEFAULT_POSITIONS_UNIT = 'angstrom'
    ENGINE_ENERGY_UNIT = 'eV'
    ENGINE_POSITIONS_UNIT = 'angstrom'

    def _compute_batch(self, positions, cell, compute_forces):
        task_args = [(positions[i].reshape(-1, 3), SIGMA_B, compute_forces)
                     for i in range(positions.shape[0])]
        results = self.parallelization_strategy.run(
            _fake_qm_single_point, task_args)
        energies = np.asarray([r[0] for r in results])
        forces = (np.stack([r[1].reshape(-1) for r in results])
                  if compute_forces else None)
        return energies, forces


def make_potential(pool):
    """Real tblite engine when available, fake QM otherwise."""
    try:
        from tfep_tpu.potentials.tblite import (
            TBLITE_INSTALLED, TBLitePotential,
        )
    except ImportError:
        TBLITE_INSTALLED = False
    strategy = ProcessPoolStrategy(pool)
    if TBLITE_INSTALLED:
        return TBLitePotential(method='GFN2-xTB',
                               numbers=np.array([8, 1] * (N_ATOMS // 2)),
                               parallelization_strategy=strategy)
    return FakeQMPotential(parallelization_strategy=strategy)


class GaussianEngineMap(TFEPMapBase):
    def configure_flow(self):
        n_dofs = self.dataset.n_atoms * 3
        return SequentialFlow.create(
            MAF.create(jax.random.key(self.seed),
                       generate_degrees(n_dofs, order='ascending')),
            MAF.create(jax.random.key(self.seed + 1),
                       generate_degrees(n_dofs, order='descending')),
        )


def main():
    positions = rng.normal(0.0, SIGMA_A, size=(N_FRAMES, N_ATOMS, 3))
    system = System(Topology(names=['C'] * N_ATOMS), positions)
    logdir = '/tmp/engine_tfep_logs'
    shutil.rmtree(logdir, ignore_errors=True)

    with multiprocessing.Pool(4) as pool:
        potential = make_potential(pool)
        # Temperature chosen so kT == 1 eV exactly (the engine's energy
        # unit): reduced potentials equal the raw engine energies.
        tfep_map = GaussianEngineMap(
            potential_energy_func=potential,
            temperature=11604.518121550082 * ureg.kelvin,
            system=system,
            batch_size=256,
            tfep_logger_dir_path=logdir,
        )
        trainer = Trainer(save_dir=None, max_epochs=25, shuffle=True,
                          engine_overlap=True, log_every_n_steps=80)
        trainer.optimizer = optax.adamw(5e-3)

        start = time.perf_counter()
        trainer.fit(tfep_map)
        wall = time.perf_counter() - start

    n_steps = trainer.global_step
    engine_total = n_steps * 256 * ENGINE_LATENCY_S / 4  # 4 pool workers
    print(f'trained steps: {n_steps} in {wall:.1f}s '
          f'(engine busy ~{engine_total:.1f}s across the pool)')

    data = tfep_map.tfep_logger.read_train_tensors(
        epoch_idx=trainer.current_epoch - 1)
    idx = data['dataset_sample_index'].astype(int)
    u_a = np.sum(positions.reshape(N_FRAMES, -1)[idx] ** 2,
                 axis=-1) / (2 * SIGMA_A ** 2)
    work = data['potential'] - data['log_det_J'] - u_a
    df_tfep = float(fep_estimator(jnp.asarray(work)))
    boot = bootstrap(jnp.asarray(work),
                     lambda d, vectorized=False, weights=None:
                         fep_estimator(d, weights=weights,
                                       vectorized=vectorized),
                     n_resamples=500, seed=1)
    lo = float(boot['confidence_interval']['low'])
    hi = float(boot['confidence_interval']['high'])
    print(f'analytic df  = {DF_ANALYTIC:.4f} kT')
    print(f'TFEP df      = {df_tfep:.4f} kT   CI=[{lo:.4f}, {hi:.4f}]')

    assert lo - 0.15 <= DF_ANALYTIC <= hi + 0.15, (
        f'TFEP estimate {df_tfep} (CI [{lo},{hi}]) misses analytic '
        f'{DF_ANALYTIC}')
    print('ENGINE TFEP OK')


if __name__ == '__main__':
    main()
