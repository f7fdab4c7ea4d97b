"""End-to-end biased-sampling (metadynamics-reweighted) TFEP test.

The one core-math path the rest of the suite does not cover: a dataset whose
frames were sampled under a known bias ``V(x)``, trained through
``training_step_fn`` with the ``bias`` batch key
(``tfep_tpu/app/base.py`` training step), and estimated with
``fep_estimator``'s log-softmax bias weights — asserting the reweighted Δf
hits the analytic answer while the unweighted estimate converges to a
provably wrong value. Reference counterparts: the loss's log-weights contract
(/root/reference/tfep/loss.py:51-57, :131-136) and the estimator's biased
branch (/root/reference/tfep/analysis/estimator.py:56-66).

Analytic construction (kT = 1, D = n_atoms*3 independent DOFs):

- Reference ensemble A:  u_A(x) = |x|^2 / 2            (standard normal)
- Target ensemble B:     u_B(x) = |x|^2 / (2 sigma_B^2)
  so Δf = f_B - f_A = -D * ln(sigma_B).
- Biased sampling: frames drawn from exp(-(u_A + V)) with V(x) = -|x|^2/4,
  i.e. N(0, sqrt(2)) per DOF. Reweighting back to A weights each frame by
  softmax(V(x_i)).

With the identity map the per-frame work is w = u_B(x) - u_A(x) =
a*|x|^2/2 with a = 1/sigma_B^2 - 1, and the *unweighted* estimator
converges (law of large numbers) to the analytically wrong value
(D/2) * ln(1 + a*sigma_s^2) instead of (D/2) * ln(1 + a) — so the
miss is a deterministic math fact, not a sampling accident.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tfep_tpu.analysis import estimate_from_logger, fep_estimator
from tfep_tpu.app import CartesianMAFMap, Trainer
from tfep_tpu.io.dataset import DictDataset, MergedDataset
from tfep_tpu.io.topology import Topology
from tfep_tpu.io.traj import System, TrajectoryDataset
from tfep_tpu.units import ureg

N_FRAMES = 2000
N_ATOMS = 2
D = N_ATOMS * 3
SIGMA_B2 = 0.5                    # target variance per DOF
SIGMA_S = np.sqrt(2.0)            # biased-sampling std per DOF
ANALYTIC_DF = -0.5 * D * np.log(SIGMA_B2)            # -D ln(sigma_B)
# Identity-map unweighted estimator converges to this instead:
_A = 1.0 / SIGMA_B2 - 1.0
WRONG_DF = 0.5 * D * np.log(1.0 + _A * SIGMA_S**2)


class GaussianPotentialB:
    """u_B(x) = |x|^2 / (2 sigma_B^2), already in kT (energy_unit=None)."""
    energy_unit = None

    def __call__(self, x, cell=None):
        return jnp.sum(x**2, axis=-1) / (2.0 * SIGMA_B2)


class BiasedMAFMap(CartesianMAFMap):
    """CartesianMAFMap whose dataset merges per-frame bias potentials,
    the reference's MergedDataset recipe for reweighted sampling
    (/root/reference/tfep/io/dataset/merged.py + app create_dataset
    override, /root/reference/tfep/app/base.py:550-571)."""

    def __init__(self, *args, bias_values, **kwargs):
        super().__init__(*args, **kwargs)
        self._bias_values = np.asarray(bias_values)

    def create_dataset(self):
        traj = TrajectoryDataset(self._system)
        aux = DictDataset({'bias': self._bias_values})
        return MergedDataset(traj, aux)


def _make_biased_system(seed=0):
    rng = np.random.default_rng(seed)
    positions = rng.normal(0.0, SIGMA_S, size=(N_FRAMES, N_ATOMS, 3))
    topology = Topology(
        names=[f'C{i}' for i in range(N_ATOMS)],
        elements=['C'] * N_ATOMS,
        resnames=['MOL'] * N_ATOMS,
        resids=[1] * N_ATOMS,
    )
    flat = positions.reshape(N_FRAMES, -1)
    u_a = 0.5 * np.sum(flat**2, axis=1)         # u_A(x)/kT
    bias = -0.25 * np.sum(flat**2, axis=1)      # V(x)/kT
    return System(topology, positions), u_a, bias


@pytest.fixture(scope='module')
def biased_run(tmp_path_factory):
    """Train a map on the biased dataset (2 epochs) and log every epoch's
    per-sample work values; epoch 0 sees the identity-initialized flow on
    its first batches."""
    tmp_path = tmp_path_factory.mktemp('biased')
    system, u_a, bias = _make_biased_system()
    tfep_map = BiasedMAFMap(
        potential_energy_func=GaussianPotentialB(),
        temperature=300.0 * ureg.kelvin,
        system=system,
        bias_values=bias,
        batch_size=200,
        n_maf_layers=2,
        tfep_logger_dir_path=str(tmp_path / 'logs'),
    )
    import optax
    trainer = Trainer(save_dir=None, max_epochs=2, shuffle=True,
                      optimizer=optax.adamw(1e-3))
    trainer.fit(tfep_map)
    return tfep_map, u_a, bias


def test_training_step_consumes_bias(biased_run):
    """The jitted training step must weight the batch loss by
    softmax(bias/kT) (app/base.py training_step_fn) — checked against a
    manual computation on one batch."""
    tfep_map, u_a, bias = biased_run
    assert tfep_map.kT == 1.0          # energy_unit=None -> kT units
    indices = list(range(64))
    batch = {k: jnp.asarray(v)
             for k, v in tfep_map.dataset.get_batch(indices).items()}
    assert 'bias' in batch

    loss, aux = tfep_map.training_step_fn(tfep_map.flow, batch)

    work = np.asarray(aux['potential']) - np.asarray(aux['log_det_J'])
    w = np.exp(bias[:64] - np.max(bias[:64]))
    w = w / w.sum()
    np.testing.assert_allclose(float(loss), float(np.sum(w * work)),
                               rtol=1e-8)

    # Without the bias key the loss falls back to the plain mean.
    batch_nobias = {k: v for k, v in batch.items() if k != 'bias'}
    loss_nb, _ = tfep_map.training_step_fn(tfep_map.flow, batch_nobias)
    np.testing.assert_allclose(float(loss_nb), float(np.mean(work)),
                               rtol=1e-8)


def test_identity_map_reweighted_df_hits_analytic(biased_run):
    """Standard (identity-map) FEP from the biased frames: reweighting
    with the bias recovers the analytic Δf; the unweighted estimate
    converges to the analytically wrong value."""
    tfep_map, u_a, bias = biased_run
    flat = np.stack([np.asarray(tfep_map.dataset[i]['positions'])
                     for i in range(N_FRAMES)])
    work = (np.asarray(GaussianPotentialB()(jnp.asarray(flat))) - u_a)

    df_weighted = float(fep_estimator(jnp.stack([jnp.asarray(work),
                                                 jnp.asarray(bias)],
                                                axis=-1)))
    df_unweighted = float(fep_estimator(jnp.asarray(work)))

    assert abs(df_weighted - ANALYTIC_DF) < 0.15
    # The unweighted estimate lands near its own (wrong) limit, far from
    # the true Δf (gap = 3 ln(3/2) ≈ 1.22 kT for these constants).
    assert abs(df_unweighted - WRONG_DF) < 0.25
    assert abs(df_unweighted - ANALYTIC_DF) > 0.8


def test_trained_map_reweighted_df_brackets_analytic(biased_run):
    """TFEP is unbiased under any invertible map: after training on the
    biased data, estimate_from_logger with bias_potentials must bracket
    the analytic Δf, and omitting the bias must miss it."""
    tfep_map, u_a, bias = biased_run

    result = estimate_from_logger(
        tfep_map.tfep_logger, epoch_idx=1,
        reference_potentials=u_a, bias_potentials=bias,
        n_resamples=1000, seed=0)

    half_width = (result['confidence_interval']['high']
                  - result['confidence_interval']['low']) / 2
    assert half_width < 0.5            # the estimate is actually informative
    assert (result['confidence_interval']['low'] - 0.1 <= ANALYTIC_DF
            <= result['confidence_interval']['high'] + 0.1)

    # Unweighted readback of the same logged work values misses.
    result_nw = estimate_from_logger(
        tfep_map.tfep_logger, epoch_idx=1,
        reference_potentials=u_a,
        n_resamples=200, seed=0)
    assert abs(result_nw['df'] - ANALYTIC_DF) > 3 * half_width


def test_multimap_biased_estimate(biased_run):
    """The multimap estimator composes with bias weights: both trained
    epochs' maps pooled (arXiv:2302.07683) still bracket the analytic Δf."""
    tfep_map, u_a, bias = biased_run
    result = estimate_from_logger(
        tfep_map.tfep_logger, epoch_idx=[0, 1],
        reference_potentials=u_a, bias_potentials=bias,
        n_resamples=500, seed=1)
    assert (result['confidence_interval']['low'] - 0.15 <= ANALYTIC_DF
            <= result['confidence_interval']['high'] + 0.15)
    assert result['n_samples'] == 2 * N_FRAMES
