"""End-to-end TFEP with the continuous-flow map (ContinuousEGNNMap).

Toy system with a known analytic answer that respects the EGNN's
symmetries: N atoms under a *relative* harmonic potential (quadratic in
the deviations from the centroid, so it is translation-invariant — the
EGNN velocity field preserves the centroid, cf.
tfep_tpu/nn/dynamics/egnn.py):

    u(x) = sum_i |x_i - mean(x)|^2 / (2 sigma^2)

The quadratic form has 3(N-1) nonzero modes, so switching sigma_A -> sigma_B
gives the reduced free-energy difference

    df = -3 (N - 1) log(sigma_B / sigma_A)    (in kT units).

Sampling x_i ~ N(0, sigma_A^2) iid makes the relative coordinates exactly
Boltzmann under u_A. A CNF with EGNN dynamics is trained with per-batch
Hutchinson probes; the final work values are then re-evaluated with the
exact trace (the FEP exponential average is biased by trace noise), and the
bootstrap CI must bracket the analytic df.
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

from tfep_tpu.analysis import bootstrap, fep_estimator
from tfep_tpu.app import ContinuousEGNNMap, Trainer
from tfep_tpu.io.topology import Topology
from tfep_tpu.io.traj import System
from tfep_tpu.units import ureg

rng = np.random.default_rng(3)
N_FRAMES, N_ATOMS = 2048, 4
BATCH_SIZE, MAX_EPOCHS = 256, 30
STEPS_PER_EPOCH = N_FRAMES // BATCH_SIZE
SIGMA_A, SIGMA_B = 1.0, 0.75
DF_ANALYTIC = -3 * (N_ATOMS - 1) * np.log(SIGMA_B / SIGMA_A)


def relative_potential(x_flat, sigma):
    """u(x) = sum_i |x_i - centroid|^2 / (2 sigma^2), translation-invariant."""
    pos = x_flat.reshape(*x_flat.shape[:-1], N_ATOMS, 3)
    rel = pos - pos.mean(axis=-2, keepdims=True)
    return (rel ** 2).sum(axis=(-1, -2)) / (2 * sigma ** 2)


class RelativeGaussianPotential:
    """Target potential B in kT units (energy_unit None => kT = 1)."""
    energy_unit = None

    def __call__(self, x, cell=None):
        return relative_potential(x, SIGMA_B)


positions = rng.normal(0.0, SIGMA_A, size=(N_FRAMES, N_ATOMS, 3))
system = System(Topology(names=['C'] * N_ATOMS), positions)

logdir = '/tmp/cnf_tfep_logs'
shutil.rmtree(logdir, ignore_errors=True)

tfep_map = ContinuousEGNNMap(
    potential_energy_func=RelativeGaussianPotential(),
    temperature=300.0 * ureg.kelvin,
    system=system,
    batch_size=BATCH_SIZE,
    tfep_logger_dir_path=logdir,
    r_cutoff=50.0,                      # fully connected at these sizes
    n_egnn_layers=2, node_feat_dim=16, distance_feat_dim=8, time_feat_dim=4,
    solver='rk4', n_steps=6,
    trace_estimator='hutchinson',       # per-batch probes during training
)

# Stability + reproducibility (the round-4/5 example-gate flake, root
# cause): with an unset shuffle_seed the sampler draws each epoch's
# order from OS entropy, so every run trains on a different batch
# sequence — and at 2e-3 unclipped some sequences terminally diverged
# (observed final loss 15.4). Gradient clipping plus a cosine-decayed
# rate makes training converge for *every* ordering probed (shuffled and
# sequential; work variance 2.64 -> ~1.4-1.5 in all cases), and the
# pinned shuffle_seed makes this run reproducible outright. No assert on
# the loss trajectory: the per-batch loss is heavy-tailed (epoch means
# fluctuate by >1 kT at converged, frozen parameters because a few
# far-tail frames dominate a 256-frame batch), so the binding quality
# gates are the end-state Δf CI and variance-reduction asserts below.
n_steps_total = MAX_EPOCHS * STEPS_PER_EPOCH
trainer = Trainer(save_dir=None, max_epochs=MAX_EPOCHS, shuffle=True,
                  shuffle_seed=7,
                  optimizer=optax.chain(
                      optax.clip_by_global_norm(1.0),
                      optax.adamw(optax.cosine_decay_schedule(
                          2e-3, decay_steps=n_steps_total))))
trainer.fit(tfep_map)
losses = np.asarray(trainer.loss_history)
print('trained steps:', trainer.global_step,
      f'epoch-mean loss {losses[:STEPS_PER_EPOCH].mean():.3f} -> '
      f'{losses[-STEPS_PER_EPOCH:].mean():.3f}')

# --- Work values with the exact trace (Hutchinson noise would bias the
# --- FEP exponential average), through the trained flow. -----------------
flow_exact = tfep_map.flow.replace(trace_estimator='exact')
x_all = jnp.asarray(positions.reshape(N_FRAMES, -1))
y_chunks, ldj_chunks = [], []
eval_fwd = jax.jit(lambda x: flow_exact.forward(x)[:2])
for start in range(0, N_FRAMES, 512):
    y, ldj = eval_fwd(x_all[start:start + 512])
    y_chunks.append(y)
    ldj_chunks.append(ldj)
y_all = jnp.concatenate(y_chunks)
ldj_all = jnp.concatenate(ldj_chunks)

# The EGNN field preserves the centroid: verify, then assemble the work.
com_drift = np.abs(np.asarray(
    y_all.reshape(N_FRAMES, N_ATOMS, 3).mean(axis=1)
    - positions.mean(axis=1))).max()
assert com_drift < 1e-8, f'centroid moved by {com_drift}'

u_b = relative_potential(y_all, SIGMA_B)
u_a = relative_potential(x_all, SIGMA_A)
work = np.asarray(u_b - u_a - ldj_all)

df_tfep = float(fep_estimator(jnp.asarray(work)))
boot = bootstrap(jnp.asarray(work),
                 lambda d, vectorized=False, weights=None:
                     fep_estimator(d, weights=weights, vectorized=vectorized),
                 n_resamples=500, seed=1)
lo = float(boot['confidence_interval']['low'])
hi = float(boot['confidence_interval']['high'])

df_fep = float(fep_estimator(jnp.asarray(
    relative_potential(x_all, SIGMA_B) - u_a)))

print(f'analytic df  = {DF_ANALYTIC:.4f} kT')
print(f'CNF TFEP df  = {df_tfep:.4f} kT   CI=[{lo:.4f}, {hi:.4f}]')
print(f'standard FEP = {df_fep:.4f} kT (identity map)')

assert lo - 0.2 <= DF_ANALYTIC <= hi + 0.2, \
    f'CNF TFEP estimate {df_tfep} (CI [{lo},{hi}]) misses {DF_ANALYTIC}'
# The trained map must reduce the work variance vs the identity map.
var_identity = float(np.var(np.asarray(
    relative_potential(x_all, SIGMA_B) - u_a)))
var_mapped = float(np.var(work))
print(f'work variance: identity {var_identity:.3f} -> mapped {var_mapped:.3f}')
assert var_mapped < var_identity

print('CNF TFEP OK')
