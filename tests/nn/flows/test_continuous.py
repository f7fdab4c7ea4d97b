"""Continuous-flow tests: integrator accuracy, trace vs oracle, EGNN equivariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfep_tpu.nn.dynamics import EGNNDynamics
from tfep_tpu.nn.flows import ContinuousFlow
from tfep_tpu.nn.masked import MaskedLinear
from tfep_tpu.nn.module import Module
from tfep_tpu.nn.ode import odeint
from tfep_tpu.utils.math import batch_log_abs_det_J

BATCH = 3
N_ATOMS = 4
DIM = N_ATOMS * 3


class LinearDynamics(Module):
    """f(t, x) = x @ A^T: analytic solution y = exp(A) x, ldj = tr(A)."""

    A: jnp.ndarray

    def __call__(self, t, x):
        return x @ self.A.T


def test_odeint_exponential():
    """dx/dt = -x integrates to x*exp(-1)."""
    for solver, tol in [('euler', 2e-2), ('midpoint', 1e-3), ('rk4', 1e-7),
                        ('dopri5', 1e-9)]:
        out = odeint(lambda t, s: -s, jnp.ones(4), 0.0, 1.0, n_steps=32,
                     solver=solver)
        np.testing.assert_allclose(np.asarray(out), np.exp(-1.0), rtol=tol,
                                   err_msg=solver)


@pytest.mark.parametrize('trace_estimator', ['exact', 'hutchinson'])
def test_continuous_flow_linear_dynamics(trace_estimator):
    rng = np.random.default_rng(0)
    A = jnp.asarray(0.3 * rng.normal(size=(DIM, DIM)))
    flow = ContinuousFlow.create(
        LinearDynamics(A=A), trace_estimator=trace_estimator,
        solver='dopri5', n_steps=16, n_hutchinson_samples=256,
        regularization=False)

    x = jnp.asarray(rng.normal(size=(BATCH, DIM)))
    y, ldj = flow.forward(x)

    # Analytic: y = x expm(A)^T, ldj = tr(A).
    from scipy.linalg import expm
    y_exact = np.asarray(x) @ expm(np.asarray(A)).T
    np.testing.assert_allclose(np.asarray(y), y_exact, rtol=1e-5, atol=1e-6)

    trace_exact = np.trace(np.asarray(A))
    tol = 1e-6 if trace_estimator == 'exact' else 1.0
    np.testing.assert_allclose(np.asarray(ldj), trace_exact, atol=tol)

    # Round trip (exact estimator only; hutchinson noise cancels in x).
    x_back, ldj_inv = flow.inverse(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), rtol=1e-5,
                               atol=1e-6)
    if trace_estimator == 'exact':
        np.testing.assert_allclose(np.asarray(ldj + ldj_inv), 0.0, atol=1e-6)


def test_continuous_flow_jacobian_oracle():
    """Exact-trace CNF log-det matches the brute-force oracle."""
    rng = np.random.default_rng(1)
    A = jnp.asarray(0.2 * rng.normal(size=(5, 5)))
    flow = ContinuousFlow.create(LinearDynamics(A=A),
                                 trace_estimator='exact', solver='rk4',
                                 n_steps=20, regularization=False)
    x = jnp.asarray(rng.normal(size=(BATCH, 5)))
    y, ldj = flow.forward(x)
    oracle = batch_log_abs_det_J(lambda z: flow.forward(z)[0], x)
    np.testing.assert_allclose(np.asarray(ldj), np.asarray(oracle),
                               atol=1e-5)


def make_egnn(key=0, identity=False):
    return EGNNDynamics.create(
        jax.random.key(key), node_types=[0, 0, 1, 1], r_cutoff=6.0,
        time_feat_dim=4, node_feat_dim=8, distance_feat_dim=4, n_layers=2,
        initialize_identity=identity)


def test_egnn_identity_init():
    dynamics = make_egnn(identity=True)
    x = jax.random.normal(jax.random.key(1), (BATCH, DIM))
    vel = dynamics(0.5, x)
    np.testing.assert_allclose(np.asarray(vel), 0.0, atol=1e-10)


def test_egnn_equivariance():
    """Rotating the input rotates the velocities; translations leave them."""
    from tfep_tpu.utils.geometry import rotation_matrix_3d

    dynamics = make_egnn()
    # Perturb update_x weights away from identity init.
    from tests.nn.flows.test_maf import randomize
    dynamics = randomize(dynamics, jax.random.key(2), scale=0.1)

    x = jax.random.normal(jax.random.key(3), (BATCH, DIM), jnp.float64)
    vel = np.asarray(dynamics(0.3, x)).reshape(BATCH, N_ATOMS, 3)

    # Rotation equivariance.
    R = np.asarray(rotation_matrix_3d(jnp.asarray([0.7]),
                                      jnp.asarray([[0.3, -1.0, 0.5]])))[0]
    x_rot = (np.asarray(x).reshape(BATCH, N_ATOMS, 3) @ R.T).reshape(BATCH,
                                                                     DIM)
    vel_rot = np.asarray(dynamics(0.3, jnp.asarray(x_rot))).reshape(
        BATCH, N_ATOMS, 3)
    np.testing.assert_allclose(vel_rot, vel @ R.T, atol=1e-8)

    # Translation invariance.
    shift = np.tile([1.0, -2.0, 0.5], N_ATOMS)
    vel_shift = np.asarray(dynamics(0.3, x + shift)).reshape(
        BATCH, N_ATOMS, 3)
    np.testing.assert_allclose(vel_shift, vel, atol=1e-8)

    # Velocities preserve the center of geometry.
    np.testing.assert_allclose(vel.mean(axis=1), 0.0, atol=1e-10)


def test_cnf_with_egnn_trains():
    """CNF + EGNN: forward, regularization, gradient flow."""
    from tfep_tpu.nn.module import filter_value_and_grad

    dynamics = make_egnn(identity=True)
    flow = ContinuousFlow.create(dynamics, trace_estimator='hutchinson',
                                 solver='rk4', n_steps=4,
                                 n_hutchinson_samples=1, regularization=True)
    x = jax.random.normal(jax.random.key(0), (BATCH, DIM))
    y, ldj, reg = flow.forward(x)
    # Identity init: y == x, ldj == 0.
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-8)
    np.testing.assert_allclose(np.asarray(ldj), 0.0, atol=1e-8)

    def loss(f):
        y, ldj, reg = f.forward(x)
        return jnp.sum(y ** 2) - jnp.sum(ldj) + 0.01 * jnp.mean(reg)

    value, grads = filter_value_and_grad(loss)(flow)
    leaves = [l for l in jax.tree_util.tree_leaves(grads) if l is not None]
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # At least some parameter receives signal.
    assert any(np.any(np.asarray(l) != 0) for l in leaves)


def test_egnn_node_type_symmetry():
    """Same-type atoms are treated symmetrically: permuting two atoms of
    the same type permutes the velocity field accordingly (cf. the
    reference's node-embedding test, tests/nn/dynamics/test_egnn.py)."""
    import jax

    from tfep_tpu.nn.dynamics import EGNNDynamics

    # Atoms 0 and 2 share a type; atom 1 differs.
    dynamics = EGNNDynamics.create(
        jax.random.key(0), node_types=[0, 1, 0], r_cutoff=10.0,
        node_feat_dim=8, distance_feat_dim=8, n_layers=2,
        initialize_identity=False)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 9)))
    t = jnp.asarray(0.3)
    v = np.asarray(dynamics(t, x)).reshape(2, 3, 3)

    # Swap atoms 0 and 2 (same type): the field must swap with them.
    perm = np.array([2, 1, 0])
    x_swapped = jnp.asarray(
        np.asarray(x).reshape(2, 3, 3)[:, perm].reshape(2, 9))
    v_swapped = np.asarray(dynamics(t, x_swapped)).reshape(2, 3, 3)
    np.testing.assert_allclose(v_swapped, v[:, perm], atol=1e-10)

    # One-hot encoding: one column per type, one 1 per row.
    one_hot = np.asarray(dynamics.node_types_one_hot)
    assert one_hot.shape == (3, 2)
    np.testing.assert_array_equal(one_hot.sum(axis=1), 1.0)
    np.testing.assert_array_equal(one_hot[0], one_hot[2])
    assert not np.array_equal(one_hot[0], one_hot[1])


def test_pallas_guard_sees_through_dynamics_wrappers():
    """A Pallas-backed EGNN wrapped in an adapter (velocity masking) must
    still be rejected for trace configurations that would vmap the kernel."""
    from tfep_tpu.nn.dynamics import MaskedVelocityDynamics

    dynamics = EGNNDynamics.create(
        jax.random.key(0), node_types=[0, 0, 1], r_cutoff=5.0,
        time_feat_dim=4, node_feat_dim=8, distance_feat_dim=4, n_layers=1,
        pairwise='pallas')
    wrapped = MaskedVelocityDynamics.create(dynamics, [0, 1, 2], dim=9)
    with pytest.raises(ValueError, match="pairwise='pallas'"):
        ContinuousFlow.create(wrapped, trace_estimator='exact')
    with pytest.raises(ValueError, match="pairwise='pallas'"):
        ContinuousFlow.create(wrapped, n_hutchinson_samples=2)
    # The supported configuration still constructs.
    ContinuousFlow.create(wrapped, trace_estimator='hutchinson')
