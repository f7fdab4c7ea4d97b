"""Fused Pallas spline kernel vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tfep_tpu.ops.pallas.spline as fs
from tfep_tpu.nn.transformers import NeuralSplineTransformer


@pytest.fixture(autouse=True)
def interpret_mode():
    fs.INTERPRET = True
    yield
    fs.INTERPRET = False


B, F, K = 16, 8, 5


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-4, 4, (B, F)))  # incl. out-of-domain
    params = jnp.asarray(0.5 * rng.normal(size=(B, (3 * K + 1) * F)))
    x0 = -3.0 * jnp.ones(F)
    xf = 3.0 * jnp.ones(F)
    return x, params, x0, xf


def test_forward_matches_reference():
    x, params, x0, xf = make_inputs()
    y, dl = fs.fused_spline(x, params, x0, xf, x0, xf, K, 1e-4, 1e-4, 16)
    y_ref, ldj_ref = fs.fused_spline_reference(x, params, x0, xf, x0, xf, K)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-10)
    np.testing.assert_allclose(np.asarray(dl.sum(-1)), np.asarray(ldj_ref),
                               atol=1e-10)


@pytest.mark.parametrize('which', ['y', 'ldj'])
def test_backward_matches_autodiff(which):
    x, params, x0, xf = make_inputs(1)

    def loss_fused(x, p):
        y, dl = fs.fused_spline(x, p, x0, xf, x0, xf, K, 1e-4, 1e-4, 16)
        return jnp.sum(jnp.sin(y)) if which == 'y' else jnp.sum(dl)

    def loss_ref(x, p):
        y, ldj = fs.fused_spline_reference(x, p, x0, xf, x0, xf, K)
        return jnp.sum(jnp.sin(y)) if which == 'y' else jnp.sum(ldj)

    gfx, gfp = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    grx, grp = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gfx), np.asarray(grx), atol=1e-9)
    np.testing.assert_allclose(np.asarray(gfp), np.asarray(grp), atol=1e-9)


def test_masked_lane_finiteness_adversarial_params():
    """Regression: the kernels evaluate EVERY bin for every element and
    mask afterwards, so an out-of-bin element whose (unclamped) relative
    position drives the rational-quadratic denominator through zero used
    to produce inf, and mask*inf = NaN in the backward — observed as a
    sudden training NaN after ~43 steps on TPU (the inf needs a near-exact
    float cancellation of D = sb + c*emo, a statistical event over ~1e10
    element-bin evaluations; empirically pinned by a 120-step fused-vs-XLA
    lockstep on hardware). This test covers the deterministic part of the
    regime — D strongly negative out-of-bin (x in bin 0, a later bin with
    near-floor height so sb ~ 1e-4 and huge slopes so c >> 0) — and
    asserts values and gradients stay finite and equal to the XLA
    reference with the clamp in place."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-2.95, -2.2, (B, F)))   # inside bin 0
    params = np.zeros((B, (3 * K + 1) * F))
    params[:, 2 * K * F:] = 9.0       # all slopes huge
    params[:, (K + 3) * F:(K + 4) * F] = -30.0   # bin-3 height at floor
    params += 0.1 * rng.normal(size=params.shape)
    params = jnp.asarray(params)
    x0 = -3.0 * jnp.ones(F)
    xf = 3.0 * jnp.ones(F)

    y, dl = fs.fused_spline(x, params, x0, xf, x0, xf, K, 1e-4, 1e-4, 16)
    assert np.isfinite(np.asarray(y)).all()
    assert np.isfinite(np.asarray(dl)).all()

    def loss(x, p, use_fused):
        fn = fs.fused_spline_reference if not use_fused else (
            lambda *a: fs.fused_spline(*a, 1e-4, 1e-4, 16))
        y, dl = fn(x, p, x0, xf, x0, xf, K)
        return jnp.sum(jnp.sin(y)) + jnp.sum(dl)

    gfx, gfp = jax.grad(lambda a, b: loss(a, b, True), argnums=(0, 1))(
        x, params)
    assert np.isfinite(np.asarray(gfx)).all()
    assert np.isfinite(np.asarray(gfp)).all()
    grx, grp = jax.grad(lambda a, b: loss(a, b, False), argnums=(0, 1))(
        x, params)
    np.testing.assert_allclose(np.asarray(gfx), np.asarray(grx), atol=1e-8)
    np.testing.assert_allclose(np.asarray(gfp), np.asarray(grp), atol=1e-8)


def test_transformer_dispatch():
    x, params, x0, xf = make_inputs(2)
    t_fused = NeuralSplineTransformer.create(x0, xf, n_bins=K,
                                             fused='always')
    t_ref = NeuralSplineTransformer.create(x0, xf, n_bins=K, fused='never')
    assert t_fused._fused_applicable
    assert not t_ref._fused_applicable
    y_f, l_f = t_fused.forward(x, params)
    y_r, l_r = t_ref.forward(x, params)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r), atol=1e-10)
    np.testing.assert_allclose(np.asarray(l_f), np.asarray(l_r), atol=1e-10)

    # Unsupported configurations never dispatch to the kernel.
    t_circ = NeuralSplineTransformer.create(
        jnp.zeros(F), jnp.ones(F), n_bins=K, circular=True, fused='always')
    assert not t_circ._fused_applicable
