"""Unit tests for the TFEP loss (``tfep_tpu.loss``).

Mirrors the reference's ``tfep/tests/test_loss.py`` (the ``log_weights ×
ignore_nan`` NaN-propagation matrix, /root/reference/tfep/tests/test_loss.py:29)
and adds correctness tests the reference lacks: the softmax-weighted mean
against a manual computation, the ``ref_potentials`` shift contract, the
gradient signs, and a statistical check that softmax(log-weights) reweighting
recovers unbiased-ensemble expectations from biased samples (the core math of
metadynamics-reweighted TFEP, /root/reference/tfep/loss.py:51-57).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfep_tpu.loss import BoltzmannKLDivLoss, boltzmann_kl_div_loss


@pytest.mark.parametrize('ignore_nan', [False, True])
@pytest.mark.parametrize('use_log_weights', [False, True])
def test_ignore_nan(ignore_nan, use_log_weights):
    """NaN work values poison the loss unless ignore_nan=True.

    Mirrors /root/reference/tfep/tests/test_loss.py:29-57 (one random NaN
    planted across all input tensors).
    """
    batch_size = 5
    n_tensors = 4 if use_log_weights else 3
    rng = np.random.default_rng(42)
    inputs = rng.normal(size=batch_size * n_tensors)

    nan_idx = rng.integers(0, len(inputs))
    inputs[nan_idx] = np.nan

    target_potentials = jnp.asarray(inputs[:batch_size])
    log_det_J = jnp.asarray(inputs[batch_size:2 * batch_size])
    ref_potentials = jnp.asarray(inputs[2 * batch_size:3 * batch_size])
    log_weights = (jnp.asarray(inputs[3 * batch_size:])
                   if use_log_weights else None)

    loss_func = BoltzmannKLDivLoss(ignore_nan=ignore_nan)
    loss = loss_func(target_potentials, log_det_J, log_weights,
                     ref_potentials)

    if ignore_nan:
        assert not jnp.isnan(loss)
    else:
        assert jnp.isnan(loss)


def test_unweighted_is_mean_work():
    """Without log_weights the loss is the plain mean reduced work."""
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=8))
    ldj = jnp.asarray(rng.normal(size=8))
    ua = jnp.asarray(rng.normal(size=8))

    loss = boltzmann_kl_div_loss(u, log_det_J=ldj, ref_potentials=ua)
    np.testing.assert_allclose(float(loss), float(jnp.mean(u - ldj - ua)),
                               rtol=1e-12)

    # log_det_J / ref_potentials omitted -> they drop out of the work.
    np.testing.assert_allclose(float(boltzmann_kl_div_loss(u)),
                               float(jnp.mean(u)), rtol=1e-12)


def test_weighted_mean_matches_manual_softmax():
    """With log_weights the loss is sum(softmax(lw) * work), not a mean."""
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=16))
    ldj = jnp.asarray(rng.normal(size=16))
    lw = jnp.asarray(rng.normal(size=16))

    loss = boltzmann_kl_div_loss(u, log_det_J=ldj, log_weights=lw)

    w = np.exp(np.asarray(lw))
    w = w / w.sum()
    expected = float(np.sum(w * np.asarray(u - ldj)))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-10)

    # Uniform log-weights (any constant) reduce to the unweighted mean.
    uniform = boltzmann_kl_div_loss(u, log_det_J=ldj,
                                    log_weights=jnp.full(16, 3.7))
    np.testing.assert_allclose(float(uniform),
                               float(jnp.mean(u - ldj)), rtol=1e-10)


def test_ref_potentials_shift_only():
    """ref_potentials shift the loss value by their (weighted) mean and do
    not change the gradient w.r.t. the map outputs
    (/root/reference/tfep/loss.py:111-117: 'does not affect the
    optimization')."""
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=10))
    ldj = jnp.asarray(rng.normal(size=10))
    ua = jnp.asarray(rng.normal(size=10))
    lw = jnp.asarray(rng.normal(size=10))

    for log_weights in (None, lw):
        base = boltzmann_kl_div_loss(u, log_det_J=ldj,
                                     log_weights=log_weights)
        shifted = boltzmann_kl_div_loss(u, log_det_J=ldj,
                                        log_weights=log_weights,
                                        ref_potentials=ua)
        if log_weights is None:
            shift = float(jnp.mean(ua))
        else:
            w = jax.nn.softmax(log_weights)
            shift = float(jnp.sum(w * ua))
        np.testing.assert_allclose(float(base - shifted), shift, rtol=1e-9,
                                   atol=1e-12)

        grad_fn = jax.grad(lambda args: boltzmann_kl_div_loss(
            args[0], log_det_J=args[1], log_weights=log_weights))
        grad_fn_ref = jax.grad(lambda args: boltzmann_kl_div_loss(
            args[0], log_det_J=args[1], log_weights=log_weights,
            ref_potentials=ua))
        g = grad_fn((u, ldj))
        g_ref = grad_fn_ref((u, ldj))
        for a, b in zip(jax.tree_util.tree_leaves(g),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-12)


def test_gradient_signs():
    """dloss/du_i = w_i > 0 and dloss/dldj_i = -w_i < 0 — higher target
    energy raises the loss, bigger Jacobian volume lowers it."""
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=6))
    ldj = jnp.asarray(rng.normal(size=6))
    lw = jnp.asarray(rng.normal(size=6))

    for log_weights in (None, lw):
        du, dldj = jax.grad(
            lambda a, b: boltzmann_kl_div_loss(a, log_det_J=b,
                                               log_weights=log_weights),
            argnums=(0, 1))(u, ldj)
        if log_weights is None:
            expected_w = np.full(6, 1.0 / 6.0)
        else:
            expected_w = np.asarray(jax.nn.softmax(lw))
        np.testing.assert_allclose(np.asarray(du), expected_w, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(dldj), -expected_w, rtol=1e-9)


def test_reweighting_recovers_unbiased_expectation():
    """softmax(V/kT) weights on samples from exp(-(u_A+V)/kT) recover
    ensemble-A expectations — the sign convention of metadynamics
    reweighting (a sign error here would flip the weighting toward the
    bias instead of away from it and fail this test badly).

    Construction (kT=1): u_A = x^2/2 (so A = N(0,1)); bias V = -x^2/4, so
    the biased ensemble ∝ exp(-x^2/4) = N(0, sqrt(2)). The weighted mean
    of x^2 must recover E_A[x^2] = 1, not E_biased[x^2] = 2.
    """
    rng = np.random.default_rng(4)
    x = rng.normal(0.0, np.sqrt(2.0), size=200_000)
    bias = -0.25 * x**2                    # V(x_i), the log-weights at kT=1

    observable = jnp.asarray(x**2)
    weighted = boltzmann_kl_div_loss(observable,
                                     log_weights=jnp.asarray(bias))
    unweighted = boltzmann_kl_div_loss(observable)

    assert abs(float(weighted) - 1.0) < 0.03       # E_A[x^2] = 1
    assert abs(float(unweighted) - 2.0) < 0.06     # E_biased[x^2] = 2


def test_nan_in_log_weights_with_ignore_nan():
    """A NaN log-weight NaNs that sample's contribution; nansum drops it
    (same contract as the reference: softmax propagates the NaN into the
    product and nansum ignores it)."""
    u = jnp.asarray([1.0, 2.0, 3.0])
    lw = jnp.asarray([0.0, jnp.nan, 0.0])
    loss = boltzmann_kl_div_loss(u, log_weights=lw, ignore_nan=True)
    assert not jnp.isnan(loss)
    loss_nan = boltzmann_kl_div_loss(u, log_weights=lw, ignore_nan=False)
    assert jnp.isnan(loss_nan)
