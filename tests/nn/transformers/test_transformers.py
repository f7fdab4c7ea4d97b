"""Property tests for all transformers: round trip + Jacobian vs oracle.

Mirrors the reference transformer test strategy
(tests/nn/transformers/test_spline.py etc.): analytic log-det must equal the
jacfwd+slogdet oracle; forward∘inverse must be the identity with cancelling
log-dets; identity parameters must produce the identity map.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfep_tpu.nn.transformers import (
    AffineTransformer, MixedTransformer, MoebiusTransformer,
    NeuralSplineTransformer, QuaternionProductTransformer,
    SOSPolynomialTransformer, SymmetrizedMoebiusTransformer,
    VolumePreservingShiftTransformer,
)
from tfep_tpu.utils.math import batch_log_abs_det_J

BATCH = 5
N_FEATURES = 6


def oracle_check(transformer, x, parameters, atol=1e-6):
    y, ldj = transformer.forward(x, parameters)

    def single(xi, pi):
        return transformer.forward(xi[None], pi[None])[0][0]

    jac = jax.vmap(jax.jacfwd(single))(x, parameters)
    oracle = jnp.linalg.slogdet(jac)[1]
    np.testing.assert_allclose(np.asarray(ldj), np.asarray(oracle), atol=atol)
    return y, ldj


def roundtrip_check(transformer, x, parameters, atol=1e-8):
    y, ldj = transformer.forward(x, parameters)
    x_back, ldj_inv = transformer.inverse(y, parameters)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=atol)
    np.testing.assert_allclose(np.asarray(ldj + ldj_inv), 0.0, atol=atol)


def identity_check(transformer, x, atol=1e-6):
    id_params = jnp.broadcast_to(
        jnp.asarray(transformer.get_identity_parameters(x.shape[1])),
        (x.shape[0], len(transformer.get_identity_parameters(x.shape[1]))))
    y, ldj = transformer.forward(x, id_params)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=atol)
    np.testing.assert_allclose(np.asarray(ldj), 0.0, atol=atol)


# =============================================================================
# Affine / shift
# =============================================================================

def test_affine_transformer():
    t = AffineTransformer()
    x = jax.random.normal(jax.random.key(0), (BATCH, N_FEATURES))
    params = 0.5 * jax.random.normal(jax.random.key(1),
                                     (BATCH, 2 * N_FEATURES))
    oracle_check(t, x, params)
    roundtrip_check(t, x, params)
    identity_check(t, x)


def test_volume_preserving_shift():
    t = VolumePreservingShiftTransformer(
        periodic_indices=jnp.asarray([1, 3]),
        periodic_limits=jnp.asarray([-1.0, 1.0]))
    x = jax.random.uniform(jax.random.key(0), (BATCH, N_FEATURES),
                           minval=-1, maxval=1)
    params = 0.3 * jax.random.normal(jax.random.key(1), (BATCH, N_FEATURES))
    y, ldj = t.forward(x, params)
    assert np.all(np.asarray(y[:, [1, 3]]) >= -1)
    assert np.all(np.asarray(y[:, [1, 3]]) < 1)
    np.testing.assert_allclose(np.asarray(ldj), 0.0)
    x_back, _ = t.inverse(y, params)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-8)


# =============================================================================
# Neural spline
# =============================================================================

@pytest.mark.parametrize('identity_boundary_slopes', [False, True])
@pytest.mark.parametrize('learn_bounds', [(False, False), (False, True),
                                          (True, True)])
def test_neural_spline(identity_boundary_slopes, learn_bounds):
    learn_lower, learn_upper = learn_bounds
    x0 = -2.0 * jnp.ones(N_FEATURES)
    xf = 2.0 * jnp.ones(N_FEATURES)
    t = NeuralSplineTransformer.create(
        x0, xf, n_bins=5,
        identity_boundary_slopes=identity_boundary_slopes,
        learn_lower_bound=learn_lower, learn_upper_bound=learn_upper)

    n_params = t.n_parameters_per_feature * N_FEATURES
    x = jax.random.uniform(jax.random.key(0), (BATCH, N_FEATURES),
                           minval=-3.0, maxval=3.0)  # incl. out-of-domain
    params = 0.5 * jax.random.normal(jax.random.key(1), (BATCH, n_params))
    oracle_check(t, x, params)
    roundtrip_check(t, x, params, atol=1e-7)
    identity_check(t, x, atol=1e-6)


def test_neural_spline_different_output_domain():
    """y0/yf != x0/xf: the spline maps [x0, xf] onto [y0, yf]."""
    x0 = -1.0 * jnp.ones(N_FEATURES)
    xf = 1.0 * jnp.ones(N_FEATURES)
    y0 = 2.0 * jnp.ones(N_FEATURES)
    yf = 6.0 * jnp.ones(N_FEATURES)
    t = NeuralSplineTransformer.create(x0, xf, n_bins=4, y0=y0, yf=yf)

    n_params = t.n_parameters_per_feature * N_FEATURES
    x = jax.random.uniform(jax.random.key(2), (BATCH, N_FEATURES),
                           minval=-1.0, maxval=1.0)
    params = 0.4 * jax.random.normal(jax.random.key(3), (BATCH, n_params))
    y, ldj = oracle_check(t, x, params)
    assert np.all(np.asarray(y) >= 2.0 - 1e-9)
    assert np.all(np.asarray(y) <= 6.0 + 1e-9)
    roundtrip_check(t, x, params, atol=1e-7)
    # Domain edges map to codomain edges.
    y_edges, _ = t.forward(jnp.stack([x0, xf]), params[:2])
    np.testing.assert_allclose(np.asarray(y_edges[0]), 2.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(y_edges[1]), 6.0, atol=1e-9)


def test_neural_spline_floors_keep_monotonicity():
    """Extreme conditioner outputs hit the min bin/slope floors and the
    spline stays strictly monotonic and invertible."""
    x0 = -2.0 * jnp.ones(N_FEATURES)
    xf = 2.0 * jnp.ones(N_FEATURES)
    t = NeuralSplineTransformer.create(x0, xf, n_bins=5,
                                       min_bin_size=1e-3, min_slope=1e-3)
    n_params = t.n_parameters_per_feature * N_FEATURES
    # Saturating parameters: widths/heights collapse to the floors.
    params = 40.0 * jax.random.normal(jax.random.key(4), (BATCH, n_params))
    x = jnp.linspace(-1.9, 1.9, BATCH * N_FEATURES).reshape(
        BATCH, N_FEATURES)
    y, ldj = t.forward(x, params)
    assert np.all(np.isfinite(np.asarray(y)))
    assert np.all(np.isfinite(np.asarray(ldj)))
    # Strict monotonicity per feature along increasing inputs.
    same_params = jnp.broadcast_to(params[0], params.shape)
    y_mono, _ = t.forward(x, same_params)
    assert np.all(np.diff(np.asarray(y_mono), axis=0) > 0)
    roundtrip_check(t, x, params, atol=1e-6)


def test_neural_spline_option_validation():
    ones = jnp.ones(N_FEATURES)
    with pytest.raises(ValueError, match='circular'):
        NeuralSplineTransformer.create(-ones, ones, n_bins=4, circular=True,
                                       learn_lower_bound=True)
    with pytest.raises(ValueError, match='periodic'):
        NeuralSplineTransformer.create(-ones, ones, n_bins=4, circular=True,
                                       y0=2 * ones, yf=3 * ones)
    with pytest.raises(ValueError):
        NeuralSplineTransformer.create(-ones, ones, n_bins=4,
                                       min_bin_size=0.0)
    with pytest.raises(ValueError):
        NeuralSplineTransformer.create(-ones, ones, n_bins=4, min_slope=1.5)


def test_neural_spline_circular():
    period = 2 * np.pi
    x0 = jnp.zeros(N_FEATURES)
    xf = period * jnp.ones(N_FEATURES)
    t = NeuralSplineTransformer.create(x0, xf, n_bins=5, circular=True)

    n_params = t.n_parameters_per_feature * N_FEATURES
    assert t.n_parameters_per_feature == 3 * 5 + 1
    x = jax.random.uniform(jax.random.key(0), (BATCH, N_FEATURES),
                           minval=0.0, maxval=period)
    params = 0.5 * jax.random.normal(jax.random.key(1), (BATCH, n_params))
    y, ldj = t.forward(x, params)
    # Output stays in the periodic domain.
    assert np.all(np.asarray(y) >= 0.0) and np.all(np.asarray(y) <= period)
    oracle_check(t, x, params)
    roundtrip_check(t, x, params, atol=1e-7)
    identity_check(t, x)

    # Periodicity: x and x + period map to the same output.
    y2, _ = t.forward(x + period, params)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-7)


# =============================================================================
# SOS polynomial
# =============================================================================

def test_sos_polynomial():
    t = SOSPolynomialTransformer.create(n_polynomials=3)
    x = jax.random.normal(jax.random.key(0), (BATCH, N_FEATURES))
    n_params = t.n_parameters_per_feature * N_FEATURES
    params = 0.5 * jax.random.normal(jax.random.key(1), (BATCH, n_params))
    y, ldj = oracle_check(t, x, params)
    assert np.all(np.isfinite(np.asarray(y)))
    identity_check(t, x)


# =============================================================================
# Moebius
# =============================================================================

def test_moebius_transformer():
    dim = 3
    t = MoebiusTransformer(dimension=dim)
    x = jax.random.normal(jax.random.key(0), (BATCH, 2 * dim))
    params = 0.5 * jax.random.normal(jax.random.key(1), (BATCH, 2 * dim))
    y, ldj = t.forward(x, params)
    # Norm-preserving on each vector.
    xv = np.asarray(x).reshape(BATCH, 2, dim)
    yv = np.asarray(y).reshape(BATCH, 2, dim)
    np.testing.assert_allclose(np.linalg.norm(yv, axis=-1),
                               np.linalg.norm(xv, axis=-1), atol=1e-6)
    roundtrip_check(t, x, params, atol=1e-6)
    identity_check(t, x)


def test_symmetrized_moebius_transformer():
    dim = 3
    t = SymmetrizedMoebiusTransformer(dimension=dim)
    x = jax.random.normal(jax.random.key(0), (BATCH, 2 * dim))
    params = 0.5 * jax.random.normal(jax.random.key(1), (BATCH, 2 * dim))
    y, ldj = t.forward(x, params)
    xv = np.asarray(x).reshape(BATCH, 2, dim)
    yv = np.asarray(y).reshape(BATCH, 2, dim)
    np.testing.assert_allclose(np.linalg.norm(yv, axis=-1),
                               np.linalg.norm(xv, axis=-1), atol=1e-6)
    roundtrip_check(t, x, params, atol=1e-6)

    # Identity parameters are near-zero -> near-identity map.
    id_params = jnp.broadcast_to(
        jnp.asarray(t.get_identity_parameters(2 * dim)), (BATCH, 2 * dim))
    y_id, _ = t.forward(x, id_params)
    np.testing.assert_allclose(np.asarray(y_id), np.asarray(x), atol=1e-6)


# =============================================================================
# Quaternion product
# =============================================================================

def test_quaternion_product_transformer():
    t = QuaternionProductTransformer()
    q = jax.random.normal(jax.random.key(0), (BATCH, 8))
    q = q.reshape(BATCH, 2, 4)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    q = q.reshape(BATCH, 8)
    params = jax.random.normal(jax.random.key(1), (BATCH, 8))
    y, ldj = t.forward(q, params)
    np.testing.assert_allclose(np.asarray(ldj), 0.0)
    # Output quaternions stay normalized.
    yq = np.asarray(y).reshape(BATCH, 2, 4)
    np.testing.assert_allclose(np.linalg.norm(yq, axis=-1), 1.0, atol=1e-6)
    roundtrip_check(t, q, params, atol=1e-7)
    identity_check(t, q)


# =============================================================================
# Mixed
# =============================================================================

def test_mixed_transformer():
    t = MixedTransformer.create(
        [AffineTransformer(),
         VolumePreservingShiftTransformer(periodic_indices=None,
                                          periodic_limits=None)],
        indices=[[0, 2, 4], [1, 3, 5]])
    x = jax.random.normal(jax.random.key(0), (BATCH, N_FEATURES))
    n_params = 2 * 3 + 1 * 3
    params = 0.5 * jax.random.normal(jax.random.key(1), (BATCH, n_params))
    oracle_check(t, x, params)
    roundtrip_check(t, x, params)
    identity_check(t, x)

    # Degree lifting composes per-transformer.
    degrees = np.array([0, 1, 2, 3, 4, 5])
    expected = np.concatenate([np.tile([0, 2, 4], 2), [1, 3, 5]])
    np.testing.assert_array_equal(t.get_degrees_out(degrees), expected)
