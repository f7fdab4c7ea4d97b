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


def test_neural_spline_remat_equivalence():
    """remat=True recomputes intermediates but values and gradients match
    the default path exactly."""
    x0 = -2.0 * jnp.ones(N_FEATURES)
    xf = 2.0 * jnp.ones(N_FEATURES)
    plain = NeuralSplineTransformer.create(x0, xf, n_bins=4)
    remat = NeuralSplineTransformer.create(x0, xf, n_bins=4, remat=True)
    n_params = plain.n_parameters_per_feature * N_FEATURES
    x = jax.random.uniform(jax.random.key(5), (BATCH, N_FEATURES),
                           minval=-2.5, maxval=2.5)
    params = 0.5 * jax.random.normal(jax.random.key(6), (BATCH, n_params))

    def loss(t, p):
        y, ldj = t.forward(x, p)
        return jnp.sum(y ** 2) + jnp.sum(ldj)

    v_plain, g_plain = jax.value_and_grad(lambda p: loss(plain, p))(params)
    v_remat, g_remat = jax.value_and_grad(lambda p: loss(remat, p))(params)
    np.testing.assert_allclose(np.asarray(v_plain), np.asarray(v_remat),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g_plain), np.asarray(g_remat),
                               rtol=1e-10, atol=1e-12)


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


# =============================================================================
# Reference-value and equivariance tests (cf. the reference's
# test_sos/test_moebius/test_quatprod/test_mixed behavior coverage)
# =============================================================================

def test_sos_polynomial_reference_values():
    """The SOS output matches an independent numpy evaluation of the
    integrated polynomial y = a0 + c1 x + c2 x^2 + c3 x^3."""
    t = SOSPolynomialTransformer.create(n_polynomials=2)
    rng = np.random.default_rng(4)
    x = rng.normal(size=(3, 2))
    p = rng.normal(size=(3, t.n_parameters_per_feature, 2))

    # Independent evaluation: y(x) = a0 + int_0^x sum_k (a_k0 + a_k1 z)^2 dz.
    a0, a10, a11, a20, a21 = p[:, 0], p[:, 1], p[:, 2], p[:, 3], p[:, 4]
    c1 = a10 ** 2 + a20 ** 2
    c2 = a10 * a11 + a20 * a21           # *2 / 2 from the integral
    c3 = (a11 ** 2 + a21 ** 2) / 3.0
    y_want = a0 + c1 * x + c2 * x ** 2 + c3 * x ** 3
    dydx = c1 + 2 * c2 * x + 3 * c3 * x ** 2
    ldj_want = np.sum(np.log(np.abs(dydx)), axis=1)

    y, ldj = t.forward(jnp.asarray(x), jnp.asarray(p.reshape(3, -1)))
    np.testing.assert_allclose(np.asarray(y), y_want, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ldj), ldj_want, atol=1e-10)


def test_sos_affine_equivalence():
    """With zero linear coefficients the SOS transformer reduces to an
    affine map y = shift + scale*x (scale = sum of squared constants)."""
    t = SOSPolynomialTransformer.create(n_polynomials=3)
    rng = np.random.default_rng(5)
    x = rng.normal(size=(4, 3))
    p = np.zeros((4, t.n_parameters_per_feature, 3))
    p[:, 0] = rng.normal(size=(4, 3))            # shift a0
    p[:, 1::2] = rng.normal(size=(4, 3, 3))      # constant terms a_k0

    scale = np.sum(p[:, 1::2] ** 2, axis=1)
    y, ldj = t.forward(jnp.asarray(x), jnp.asarray(p.reshape(4, -1)))
    np.testing.assert_allclose(np.asarray(y), p[:, 0] + scale * x, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ldj),
                               np.sum(np.log(scale), axis=1), atol=1e-10)


def test_symmetrized_moebius_flip_equivariance():
    """f(-x, w) = -f(x, w) for the symmetrized Moebius transformer."""
    dim = 3
    t = SymmetrizedMoebiusTransformer(dimension=dim)
    x = jax.random.normal(jax.random.key(2), (BATCH, 2 * dim))
    w = 0.4 * jax.random.normal(jax.random.key(3), (BATCH, 2 * dim))
    y, _ = t.forward(x, w)
    y_neg, _ = t.forward(-x, w)
    np.testing.assert_allclose(np.asarray(y), -np.asarray(y_neg), atol=1e-10)


def test_moebius_zero_w_is_identity_per_vector():
    """w = 0 for one vector leaves that vector unchanged even when other
    vectors transform (per-sphere independence)."""
    dim = 3
    t = MoebiusTransformer(dimension=dim)
    x = jax.random.normal(jax.random.key(4), (BATCH, 2 * dim))
    w = np.array(0.5 * jax.random.normal(jax.random.key(5), (BATCH, 2, dim)))
    w[:, 0] = 0.0
    y, _ = t.forward(x, jnp.asarray(w.reshape(BATCH, -1)))
    np.testing.assert_allclose(np.asarray(y).reshape(BATCH, 2, dim)[:, 0],
                               np.asarray(x).reshape(BATCH, 2, dim)[:, 0],
                               atol=1e-10)


def test_quaternion_product_flip_equivariance():
    """f(-q, w) = -f(q, w): both lifts of a rotation map consistently."""
    t = QuaternionProductTransformer()
    q = jax.random.normal(jax.random.key(6), (BATCH, 2, 4))
    q = (q / jnp.linalg.norm(q, axis=-1, keepdims=True)).reshape(BATCH, 8)
    w = jax.random.normal(jax.random.key(7), (BATCH, 8))
    y, _ = t.forward(q, w)
    y_neg, _ = t.forward(-q, w)
    np.testing.assert_allclose(np.asarray(y), -np.asarray(y_neg), atol=1e-12)


def test_mixed_transformer_get_degrees_out():
    t = MixedTransformer.create(
        [AffineTransformer(), VolumePreservingShiftTransformer(
            periodic_indices=None, periodic_limits=None)],
        indices=[[0, 2], [1, 3]])
    degrees_in = np.array([5, 6, 7, 8])
    degrees_out = t.get_degrees_out(degrees_in)
    # Affine: 2 params/feature for features {0, 2}; shift: 1 param/feature
    # for features {1, 3}; parameter blocks are per-transformer.
    assert len(degrees_out) == 2 * 2 + 2
    assert sorted(degrees_out.tolist()) == [5, 5, 6, 7, 7, 8]


def test_mixed_transformer_identity_parameters():
    t = MixedTransformer.create(
        [AffineTransformer(), VolumePreservingShiftTransformer(
            periodic_indices=None, periodic_limits=None)],
        indices=[[0, 2], [1, 3]])
    x = jax.random.normal(jax.random.key(8), (BATCH, 4))
    identity_check(t, x)


def test_mixed_transformer_errors():
    with pytest.raises(ValueError):
        MixedTransformer.create([AffineTransformer()], indices=[[0, 1]])
    with pytest.raises(ValueError):
        MixedTransformer.create(
            [AffineTransformer(), AffineTransformer()], indices=[[0, 1]])


def test_sos_polynomial_inverse_round_trip():
    """The analytic (Cardano + Newton) inverse recovers x to float64
    precision — beyond the reference, which raises NotImplementedError."""
    t = SOSPolynomialTransformer.create(n_polynomials=3)
    x = jax.random.normal(jax.random.key(20), (64, N_FEATURES))
    n_params = t.n_parameters_per_feature * N_FEATURES
    params = jax.random.normal(jax.random.key(21), (64, n_params))
    roundtrip_check(t, x, params, atol=1e-9)


def test_sos_polynomial_inverse_affine_branch():
    """All-zero linear coefficients degrade to an affine map; the inverse
    must take the linear branch without NaNs."""
    t = SOSPolynomialTransformer.create(n_polynomials=2)
    rng = np.random.default_rng(6)
    x = rng.normal(size=(8, 3))
    p = np.zeros((8, t.n_parameters_per_feature, 3))
    p[:, 0] = rng.normal(size=(8, 3))
    p[:, 1::2] = rng.normal(size=(8, 2, 3))
    params = jnp.asarray(p.reshape(8, -1))
    roundtrip_check(t, jnp.asarray(x), params, atol=1e-9)


def test_sos_polynomial_inverse_near_triple_root():
    """Cardano is ill-conditioned near triple roots (x ~ -shift); the
    Newton polish must still recover the input."""
    t = SOSPolynomialTransformer.create(n_polynomials=2)
    # Parameters making the derivative nearly vanish at one point:
    # a_10 = -a_11 * x0 makes (a_10 + a_11 x)^2 zero at x = x0.
    x0 = 0.7
    p = np.zeros((1, t.n_parameters_per_feature, 1))
    p[:, 1] = -1.0 * x0   # a_10
    p[:, 2] = 1.0         # a_11
    p[:, 3] = -0.5 * x0   # a_20
    p[:, 4] = 0.5         # a_21
    params = jnp.asarray(p.reshape(1, -1))
    x = jnp.asarray([[x0 + 1e-3]])
    y, _ = t.forward(x, params)
    x_back, _ = t.inverse(y, params)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-6)


@pytest.mark.parametrize('dimension', [2, 3, 5])
@pytest.mark.parametrize('unit_sphere', [False, True])
def test_moebius_dimensions_and_unit_sphere(dimension, unit_sphere):
    """Round trip + norm preservation across vector dimensions, with and
    without the unit-sphere fast path."""
    t = MoebiusTransformer(dimension=dimension, unit_sphere=unit_sphere)
    x = jax.random.normal(jax.random.key(12), (BATCH, 2 * dimension))
    if unit_sphere:
        xv = x.reshape(BATCH, 2, dimension)
        xv = xv / jnp.linalg.norm(xv, axis=-1, keepdims=True)
        x = xv.reshape(BATCH, 2 * dimension)
    w = 0.4 * jax.random.normal(jax.random.key(13), (BATCH, 2 * dimension))
    y, ldj = t.forward(x, w)
    yv = np.asarray(y).reshape(BATCH, 2, dimension)
    xv = np.asarray(x).reshape(BATCH, 2, dimension)
    np.testing.assert_allclose(np.linalg.norm(yv, axis=-1),
                               np.linalg.norm(xv, axis=-1), atol=1e-9)
    roundtrip_check(t, x, w, atol=1e-8)


def test_sos_polynomial_inverse_tiny_linear_terms_f32():
    """Near-identity parameters (tiny a_k1, the regime right after identity
    init) must not overflow Cardano's intermediates in float32."""
    t = SOSPolynomialTransformer.create(n_polynomials=2)
    p = np.zeros((1, t.n_parameters_per_feature, 3), np.float32)
    p[:, 1::2] = np.sqrt(0.5, dtype=np.float32)
    x = jnp.asarray(np.array([[0.3, -1.2, 2.0]], np.float32))
    for a_k1 in (1e-8, 1e-7, 1e-5, 1e-3):
        p[:, 2::2] = a_k1
        params = jnp.asarray(p.reshape(1, -1))
        y, _ = t.forward(x, params)
        x_back, ldj_inv = t.inverse(y, params)
        assert not np.any(np.isnan(np.asarray(x_back))), f'NaN at {a_k1}'
        np.testing.assert_allclose(np.asarray(x_back), np.asarray(x),
                                   atol=1e-5)
        assert np.all(np.isfinite(np.asarray(ldj_inv)))
