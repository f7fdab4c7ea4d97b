"""MAF tests: round-trip, Jacobian oracle, autoregressive property, identity.

Mirrors the reference test strategy (tests/nn/flows/test_maf.py): every flow
must satisfy inverse(forward(x)) == x with log_det_J + log_det_J_inv == 0,
its analytic log-det must match the brute-force jacfwd+slogdet oracle, and
perturbing input i must leave outputs of degree <= degree(i) unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfep_tpu.nn.conditioners.made import generate_degrees
from tfep_tpu.nn.flows import MAF, PartialFlow, SequentialFlow
from tfep_tpu.nn.transformers.affine import AffineTransformer
from tfep_tpu.utils.math import batch_log_abs_det_J

BATCH = 5
N_FEATURES = 7


def randomize(flow, key, scale=0.5):
    """Perturb all trainable parameters so the flow is not the identity."""
    from tfep_tpu.nn.module import partition, combine
    trainable, frozen = partition(flow)
    leaves, treedef = jax.tree_util.tree_flatten(trainable)
    keys = jax.random.split(key, len(leaves))
    new_leaves = [
        l + scale * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ]
    return combine(jax.tree_util.tree_unflatten(treedef, new_leaves), frozen)


@pytest.mark.parametrize('conditioning_indices', [None, [0, 3], [1, 6]])
@pytest.mark.parametrize('order', ['ascending', 'descending'])
@pytest.mark.parametrize('weight_norm', [False, True])
@pytest.mark.parametrize('repeats', [1, 2])
def test_maf_round_trip_and_jacobian(conditioning_indices, order,
                                     weight_norm, repeats):
    degrees_in = generate_degrees(
        N_FEATURES, order=order, conditioning_indices=conditioning_indices,
        repeats=repeats)
    flow = MAF.create(jax.random.key(0), degrees_in,
                      weight_norm=weight_norm)
    flow = randomize(flow, jax.random.key(1))

    x = jax.random.normal(jax.random.key(2), (BATCH, N_FEATURES),
                          jnp.float64)
    y, log_det_J = flow.forward(x)
    x_back, log_det_J_inv = flow.inverse(y)

    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-8)
    np.testing.assert_allclose(np.asarray(log_det_J + log_det_J_inv),
                               np.zeros(BATCH), atol=1e-8)

    # Analytic log-det vs brute-force oracle.
    oracle = batch_log_abs_det_J(lambda z: flow.forward(z)[0], x)
    np.testing.assert_allclose(np.asarray(log_det_J), np.asarray(oracle),
                               atol=1e-7)

    # Conditioning features are propagated unchanged.
    if conditioning_indices is not None:
        np.testing.assert_array_equal(
            np.asarray(y[:, conditioning_indices]),
            np.asarray(x[:, conditioning_indices]))


@pytest.mark.parametrize('order', ['ascending', 'descending'])
def test_maf_identity_initialization(order):
    degrees_in = generate_degrees(N_FEATURES, order=order)
    flow = MAF.create(jax.random.key(0), degrees_in,
                      initialize_identity=True)
    x = jax.random.normal(jax.random.key(1), (BATCH, N_FEATURES),
                          jnp.float64)
    y, log_det_J = flow.forward(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-10)
    np.testing.assert_allclose(np.asarray(log_det_J), np.zeros(BATCH),
                               atol=1e-10)


def check_autoregressive_property(flow, x, degrees_in):
    """Perturbing feature i must not change outputs with degree <= degree(i)."""
    degrees_in = np.asarray(degrees_in)
    y_ref = np.asarray(flow.forward(x)[0])
    positions = np.arange(x.shape[1])
    for i in range(x.shape[1]):
        x_pert = x.at[:, i].add(1.3)
        y_pert = np.asarray(flow.forward(x_pert)[0])
        # Outputs of strictly lower degree are unaffected; outputs of equal
        # degree too except position i itself (the transformer consumes x_i
        # directly).
        unaffected = (degrees_in < degrees_in[i]) | (
            (degrees_in == degrees_in[i]) & (positions != i))
        if degrees_in[i] == -1:
            # Conditioning features affect everything except other
            # conditioning features.
            unaffected = (degrees_in == -1) & (positions != i)
        np.testing.assert_allclose(
            y_pert[:, unaffected], y_ref[:, unaffected], atol=1e-10,
            err_msg=f'feature {i} leaked into lower degrees')


@pytest.mark.parametrize('conditioning_indices', [None, [2, 4]])
def test_maf_autoregressive_property(conditioning_indices):
    degrees_in = generate_degrees(
        N_FEATURES, conditioning_indices=conditioning_indices)
    flow = MAF.create(jax.random.key(0), degrees_in)
    flow = randomize(flow, jax.random.key(3))
    x = jax.random.normal(jax.random.key(4), (BATCH, N_FEATURES),
                          jnp.float64)
    check_autoregressive_property(flow, x, degrees_in)


def test_sequential_flow():
    d1 = generate_degrees(N_FEATURES, order='ascending')
    d2 = generate_degrees(N_FEATURES, order='descending')
    flow = SequentialFlow.create(
        MAF.create(jax.random.key(0), d1),
        MAF.create(jax.random.key(1), d2),
    )
    flow = randomize(flow, jax.random.key(2))
    x = jax.random.normal(jax.random.key(3), (BATCH, N_FEATURES),
                          jnp.float64)
    y, ldj = flow.forward(x)
    x_back, ldj_inv = flow.inverse(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-8)
    np.testing.assert_allclose(np.asarray(ldj + ldj_inv), np.zeros(BATCH),
                               atol=1e-8)
    oracle = batch_log_abs_det_J(lambda z: flow.forward(z)[0], x)
    np.testing.assert_allclose(np.asarray(ldj), np.asarray(oracle), atol=1e-7)


@pytest.mark.parametrize('return_partial', [False, True])
def test_partial_flow(return_partial):
    fixed = [1, 4]
    n_propagated = N_FEATURES - len(fixed)
    inner = MAF.create(jax.random.key(0),
                       generate_degrees(n_propagated))
    inner = randomize(inner, jax.random.key(1))
    flow = PartialFlow.create(inner, fixed, n_features=N_FEATURES,
                              return_partial=return_partial)
    x = jax.random.normal(jax.random.key(2), (BATCH, N_FEATURES),
                          jnp.float64)
    out = flow.forward(x)
    if return_partial:
        assert out[0].shape == (BATCH, n_propagated)
        return
    y, ldj = out
    # Fixed DOFs unchanged.
    np.testing.assert_array_equal(np.asarray(y[:, fixed]),
                                  np.asarray(x[:, fixed]))
    x_back, ldj_inv = flow.inverse(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-8)
    oracle = batch_log_abs_det_J(lambda z: flow.forward(z)[0], x)
    np.testing.assert_allclose(np.asarray(ldj), np.asarray(oracle), atol=1e-7)


def test_maf_gradients_flow():
    """Gradients reach every trainable leaf through forward and inverse."""
    from tfep_tpu.nn.module import filter_value_and_grad, partition
    degrees_in = generate_degrees(N_FEATURES)
    flow = MAF.create(jax.random.key(0), degrees_in)
    x = jax.random.normal(jax.random.key(1), (BATCH, N_FEATURES),
                          jnp.float64)

    def loss(f):
        y, ldj = f.forward(x)
        return jnp.sum(y ** 2) - jnp.sum(ldj)

    value, grads = filter_value_and_grad(loss)(flow)
    leaves = [l for l in jax.tree_util.tree_leaves(grads) if l is not None]
    assert len(leaves) > 0
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)

    def loss_inv(f):
        xi, ldj = f.inverse(x)
        return jnp.sum(xi ** 2) - jnp.sum(ldj)

    value, grads = filter_value_and_grad(loss_inv)(flow)
    leaves = [l for l in jax.tree_util.tree_leaves(grads) if l is not None]
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_maf_inverse_jit():
    degrees_in = generate_degrees(N_FEATURES)
    flow = MAF.create(jax.random.key(0), degrees_in)
    flow = randomize(flow, jax.random.key(1))
    x = jax.random.normal(jax.random.key(2), (BATCH, N_FEATURES),
                          jnp.float64)
    y, _ = jax.jit(lambda f, z: f.forward(z))(flow, x)
    x_back, _ = jax.jit(lambda f, z: f.inverse(z))(flow, y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-8)


def test_maf_mixed_precision_compute():
    """compute_dtype='bfloat16' keeps the flow invertible and close to f32.

    The mixed-precision policy only casts conditioner matmul operands
    (float32 accumulation); parameters, transformer math, and outputs stay
    in the storage dtype.
    """
    degrees_in = generate_degrees(N_FEATURES)
    f32 = MAF.create(jax.random.key(0), degrees_in, dtype=jnp.float32)
    bf16 = MAF.create(jax.random.key(0), degrees_in, dtype=jnp.float32,
                      compute_dtype='bfloat16')
    f32 = randomize(f32, jax.random.key(1))
    bf16 = randomize(bf16, jax.random.key(1))
    x = jax.random.normal(jax.random.key(2), (BATCH, N_FEATURES),
                          jnp.float32)

    y32, ldj32 = f32.forward(x)
    y16, ldj16 = bf16.forward(x)
    assert y16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32),
                               atol=0.05, rtol=0.05)

    x_back, ldj_inv = bf16.inverse(y16)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldj16 + ldj_inv), 0.0, atol=1e-5)


def test_sequential_flow_remat_equivalence():
    """remat=True is numerically identical in outputs and gradients."""
    from tfep_tpu.nn.module import filter_value_and_grad

    degrees = generate_degrees(N_FEATURES)
    def build(remat):
        layers = [MAF.create(jax.random.key(i), degrees) for i in range(3)]
        flow = SequentialFlow.create(*layers, remat=remat)
        return randomize(flow, jax.random.key(9))

    plain, remat = build(False), build(True)
    x = jax.random.normal(jax.random.key(3), (BATCH, N_FEATURES),
                          jnp.float64)

    y_p, ldj_p = jax.jit(lambda f, x: f.forward(x))(plain, x)
    y_r, ldj_r = jax.jit(lambda f, x: f.forward(x))(remat, x)
    np.testing.assert_array_equal(np.asarray(y_r), np.asarray(y_p))
    np.testing.assert_array_equal(np.asarray(ldj_r), np.asarray(ldj_p))

    def loss(f):
        y, ldj = f.forward(x)
        return jnp.sum(y ** 2) - jnp.sum(ldj)

    _, g_p = jax.jit(filter_value_and_grad(loss))(plain)
    _, g_r = jax.jit(filter_value_and_grad(loss))(remat)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-12)

    x_back, _ = remat.inverse(y_r)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-8)


@pytest.mark.parametrize('transformer_name', ['affine', 'spline',
                                              'spline_circular', 'sos'])
@pytest.mark.parametrize('conditioning_indices,repeats', [
    (None, 1),
    ([0, 1], 1),
    (None, 3),      # 10 % 3 != 0: exercises the padded last group
    ([2], 4),
])
def test_fast_inverse_matches_reference_path(transformer_name,
                                             conditioning_indices, repeats):
    """The restricted (per-degree-group) inverse must equal the full-pass
    inverse exactly — it computes the same conditioner rows and the same
    transformer math, just nothing else."""
    n_features = 10
    degrees = generate_degrees(n_features,
                               conditioning_indices=conditioning_indices,
                               repeats=repeats)
    if transformer_name == 'affine':
        transformer = AffineTransformer()
    elif transformer_name == 'sos':
        from tfep_tpu.nn.transformers.sos import SOSPolynomialTransformer
        transformer = SOSPolynomialTransformer()
    else:
        from tfep_tpu.nn.transformers.spline import NeuralSplineTransformer
        n_t = n_features - (0 if conditioning_indices is None
                            else len(conditioning_indices))
        transformer = NeuralSplineTransformer.create(
            x0=-4.0 * jnp.ones(n_t), xf=4.0 * jnp.ones(n_t), n_bins=4,
            circular=(transformer_name == 'spline_circular'))

    flow = MAF.create(jax.random.key(3), degrees, transformer=transformer,
                      initialize_identity=False)
    assert flow._can_fast_inverse
    # Disable BOTH fast tables so the baseline is the original full-pass
    # inverse, not the row-restricted variant.
    slow = flow.replace(inverse_groups_t=None, inverse_param_rows=None)
    assert not slow._can_fast_inverse
    assert not slow._can_row_restricted_inverse

    y = jax.random.normal(jax.random.key(4), (7, n_features))
    x_fast, ldj_fast = jax.jit(lambda y: flow.inverse(y))(y)
    x_slow, ldj_slow = jax.jit(lambda y: slow.inverse(y))(y)
    np.testing.assert_allclose(np.asarray(x_fast), np.asarray(x_slow),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(ldj_fast), np.asarray(ldj_slow),
                               rtol=1e-12, atol=1e-13)

    # And it really is an inverse (belt and braces — the round-trip tests
    # above already run through the fast path).
    y_rt, ldj_fwd = flow.forward(x_fast)
    np.testing.assert_allclose(np.asarray(y_rt), np.asarray(y), atol=1e-8)
    np.testing.assert_allclose(np.asarray(ldj_fwd + ldj_fast), 0.0,
                               atol=1e-8)


def test_mixed_transformer_row_restricted_inverse():
    """MixedTransformer's parameter layout is not the standard tiling, so
    it must NOT take the sliced path — it takes the layout-agnostic
    row-restricted path instead (per-group conditioner rows scattered
    into an identity-parameter fill), which must match the full-pass
    inverse exactly."""
    from tfep_tpu.nn.transformers.mixed import MixedTransformer
    from tfep_tpu.nn.transformers.spline import NeuralSplineTransformer

    spline = NeuralSplineTransformer.create(
        x0=-4.0 * jnp.ones(3), xf=4.0 * jnp.ones(3), n_bins=4)
    mixed = MixedTransformer.create(
        transformers=[AffineTransformer(), spline],
        indices=[[0, 2, 4], [1, 3, 5]])
    flow = MAF.create(jax.random.key(5), generate_degrees(6),
                      transformer=mixed, initialize_identity=False)
    assert not flow._can_fast_inverse
    assert flow._can_row_restricted_inverse
    slow = flow.replace(inverse_param_rows=None)

    y = jax.random.normal(jax.random.key(6), (5, 6))
    x, ldj = jax.jit(lambda y: flow.inverse(y))(y)
    x_slow, ldj_slow = jax.jit(lambda y: slow.inverse(y))(y)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_slow),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(ldj), np.asarray(ldj_slow),
                               rtol=1e-12, atol=1e-13)

    y_rt, ldj_fwd = flow.forward(x)
    np.testing.assert_allclose(np.asarray(y_rt), np.asarray(y), atol=1e-8)
    np.testing.assert_allclose(np.asarray(ldj_fwd + ldj), 0.0, atol=1e-8)


def test_row_restricted_inverse_falls_back_without_identity():
    """A transformer that cannot express the identity (spline with
    x0 != y0) must fall back to the full-pass inverse at trace time —
    and still invert correctly."""
    from tfep_tpu.nn.transformers.spline import NeuralSplineTransformer

    spline = NeuralSplineTransformer.create(
        x0=-4.0 * jnp.ones(6), xf=4.0 * jnp.ones(6),
        y0=-2.0 * jnp.ones(6), yf=2.0 * jnp.ones(6), n_bins=4)
    flow = MAF.create(jax.random.key(7), generate_degrees(6),
                      transformer=spline, initialize_identity=False)
    # The sliced path doesn't need identity parameters, so it still
    # applies; force it off to exercise the row-restricted gate.
    flow = flow.replace(inverse_groups_t=None)
    assert flow._can_row_restricted_inverse       # table exists...
    y = 1.5 * jax.random.normal(jax.random.key(8), (5, 6))
    x, ldj = flow.inverse(y)                      # ...but falls back
    y_rt, ldj_fwd = flow.forward(x)
    np.testing.assert_allclose(np.asarray(y_rt), np.asarray(y), atol=1e-7)


def test_fast_inverse_scalar_spline_bounds():
    """Scalar (0-d) spline domain bounds broadcast over all features;
    slice_features must keep them intact so the fast inverse works on
    flows built with scalar bounds (regression: IndexError on 0-d gather)."""
    from tfep_tpu.nn.transformers.spline import NeuralSplineTransformer

    spline = NeuralSplineTransformer.create(x0=-4.0, xf=4.0, n_bins=4)
    flow = MAF.create(jax.random.key(9), generate_degrees(6),
                      transformer=spline, initialize_identity=False)
    assert flow._can_fast_inverse
    y = jax.random.normal(jax.random.key(10), (5, 6))
    x, ldj = jax.jit(lambda y: flow.inverse(y))(y)
    slow = flow.replace(inverse_groups_t=None, inverse_param_rows=None)
    x_slow, ldj_slow = jax.jit(lambda y: slow.inverse(y))(y)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_slow),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(ldj), np.asarray(ldj_slow),
                               rtol=1e-12, atol=1e-13)


def test_autoregressive_empty_group_dropped():
    """Empty transformer_indices groups (e.g. from a degree histogram with
    holes) are legal and contribute nothing — create() must not crash on
    them (regression: IndexError building the padded group table)."""
    from tfep_tpu.nn.conditioners.made import MADE
    from tfep_tpu.nn.flows.autoregressive import AutoregressiveFlow

    degrees_in = np.array([0, 1, 3])
    made = MADE.create(
        jax.random.key(11), degrees_in=degrees_in,
        degrees_out=np.tile(degrees_in, 2), hidden_layers=[8])
    flow = AutoregressiveFlow.create(
        3, [[0], [1], [], [2]], made, AffineTransformer(),
        initialize_identity=False)
    assert len(flow.inverse_groups_t) == 3     # the empty group is dropped
    y = jax.random.normal(jax.random.key(12), (4, 3))
    x, ldj = flow.inverse(y)
    y_rt, ldj_fwd = flow.forward(x)
    np.testing.assert_allclose(np.asarray(y_rt), np.asarray(y), atol=1e-8)
    np.testing.assert_allclose(np.asarray(ldj_fwd + ldj), 0.0, atol=1e-8)
