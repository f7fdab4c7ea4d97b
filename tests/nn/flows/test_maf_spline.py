"""Integration: MAF with spline transformer + periodic embedding.

The circular-spline MAF with a periodic cos/sin embedding is the flagship
configuration for torsional degrees of freedom (used by the mixed map).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfep_tpu.nn.conditioners.made import generate_degrees
from tfep_tpu.nn.embeddings import PeriodicEmbedding
from tfep_tpu.nn.flows import MAF
from tfep_tpu.nn.transformers import NeuralSplineTransformer
from tfep_tpu.utils.math import batch_log_abs_det_J

from tests.nn.flows.test_maf import randomize

BATCH = 5
N_FEATURES = 4


def test_spline_maf_roundtrip_and_jacobian():
    x0 = -2.0 * jnp.ones(N_FEATURES)
    xf = 2.0 * jnp.ones(N_FEATURES)
    transformer = NeuralSplineTransformer.create(x0, xf, n_bins=4)
    flow = MAF.create(jax.random.key(0), generate_degrees(N_FEATURES),
                      transformer=transformer)
    flow = randomize(flow, jax.random.key(1), scale=0.3)

    x = jax.random.uniform(jax.random.key(2), (BATCH, N_FEATURES),
                           minval=-1.8, maxval=1.8, dtype=jnp.float64)
    y, ldj = flow.forward(x)
    x_back, ldj_inv = flow.inverse(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-7)
    np.testing.assert_allclose(np.asarray(ldj + ldj_inv), 0.0, atol=1e-7)

    oracle = batch_log_abs_det_J(lambda z: flow.forward(z)[0], x)
    np.testing.assert_allclose(np.asarray(ldj), np.asarray(oracle),
                               atol=1e-6)


def test_circular_spline_maf_with_periodic_embedding():
    period = 2 * np.pi
    x0 = jnp.zeros(N_FEATURES)
    xf = period * jnp.ones(N_FEATURES)
    transformer = NeuralSplineTransformer.create(x0, xf, n_bins=4,
                                                 circular=True)
    embedding = PeriodicEmbedding.create(N_FEATURES, limits=[0.0, period])
    flow = MAF.create(jax.random.key(0), generate_degrees(N_FEATURES),
                      transformer=transformer, embedding=embedding)
    flow = randomize(flow, jax.random.key(1), scale=0.3)

    x = jax.random.uniform(jax.random.key(2), (BATCH, N_FEATURES),
                           minval=0.0, maxval=period, dtype=jnp.float64)
    y, ldj = flow.forward(x)
    assert np.all(np.asarray(y) >= 0) and np.all(np.asarray(y) <= period)

    x_back, ldj_inv = flow.inverse(y)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ldj + ldj_inv), 0.0, atol=1e-7)

    oracle = batch_log_abs_det_J(lambda z: flow.forward(z)[0], x)
    np.testing.assert_allclose(np.asarray(ldj), np.asarray(oracle),
                               atol=1e-6)

    # Identity-initialized spline MAF is the identity inside the domain.
    flow_id = MAF.create(jax.random.key(3), generate_degrees(N_FEATURES),
                         transformer=NeuralSplineTransformer.create(
                             x0, xf, n_bins=4, circular=True),
                         embedding=PeriodicEmbedding.create(
                             N_FEATURES, limits=[0.0, period]))
    y_id, ldj_id = flow_id.forward(x)
    np.testing.assert_allclose(np.asarray(y_id), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ldj_id), 0.0, atol=1e-6)
