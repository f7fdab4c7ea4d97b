"""Tests for MAF embeddings and radial expansions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfep_tpu.nn.embeddings import (
    BehlerParrinelloRadialExpansion, FlipInvariantEmbedding,
    GaussianBasisExpansion, MixedEmbedding, PeriodicEmbedding,
)

BATCH = 4


def test_periodic_embedding():
    emb = PeriodicEmbedding.create(5, limits=[-np.pi, np.pi],
                                   periodic_indices=[1, 3])
    x = jax.random.uniform(jax.random.key(0), (BATCH, 5),
                           minval=-np.pi, maxval=np.pi)
    out = emb(x)
    assert out.shape == (BATCH, 7)  # 3 nonperiodic + 2*2 cos/sin
    # Nonperiodic features pass through first.
    np.testing.assert_array_equal(np.asarray(out[:, :3]),
                                  np.asarray(x[:, [0, 2, 4]]))
    # cos/sin have unit norm per periodic feature.
    cs = np.asarray(out[:, 3:]).reshape(BATCH, 2, 2)
    np.testing.assert_allclose(np.linalg.norm(cs, axis=-1), 1.0, atol=1e-7)

    degrees = emb.get_degrees_out(np.array([0, 1, 2, 3, 4]))
    np.testing.assert_array_equal(degrees, [0, 2, 4, 1, 1, 3, 3])


def test_periodic_embedding_invariance():
    """x and x + period embed identically."""
    emb = PeriodicEmbedding.create(2, limits=[0.0, 2 * np.pi])
    x = jax.random.uniform(jax.random.key(0), (BATCH, 2), minval=0,
                           maxval=2 * np.pi)
    np.testing.assert_allclose(np.asarray(emb(x)),
                               np.asarray(emb(x + 2 * np.pi)), atol=1e-6)


def test_flip_invariant_embedding():
    emb = FlipInvariantEmbedding.create(
        jax.random.key(0), n_features_in=10, embedding_dimension=6,
        embedded_indices=[2, 3, 4, 5, 6, 7, 8, 9], vector_dimension=4)
    x = jax.random.normal(jax.random.key(1), (BATCH, 10))
    out = emb(x)
    assert out.shape == (BATCH, 2 + 2 * 6)

    # Sign-flip invariance of the embedded vectors.
    x_flipped = x.at[:, 2:6].multiply(-1)
    out_flipped = emb(x_flipped)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_flipped),
                               atol=1e-6)

    degrees = emb.get_degrees_out(np.array([0, 1, 2, 2, 2, 2, 3, 3, 3, 3]))
    np.testing.assert_array_equal(degrees, [0, 1] + [2] * 6 + [3] * 6)

    with pytest.raises(ValueError, match='same degree'):
        emb.get_degrees_out(np.array([0, 1, 2, 9, 2, 2, 3, 3, 3, 3]))


def test_mixed_embedding():
    periodic = PeriodicEmbedding.create(2, limits=[0.0, 1.0])
    flip = FlipInvariantEmbedding.create(
        jax.random.key(0), n_features_in=4, embedding_dimension=3,
        vector_dimension=4)
    emb = MixedEmbedding.create(8, [periodic, flip],
                                embedded_indices=[[0, 1], [2, 3, 4, 5]])
    x = jax.random.normal(jax.random.key(1), (BATCH, 8))
    out = emb(x)
    # 2 nonembedded + 2*2 periodic + 3 flip-embedded.
    assert out.shape == (BATCH, 2 + 4 + 3)

    degrees = emb.get_degrees_out(np.array([0, 1, 2, 2, 2, 2, 3, 4]))
    np.testing.assert_array_equal(degrees, [3, 4, 0, 0, 1, 1, 2, 2, 2])


def test_gaussian_basis_expansion():
    exp = GaussianBasisExpansion.from_range(n_gaussians=8, max_mean=5.0)
    r = jnp.linspace(0, 5, 11).reshape(1, -1)
    out = exp(r)
    assert out.shape == (1, 11, 8)
    assert np.all(np.asarray(out) > 0) and np.all(np.asarray(out) <= 1)
    # The encoding peaks at the matching mean.
    peak = np.argmax(np.asarray(out[0, 0]))
    assert peak == 0


def test_gaussian_basis_trainable_partition():
    from tfep_tpu.nn.module import partition
    exp = GaussianBasisExpansion.from_range(
        n_gaussians=4, max_mean=2.0, trainable_means=True,
        trainable_stds=False)
    trainable, frozen = partition(exp)
    assert trainable.means_param is not None
    assert frozen.log_gammas_buf is not None


def test_behler_parrinello_cutoff():
    exp = BehlerParrinelloRadialExpansion.from_range(
        r_cutoff=3.0, n_gaussians=4, max_mean=3.0)
    r = jnp.asarray([[1.0, 2.9, 3.5]])
    out = exp(r)
    assert out.shape == (1, 3, 4)
    # Beyond the cutoff the encoding is exactly zero.
    np.testing.assert_array_equal(np.asarray(out[0, 2]), 0.0)
