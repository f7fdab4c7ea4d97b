"""Embedding parity against the PyTorch reference.

PeriodicEmbedding is covered end-to-end in ``test_maf_parity``; here the
weighted (FlipInvariant) and radial embeddings get direct weight-copied
comparisons.  Reference:
``/root/reference/tfep/nn/embeddings/{mafembed,radial}.py``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refbridge import to_numpy, to_torch

from tfep_tpu.nn.embeddings.mafembed import (
    FlipInvariantEmbedding, MixedEmbedding, PeriodicEmbedding)
from tfep_tpu.nn.embeddings.radial import (
    BehlerParrinelloRadialExpansion, GaussianBasisExpansion)


def _copy_dense(ref_linear, our_linear):
    """Copy a plain torch Linear into our (unmasked) MaskedLinear."""
    return our_linear.replace(
        weight=jnp.asarray(ref_linear.weight.detach().numpy()),
        bias=jnp.asarray(ref_linear.bias.detach().numpy()))


def test_flip_invariant_embedding_parity(ref):
    import torch

    n_vectors, vec_dim, emb_dim = 3, 4, 6
    n_features = n_vectors * vec_dim + 2   # plus 2 non-embedded scalars
    embedded = list(range(2, 2 + n_vectors * vec_dim))

    torch.manual_seed(0)
    ref_emb = ref.nn.embeddings.mafembed.FlipInvariantEmbedding(
        n_features_in=n_features, embedding_dimension=emb_dim,
        embedded_indices=embedded, vector_dimension=vec_dim,
        hidden_layer_width=16)
    our_emb = FlipInvariantEmbedding.create(
        jax.random.PRNGKey(0), n_features_in=n_features,
        embedding_dimension=emb_dim, embedded_indices=embedded,
        vector_dimension=vec_dim, hidden_layer_width=16)

    our_emb = our_emb.replace(
        embed_l1=_copy_dense(ref_emb.embedding_layer[0], our_emb.embed_l1),
        embed_l2=_copy_dense(ref_emb.embedding_layer[2], our_emb.embed_l2),
        weight_l1=_copy_dense(ref_emb.weight_layer[0], our_emb.weight_l1),
        weight_l2=_copy_dense(ref_emb.weight_layer[2], our_emb.weight_l2))

    x = np.random.default_rng(1).standard_normal((5, n_features))
    with torch.no_grad():
        ref_y = to_numpy(ref_emb(to_torch(x)))
    our_y = to_numpy(our_emb(x))
    np.testing.assert_allclose(our_y, ref_y, atol=1e-12)

    # Flip invariance holds on both sides (the property being bought).
    x_flipped = x.copy()
    x_flipped[:, embedded] *= -1
    np.testing.assert_allclose(to_numpy(our_emb(x_flipped)), our_y,
                               atol=1e-12)

    degrees = np.array([-1, -1] + sum(([d] * vec_dim
                                       for d in range(n_vectors)), []))
    np.testing.assert_array_equal(
        to_numpy(ref_emb.get_degrees_out(to_torch(degrees, dtype=None))),
        our_emb.get_degrees_out(degrees))


def test_mixed_embedding_parity(ref):
    """MixedEmbedding composes sub-embeddings over disjoint groups."""
    import torch

    n_features = 6
    periodic_idx = [0, 3]
    limits = (-np.pi, np.pi)

    ref_sub = ref.nn.embeddings.mafembed.PeriodicEmbedding(
        n_features_in=n_features, limits=list(limits),
        periodic_indices=periodic_idx)
    our_sub = PeriodicEmbedding.create(
        n_features_in=n_features, limits=limits,
        periodic_indices=periodic_idx)

    ref_emb = ref.nn.embeddings.mafembed.MixedEmbedding(
        n_features_in=n_features, embedding_layers=[ref_sub],
        embedded_indices=[list(range(n_features))])
    our_emb = MixedEmbedding.create(
        n_features_in=n_features, embedding_layers=[our_sub],
        embedded_indices=[list(range(n_features))])

    x = np.random.default_rng(2).uniform(-3, 3, size=(5, n_features))
    with torch.no_grad():
        ref_y = to_numpy(ref_emb(to_torch(x)))
    np.testing.assert_allclose(to_numpy(our_emb(x)), ref_y, atol=1e-12)

    degrees = np.arange(n_features)
    np.testing.assert_array_equal(
        to_numpy(ref_emb.get_degrees_out(to_torch(degrees, dtype=None))),
        our_emb.get_degrees_out(degrees))


def test_gaussian_basis_expansion_parity(ref):
    import torch

    means = np.linspace(0.5, 5.0, 8)
    stds = np.full(8, 0.4)
    ref_exp = ref.nn.embeddings.radial.GaussianBasisExpansion(
        means=to_torch(means), stds=to_torch(stds))
    our_exp = GaussianBasisExpansion.create(means=means, stds=stds)

    r = np.random.default_rng(3).uniform(0.1, 6.0, size=(5, 7))
    with torch.no_grad():
        ref_y = to_numpy(ref_exp(to_torch(r)))
    np.testing.assert_allclose(to_numpy(our_exp(r)), ref_y, atol=1e-12)


def test_behler_parrinello_radial_parity(ref):
    import torch

    means = np.linspace(0.5, 5.0, 8)
    stds = np.full(8, 0.4)
    r_cutoff = 4.5
    ref_exp = ref.nn.embeddings.radial.BehlerParrinelloRadialExpansion(
        r_cutoff=r_cutoff, means=to_torch(means), stds=to_torch(stds))
    our_exp = BehlerParrinelloRadialExpansion.create(
        r_cutoff=r_cutoff, means=means, stds=stds)

    # Spans the interior, the cutoff switch region, and beyond-cutoff.
    r = np.random.default_rng(4).uniform(0.1, 6.0, size=(5, 7))
    with torch.no_grad():
        ref_y = to_numpy(ref_exp(to_torch(r)))
    np.testing.assert_allclose(to_numpy(our_exp(r)), ref_y, atol=1e-12)
