"""Dedicated tests for the graph primitives and masked linear layers.

Mirrors the reference's test surfaces
(/root/reference/tfep/tests/nn/test_graph.py — edge construction, batch
flattening, distances, pruning, segment sums — and
/root/reference/tfep/tests/nn/test_masked.py — mask semantics, masked
forward equivalence, weight-norm NaN safety), adapted to the static-shape
mask formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfep_tpu.nn.graph import (
    FixedGraph, compute_edge_distances, fix_node_indices_batch_size,
    get_all_edges, prune_long_edges, unsorted_segment_sum,
)
from tfep_tpu.nn.masked import MaskedLinear, create_autoregressive_mask


# ===========================================================================
# Graph primitives
# ===========================================================================

@pytest.mark.parametrize('n_nodes', [2, 3, 5])
def test_get_all_edges(n_nodes):
    edges = get_all_edges(n_nodes)
    assert edges.shape == (2, n_nodes * (n_nodes - 1))
    # No self loops; every ordered pair appears exactly once.
    assert not np.any(edges[0] == edges[1])
    pairs = {tuple(e) for e in edges.T}
    assert len(pairs) == edges.shape[1]
    for i in range(n_nodes):
        for j in range(n_nodes):
            if i != j:
                assert (i, j) in pairs


@pytest.mark.parametrize('batch_size', [1, 3])
def test_fix_node_indices_batch_size(batch_size):
    n_nodes = 4
    edges = get_all_edges(n_nodes)
    batched = fix_node_indices_batch_size(edges, batch_size, n_nodes)
    assert batched.shape == (2, batch_size * edges.shape[1])
    # Each sample's block is the template offset by b * n_nodes, and no
    # edge crosses samples.
    blocks = batched.reshape(2, edges.shape[1], batch_size)
    for b in range(batch_size):
        np.testing.assert_array_equal(blocks[:, :, b], edges + b * n_nodes)
        assert np.all(blocks[:, :, b] // n_nodes == b)


def test_compute_edge_distances():
    rng = np.random.default_rng(0)
    n_nodes = 5
    x = jnp.asarray(rng.normal(size=(n_nodes, 3)))
    edges = get_all_edges(n_nodes)

    distances, directions = compute_edge_distances(x, edges)
    expected_d = np.linalg.norm(
        np.asarray(x)[edges[1]] - np.asarray(x)[edges[0]], axis=-1)
    np.testing.assert_allclose(distances, expected_d, atol=1e-12)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(directions), axis=-1),
        np.ones(edges.shape[1]), atol=1e-12)

    # Unnormalized directions are the raw difference vectors.
    _, raw = compute_edge_distances(x, edges, normalize_directions=False)
    np.testing.assert_allclose(
        raw, np.asarray(x)[edges[1]] - np.asarray(x)[edges[0]], atol=1e-12)


def test_prune_long_edges_is_a_mask():
    x = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
    edges = get_all_edges(3)
    distances, directions = compute_edge_distances(x, edges)
    mask, edges_out, d_out, dir_out = prune_long_edges(
        2.0, edges, distances, directions)
    # Static shapes: nothing shrinks, the mask flags the short edges.
    assert edges_out.shape == edges.shape
    assert d_out.shape == distances.shape
    np.testing.assert_array_equal(np.asarray(mask),
                                  np.asarray(distances) <= 2.0)
    # Exactly the 0<->1 pair is within the cutoff.
    assert int(np.asarray(mask).sum()) == 2


def test_unsorted_segment_sum():
    data = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]])
    seg = jnp.asarray([0, 2, 0, 2])
    out = unsorted_segment_sum(data, seg, n_segments=3)
    np.testing.assert_allclose(
        out, [[6.0, 8.0], [0.0, 0.0], [10.0, 12.0]], atol=1e-12)


def test_fixed_graph():
    node_types = [0, 1, 1, 2]
    features = FixedGraph.build_node_features(node_types)
    np.testing.assert_array_equal(
        features, np.eye(3)[[0, 1, 1, 2]])

    graph = FixedGraph(
        node_types_one_hot=jnp.asarray(features),
        edges_template=jnp.asarray(get_all_edges(4)),
        n_nodes=4)
    edges_b = graph.get_edges(batch_size=2)
    assert edges_b.shape == (2, 2 * 12)
    # Second sample's nodes live in [4, 8).
    second = np.asarray(edges_b).reshape(2, 12, 2)[:, :, 1]
    assert second.min() >= 4 and second.max() < 8


# ===========================================================================
# Masked linear
# ===========================================================================

def test_create_autoregressive_mask():
    degrees_in = np.array([0, 1, 2])
    degrees_out = np.array([0, 1, 2])
    # Output layer: strictly lower degree feeds.
    mask = create_autoregressive_mask(degrees_in, degrees_out,
                                      strictly_less=True)
    np.testing.assert_array_equal(
        mask, np.array([[False, True, True],
                        [False, False, True],
                        [False, False, False]]))
    # Hidden layer: lower-or-equal.
    mask_h = create_autoregressive_mask(degrees_in, degrees_out,
                                        strictly_less=False)
    np.testing.assert_array_equal(mask_h, np.tril(np.ones((3, 3))).T)
    # transpose swaps the orientation.
    np.testing.assert_array_equal(
        create_autoregressive_mask(degrees_in, degrees_out,
                                   strictly_less=True, transpose=True),
        mask.T)


def test_masked_linear_respects_mask():
    key = jax.random.key(0)
    mask = create_autoregressive_mask(np.arange(4), np.arange(4),
                                      strictly_less=True, transpose=True)
    layer = MaskedLinear.create(key, 4, 4, mask=mask)
    x = jax.random.normal(jax.random.key(1), (8, 4))

    y = layer(x)
    # Output j only depends on inputs of strictly lower degree: perturbing
    # input i must leave outputs with degree <= i unchanged.
    for i in range(4):
        x2 = x.at[:, i].add(10.0)
        y2 = layer(x2)
        np.testing.assert_allclose(y2[:, :i + 1], y[:, :i + 1], atol=1e-12)

    # Masked entries carry no gradient.
    from tfep_tpu.nn.module import filter_value_and_grad
    _, grads = filter_value_and_grad(lambda l: jnp.sum(l(x) ** 2))(layer)
    w_grad = np.asarray(grads.weight)
    assert np.all(w_grad[~np.asarray(mask)] == 0.0)


@pytest.mark.parametrize('weight_norm', [False, True])
def test_masked_linear_matches_dense_equivalent(weight_norm):
    """A fully-True mask must behave exactly like the dense layer."""
    key = jax.random.key(2)
    dense = MaskedLinear.create(key, 5, 3, weight_norm=weight_norm)
    masked = MaskedLinear.create(key, 5, 3, mask=np.ones((3, 5), dtype=bool),
                                 weight_norm=weight_norm)
    x = jax.random.normal(jax.random.key(3), (7, 5))
    np.testing.assert_allclose(dense(x), masked(x), atol=1e-12)


def test_weight_norm_zero_row_safe():
    """A fully-masked output row must give zero output and finite grads.

    This is the hazard the reference handles with NaN-sanitizing gradient
    hooks (/root/reference/tfep/nn/masked.py:312-440); here the zero-norm
    guard must make plain autodiff finite.
    """
    mask = np.array([[True, True], [False, False]])
    layer = MaskedLinear.create(jax.random.key(4), 2, 2, mask=mask,
                                weight_norm=True, bias=False)
    x = jax.random.normal(jax.random.key(5), (6, 2))

    y = layer(x)
    np.testing.assert_allclose(y[:, 1], np.zeros(6), atol=1e-12)

    from tfep_tpu.nn.module import filter_value_and_grad
    loss, grads = filter_value_and_grad(lambda l: jnp.sum(l(x) ** 2))(layer)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_masked_linear_identity_init():
    """set_output makes the layer constant; weight-norm path uses g=0."""
    target = jnp.asarray([1.5, -2.0, 0.25])
    for weight_norm in (False, True):
        layer = MaskedLinear.create(jax.random.key(6), 4, 3,
                                    weight_norm=weight_norm)
        layer = layer.set_output(target)
        x = jax.random.normal(jax.random.key(7), (5, 4))
        np.testing.assert_allclose(layer(x),
                                   np.tile(np.asarray(target), (5, 1)),
                                   atol=1e-12)


def test_masked_linear_n_parameters():
    mask = create_autoregressive_mask(np.arange(3), np.arange(3),
                                      strictly_less=True, transpose=True)
    layer = MaskedLinear.create(jax.random.key(8), 3, 3, mask=mask)
    # 3 unmasked weights + 3 biases.
    assert layer.n_parameters() == int(mask.sum()) + 3


def test_degree_based_masking_matches_explicit_mask():
    """The lazy degree-based mask is exactly the materialized one: same
    forward outputs, same parameter count, for both hidden- and
    output-layer (strictly-less) connectivity."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tfep_tpu.nn.masked import MaskedLinear, create_autoregressive_mask

    degrees_in = np.array([0, 1, 2, 0, 1, 2, 1])
    degrees_out = np.array([0, 1, 2, 2, 1, 0, 2, 1, 0])
    x = jax.random.normal(jax.random.key(1), (5, len(degrees_in)))

    for strictly_less, weight_norm in [(False, True), (True, False),
                                       (True, True), (False, False)]:
        mask = create_autoregressive_mask(
            degrees_in, degrees_out, strictly_less=strictly_less,
            transpose=True)
        explicit = MaskedLinear.create(
            jax.random.key(0), len(degrees_in), len(degrees_out),
            mask=mask, weight_norm=weight_norm)
        lazy = MaskedLinear.create(
            jax.random.key(0), len(degrees_in), len(degrees_out),
            degrees_in=degrees_in, degrees_out=degrees_out,
            strictly_less=strictly_less, weight_norm=weight_norm)
        np.testing.assert_allclose(np.asarray(explicit(x)),
                                   np.asarray(lazy(x)), rtol=1e-6)
        assert explicit.n_parameters() == lazy.n_parameters()
        np.testing.assert_array_equal(np.asarray(lazy._mask_array()), mask)


def test_masked_linear_rejects_mask_and_degrees():
    import jax
    import numpy as np
    import pytest

    from tfep_tpu.nn.masked import MaskedLinear

    with pytest.raises(ValueError, match='not both'):
        MaskedLinear.create(jax.random.key(0), 3, 3,
                            mask=np.ones((3, 3), bool),
                            degrees_in=np.arange(3),
                            degrees_out=np.arange(3))


def test_masked_linear_rejects_one_sided_degrees():
    import jax
    import numpy as np
    import pytest

    from tfep_tpu.nn.masked import MaskedLinear

    with pytest.raises(ValueError, match='together'):
        MaskedLinear.create(jax.random.key(0), 3, 3,
                            degrees_in=np.arange(3))
