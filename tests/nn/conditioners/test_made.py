"""Dedicated MADE / generate_degrees tests.

Mirrors the reference's conditioner test behaviors
(/root/reference/tfep/tests/nn/conditioners/test_made.py): degree
generation options, hidden-degree assignment, layer dimensions, error
paths, and the autoregressive property checked directly on the
conditioner output (not just through a MAF).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfep_tpu.nn.conditioners.made import MADE, generate_degrees


# =============================================================================
# generate_degrees
# =============================================================================

def test_generate_degrees_orders():
    np.testing.assert_array_equal(generate_degrees(4), [0, 1, 2, 3])
    np.testing.assert_array_equal(
        generate_degrees(4, order='descending'), [3, 2, 1, 0])
    # max_value tiles round-robin.
    np.testing.assert_array_equal(
        generate_degrees(7, order='descending', max_value=2),
        [2, 1, 0, 2, 1, 0, 2])


def test_generate_degrees_random_seeded():
    a = generate_degrees(6, order='random', seed=3)
    b = generate_degrees(6, order='random', seed=3)
    np.testing.assert_array_equal(a, b)
    assert sorted(a.tolist()) == [0, 1, 2, 3, 4, 5]


def test_generate_degrees_conditioning():
    # Conditioning slots get degree -1; the rest fill in order.
    np.testing.assert_array_equal(
        generate_degrees(7, max_value=2, conditioning_indices=[0, 2, 3]),
        [-1, 0, -1, -1, 1, 2, 0])


def test_generate_degrees_repeats():
    np.testing.assert_array_equal(
        generate_degrees(6, repeats=2), [0, 0, 1, 1, 2, 2])
    # Per-degree repeat counts; max_value inferred from the list length.
    np.testing.assert_array_equal(
        generate_degrees(7, repeats=[1, 3, 2], conditioning_indices=[2]),
        [0, 1, -1, 1, 1, 2, 2])


def test_generate_degrees_unknown_order():
    with pytest.raises(ValueError, match='order'):
        generate_degrees(4, order='sideways')


# =============================================================================
# Hidden-degree assignment
# =============================================================================

def test_hidden_degrees_int_spec():
    """An integer spec yields that many layers, all >= n_relevant wide."""
    degrees_in = np.array([0, 1, 2, 3])
    degrees_out = np.tile(degrees_in, 2)
    hidden = MADE._get_degrees_hidden(degrees_in, degrees_out, 3)
    assert len(hidden) == 3
    # Only inputs with degree < max(degrees_out) are relevant; each layer
    # must fit at least one full motif.
    n_relevant = int((degrees_in < degrees_out.max()).sum())
    for layer in hidden:
        assert len(layer) >= n_relevant
        # Round-robin tiling of the relevant motif.
        motif = degrees_in[degrees_in < degrees_out.max()]
        np.testing.assert_array_equal(
            layer, np.resize(motif, len(layer)))


def test_hidden_degrees_prune_irrelevant_inputs():
    """Inputs with degree >= max output degree never enter the motif."""
    # Outputs mask strictly-less, so inputs with degree >= max(degrees_out)
    # (here 2 and 5) cannot influence any output and are pruned from the
    # hidden motif (reference made.py:390,410).
    degrees_in = np.array([0, 1, 2, 5, 5])
    degrees_out = np.array([0, 1, 2])
    hidden = MADE._get_degrees_hidden(degrees_in, degrees_out, [4])
    np.testing.assert_array_equal(hidden[0], [0, 1, 0, 1])


def test_hidden_degrees_width_list():
    degrees_in = np.array([0, 1, 2])
    degrees_out = np.array([0, 1, 2, 0, 1, 2])
    hidden = MADE._get_degrees_hidden(degrees_in, degrees_out, [5, 7])
    assert [len(h) for h in hidden] == [5, 7]


def test_hidden_degrees_explicit():
    degrees_in = np.array([0, 1, 2])
    degrees_out = np.array([0, 1, 2])
    explicit = [np.array([0, 0, 1, 1]), np.array([1, 0, 1])]
    hidden = MADE._get_degrees_hidden(degrees_in, degrees_out, explicit)
    for got, want in zip(hidden, explicit):
        np.testing.assert_array_equal(got, want)


def test_error_too_narrow_hidden_layer():
    degrees_in = np.arange(6)
    degrees_out = np.arange(6)
    with pytest.raises(ValueError, match='too small'):
        MADE._get_degrees_hidden(degrees_in, degrees_out, [3])


def test_error_ignored_hidden_degree():
    """Hidden nodes with degree >= max output degree can never feed the
    output layer (strictly-less masking) — constructing one is an error."""
    degrees_in = np.arange(3)
    degrees_out = np.arange(3)
    with pytest.raises(ValueError, match='ignored'):
        MADE._get_degrees_hidden(degrees_in, degrees_out,
                                 [np.array([0, 1, 2])])


# =============================================================================
# MADE network
# =============================================================================

def _make_made(key=0, n_in=5, reps_out=3, hidden_layers=2,
               conditioning_indices=None, weight_norm=True):
    degrees_in = generate_degrees(
        n_in, conditioning_indices=conditioning_indices)
    noncond = degrees_in[degrees_in >= 0]
    degrees_out = np.tile(noncond, reps_out)
    made = MADE.create(jax.random.key(key), degrees_in, degrees_out,
                       hidden_layers=hidden_layers, weight_norm=weight_norm)
    return made, degrees_in, degrees_out


def test_made_layer_dimensions():
    made, degrees_in, degrees_out = _make_made(n_in=6, reps_out=2,
                                               hidden_layers=3)
    assert made.dimension_in == 6
    assert made.dimension_out == 12
    assert len(made.dimensions_hidden) == 3
    n_relevant = int((degrees_in < degrees_out.max()).sum())
    for width in made.dimensions_hidden:
        assert width >= n_relevant


@pytest.mark.parametrize('conditioning_indices', [None, [0, 3]])
@pytest.mark.parametrize('weight_norm', [True, False])
def test_made_autoregressive_property(conditioning_indices, weight_norm):
    """Output of degree d depends only on inputs of degree < d (and on all
    conditioning inputs), checked via the Jacobian of the conditioner."""
    made, degrees_in, degrees_out = _make_made(
        n_in=6, reps_out=2, conditioning_indices=conditioning_indices,
        weight_norm=weight_norm)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(6,)))
    jac = jax.jacfwd(lambda v: made(v[None])[0])(x)  # (n_out, n_in)
    for out_idx, d_out in enumerate(degrees_out):
        for in_idx, d_in in enumerate(degrees_in):
            # -1 (conditioning) inputs may influence everything.
            if d_in >= d_out and d_in != -1:
                assert jac[out_idx, in_idx] == 0.0, (
                    f'output {out_idx} (deg {d_out}) depends on input '
                    f'{in_idx} (deg {d_in})')


def test_made_set_output_constant():
    made, _, degrees_out = _make_made()
    target = jnp.asarray(np.linspace(-1.0, 1.0, len(degrees_out)))
    made = made.set_output(target)
    rng = np.random.default_rng(1)
    for _ in range(3):
        x = jnp.asarray(rng.normal(size=(2, 5)))
        np.testing.assert_allclose(np.asarray(made(x)),
                                   np.tile(np.asarray(target), (2, 1)),
                                   atol=1e-12)


def test_made_n_parameters_counts_masked_out():
    """n_parameters counts only learnable entries (masked weights are not
    learnable), so it is below the dense count."""
    made, _, _ = _make_made(weight_norm=False)
    dense = sum(l.in_features * l.out_features + l.out_features
                for l in made.layers)
    assert 0 < made.n_parameters() < dense
