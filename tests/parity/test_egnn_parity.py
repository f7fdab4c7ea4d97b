"""EGNN dynamics parity against the PyTorch reference.

The EGNN velocity field is the entire learnable content of the CNF path
(ContinuousEGNNMap); a divergence in message construction, attention,
aggregation direction, or the position-update sign would produce a valid
but different flow.  Weights are copied layer-by-layer and the fields
compared on shared ``(t, x)`` batches.  Reference:
``/root/reference/tfep/nn/dynamics/egnn.py:28-380``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refbridge import to_numpy, to_torch

from tfep_tpu.nn.dynamics import EGNNDynamics


def _copy_dense(ref_linear, our_linear):
    kwargs = {'weight': jnp.asarray(ref_linear.weight.detach().numpy())}
    if ref_linear.bias is not None:
        kwargs['bias'] = jnp.asarray(ref_linear.bias.detach().numpy())
    return our_linear.replace(**kwargs)


def _copy_mlp(ref_seq, our_mlp):
    """Copy every Linear in a torch Sequential into our _MLP."""
    ref_linears = [m for m in ref_seq if hasattr(m, 'weight')]
    assert len(ref_linears) == len(our_mlp.layers), (
        f'{len(ref_linears)} vs {len(our_mlp.layers)} layers')
    new_layers = tuple(
        _copy_dense(rl, ol) for rl, ol in zip(ref_linears, our_mlp.layers))
    return our_mlp.replace(layers=new_layers)


def _copy_gaussians(ref_emb, our_emb):
    """Copy (possibly perturbed) means/log-gammas across."""
    kwargs = {}
    means = to_numpy(ref_emb._means)
    log_gammas = to_numpy(ref_emb._log_gammas)
    if our_emb.trainable_means:
        kwargs['means_param'] = jnp.asarray(means)
    else:
        kwargs['means_buf'] = jnp.asarray(means)
    if our_emb.trainable_stds:
        kwargs['log_gammas_param'] = jnp.asarray(log_gammas)
    else:
        kwargs['log_gammas_buf'] = jnp.asarray(log_gammas)
    return our_emb.replace(**kwargs)


def _build_pair(ref, n_atoms=5, r_cutoff=50.0, n_layers=2,
                node_feat_dim=8, distance_feat_dim=6, time_feat_dim=4,
                initialize_identity=False, seed=0):
    import torch

    node_types = np.arange(n_atoms) % 3
    torch.manual_seed(seed)
    ref_dyn = ref.nn.dynamics.egnn.EGNNDynamics(
        node_types=to_torch(node_types, dtype=None), r_cutoff=r_cutoff,
        time_feat_dim=time_feat_dim, node_feat_dim=node_feat_dim,
        distance_feat_dim=distance_feat_dim, n_layers=n_layers,
        initialize_identity=initialize_identity)
    if not initialize_identity:
        gen = torch.Generator().manual_seed(200 + seed)
        with torch.no_grad():
            for p in ref_dyn.parameters():
                p.add_(0.1 * torch.randn(p.shape, generator=gen,
                                         dtype=p.dtype))

    our_dyn = EGNNDynamics.create(
        jax.random.PRNGKey(seed), node_types=node_types, r_cutoff=r_cutoff,
        time_feat_dim=time_feat_dim, node_feat_dim=node_feat_dim,
        distance_feat_dim=distance_feat_dim, n_layers=n_layers,
        initialize_identity=initialize_identity)

    # Copy: top-level time/h embeddings + each layer's four MLPs and
    # distance expansion.
    our_dyn = our_dyn.replace(
        time_embedding=_copy_gaussians(ref_dyn.time_embedding,
                                       our_dyn.time_embedding),
        h_embedding=_copy_dense(ref_dyn.h_embedding, our_dyn.h_embedding))
    new_layers = []
    for idx, our_layer in enumerate(our_dyn.graph_layers):
        ref_layer = ref_dyn._modules[f'graph_layer_{idx}']
        new_layers.append(our_layer.replace(
            distance_embedding=_copy_gaussians(
                ref_layer.distance_embedding, our_layer.distance_embedding),
            message_mlp=_copy_mlp(ref_layer.message_mlp,
                                  our_layer.message_mlp),
            attention_mlp=_copy_mlp(ref_layer.attention_mlp,
                                    our_layer.attention_mlp),
            update_x_mlp=_copy_mlp(ref_layer.update_x_mlp,
                                   our_layer.update_x_mlp),
            update_h_mlp=_copy_mlp(ref_layer.update_h_mlp,
                                   our_layer.update_h_mlp)))
    our_dyn = our_dyn.replace(graph_layers=tuple(new_layers))
    return ref_dyn, our_dyn


def _compare_fields(ref_dyn, our_dyn, n_atoms, atol=1e-10):
    import torch

    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, n_atoms * 3)) * 2.0
    for t in (0.0, 0.3, 1.0):
        with torch.no_grad():
            ref_v = to_numpy(ref_dyn(to_torch(np.asarray([t]))[0:1],
                                     to_torch(x)))
        our_v = to_numpy(our_dyn(jnp.asarray(t), jnp.asarray(x)))
        np.testing.assert_allclose(our_v, ref_v, atol=atol,
                                   err_msg=f't={t}')


def test_egnn_identity_init_parity(ref):
    """Identity init -> zero velocity field on both sides."""
    ref_dyn, our_dyn = _build_pair(ref, initialize_identity=True)
    _compare_fields(ref_dyn, our_dyn, n_atoms=5)
    x = np.random.default_rng(0).standard_normal((2, 15))
    np.testing.assert_allclose(
        to_numpy(our_dyn(jnp.asarray(0.5), jnp.asarray(x))), 0.0,
        atol=1e-12)


def test_egnn_fully_connected_parity(ref):
    """Randomized weights, cutoff large enough that every pair messages."""
    ref_dyn, our_dyn = _build_pair(ref, r_cutoff=50.0)
    _compare_fields(ref_dyn, our_dyn, n_atoms=5)


def test_egnn_cutoff_pruning_parity(ref):
    """A small cutoff exercises the edge-pruning path: the dense masked
    formulation here must match the reference's pruned edge list."""
    ref_dyn, our_dyn = _build_pair(ref, n_atoms=6, r_cutoff=2.5, seed=1)
    _compare_fields(ref_dyn, our_dyn, n_atoms=6)


def test_egnn_equivariance_both_sides(ref):
    """Both fields are rotation-equivariant and translation-invariant on
    the same weights (the property the architecture pays for)."""
    from tfep_tpu.utils.geometry import rotation_matrix_3d

    ref_dyn, our_dyn = _build_pair(ref, seed=2)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((3, 5, 3))
    rot = to_numpy(rotation_matrix_3d(np.asarray([0.7]),
                                      np.asarray([[0.0, 0.0, 1.0]])))[0]

    v = to_numpy(our_dyn(jnp.asarray(0.4),
                         jnp.asarray(x.reshape(3, -1)))).reshape(3, 5, 3)
    v_rot = to_numpy(our_dyn(
        jnp.asarray(0.4),
        jnp.asarray((x @ rot.T).reshape(3, -1)))).reshape(3, 5, 3)
    np.testing.assert_allclose(v_rot, v @ rot.T, atol=1e-9)

    v_shift = to_numpy(our_dyn(
        jnp.asarray(0.4),
        jnp.asarray((x + 7.0).reshape(3, -1)))).reshape(3, 5, 3)
    np.testing.assert_allclose(v_shift, v, atol=1e-8)
