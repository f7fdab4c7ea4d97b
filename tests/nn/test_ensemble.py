"""Vmapped-ensemble tests: the stacked K-member training step must be
numerically the K separate single-model steps, batched (tfep_tpu.nn.ensemble
has no reference equivalent — the reference trains one torch module per
process, /root/reference/tfep/app/base.py:780-840)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tfep_tpu.nn import (
    ensemble_init, ensemble_map, make_ensemble_train_step, n_members,
    stack_modules, unstack_module,
)
from tfep_tpu.nn.conditioners.made import generate_degrees
from tfep_tpu.nn.flows import MAF
from tfep_tpu.nn.module import (
    apply_updates, filter_value_and_grad, partition,
)
from tfep_tpu.nn.transformers.spline import NeuralSplineTransformer

K = 3
N_FEATURES = 6
BATCH = 4


def build_members(k=K, transformer=None):
    return [
        MAF.create(jax.random.key(i), generate_degrees(N_FEATURES),
                   transformer=transformer, initialize_identity=False)
        for i in range(k)
    ]


def single_loss(flow, x):
    y, ldj = flow.forward(x)
    return jnp.mean(0.5 * jnp.sum(y ** 2, axis=-1) - ldj)


def test_stack_unstack_round_trip():
    members = build_members()
    stacked = stack_modules(members)
    assert n_members(stacked) == K
    for k, m in enumerate(unstack_module(stacked)):
        for a, b in zip(jax.tree_util.tree_leaves(m),
                        jax.tree_util.tree_leaves(members[k])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stack_requires_same_structure():
    a = MAF.create(jax.random.key(0), generate_degrees(N_FEATURES),
                   hidden_layers=[32])
    b = MAF.create(jax.random.key(1), generate_degrees(N_FEATURES),
                   hidden_layers=[32, 32])
    with pytest.raises(ValueError, match='different pytree structures'):
        stack_modules([a, b])

    # Same structure but different widths: the masks (buffers) differ.
    c = MAF.create(jax.random.key(2), generate_degrees(N_FEATURES),
                   hidden_layers=[16, 16])
    d = MAF.create(jax.random.key(3), generate_degrees(N_FEATURES),
                   hidden_layers=[32, 32])
    with pytest.raises(ValueError, match='buffer'):
        stack_modules([c, d])


def test_stack_requires_same_buffers():
    spline_a = NeuralSplineTransformer.create(
        x0=-4.0 * jnp.ones(N_FEATURES), xf=4.0 * jnp.ones(N_FEATURES),
        n_bins=4)
    spline_b = NeuralSplineTransformer.create(
        x0=-2.0 * jnp.ones(N_FEATURES), xf=2.0 * jnp.ones(N_FEATURES),
        n_bins=4)
    a = MAF.create(jax.random.key(0), generate_degrees(N_FEATURES),
                   transformer=spline_a)
    b = MAF.create(jax.random.key(1), generate_degrees(N_FEATURES),
                   transformer=spline_b)
    with pytest.raises(ValueError, match='buffer'):
        stack_modules([a, b])


def test_ensemble_map_matches_members():
    members = build_members()
    stacked = stack_modules(members)
    x = jax.random.normal(jax.random.key(10), (BATCH, N_FEATURES))
    ys, ldjs = ensemble_map(lambda m, x: m.forward(x), stacked, x)
    assert ys.shape == (K, BATCH, N_FEATURES)
    for k, m in enumerate(members):
        y_ref, ldj_ref = m.forward(x)
        np.testing.assert_allclose(np.asarray(ys[k]), np.asarray(y_ref),
                                   rtol=1e-6, atol=1e-12)
        np.testing.assert_allclose(np.asarray(ldjs[k]), np.asarray(ldj_ref),
                                   rtol=1e-6, atol=1e-12)


def test_ensemble_map_per_member_args():
    members = build_members()
    stacked = stack_modules(members)
    xs = jax.random.normal(jax.random.key(11), (K, BATCH, N_FEATURES))
    ys, _ = ensemble_map(lambda m, x: m.forward(x), stacked, xs,
                         member_axes=(0,))
    for k, m in enumerate(members):
        np.testing.assert_allclose(np.asarray(ys[k]),
                                   np.asarray(m.forward(xs[k])[0]),
                                   rtol=1e-6, atol=1e-12)


@pytest.mark.parametrize('share_batch', [True, False])
def test_ensemble_training_matches_separate_runs(share_batch):
    """The vmapped step == K independent single-model steps, for several
    steps, including the optax (AdamW) moments carried along."""
    members = build_members()
    stacked = stack_modules(members)
    optimizer = optax.adamw(1e-2)
    step = jax.jit(make_ensemble_train_step(single_loss, optimizer,
                                            share_batch=share_batch))

    opt_state = ensemble_init(optimizer, stacked)
    if share_batch:
        batches = [jax.random.normal(jax.random.key(20 + s),
                                     (BATCH, N_FEATURES))
                   for s in range(3)]
    else:
        batches = [jax.random.normal(jax.random.key(20 + s),
                                     (K, BATCH, N_FEATURES))
                   for s in range(3)]

    # Reference: each member trained separately.
    ref_flows = list(members)
    ref_states = []
    for m in ref_flows:
        t, _ = partition(m)
        ref_states.append(optimizer.init(t))
    ref_losses = []
    for b in batches:
        losses_s = []
        for k in range(K):
            bk = b if share_batch else b[k]
            (loss), grads = filter_value_and_grad(
                lambda f: single_loss(f, bk))(ref_flows[k])
            t, _ = partition(ref_flows[k])
            updates, ref_states[k] = optimizer.update(
                grads, ref_states[k], t)
            ref_flows[k] = apply_updates(ref_flows[k], updates)
            losses_s.append(float(loss))
        ref_losses.append(losses_s)

    # Vmapped ensemble.
    ens_losses = []
    for b in batches:
        stacked, opt_state, losses = step(stacked, opt_state, b)
        ens_losses.append(np.asarray(losses))

    np.testing.assert_allclose(np.asarray(ens_losses),
                               np.asarray(ref_losses), rtol=1e-9)
    for k, m in enumerate(unstack_module(stacked)):
        for a, b in zip(jax.tree_util.tree_leaves(partition(m)[0]),
                        jax.tree_util.tree_leaves(partition(ref_flows[k])[0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-8, atol=1e-12)


def test_ensemble_checkpoint_roundtrip(tmp_path):
    """A stacked ensemble is an ordinary pytree: its trainable leaves
    save/restore like a single flow's."""
    stacked = stack_modules(build_members())
    trainable, frozen = partition(stacked)
    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(trainable)]
    np.savez(tmp_path / 'ens.npz', *leaves)
    loaded = [jnp.asarray(v) for _, v in
              sorted(np.load(tmp_path / 'ens.npz').items(),
                     key=lambda kv: int(kv[0].split('_')[1]))]
    from tfep_tpu.nn.module import combine
    _, treedef = jax.tree_util.tree_flatten(trainable)
    restored_stacked = combine(treedef.unflatten(loaded), frozen)
    x = jax.random.normal(jax.random.key(30), (BATCH, N_FEATURES))
    y0, _ = ensemble_map(lambda m, x: m.forward(x), stacked, x)
    y1, _ = ensemble_map(lambda m, x: m.forward(x), restored_stacked, x)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_sharded_ensemble_matches_unsharded():
    """8 members sharded over the 8-device mesh (member axis = 'dp') must
    train exactly like the unsharded ensemble — members are independent,
    so the partitioning is communication-free and cannot change the math."""
    from tfep_tpu.parallel.sharding import make_mesh, shard_ensemble

    k = 8
    members = build_members(k)
    stacked = stack_modules(members)
    optimizer = optax.adamw(1e-2)
    step = jax.jit(make_ensemble_train_step(single_loss, optimizer))

    batches = [jax.random.normal(jax.random.key(40 + s),
                                 (BATCH, N_FEATURES)) for s in range(2)]

    # Unsharded run.
    opt_state = ensemble_init(optimizer, stacked)
    ref, ref_opt = stacked, opt_state
    ref_losses = []
    for b in batches:
        ref, ref_opt, losses = step(ref, ref_opt, b)
        ref_losses.append(np.asarray(losses))

    # Member-axis-sharded run.
    mesh = make_mesh(8)
    sharded = shard_ensemble(stacked, mesh)
    t_s, _ = partition(sharded)
    leaf = jax.tree_util.tree_leaves(t_s)[0]
    assert len(leaf.sharding.device_set) == 8
    opt_s = ensemble_init(optimizer, sharded)
    sh_losses = []
    for b in batches:
        sharded, opt_s, losses = step(sharded, opt_s, b)
        sh_losses.append(np.asarray(losses))

    np.testing.assert_allclose(np.asarray(sh_losses),
                               np.asarray(ref_losses), rtol=1e-12)
    # Leaf-scale-relative comparison: GSPMD may reorder the per-shard
    # reductions, and AdamW's 1/sqrt(v) amplifies that f64 noise on
    # near-zero entries (measured ~5e-11); a wrong sharding (a missing
    # or spurious collective) is an O(1) relative error.
    for a, b in zip(jax.tree_util.tree_leaves(partition(sharded)[0]),
                    jax.tree_util.tree_leaves(partition(ref)[0])):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.max(np.abs(b))), 1e-12)
        assert float(np.max(np.abs(a - b))) / scale < 1e-8
    # The updated parameters kept the member-axis sharding.
    out_leaf = jax.tree_util.tree_leaves(partition(sharded)[0])[0]
    assert len(out_leaf.sharding.device_set) == 8


def test_shard_ensemble_rejects_uneven_members():
    from tfep_tpu.parallel.sharding import make_mesh, shard_ensemble

    stacked = stack_modules(build_members(3))
    with pytest.raises(ValueError, match='divisible'):
        shard_ensemble(stacked, make_mesh(8))


def test_ensemble_matches_separate_runs_with_global_norm_clipping():
    """Whole-tree optax transforms must see one member at a time: with
    clip_by_global_norm, a shared update over the stacked tree would let
    the largest member's gradient norm over-clip the others (regression:
    the update is vmapped over members and the state is built per member
    by ensemble_init)."""
    members = build_members()
    stacked = stack_modules(members)
    optimizer = optax.chain(optax.clip_by_global_norm(0.01),
                            optax.sgd(1e-2))
    step = jax.jit(make_ensemble_train_step(single_loss, optimizer))
    opt_state = ensemble_init(optimizer, stacked)

    batches = [jax.random.normal(jax.random.key(50 + s),
                                 (BATCH, N_FEATURES)) for s in range(2)]

    ref_flows = list(members)
    ref_states = []
    for m in ref_flows:
        t, _ = partition(m)
        ref_states.append(optimizer.init(t))
    for b in batches:
        for k in range(K):
            _, grads = filter_value_and_grad(
                lambda f: single_loss(f, b))(ref_flows[k])
            t, _ = partition(ref_flows[k])
            updates, ref_states[k] = optimizer.update(
                grads, ref_states[k], t)
            ref_flows[k] = apply_updates(ref_flows[k], updates)

    for b in batches:
        stacked, opt_state, _ = step(stacked, opt_state, b)

    for k, m in enumerate(unstack_module(stacked)):
        for a, b in zip(jax.tree_util.tree_leaves(partition(m)[0]),
                        jax.tree_util.tree_leaves(partition(ref_flows[k])[0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9, atol=1e-13)


def test_shard_ensemble_rejects_unstacked_module():
    from tfep_tpu.parallel.sharding import make_mesh, shard_ensemble

    flow = build_members(1)[0]     # a plain flow, NOT a stacked ensemble
    with pytest.raises(ValueError, match='Not a stacked ensemble'):
        shard_ensemble(flow, make_mesh(8))
