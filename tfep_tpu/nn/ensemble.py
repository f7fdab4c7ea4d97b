"""Vmapped ensembles: train K independent flows simultaneously on one chip.

TFEP training is typically engine-bound: the realistic batch size is set by
how many potential evaluations the QM/MM engine can deliver per step (tens
to a few hundred frames), which leaves the accelerator far below
saturation — the flagship spline-MAF step reaches ~76% of f32 peak at
batch 4096 but a small fraction of it at batch 256. Stacking K
structurally identical flows (independent seeds, or replicas for a
hyperparameter sweep / map-uncertainty estimate) and ``jax.vmap``-ing the
training step over the member axis fills that headroom: XLA fuses the K
members' (identical-shape) matmuls into batched ones, so K members cost
far less than K sequential runs at engine-bound sizes.

This has no reference equivalent (the reference trains one torch module
per process, /root/reference/tfep/app/base.py:780-840); it is a TPU-native
capability that falls out of flows being pure pytree functions.

Design: a "stacked" module is an ordinary module pytree whose *trainable*
leaves carry a leading member axis K while buffers and statics stay
shared (members are structurally identical by construction — same
topology, same degree tables — only their parameters differ). Because it
is a normal pytree, ``optax`` states built per member
(:func:`ensemble_init`) carry the member axis on every leaf, the update
is vmapped over members (so even whole-tree transforms like
``clip_by_global_norm`` see one member at a time), and the whole
ensemble checkpoints exactly like a single flow.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from tfep_tpu.nn.module import combine, partition

__all__ = ['stack_modules', 'unstack_module', 'n_members', 'ensemble_map',
           'ensemble_init', 'make_ensemble_train_step']


def _check_same_structure(treedefs):
    first = treedefs[0]
    for i, td in enumerate(treedefs[1:], start=1):
        if td != first:
            raise ValueError(
                f'Member 0 and member {i} have different pytree '
                f'structures — ensemble members must be built with the '
                f'same constructor arguments (only parameter values may '
                f'differ).')


def stack_modules(modules: Sequence[Any]):
    """Stack K structurally identical modules into one ensemble pytree.

    Trainable leaves gain a leading member axis K (``jnp.stack``); buffers
    and static fields are taken from the first member (they encode
    structure — index tables, degree groups, spline domains — and must be
    identical across members, which is asserted for array buffers).

    Parameters
    ----------
    modules : sequence of Module
        K >= 1 modules built with the same constructor arguments but
        (typically) different random seeds.

    Returns
    -------
    Module
        A module pytree of the same type; not directly callable — use
        :func:`ensemble_map` / :func:`make_ensemble_train_step` to apply
        or train it, and :func:`unstack_module` to extract members.
    """
    modules = list(modules)
    if not modules:
        raise ValueError('Need at least one module to stack.')
    parts = [partition(m) for m in modules]
    t_flat = [jax.tree_util.tree_flatten(t, is_leaf=lambda x: x is None)
              for t, _ in parts]
    _check_same_structure([td for _, td in t_flat])
    f_flat = [jax.tree_util.tree_flatten(f, is_leaf=lambda x: x is None)
              for _, f in parts]
    # Buffers must agree: they encode the (shared) structure. NaN entries
    # (e.g. padded/sentinel values) count as equal when aligned — an
    # elementwise == would reject structurally identical members.
    import numpy as np

    for i, (leaves, _) in enumerate(f_flat[1:], start=1):
        for l0, li in zip(f_flat[0][0], leaves):
            if l0 is None and li is None:
                continue
            if l0 is not None and li is not None:
                a, b = np.asarray(l0), np.asarray(li)
                equal_nan = (a.dtype.kind == 'f' and b.dtype.kind == 'f')
                same = np.array_equal(a, b, equal_nan=equal_nan)
            else:
                same = False
            if not same:
                raise ValueError(
                    f'Member 0 and member {i} differ in a buffer '
                    f'(non-trainable) leaf — ensemble members must share '
                    f'structure; only trainable parameters may differ.')
    stacked_leaves = [
        None if leaves_0 is None else jnp.stack(
            [f[0][i] for f in t_flat])
        for i, leaves_0 in enumerate(t_flat[0][0])
    ]
    stacked_t = t_flat[0][1].unflatten(stacked_leaves)
    return combine(stacked_t, parts[0][1])


def n_members(stacked) -> int:
    """Member count K of a stacked ensemble (0-th axis of any leaf)."""
    trainable, _ = partition(stacked)
    for leaf in jax.tree_util.tree_leaves(trainable):
        if leaf is not None:
            return int(leaf.shape[0])
    raise ValueError('The ensemble has no trainable leaves.')


def unstack_module(stacked, member: Optional[int] = None):
    """Extract one member (or, with ``member=None``, the list of all K)."""
    trainable, frozen = partition(stacked)
    if member is not None:
        t = jax.tree_util.tree_map(lambda l: l[member], trainable)
        return combine(t, frozen)
    return [combine(jax.tree_util.tree_map(lambda l: l[k], trainable),
                    frozen)
            for k in range(n_members(stacked))]


def ensemble_map(fn: Callable, stacked, *args, member_axes=None):
    """``jax.vmap`` of ``fn(member, *args)`` over the member axis.

    Parameters
    ----------
    fn : callable
        Function of a single (unstacked) module and ``*args``.
    stacked : Module
        Ensemble built by :func:`stack_modules`.
    *args
        Extra arguments. By default they are shared (broadcast) across
        members; pass ``member_axes`` to map some of them per-member.
    member_axes : sequence of int or None, optional
        ``in_axes`` for ``*args`` (default: all ``None`` = shared). Use
        ``0`` for arguments carrying a leading member axis, e.g.
        per-member batches.

    Returns
    -------
    Whatever ``fn`` returns, with a leading member axis K.
    """
    trainable, frozen = partition(stacked)
    if member_axes is None:
        member_axes = tuple(None for _ in args)

    def inner(t, *a):
        return fn(combine(t, frozen), *a)

    return jax.vmap(inner, in_axes=(0,) + tuple(member_axes))(
        trainable, *args)


def ensemble_init(optimizer, stacked):
    """Per-member optimizer state for a stacked ensemble.

    ``jax.vmap`` of ``optimizer.init`` over the member axis, so EVERY
    state leaf — including scalars like step counts and any
    non-elementwise bookkeeping (factored second moments, clipping
    statistics) — carries a leading member axis. This is what keeps
    :func:`make_ensemble_train_step` exactly equal to K separate
    single-model runs for arbitrary optax transforms; a plain
    ``optimizer.init(partition(stacked)[0])`` would share the scalar
    state across members and let whole-tree reductions (e.g.
    ``clip_by_global_norm``) couple them.
    """
    trainable, _ = partition(stacked)
    return jax.vmap(optimizer.init)(trainable)


def make_ensemble_train_step(loss_fn: Callable, optimizer,
                             share_batch: bool = True,
                             has_aux: bool = False) -> Callable:
    """Build a jittable per-member training step for a stacked ensemble.

    Parameters
    ----------
    loss_fn : callable
        ``loss_fn(member, batch) -> loss`` (or ``(loss, aux)`` with
        ``has_aux=True``) for a single module — e.g. a closure over
        ``tfep_map.training_step_fn``.
    optimizer : optax.GradientTransformation
        Shared optimizer definition; build its state with
        :func:`ensemble_init` (NOT a plain ``optimizer.init``) so every
        state leaf carries the member axis. The update itself is vmapped
        over members, so whole-tree transforms (``clip_by_global_norm``,
        LAMB/LARS trust ratios, adafactor's factored moments) see one
        member at a time, exactly as in K separate runs.
    share_batch : bool, optional
        If ``True`` (default) every member sees the same batch (seed
        ensembles); if ``False``, ``batch`` must carry a leading member
        axis (bootstrap / data-split ensembles).
    has_aux : bool, optional
        Whether ``loss_fn`` returns ``(loss, aux)``.

    Returns
    -------
    callable
        ``step(stacked, opt_state, batch) -> (stacked, opt_state,
        losses)`` (plus ``aux`` with ``has_aux=True``), where ``losses``
        has shape ``(K,)``. Each member's update is independent — the
        step is numerically the K separate single-model steps, batched.
    """

    def step(stacked, opt_state, batch):
        trainable, frozen = partition(stacked)

        def member_loss(t, b):
            return loss_fn(combine(t, frozen), b)

        grad_fn = jax.vmap(
            jax.value_and_grad(member_loss, has_aux=has_aux),
            in_axes=(0, None if share_batch else 0))
        values, grads = grad_fn(trainable, batch)
        updates, new_opt_state = jax.vmap(optimizer.update)(
            grads, opt_state, trainable)
        new_trainable = jax.tree_util.tree_map(
            lambda p, u: p + u, trainable, updates)
        new_stacked = combine(new_trainable, frozen)
        if has_aux:
            losses, aux = values
            return new_stacked, new_opt_state, losses, aux
        return new_stacked, new_opt_state, values

    return step
