"""Tests for the pytree-module core."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tfep_tpu.nn.module import (
    Module, buffer, static, partition, combine, filter_value_and_grad,
    apply_updates, n_parameters,
)


class Inner(Module):
    w: jnp.ndarray
    idx: jnp.ndarray = buffer()


class Outer(Module):
    inner: Inner
    b: jnp.ndarray
    name: str = static(default='outer')


def make_outer():
    return Outer(
        inner=Inner(w=jnp.ones((3, 2)), idx=jnp.arange(3)),
        b=jnp.zeros(3),
    )


def test_pytree_roundtrip():
    m = make_outer()
    leaves, treedef = jax.tree_util.tree_flatten(m)
    m2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(m2, Outer)
    assert m2.name == 'outer'
    np.testing.assert_array_equal(m2.inner.w, m.inner.w)


def test_partition_combine():
    m = make_outer()
    trainable, frozen = partition(m)
    # Buffers and int arrays are frozen.
    assert trainable.inner.idx is None
    assert frozen.inner.w is None
    assert trainable.inner.w is not None
    m2 = combine(trainable, frozen)
    np.testing.assert_array_equal(m2.inner.idx, m.inner.idx)
    np.testing.assert_array_equal(m2.inner.w, m.inner.w)


def test_filter_grad_and_updates():
    m = make_outer()

    def loss(mod, x):
        return jnp.sum((x @ mod.inner.w + mod.b[None, :2].T @ jnp.ones((2,)))**2)

    def simple_loss(mod):
        return jnp.sum(mod.inner.w ** 2) + jnp.sum(mod.b ** 2)

    value, grads = filter_value_and_grad(simple_loss)(m)
    assert grads.inner.idx is None
    np.testing.assert_allclose(np.asarray(grads.inner.w), 2 * np.ones((3, 2)))

    # Optax end-to-end on the partitioned params.
    trainable, _ = partition(m)
    opt = optax.sgd(0.1)
    state = opt.init(trainable)
    updates, state = opt.update(grads, state, trainable)
    m2 = apply_updates(m, updates)
    np.testing.assert_array_equal(m2.inner.idx, m.inner.idx)  # untouched
    np.testing.assert_allclose(np.asarray(m2.inner.w),
                               np.asarray(m.inner.w) - 0.2)


def test_n_parameters():
    m = make_outer()
    assert n_parameters(m) == 6 + 3


def test_jit_static_field():
    m = make_outer()

    @jax.jit
    def f(mod, x):
        return x @ mod.inner.w

    out = f(m, jnp.ones((4, 3)))
    assert out.shape == (4, 2)


def test_buffer_nested_module_frozen():
    class Holder(Module):
        sub: Inner = buffer()

    h = Holder(sub=Inner(w=jnp.ones(2), idx=jnp.arange(2)))
    trainable, frozen = partition(h)
    assert trainable.sub.w is None  # everything under a buffer field frozen
    assert frozen.sub.w is not None
