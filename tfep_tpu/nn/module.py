"""Minimal pytree-module core for TPU-native flows.

This is the foundation of the framework's neural-network layer: modules are
immutable dataclasses registered as JAX pytrees, so the whole model is a pytree
of arrays that composes directly with ``jax.jit``/``jax.grad``/``jax.vmap`` and
``pjit`` sharding. Design goals (vs the reference's ``torch.nn.Module`` tree,
cf. /root/reference/tfep/nn/flows/sequential.py:24):

- A module instance *is* its parameters: no mutable state, no ``apply`` scope.
  Gradients come back as a module-shaped pytree.
- Three kinds of fields:
    * parameter fields (default): inexact (float/complex) array leaves, trained;
    * ``buffer()`` fields: array leaves excluded from differentiation (index
      tables, masks, constant domains) — the analogue of torch buffers;
    * ``static()`` fields: hashable Python config, part of the treedef, so jit
      re-traces when they change.
- ``partition``/``combine`` split a module into (trainable, frozen) pytrees so
  optimizers only see trainable leaves, mirroring equinox's filtering approach.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, TypeVar

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    'Module', 'module', 'static', 'buffer', 'is_trainable_array',
    'partition', 'combine', 'tree_replace', 'filter_value_and_grad',
    'apply_updates', 'n_parameters',
]

T = TypeVar('T')

_STATIC_KEY = 'tfep_static'
_BUFFER_KEY = 'tfep_buffer'


def static(**kwargs) -> dataclasses.Field:
    """Declare a static (non-pytree, hashable config) dataclass field."""
    metadata = dict(kwargs.pop('metadata', {}))
    metadata[_STATIC_KEY] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def buffer(**kwargs) -> dataclasses.Field:
    """Declare a non-trainable array field (pytree leaf excluded from grads)."""
    metadata = dict(kwargs.pop('metadata', {}))
    metadata[_BUFFER_KEY] = True
    return dataclasses.field(metadata=metadata, **kwargs)


class _HashableArrayWrapper:
    """Hashable wrapper so numpy arrays can live in static fields if needed."""

    __slots__ = ('value',)

    def __init__(self, value):
        self.value = value

    def __hash__(self):
        return hash((self.value.shape, self.value.dtype, self.value.tobytes()))

    def __eq__(self, other):
        return (
            isinstance(other, _HashableArrayWrapper)
            and self.value.shape == other.value.shape
            and self.value.dtype == other.value.dtype
            and bool(np.all(self.value == other.value))
        )


def _flatten_module(obj):
    cls = type(obj)
    dynamic_names = cls.__tfep_dynamic_fields__
    static_names = cls.__tfep_static_fields__
    children = tuple(getattr(obj, name) for name in dynamic_names)
    aux = tuple(_wrap_static(getattr(obj, name)) for name in static_names)
    return children, aux


def _flatten_module_with_keys(obj):
    cls = type(obj)
    dynamic_names = cls.__tfep_dynamic_fields__
    static_names = cls.__tfep_static_fields__
    children = tuple(
        (jax.tree_util.GetAttrKey(name), getattr(obj, name))
        for name in dynamic_names
    )
    aux = tuple(_wrap_static(getattr(obj, name)) for name in static_names)
    return children, aux


def _wrap_static(value):
    if isinstance(value, np.ndarray):
        return _HashableArrayWrapper(value)
    if isinstance(value, list):
        return tuple(_wrap_static(v) for v in value)
    return value


def _unwrap_static(value):
    if isinstance(value, _HashableArrayWrapper):
        return value.value
    return value


def _unflatten_module(cls, aux, children):
    obj = object.__new__(cls)
    for name, value in zip(cls.__tfep_dynamic_fields__, children):
        object.__setattr__(obj, name, value)
    for name, value in zip(cls.__tfep_static_fields__, aux):
        object.__setattr__(obj, name, _unwrap_static(value))
    return obj


class _ModuleMeta(type):
    """Metaclass that dataclass-ifies and pytree-registers every subclass."""

    def __new__(mcs, name, bases, namespace, **kwargs):
        cls = super().__new__(mcs, name, bases, namespace, **kwargs)
        # Make it a frozen dataclass (fields from annotations).
        cls = dataclasses.dataclass(frozen=True, eq=False, repr=False)(cls)

        dynamic_fields, static_fields, buffer_fields = [], [], []
        for f in dataclasses.fields(cls):
            if f.metadata.get(_STATIC_KEY):
                static_fields.append(f.name)
            else:
                dynamic_fields.append(f.name)
                if f.metadata.get(_BUFFER_KEY):
                    buffer_fields.append(f.name)
        cls.__tfep_dynamic_fields__ = tuple(dynamic_fields)
        cls.__tfep_static_fields__ = tuple(static_fields)
        cls.__tfep_buffer_fields__ = tuple(buffer_fields)

        jax.tree_util.register_pytree_with_keys(
            cls,
            _flatten_module_with_keys,
            flatten_func=_flatten_module,
            unflatten_func=lambda aux, children: _unflatten_module(cls, aux, children),
        )
        return cls


class Module(metaclass=_ModuleMeta):
    """Base class for all pytree modules.

    Subclassing automatically (a) freezes the class as an immutable
    dataclass whose fields come from the annotations, and (b) registers it
    as a JAX pytree, so instances flow through
    ``jit``/``grad``/``vmap``/``pjit`` directly. Field kinds:

    - plain annotated fields: pytree children; inexact arrays among them
      are the *trainable parameters* seen by :func:`partition`;
    - ``buffer()`` fields: pytree children excluded from differentiation
      (masks, index tables, constant domains);
    - ``static()`` fields: hashable config hashed into the treedef (jit
      re-traces when they change).

    Instances are immutable — use :meth:`replace` to derive modified
    copies.
    """

    def replace(self: T, **changes) -> T:
        """Return a copy of the module with the given fields replaced."""
        return dataclasses.replace(self, **changes)

    def __repr__(self):
        cls = type(self)
        parts = []
        for f in dataclasses.fields(cls):
            v = getattr(self, f.name)
            if isinstance(v, (jnp.ndarray, np.ndarray)):
                parts.append(f'{f.name}=Array{tuple(v.shape)}:{v.dtype}')
            else:
                parts.append(f'{f.name}={v!r}')
        return f'{cls.__name__}({", ".join(parts)})'


# Convenience alias so subclasses can be declared with a decorator-free style.
module = Module


def is_trainable_array(x) -> bool:
    """True for inexact (float/complex) array leaves — the trainable ones."""
    return isinstance(x, (jax.Array, np.ndarray)) and jnp.issubdtype(
        jnp.result_type(x), jnp.inexact
    )


def _partition_node(node, in_buffer):
    """Recursively split ``node`` into (trainable, frozen) twins."""
    if isinstance(node, Module):
        cls = type(node)
        t_children, f_children = [], []
        for fname in cls.__tfep_dynamic_fields__:
            child = getattr(node, fname)
            buf = in_buffer or fname in cls.__tfep_buffer_fields__
            t, f = _partition_node(child, buf)
            t_children.append(t)
            f_children.append(f)
        aux = tuple(
            _wrap_static(getattr(node, n)) for n in cls.__tfep_static_fields__
        )
        return (
            _unflatten_module(cls, aux, tuple(t_children)),
            _unflatten_module(cls, aux, tuple(f_children)),
        )

    is_module = lambda x: isinstance(x, Module)

    def split(leaf):
        if isinstance(leaf, Module):
            return _partition_node(leaf, in_buffer)
        if not in_buffer and is_trainable_array(leaf):
            return (leaf, None)
        return (None, leaf)

    trainable = jax.tree_util.tree_map(
        lambda l: split(l)[0], node, is_leaf=is_module
    )
    frozen = jax.tree_util.tree_map(
        lambda l: split(l)[1], node, is_leaf=is_module
    )
    return trainable, frozen


def partition(tree):
    """Split ``tree`` into (trainable, frozen) with None at the other's slots."""
    return _partition_node(tree, False)


def combine(trainable, frozen):
    """Inverse of :func:`partition`: merge the twin pytrees back.

    Each leaf position takes the trainable leaf if present, else the
    frozen one; the result is structurally identical to the original
    module tree.
    """
    t_leaves, treedef = jax.tree_util.tree_flatten(
        trainable, is_leaf=lambda x: x is None
    )
    f_leaves = jax.tree_util.tree_flatten(frozen, is_leaf=lambda x: x is None)[0]
    leaves = [t if t is not None else f for t, f in zip(t_leaves, f_leaves)]
    return treedef.unflatten(leaves)


def tree_replace(module_tree: T, fn: Callable[[Any], Any]) -> T:
    """Map ``fn`` over trainable leaves only, keeping buffers/statics intact.

    Useful for dtype casts or parameter re-initialization that must not
    touch index buffers, e.g. ``tree_replace(flow, lambda p: p * 0)``.
    """
    trainable, frozen = partition(module_tree)
    trainable = jax.tree_util.tree_map(fn, trainable)
    return combine(trainable, frozen)


def filter_value_and_grad(fn: Callable, has_aux: bool = False) -> Callable:
    """``jax.value_and_grad`` differentiating only trainable leaves of arg 0.

    The returned gradient is a module-shaped pytree with ``None`` at
    buffer/non-inexact leaves (ready for ``optax`` with masked transforms or
    :func:`apply_updates`).
    """

    def wrapped(module_tree, *args, **kwargs):
        trainable, frozen = partition(module_tree)

        def inner(trainable_):
            return fn(combine(trainable_, frozen), *args, **kwargs)

        return jax.value_and_grad(inner, has_aux=has_aux)(trainable)

    return wrapped


def apply_updates(module_tree: T, updates) -> T:
    """Apply optax-style updates (None where frozen) to a module pytree.

    ``updates`` must be the gradient-shaped pytree produced by
    :func:`filter_value_and_grad` after an ``optimizer.update`` call; each
    trainable leaf becomes ``param + update`` and every other leaf is kept.
    """
    leaves, treedef = jax.tree_util.tree_flatten(
        updates, is_leaf=lambda x: x is None
    )
    m_leaves = jax.tree_util.tree_flatten(
        module_tree, is_leaf=lambda x: x is None
    )[0]
    new_leaves = [
        m if u is None else m + u for m, u in zip(m_leaves, leaves)
    ]
    return treedef.unflatten(new_leaves)


def n_parameters(module_tree) -> int:
    """Total number of trainable scalar parameters."""
    trainable, _ = partition(module_tree)
    return sum(
        leaf.size
        for leaf in jax.tree_util.tree_leaves(trainable)
        if leaf is not None
    )
