"""Device-mesh sharding for TFEP training (GSPMD/pjit parallelism).

The scaling dimension of TFEP is trajectory frames x atoms (SURVEY §5):
there is no sequence axis, so the primary device-side strategy is frame-axis
data parallelism — batches sharded over the mesh's ``dp`` axis, parameters
replicated, with XLA inserting the ``psum`` for the loss/gradient reductions.

For large solvated systems the flow itself stops being small: a MADE
conditioner over ``D`` degrees of freedom holds O(D^2) weights per layer
(D ~ 3e4 for a 10k-atom box ⇒ ~1 GB/layer in f32), past what replication
can afford. :func:`tensor_parallel_specs` therefore adds Megatron-style
tensor parallelism over the MADE stacks: hidden layers are column-parallel
(output/hidden axis split over the ``tp`` mesh axis), the final projection
is row-parallel (input axis split), and the row-parallel matmul's partial
sums are combined by the all-reduce GSPMD derives from the output sharding.
Everything is expressed as shardings — no hand-written collectives — so it
composes with ``dp`` on a 2-D mesh and with the engine-callback pipeline.
These helpers build the mesh and shardings; the per-sample engine fan-out
(host side) composes with them by giving each host its own shard of frames.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['make_mesh', 'batch_sharding', 'replicated_sharding',
           'shard_batch', 'replicate', 'tensor_parallel_specs',
           'shard_module', 'shard_ensemble']

BATCH_AXIS = 'dp'
MODEL_AXIS = 'tp'


def make_mesh(n_devices: Optional[int] = None, axis_name: str = BATCH_AXIS,
              model_axis_size: int = 1, model_axis_name: str = MODEL_AXIS
              ) -> Mesh:
    """Device mesh over the frame (data) axis, optionally 2-D (data x model).

    With ``model_axis_size > 1`` the devices are laid out as a
    ``(n_devices / model_axis_size, model_axis_size)`` grid named
    ``(axis_name, model_axis_name)``; model-parallel groups are contiguous
    device ranges so tensor-parallel collectives ride neighboring ICI links.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if model_axis_size <= 1:
        return Mesh(np.asarray(devices), (axis_name,))
    if len(devices) % model_axis_size:
        raise ValueError(
            f'model_axis_size={model_axis_size} must divide the device '
            f'count ({len(devices)}).')
    grid = np.asarray(devices).reshape(-1, model_axis_size)
    return Mesh(grid, (axis_name, model_axis_name))


def batch_sharding(mesh: Mesh, axis_name: str = BATCH_AXIS) -> NamedSharding:
    """Sharding for per-sample arrays: leading axis split over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for parameters: fully replicated."""
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = BATCH_AXIS) -> dict:
    """Place a host batch dict onto the mesh, frames split across devices."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.device_put(batch, sharding)


def replicate(tree, mesh: Mesh):
    """Replicate a parameter pytree (e.g. the flow) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(tree, sharding)


# =============================================================================
# Tensor parallelism over MADE conditioners
# =============================================================================

def _masked_linear_specs(layer, hidden: bool, axis_name: str,
                         axis_size: Optional[int]):
    """Module-shaped PartitionSpec tree for one MaskedLinear.

    Hidden layers are column-parallel: the output (hidden-unit) axis of the
    ``(out, in)`` weight is split, so bias/gain/mask follow the same rows and
    the activations come out split over ``axis_name`` with no communication.
    The MADE output layer is row-parallel: its input axis is split to match
    the incoming split activations, each device computes a partial matmul,
    and GSPMD inserts the all-reduce implied by the replicated output spec
    (the weight-norm row norm over the split input axis reduces the same way).

    When ``axis_size`` is given and the hidden axis is not divisible by it,
    the layer stays replicated (``device_put`` cannot pad uneven shards; for
    real tensor-parallel runs pass MADE hidden widths divisible by the model
    axis, e.g. multiples of 128 x axis_size for MXU-aligned shards).
    """
    from tfep_tpu.nn.masked import MaskedLinear
    from tfep_tpu.nn.module import _unflatten_module, _wrap_static

    sharded_dim = layer.out_features if hidden else layer.in_features
    if axis_size is not None and sharded_dim % axis_size:
        specs = {'weight': P(), 'bias': P(), 'gain': P(), 'mask': P(),
                 'degrees_in': P(), 'degrees_out': P()}
    elif hidden:
        # Degree vectors follow the axis they index: rows (out) are split.
        specs = {'weight': P(axis_name, None), 'bias': P(axis_name),
                 'gain': P(axis_name, None), 'mask': P(axis_name, None),
                 'degrees_in': P(), 'degrees_out': P(axis_name)}
    else:
        specs = {'weight': P(None, axis_name), 'bias': P(),
                 'gain': P(), 'mask': P(None, axis_name),
                 'degrees_in': P(axis_name), 'degrees_out': P()}
    children = tuple(
        None if getattr(layer, name) is None else specs[name]
        for name in MaskedLinear.__tfep_dynamic_fields__)
    aux = tuple(_wrap_static(getattr(layer, name))
                for name in MaskedLinear.__tfep_static_fields__)
    return _unflatten_module(MaskedLinear, aux, children)


def tensor_parallel_specs(tree, axis_name: str = MODEL_AXIS,
                          axis_size: Optional[int] = None):
    """PartitionSpec pytree for ``tree`` sharding MADE stacks over ``axis_name``.

    Returns a pytree with the same structure as ``tree`` whose leaves are
    :class:`~jax.sharding.PartitionSpec`: MADE conditioner layers get the
    column-/row-parallel specs of :func:`_masked_linear_specs`; every other
    array (transformer parameters, buffers, pre-flow frames, ...) stays
    replicated (``P()``). Prefer :func:`shard_module`, which builds these
    specs and places the module in one step. When calling this directly,
    pass ``axis_size`` (the ``tp`` mesh-axis size): without it the
    non-divisible-width replication fallback is skipped and ``device_put``
    will reject layers whose sharded axis does not divide evenly.
    """
    from tfep_tpu.nn.conditioners.made import MADE
    from tfep_tpu.nn.module import Module, _unflatten_module, _wrap_static

    def rec(node):
        if isinstance(node, MADE):
            n_layers = len(node.layers)
            children = []
            for fname in MADE.__tfep_dynamic_fields__:
                value = getattr(node, fname)
                if fname == 'layers':
                    children.append(tuple(
                        _masked_linear_specs(l, i < n_layers - 1, axis_name,
                                             axis_size)
                        for i, l in enumerate(value)))
                else:
                    children.append(rec(value))
            aux = tuple(_wrap_static(getattr(node, name))
                        for name in MADE.__tfep_static_fields__)
            return _unflatten_module(MADE, aux, children)
        if isinstance(node, Module):
            cls = type(node)
            children = tuple(
                rec(getattr(node, fname))
                for fname in cls.__tfep_dynamic_fields__)
            aux = tuple(_wrap_static(getattr(node, name))
                        for name in cls.__tfep_static_fields__)
            return _unflatten_module(cls, aux, children)
        # Generic containers: recurse into nested modules, P() elsewhere.
        return jax.tree_util.tree_map(
            lambda leaf: rec(leaf) if isinstance(leaf, Module) else P(),
            node, is_leaf=lambda x: isinstance(x, Module))

    return rec(tree)


def shard_ensemble(stacked, mesh: Mesh, axis_name: str = BATCH_AXIS,
                   n_members: Optional[int] = None):
    """Shard a stacked ensemble's member axis over the mesh.

    Ensemble members (:func:`tfep_tpu.nn.ensemble.stack_modules`) are
    fully independent, so splitting the leading member axis of every
    trainable leaf over ``axis_name`` makes the vmapped training step
    embarrassingly parallel: each device trains its member shard with
    zero cross-device communication (the batch and the buffers are
    replicated). Optimizer states built from the sharded trainable
    partition inherit the placement (``optax`` inits with ``zeros_like``).

    The member count must be divisible by the mesh axis size
    (``device_put`` cannot pad uneven shards).

    Parameters
    ----------
    n_members : int, optional
        The expected member count K. Pass it whenever available: the
        all-leaves-share-axis-0 inference below cannot distinguish a
        stacked ensemble from a plain module whose trainable leaves
        happen to agree on their first dimension (e.g. all-square
        layers), and would then silently shard a *weight* dimension as
        the member axis. An explicit K turns that mistake into an error.
    """
    from tfep_tpu.nn import ensemble
    from tfep_tpu.nn.module import combine, partition

    k = ensemble.n_members(stacked)
    trainable, frozen = partition(stacked)
    # Sanity: a genuinely stacked ensemble has the member count as axis 0
    # of EVERY trainable leaf; a plain (unstacked) module passed by
    # mistake would have its first weight dimension silently misread as K.
    axis0 = {leaf.shape[0] if leaf.ndim else None
             for leaf in jax.tree_util.tree_leaves(trainable)}
    if axis0 != {k}:
        raise ValueError(
            f'Not a stacked ensemble: trainable leaves disagree on the '
            f'leading (member) axis ({sorted(map(str, axis0))}). Build '
            f'the input with tfep_tpu.nn.ensemble.stack_modules.')
    if n_members is not None and k != n_members:
        raise ValueError(
            f'The input looks like a {k}-member ensemble but n_members='
            f'{n_members} was expected — is this really the output of '
            f'stack_modules?')
    axis_size = mesh.shape[axis_name]
    if k % axis_size:
        raise ValueError(
            f'The member count ({k}) must be divisible by the '
            f'{axis_name!r} mesh axis size ({axis_size}).')
    member_sharding = NamedSharding(mesh, P(axis_name))
    trainable = jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, member_sharding), trainable)
    frozen = jax.device_put(frozen, replicated_sharding(mesh))
    return combine(trainable, frozen)


def shard_module(tree, mesh: Mesh, axis_name: str = MODEL_AXIS):
    """Place a module pytree on ``mesh`` with MADE tensor parallelism.

    On a 1-D (data-only) mesh this is :func:`replicate`; on a 2-D mesh the
    MADE conditioners are split over the model axis per
    :func:`tensor_parallel_specs`.
    """
    if axis_name not in mesh.axis_names:
        return replicate(tree, mesh)
    specs = tensor_parallel_specs(tree, axis_name,
                                  axis_size=mesh.shape[axis_name])
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs)
    return jax.device_put(tree, shardings)
