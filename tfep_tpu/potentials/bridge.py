"""Host-callback bridge: external engines as differentiable device functions.

The training step is one jitted XLA computation; the engine call is a
``jax.pure_callback`` hole in the graph. A ``custom_vjp`` makes it
differentiable with the TFEP contract: the forward host call returns
``(energies, forces)`` (forces precomputed in the same engine evaluation,
like the reference's ``precompute_gradient``), and the backward is
``grad = -forces * g`` — exactly the reference autograd-Function pattern
(/root/reference/tfep/potentials/ase.py:168-320). NaN policies are the host
function's responsibility (energies/forces containing NaN propagate to the
loss, which handles them with ``ignore_nan``).

Host functions receive numpy arrays of shape ``(batch, n_dofs)`` (and
optionally a cell) and must return numpy arrays; per-sample engine fan-out
(process pools, SLURM) happens inside them via
:mod:`tfep_tpu.parallel.strategies`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['make_callback_potential', 'make_callback_forces']


def make_callback_potential(
        energy_and_forces_fn: Callable,
        energy_fn: Optional[Callable] = None,
        has_cell: bool = False,
        n_aux: Optional[int] = None,
        vmap_method: str = 'sequential',
) -> Callable:
    """Wrap host energy(+forces) functions into a differentiable device fn.

    Parameters
    ----------
    energy_and_forces_fn : Callable
        ``(positions, *aux) -> (energies, forces)`` with numpy arrays;
        positions/forces shape ``(batch, n_dofs)``, energies ``(batch,)``.
        Used on the differentiated path (one engine call per step).
    energy_fn : Callable, optional
        ``(positions, *aux) -> energies``. Used on the non-differentiated
        path; defaults to calling ``energy_and_forces_fn`` and dropping
        forces (engines where forces are cheap), mirroring
        ``precompute_gradient=False`` semantics otherwise.
    has_cell : bool
        Legacy alias for ``n_aux=1`` (a ``batch_cell`` second argument).
    n_aux : int, optional
        Number of auxiliary (non-differentiated) array arguments following
        the positions — e.g. the box cell, or per-sample integer keys that
        must travel with the positions through the callback (so host-side
        state can't race ahead of asynchronous device dispatch).
    vmap_method : str
        Forwarded to ``jax.pure_callback`` for transforms that vmap over it.

    Returns
    -------
    potential : Callable
        ``potential(batch_positions, *aux) -> (batch,)`` energies,
        differentiable w.r.t. positions (cotangent ``-forces * g``).
    """
    if n_aux is None:
        n_aux = 1 if has_cell else 0

    def _host_energy(*args):
        if energy_fn is not None:
            return np.asarray(energy_fn(*args))
        return np.asarray(energy_and_forces_fn(*args)[0])

    def _host_energy_forces(*args):
        energies, forces = energy_and_forces_fn(*args)
        return np.asarray(energies), np.asarray(forces)

    @jax.custom_vjp
    def potential(x, *aux):
        shape = jax.ShapeDtypeStruct(x.shape[:1], x.dtype)
        return jax.pure_callback(_host_energy, shape, x, *aux,
                                 vmap_method=vmap_method)

    def fwd(x, *aux):
        e_shape = jax.ShapeDtypeStruct(x.shape[:1], x.dtype)
        f_shape = jax.ShapeDtypeStruct(x.shape, x.dtype)
        e, f = jax.pure_callback(_host_energy_forces, (e_shape, f_shape),
                                 x, *aux, vmap_method=vmap_method)
        return e, f

    def bwd(forces, g):
        return (-forces * g[:, None],) + (None,) * n_aux

    potential.defvjp(fwd, bwd)
    return potential


def make_callback_forces(
        energy_and_forces_fn: Callable,
        has_cell: bool = False,
        fd_step: float = 1e-4,
        vmap_method: str = 'sequential',
) -> Callable:
    """Differentiable engine *forces* for force-matching losses.

    Returns ``forces(batch_positions[, batch_cell]) -> (batch, n_dofs)``.
    The backward pass computes the vector-Hessian product by central finite
    differences of the engine forces along the (per-sample) cotangent
    direction — two extra engine evaluations — exploiting the symmetry of
    the Hessian (``v^T dF/dx = dF/dx v``). This is the JAX equivalent of the
    reference's double-backpropagation Function
    (/root/reference/tfep/potentials/psi4.py:641-766).
    """

    n_aux = 1 if has_cell else 0

    def _host_forces(*args):
        return np.asarray(energy_and_forces_fn(*args)[1])

    def _forces_cb(x, *aux):
        shape = jax.ShapeDtypeStruct(x.shape, x.dtype)
        return jax.pure_callback(_host_forces, shape, x, *aux,
                                 vmap_method=vmap_method)

    @jax.custom_vjp
    def forces(x, *aux):
        return _forces_cb(x, *aux)

    def fwd(x, *aux):
        return _forces_cb(x, *aux), (x, aux)

    def bwd(res, g):
        x, aux = res
        norm = jnp.linalg.norm(g, axis=-1, keepdims=True)
        safe = jnp.where(norm > 0, norm, 1.0)
        direction = g / safe
        f_plus = _forces_cb(x + fd_step * direction, *aux)
        f_minus = _forces_cb(x - fd_step * direction, *aux)
        vhp = (f_plus - f_minus) / (2.0 * fd_step) * norm
        return (vhp,) + (None,) * n_aux

    forces.defvjp(fwd, bwd)
    return forces
