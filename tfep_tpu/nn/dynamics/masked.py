"""Velocity masking: conditioning DOFs for continuous flows.

A CNF has no conditioner/transformer split, so "conditioning" degrees of
freedom (inputs that shape the map but are not transported, cf. the
reference's conditioning semantics at /root/reference/tfep/app/base.py:601-729)
are expressed on the velocity field instead: the wrapped dynamics sees the
full state — conditioning coordinates influence every message — but its
velocities are zeroed on the conditioning DOFs, so those coordinates are
integrated in place. The Jacobian rows of the masked DOFs vanish, so both
the exact trace and Hutchinson estimates of ``log_det_J`` remain correct
with no special casing.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tfep_tpu.nn.module import Module, buffer

__all__ = ['MaskedVelocityDynamics']


class MaskedVelocityDynamics(Module):
    """Zero a dynamics' velocities on a fixed set of feature indices.

    Parameters
    ----------
    dynamics : Module
        The wrapped velocity field ``v = f(t, x)``; it sees the full
        (unmasked) state.
    velocity_mask : jnp.ndarray
        ``(dim,)`` float mask — 1 on transported DOFs, 0 on conditioning
        DOFs. Build with :meth:`create` from the zeroed indices.
    """

    dynamics: object
    velocity_mask: jnp.ndarray = buffer(default=None)

    @classmethod
    def create(cls, dynamics, zero_velocity_indices,
               dim: int) -> 'MaskedVelocityDynamics':
        """Wrap ``dynamics`` so the ``zero_velocity_indices`` DOFs (over a
        ``dim``-feature flattened state) never move."""
        mask = np.ones(dim)
        mask[np.asarray(zero_velocity_indices, dtype=np.int64)] = 0.0
        return cls(dynamics=dynamics, velocity_mask=jnp.asarray(mask))

    def __call__(self, t, x):
        return self.dynamics(t, x) * self.velocity_mask.astype(x.dtype)
