"""Flow base class: the invertible-map contract.

Every flow is a pure-functional pytree module implementing

    ``forward(x) -> (y, log_det_J)`` and ``inverse(y) -> (x, log_det_J)``

with ``x``/``y`` of shape ``(batch, n_features)`` and ``log_det_J`` of shape
``(batch,)`` — the same contract as the reference flows (e.g.
/root/reference/tfep/nn/flows/sequential.py:44-68). Continuous flows may
return an extra regularization term as a third output.
"""

from __future__ import annotations

import jax.numpy as jnp

from tfep_tpu.nn.module import Module

__all__ = ['Flow', 'default_float']


def default_float():
    """Canonical float dtype (float32, or float64 when jax_enable_x64)."""
    return jnp.result_type(float)


class Flow(Module):
    """Abstract base class for invertible maps.

    Subclasses implement :meth:`forward` and :meth:`inverse`, both mapping
    a ``(batch, n_features)`` array to ``(output, log_det_J)`` with
    ``log_det_J`` of shape ``(batch,)`` and
    ``forward_log_det_J(x) + inverse_log_det_J(forward(x)) == 0``.
    Flows are pytrees: pass them straight into ``jax.jit``/``jax.grad``.
    """

    def __call__(self, x):
        """Alias for :meth:`forward` (the training direction)."""
        return self.forward(x)

    def forward(self, x):
        """Map ``x`` to ``(y, log_det_J)``."""
        raise NotImplementedError

    def inverse(self, y):
        """Exact inverse of :meth:`forward`; returns ``(x, log_det_J)``."""
        raise NotImplementedError
