"""Conditioner API for autoregressive flows.

A conditioner maps input features to the parameter vector consumed by a
transformer: ``parameters = conditioner(x)`` with shapes
``(batch, n_features) -> (batch, n_parameters)``. ``set_output`` returns a
copy whose output is a given constant — used for identity initialization.
Reference contract: /root/reference/tfep/nn/conditioners/conditioner.py:26-63.
"""

from __future__ import annotations

import jax.numpy as jnp

from tfep_tpu.nn.module import Module

__all__ = ['Conditioner']


class Conditioner(Module):
    """Abstract base class for conditioners."""

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def set_output(self, output: jnp.ndarray) -> 'Conditioner':
        """Return a copy that constantly returns ``output`` for any input."""
        raise NotImplementedError
