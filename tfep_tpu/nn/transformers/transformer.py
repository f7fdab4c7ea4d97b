"""Transformer API for autoregressive flows.

A transformer applies a parametric bijection elementwise over features:
``forward(x, parameters) -> (y, log_det_J)`` with ``x`` shape
``(batch, n_features)`` and ``parameters`` shape ``(batch, n_parameters)``.
``get_identity_parameters`` returns the (host-side) constant parameter vector
that makes the map the identity; ``get_degrees_out`` lifts feature degrees to
parameter degrees so a MADE conditioner preserves the autoregressive property.
Reference contract: /root/reference/tfep/nn/transformers/transformer.py:26-127.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tfep_tpu.nn.module import Module

__all__ = ['Transformer', 'MAFTransformer']


class Transformer(Module):
    """Abstract base class for transformers."""

    def forward(self, x: jnp.ndarray, parameters: jnp.ndarray):
        raise NotImplementedError

    def inverse(self, y: jnp.ndarray, parameters: jnp.ndarray):
        raise NotImplementedError

    def get_identity_parameters(self, n_features: int) -> np.ndarray:
        """Parameter vector (host-side numpy) making this the identity map."""
        raise NotImplementedError


class MAFTransformer(Transformer):
    """A transformer usable inside a MAF (adds conditioner degree mapping)."""

    def get_degrees_out(self, degrees_in: np.ndarray) -> np.ndarray:
        """Degrees of each conditioner output parameter (host-side numpy)."""
        raise NotImplementedError
