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
    """Abstract base class for transformers.

    A transformer is a parametric elementwise bijection used as the second
    half of an autoregressive flow: the conditioner produces ``parameters``
    autoregressively from the input and the transformer applies them.
    Subclasses implement :meth:`forward`, :meth:`inverse` (both returning
    ``(output, log_det_J)``) and :meth:`get_identity_parameters`.
    Reference: /root/reference/tfep/nn/transformers/transformer.py:26.
    """

    def forward(self, x: jnp.ndarray, parameters: jnp.ndarray):
        """Map ``x`` of shape ``(batch, n_features)`` with per-sample
        ``parameters`` of shape ``(batch, n_parameters)``; returns
        ``(y, log_det_J)`` with ``log_det_J`` of shape ``(batch,)``."""
        raise NotImplementedError

    def inverse(self, y: jnp.ndarray, parameters: jnp.ndarray):
        """Exact inverse of :meth:`forward`; returns ``(x, -log_det_J)``."""
        raise NotImplementedError

    def get_identity_parameters(self, n_features: int) -> np.ndarray:
        """Parameter vector (host-side numpy) making this the identity map."""
        raise NotImplementedError


class MAFTransformer(Transformer):
    """A transformer usable inside a MAF (adds conditioner degree mapping).

    Besides the :class:`Transformer` contract, a MAF transformer declares
    how many conditioner parameters each feature consumes
    (``n_parameters_per_feature`` or an overridden
    :meth:`get_degrees_out`), so :class:`~tfep_tpu.nn.flows.MAF` can build
    a MADE conditioner whose output degrees preserve the autoregressive
    property. Reference: transformer.py:76-127.
    """

    def get_degrees_out(self, degrees_in: np.ndarray) -> np.ndarray:
        """Degrees of each conditioner output parameter (host-side numpy)."""
        raise NotImplementedError

    # Transformers whose parameters follow the standard tiled layout
    # (params reshaped (batch, n_parameters_per_feature, n_features) —
    # what the default tile-based get_degrees_out encodes) and whose
    # per-feature state (if any) is sliceable may implement
    # ``slice_features(indices) -> transformer`` returning a view over a
    # feature subset. The autoregressive inverse uses it to evaluate only
    # the current degree-group's features per iteration instead of all of
    # them (tfep_tpu/nn/flows/autoregressive.py). Transformers with a
    # non-tiled layout (e.g. MixedTransformer) must NOT implement it.
