"""Sequential composition of flows with cumulative log-det-Jacobian.

Reference behavior: /root/reference/tfep/nn/flows/sequential.py:24-68, plus
accumulation of optional regularization terms (third output) produced by
continuous flows.
"""

from __future__ import annotations

import jax.numpy as jnp

from tfep_tpu.nn.flows.flow import Flow

__all__ = ['SequentialFlow']


class SequentialFlow(Flow):
    """A sequence of flows executed in order (reversed for the inverse)."""

    flows: tuple

    @classmethod
    def create(cls, *flows) -> 'SequentialFlow':
        return cls(flows=tuple(flows))

    def __getitem__(self, i):
        return self.flows[i]

    def __len__(self):
        return len(self.flows)

    def n_parameters(self) -> int:
        return sum(f.n_parameters() for f in self.flows)

    def forward(self, x):
        return self._pass(x, inverse=False)

    def inverse(self, y):
        return self._pass(y, inverse=True)

    def _pass(self, x, inverse: bool):
        cumulative_log_det_J = jnp.zeros(x.shape[0], dtype=x.dtype)
        regularization = None

        flows = reversed(self.flows) if inverse else self.flows
        for flow in flows:
            out = flow.inverse(x) if inverse else flow.forward(x)
            x, log_det_J = out[0], out[1]
            cumulative_log_det_J = cumulative_log_det_J + log_det_J
            if len(out) > 2 and out[2] is not None:
                regularization = (out[2] if regularization is None
                                  else regularization + out[2])

        if regularization is None:
            return x, cumulative_log_det_J
        return x, cumulative_log_det_J, regularization
