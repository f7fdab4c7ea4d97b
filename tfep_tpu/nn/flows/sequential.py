"""Sequential composition of flows with cumulative log-det-Jacobian.

Reference behavior: /root/reference/tfep/nn/flows/sequential.py:24-68, plus
accumulation of optional regularization terms (third output) produced by
continuous flows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfep_tpu.nn.flows.flow import Flow
from tfep_tpu.nn.module import static

__all__ = ['SequentialFlow']


class SequentialFlow(Flow):
    """A sequence of flows executed in order (reversed for the inverse).

    With ``remat=True`` each layer is wrapped in :func:`jax.checkpoint`, so
    backward saves only the per-layer inputs instead of every intermediate
    activation — on TPU the training step is HBM-bound on those residuals
    (measured ~675 MB/step for the 6-layer spline-MAF flagship), and
    recomputing them is cheaper than streaming them.

    Parameters
    ----------
    flows : tuple of Flow
        The composed flows, applied in order on :meth:`forward` and in
        reverse on :meth:`inverse`; log-det-Jacobians accumulate, and any
        regularization third outputs (continuous flows) are summed.
    remat : bool, optional
        Rematerialize each layer under reverse-mode AD (default ``False``).

    Examples
    --------
    >>> flow = SequentialFlow.create(maf1, maf2, remat=True)  # doctest: +SKIP
    >>> y, log_det_J = flow.forward(x)                        # doctest: +SKIP
    """

    flows: tuple
    remat: bool = static(default=False)

    @classmethod
    def create(cls, *flows, remat: bool = False) -> 'SequentialFlow':
        return cls(flows=tuple(flows), remat=remat)

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
            if inverse:
                apply = lambda f, z: f.inverse(z)
            else:
                apply = lambda f, z: f.forward(z)
            if self.remat:
                apply = jax.checkpoint(apply)
            out = apply(flow, x)
            x, log_det_J = out[0], out[1]
            cumulative_log_det_J = cumulative_log_det_J + log_det_J
            if len(out) > 2 and out[2] is not None:
                regularization = (out[2] if regularization is None
                                  else regularization + out[2])

        if regularization is None:
            return x, cumulative_log_det_J
        return x, cumulative_log_det_J, regularization
