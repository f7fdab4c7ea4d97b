"""Partial flow: maps only a subset of the degrees of freedom.

The wrapped flow never sees the fixed DOFs (they cannot condition it); the
output re-inserts them unchanged. Indices are resolved host-side at
construction so device shapes are static. Reference behavior:
/root/reference/tfep/nn/flows/partial.py:29-121.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tfep_tpu.nn.flows.flow import Flow
from tfep_tpu.nn.module import buffer, static

__all__ = ['PartialFlow']


class PartialFlow(Flow):
    """Wrap a flow so that ``fixed_indices`` DOFs are held constant.

    Parameters
    ----------
    flow : Flow
        The wrapped flow; it sees only the propagated (non-fixed) features.
    fixed_indices_buf : ndarray of int
        Sorted fixed feature indices (held constant, never conditioning).
    propagated_indices : ndarray of int
        Complement of the fixed indices over ``n_features``.
    return_partial : bool, optional
        If ``True``, return only the propagated features (without
        re-inserting the fixed ones) — used by the mixed map's dataset
        analysis pass.

    Notes
    -----
    The fixed DOFs contribute nothing to ``log_det_J`` (identity block).
    Build with :meth:`create`, which resolves the index complement
    host-side so device shapes are static.
    """

    flow: object
    fixed_indices_buf: jnp.ndarray = buffer()       # (n_fixed,)
    propagated_indices: jnp.ndarray = buffer()      # (n_propagated,)
    return_partial: bool = static(default=False)

    @classmethod
    def create(cls, flow, fixed_indices, n_features: int,
               return_partial: bool = False) -> 'PartialFlow':
        """Build a partial flow.

        Unlike the reference (which infers input dimension lazily at first
        call, partial.py:93-96), the total ``n_features`` is given explicitly
        so all shapes are static at trace time.
        """
        fixed = np.sort(np.asarray(fixed_indices).reshape(-1))
        propagated = np.setdiff1d(np.arange(n_features), fixed)
        return cls(flow=flow,
                   fixed_indices_buf=jnp.asarray(fixed),
                   propagated_indices=jnp.asarray(propagated),
                   return_partial=return_partial)

    @property
    def fixed_indices(self):
        return self.fixed_indices_buf

    def n_parameters(self) -> int:
        return self.flow.n_parameters()

    def forward(self, x, **kwargs):
        return self._pass(x, inverse=False, **kwargs)

    def inverse(self, y, **kwargs):
        return self._pass(y, inverse=True, **kwargs)

    def _pass(self, x, inverse: bool, **kwargs):
        # kwargs thread through to the wrapped flow (e.g. a ContinuousFlow
        # Hutchinson ``key``).
        has_fixed = self.fixed_indices_buf.shape[0] > 0
        x_full = x = jnp.asarray(x)  # .at[] update requires a jax array
        if has_fixed:
            x = x[:, self.propagated_indices]

        out = (self.flow.inverse(x, **kwargs) if inverse
               else self.flow.forward(x, **kwargs))

        if self.return_partial:
            return out

        if has_fixed:
            y = x_full.at[:, self.propagated_indices].set(out[0])
        else:
            y = out[0]
        return (y, *out[1:])
