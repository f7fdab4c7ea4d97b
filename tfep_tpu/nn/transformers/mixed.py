"""Mixed transformer: dispatch disjoint feature groups to sub-transformers.

Used by the mixed internal/Cartesian map to apply neural splines to bonds/
angles/torsions and a volume-preserving shift to constant reference DOFs.
The conditioner parameter vector is split by cached cumulative lengths
(ordered by transformer). Reference behavior:
/root/reference/tfep/nn/transformers/mixed.py:29-186.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from tfep_tpu.nn.module import static
from tfep_tpu.nn.transformers.transformer import MAFTransformer

__all__ = ['MixedTransformer']


class MixedTransformer(MAFTransformer):
    """Apply different transformers to disjoint feature-index groups.

    Each sub-transformer sees only its assigned features and its slice of
    the conditioner parameter vector (parameters are laid out per
    transformer, in order — the split offsets are cached at :meth:`create`
    time from each transformer's identity-parameter count). The total
    log-det is the sum over groups, since the Jacobian is block diagonal
    in the feature partition.

    :class:`~tfep_tpu.app.MixedMAFMap` uses this to give distances/angles
    neural splines, torsions circular splines, and kept-constant reference
    DOFs a :class:`~tfep_tpu.nn.transformers.VolumePreservingShift`.

    Attributes
    ----------
    transformers : tuple of MAFTransformer
        The sub-transformers.
    indices : tuple of tuple of int
        Feature indices assigned to each (disjoint, together covering all
        transformed features).
    param_lengths : tuple of int
        Per-transformer conditioner-parameter counts, cached for the
        static split.
    """

    transformers: tuple
    indices: tuple = static(default=())        # tuple of index tuples
    param_lengths: tuple = static(default=())  # per-transformer param counts

    @classmethod
    def create(cls, transformers: Sequence[MAFTransformer],
               indices: Sequence[Sequence[int]]) -> 'MixedTransformer':
        """Build a mixed transformer.

        Parameters
        ----------
        transformers : sequence of MAFTransformer
            At least two sub-transformers.
        indices : sequence of sequence of int
            For each transformer, the feature indices it transforms. Groups
            must be disjoint and together cover every transformed feature.

        Returns
        -------
        MixedTransformer
            With per-transformer parameter split offsets precomputed.
        """
        if len(transformers) < 2:
            raise ValueError(
                'The number of transformers must be greater than 1.')
        if len(transformers) != len(indices):
            raise ValueError('The number of elements in indices must equal '
                             'that in transformers.')
        indices = tuple(tuple(int(i) for i in np.asarray(ind).reshape(-1))
                        for ind in indices)
        param_lengths = tuple(
            len(t.get_identity_parameters(len(ind)))
            for t, ind in zip(transformers, indices))
        return cls(transformers=tuple(transformers), indices=indices,
                   param_lengths=param_lengths)

    # ------------------------------------------------------------------ #
    def forward(self, x, parameters):
        return self._run(x, parameters, inverse=False)

    def inverse(self, y, parameters):
        return self._run(y, parameters, inverse=True)

    def get_identity_parameters(self, n_features: int) -> np.ndarray:
        params = [np.asarray(t.get_identity_parameters(len(ind)))
                  for t, ind in zip(self.transformers, self.indices)]
        return np.concatenate(params)

    def get_degrees_out(self, degrees_in: np.ndarray) -> np.ndarray:
        degrees_in = np.asarray(degrees_in)
        degrees_out = [
            np.asarray(t.get_degrees_out(degrees_in[np.asarray(ind)]))
            for t, ind in zip(self.transformers, self.indices)]
        return np.concatenate(degrees_out)

    def _run(self, x, parameters, inverse: bool):
        parts = []
        cumulative_log_det_J = 0.0
        offset = 0
        for transformer, ind, plen in zip(self.transformers, self.indices,
                                          self.param_lengths):
            par = parameters[:, offset:offset + plen]
            offset += plen
            fn = transformer.inverse if inverse else transformer.forward
            y_part, log_det_J = fn(x[:, jnp.asarray(ind)], par)
            parts.append(y_part)
            cumulative_log_det_J = cumulative_log_det_J + log_det_J

        # Reassemble with one concat + inverse-permutation gather instead
        # of per-group scatters (scatters cost ~2.5% of the mixed-map train
        # step on TPU). The permutation is host-side numpy over the static
        # feature count, so it folds into the compiled program.
        covered = np.concatenate([np.asarray(ind, dtype=np.int64)
                                  for ind in self.indices])
        rest = np.setdiff1d(np.arange(x.shape[1]), covered)
        if len(rest):
            parts.append(x[:, jnp.asarray(rest)])
            covered = np.concatenate([covered, rest])
        y = jnp.concatenate(parts, axis=1)[:, jnp.asarray(np.argsort(covered))]
        return y, cumulative_log_det_J
