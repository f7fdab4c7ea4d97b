"""PCA-whitened flow: runs the wrapped flow in whitened coordinates.

The whitening matrix is estimated host-side at construction from a data
sample (eigendecomposition of the covariance); whiten/blacken are single
matmuls on the MXU. With ``blacken=True`` the whitening Jacobians cancel;
otherwise the constant ``-sum(log sigma_i)`` enters the log-det. Reference
behavior: /root/reference/tfep/nn/flows/pca.py:26-125.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tfep_tpu.nn.flows.flow import Flow
from tfep_tpu.nn.module import buffer, static

__all__ = ['PCAWhitenedFlow']


class PCAWhitenedFlow(Flow):
    """Whiten -> wrapped flow -> (optional) blacken."""

    flow: object
    mean: jnp.ndarray = buffer(default=None)
    whitening_matrix: jnp.ndarray = buffer(default=None)
    blackening_matrix: jnp.ndarray = buffer(default=None)
    whitening_log_det_J: jnp.ndarray = buffer(default=None)
    blacken: bool = static(default=True)

    @classmethod
    def create(cls, flow, x, blacken: bool = True) -> 'PCAWhitenedFlow':
        """``x``: (n_samples, n_features) data sample for the PCA estimate."""
        x = np.asarray(x)
        mean = x.mean(axis=0)
        centered = x - mean
        cov = centered.T @ centered / (x.shape[0] - 1)

        eigvalues, eigvectors = np.linalg.eigh(cov)
        if np.any(eigvalues < 0.0):
            raise ValueError(
                'Cannot determine the PCA whitening matrix since some of the '
                'eigenvalues of the covariance matrix estimate are negative. '
                'Likely, this is due to an insufficient number of samples.')
        singular_values = np.sqrt(eigvalues)

        whitening = eigvectors @ np.diag(1.0 / singular_values)
        blackening = np.diag(singular_values) @ eigvectors.T
        log_det = -np.sum(np.log(singular_values))

        return cls(flow=flow,
                   mean=jnp.asarray(mean),
                   whitening_matrix=jnp.asarray(whitening),
                   blackening_matrix=jnp.asarray(blackening),
                   whitening_log_det_J=jnp.asarray(log_det),
                   blacken=blacken)

    def n_parameters(self) -> int:
        return self.flow.n_parameters()

    def _whiten(self, x):
        return (x - self.mean) @ self.whitening_matrix

    def _blacken(self, x):
        return x @ self.blackening_matrix + self.mean

    def forward(self, x):
        return self._pass(x, inverse=False)

    def inverse(self, y):
        return self._pass(y, inverse=True)

    def _pass(self, x, inverse: bool):
        whiten = (not inverse) or self.blacken
        blacken = inverse or self.blacken

        if whiten:
            x = self._whiten(x)

        out = self.flow.inverse(x) if inverse else self.flow.forward(x)
        y, log_det_J = out[0], out[1]

        if blacken:
            y = self._blacken(y)

        if not (whiten and blacken):
            if whiten:
                log_det_J = log_det_J + self.whitening_log_det_J
            else:
                log_det_J = log_det_J - self.whitening_log_det_J

        return (y, log_det_J, *out[2:])
