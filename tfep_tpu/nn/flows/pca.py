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
    """Whiten -> wrapped flow -> (optional) blacken.

    Runs the wrapped flow in PCA-whitened coordinates
    ``z = (x - mean) @ W`` where ``W = V diag(1/sigma)`` comes from the
    eigendecomposition ``cov = V diag(sigma^2) V^T`` of a data sample's
    covariance. Whitening decorrelates and rescales the input features to
    unit variance, which typically conditions the wrapped flow's
    optimization much better for strongly anisotropic molecular data.

    With ``blacken=True`` (the default) the output is mapped back through
    the inverse transform, so the flow is an ``x -> x`` map and the two
    constant Jacobians cancel exactly — nothing is added to ``log_det_J``.
    With ``blacken=False`` the flow maps ``x -> z`` space and the constant
    ``-sum(log sigma_i)`` enters the log-det.

    Both directions are single ``(batch, n) @ (n, n)`` matmuls that XLA
    places on the MXU; the eigendecomposition itself happens once,
    host-side, at construction.

    Attributes
    ----------
    flow : Flow
        The wrapped flow, operating in whitened coordinates.
    mean : jax.Array
        ``(n_features,)`` sample mean.
    whitening_matrix, blackening_matrix : jax.Array
        ``(n_features, n_features)`` mutually inverse linear maps.
    whitening_log_det_J : jax.Array
        Scalar ``-sum(log sigma_i)``, the whitening map's constant log-det.
    blacken : bool
        Whether the output is mapped back to the original coordinates.

    Reference behavior: /root/reference/tfep/nn/flows/pca.py:26-125.
    """

    flow: object
    mean: jnp.ndarray = buffer(default=None)
    whitening_matrix: jnp.ndarray = buffer(default=None)
    blackening_matrix: jnp.ndarray = buffer(default=None)
    whitening_log_det_J: jnp.ndarray = buffer(default=None)
    blacken: bool = static(default=True)

    @classmethod
    def create(cls, flow, x, blacken: bool = True) -> 'PCAWhitenedFlow':
        """Estimate the whitening transform from data and wrap ``flow``.

        Parameters
        ----------
        flow : Flow
            The flow to run in whitened coordinates.
        x : array_like
            ``(n_samples, n_features)`` data sample used for the PCA
            estimate. Needs at least ``n_features + 1`` linearly
            independent samples for a positive-definite covariance.
        blacken : bool, optional
            If ``True`` (default), map the wrapped flow's output back to
            the original coordinates so the overall map is ``x -> x``.

        Returns
        -------
        PCAWhitenedFlow

        Raises
        ------
        ValueError
            If the covariance estimate has negative eigenvalues (too few
            samples).
        """
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
        """Map ``(batch, n_features)`` inputs through whiten/flow/blacken.

        Returns ``(y, log_det_J, *extras)`` where the constant whitening
        log-det is included only when the map changes coordinate systems
        (``blacken=False``).
        """
        return self._pass(x, inverse=False)

    def inverse(self, y):
        """Invert :meth:`forward` (defined for any ``blacken`` setting)."""
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
