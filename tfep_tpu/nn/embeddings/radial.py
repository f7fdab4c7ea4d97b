"""Radial basis expansions: Gaussian soft one-hot + Behler-Parrinello cutoff.

Distance featurizers for graph networks (EGNN dynamics). Means/stds can be
trainable; stds are stored as log inverse variances so training keeps them
positive. Reference behaviors:
/root/reference/tfep/nn/embeddings/radial.py:24-292.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tfep_tpu.nn.module import Module, buffer, static

__all__ = ['GaussianBasisExpansion', 'BehlerParrinelloRadialExpansion',
           'behler_parrinello_cosine_switching_function']


class GaussianBasisExpansion(Module):
    """Soft one-hot expansion ``exp(-gamma_i (r - mu_i)^2)`` (SchNet-style).

    Expands a scalar (typically an interatomic distance) into
    ``n_gaussians`` overlapping radial basis functions, giving graph
    networks a smooth, localized distance representation instead of a raw
    scalar. ``gamma_i = 1 / std_i^2`` is stored as ``log gamma`` so
    gradient updates keep the widths positive.

    Trainability is structural here: with ``trainable_* = False`` the
    arrays live in buffer fields (excluded from gradients), mirroring the
    reference's Parameter-vs-tensor switch
    (/root/reference/tfep/nn/embeddings/radial.py:24-160).

    Use :meth:`create` with explicit means/stds, or :meth:`from_range` for
    the common equidistant grid.
    """

    means_param: jnp.ndarray               # trainable slot (may be size 0)
    log_gammas_param: jnp.ndarray
    means_buf: jnp.ndarray = buffer(default=None)
    log_gammas_buf: jnp.ndarray = buffer(default=None)
    trainable_means: bool = static(default=False)
    trainable_stds: bool = static(default=False)

    @classmethod
    def create(cls, means, stds, trainable_means: bool = False,
               trainable_stds: bool = False) -> 'GaussianBasisExpansion':
        """Build a Gaussian basis from explicit centers and widths.

        Parameters
        ----------
        means : array_like, shape (n_gaussians,)
            Gaussian centers.
        stds : array_like, shape (n_gaussians,)
            Gaussian standard deviations (stored as ``log(1/std^2)``).
        trainable_means, trainable_stds : bool, optional
            Whether each is a trained parameter or a frozen buffer.
        """
        means = jnp.asarray(np.asarray(means, dtype=float))
        log_gammas = jnp.log(1.0 / jnp.asarray(
            np.asarray(stds, dtype=float)) ** 2)
        empty = jnp.zeros(0, dtype=means.dtype)
        return cls(
            means_param=means if trainable_means else empty,
            log_gammas_param=log_gammas if trainable_stds else empty,
            means_buf=None if trainable_means else means,
            log_gammas_buf=None if trainable_stds else log_gammas,
            trainable_means=trainable_means,
            trainable_stds=trainable_stds,
        )

    @classmethod
    def from_range(cls, n_gaussians: int, max_mean: float,
                   min_mean: float = 0.0, relative_std: float = 3.0,
                   **kwargs):
        """Equidistant Gaussians; stds = relative_std * spacing."""
        means, stds = _equidistant_means_and_stds(
            n_gaussians, max_mean, min_mean, relative_std)
        return cls.create(means, stds, **kwargs)

    @property
    def means(self):
        return self.means_param if self.trainable_means else self.means_buf

    @property
    def log_gammas(self):
        return (self.log_gammas_param if self.trainable_stds
                else self.log_gammas_buf)

    def __call__(self, data):
        """Expand ``(batch, *)`` data to ``(batch, *, n_gaussians)``."""
        if data.shape[-1] != 1:
            data = data[..., None]
        disp = (data - self.means) ** 2
        gammas = jnp.exp(self.log_gammas)
        return jnp.exp(-gammas * disp)


def behler_parrinello_cosine_switching_function(
        r_cutoff: float, r, force_zero_after_cutoff: bool = True):
    """``0.5 cos(pi r / rc) + 0.5``, optionally zeroed beyond the cutoff.

    Parameters
    ----------
    r_cutoff : float
        Cutoff radius ``rc``.
    r : ndarray
        Distances to switch.
    force_zero_after_cutoff : bool, optional
        Clamp the (otherwise oscillating) cosine to exactly 0 for
        ``r > rc``.

    Returns
    -------
    ndarray
        Switching values in [0, 1], same shape as ``r``.
    """
    switching = 0.5 * jnp.cos(jnp.pi / r_cutoff * r) + 0.5
    if force_zero_after_cutoff:
        switching = jnp.where(r > r_cutoff, 0.0, switching)
    return switching


class BehlerParrinelloRadialExpansion(GaussianBasisExpansion):
    """Gaussian expansion × cosine switching envelope (Behler–Parrinello).

    Multiplies the Gaussian basis by the smooth cutoff
    ``0.5 cos(pi r / r_cutoff) + 0.5`` so every feature decays continuously
    to zero at ``r_cutoff`` (and, with ``force_zero_after_cutoff``, stays
    exactly zero beyond it). This keeps graph-network messages continuous
    as pairs cross the cutoff — the radial featurizer used by
    :class:`~tfep_tpu.nn.dynamics.EGNNDynamics`. Reference:
    /root/reference/tfep/nn/embeddings/radial.py:163-292.
    """

    r_cutoff: float = static(default=1.0)
    force_zero_after_cutoff: bool = static(default=True)

    @classmethod
    def create(cls, r_cutoff, means, stds, trainable_means=False,
               trainable_stds=False, force_zero_after_cutoff=True):
        base = GaussianBasisExpansion.create(
            means, stds, trainable_means, trainable_stds)
        return cls(means_param=base.means_param,
                   log_gammas_param=base.log_gammas_param,
                   means_buf=base.means_buf,
                   log_gammas_buf=base.log_gammas_buf,
                   trainable_means=trainable_means,
                   trainable_stds=trainable_stds,
                   r_cutoff=float(r_cutoff),
                   force_zero_after_cutoff=force_zero_after_cutoff)

    @classmethod
    def from_range(cls, r_cutoff, n_gaussians, max_mean, min_mean=0.0,
                   relative_std=3.0, **kwargs):
        means, stds = _equidistant_means_and_stds(
            n_gaussians, max_mean, min_mean, relative_std)
        return cls.create(r_cutoff, means, stds, **kwargs)

    def __call__(self, distances):
        encoding = GaussianBasisExpansion.__call__(self, distances)
        switching = behler_parrinello_cosine_switching_function(
            self.r_cutoff, distances, self.force_zero_after_cutoff)
        return encoding * switching[..., None]


def _equidistant_means_and_stds(n_gaussians, max_mean, min_mean,
                                relative_std):
    spacing = (max_mean - min_mean) / (n_gaussians - 1)
    means = np.linspace(min_mean, max_mean, n_gaussians)
    stds = np.full(n_gaussians, relative_std * spacing)
    return means, stds
