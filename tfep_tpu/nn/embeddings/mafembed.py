"""MAF input embeddings: periodic (cos/sin), flip-invariant, and mixed.

An embedding lifts conditioner inputs to a better representation and lifts
the feature degrees alongside (``get_degrees_out``), so the MADE masks stay
autoregressive. The output feature order follows the reference's actual
layout: non-embedded features first, then the embedded blocks
(/root/reference/tfep/nn/embeddings/mafembed.py:30-447).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tfep_tpu.nn.masked import MaskedLinear
from tfep_tpu.nn.module import Module, buffer, static
from tfep_tpu.utils.misc import remove_and_shift_sorted_indices

__all__ = ['MAFEmbedding', 'PeriodicEmbedding', 'FlipInvariantEmbedding',
           'MixedEmbedding']


class MAFEmbedding(Module):
    """Base class for MAF conditioner input embeddings.

    Implementations provide ``__call__(x) -> lifted_x`` mapping
    ``(batch, n_features_in)`` to ``(batch, n_features_out)``, and
    :meth:`get_degrees_out` so the MADE conditioner can assign each output
    feature the autoregressive degree of the input it derives from — the
    masks then remain autoregressive through the embedding.
    """

    def get_degrees_out(self, degrees_in: np.ndarray) -> np.ndarray:
        """Lift per-input-feature degrees to the embedded feature space.

        Parameters
        ----------
        degrees_in : numpy.ndarray
            ``(n_features_in,)`` integer degrees of the raw inputs.

        Returns
        -------
        numpy.ndarray
            ``(n_features_out,)`` degrees in the embedding's output order.
        """
        raise NotImplementedError


class PeriodicEmbedding(MAFEmbedding):
    """Lift periodic DOFs to (cos, sin) pairs.

    A periodic feature (e.g. a torsion in ``limits = (-pi, pi]``) has a
    topological discontinuity at the boundary that a plain dense network
    must waste capacity approximating; mapping it to the unit circle
    removes it. Each periodic feature is first rescaled so ``limits`` spans
    one period, then emitted as its (cos, sin) pair.

    Output layout: ``[x[nonperiodic], cos/sin interleaved per periodic
    DOF]`` — matching the reference
    (/root/reference/tfep/nn/embeddings/mafembed.py:106-232).

    Attributes
    ----------
    limits : jax.Array
        ``(2,)`` lower/upper values identified with each other.
    periodic_indices, nonperiodic_indices : jax.Array
        Partition of the input features.
    """

    limits: jnp.ndarray = buffer(default=None)           # (2,)
    periodic_indices: jnp.ndarray = buffer(default=None)
    nonperiodic_indices: jnp.ndarray = buffer(default=None)

    @classmethod
    def create(cls, n_features_in: int, limits: Sequence[float],
               periodic_indices: Optional[Sequence[int]] = None
               ) -> 'PeriodicEmbedding':
        """Build a periodic embedding.

        Parameters
        ----------
        n_features_in : int
            Total input features.
        limits : sequence of 2 floats
            Values identified with each other (one period).
        periodic_indices : sequence of int, optional
            Which features are periodic (default: all).
        """
        if periodic_indices is None:
            periodic_indices = np.arange(n_features_in)
        else:
            periodic_indices = np.asarray(periodic_indices)
            if len(np.unique(periodic_indices)) < len(periodic_indices):
                raise ValueError(
                    'Found duplicated indices in periodic_indices.')
        nonperiodic = remove_and_shift_sorted_indices(
            np.arange(n_features_in), np.sort(periodic_indices), shift=False)
        return cls(limits=jnp.asarray(np.asarray(limits, dtype=float)),
                   periodic_indices=jnp.asarray(periodic_indices),
                   nonperiodic_indices=jnp.asarray(nonperiodic))

    def __call__(self, x):
        batch_size = x.shape[0]
        period_scale = 2 * jnp.pi / (self.limits[1] - self.limits[0])
        x_periodic = (x[:, self.periodic_indices] - self.limits[0]) \
            * period_scale
        cos_sin = jnp.stack([jnp.cos(x_periodic), jnp.sin(x_periodic)],
                            axis=2).reshape(batch_size, -1)
        return jnp.concatenate([x[:, self.nonperiodic_indices], cos_sin],
                               axis=1)

    def get_degrees_out(self, degrees_in: np.ndarray) -> np.ndarray:
        degrees_in = np.asarray(degrees_in)
        p_idx = np.asarray(self.periodic_indices)
        np_idx = np.asarray(self.nonperiodic_indices)
        return np.concatenate([
            degrees_in[np_idx],
            np.repeat(degrees_in[p_idx], 2),
        ])


class FlipInvariantEmbedding(MAFEmbedding):
    """Sign-flip-invariant vector embedding (Köhler et al., SI Eq. 46).

    Each ``vector_dimension``-vector ``v`` maps to a softmax-weighted mix
    of ``MLP(v)`` and ``MLP(-v)`` (weights from a second MLP), so the
    embedding satisfies ``E(v) == E(-v)`` exactly. Its intended use is
    quaternion inputs, where ``q`` and ``-q`` encode the same rotation
    (double cover of SO(3)): downstream conditioners then cannot depend on
    the arbitrary sign. All components of a vector must share one
    autoregressive degree, which the ``embedding_dimension`` outputs
    inherit.

    Reference behavior:
    /root/reference/tfep/nn/embeddings/mafembed.py:235-380.
    """

    embed_l1: MaskedLinear
    embed_l2: MaskedLinear
    weight_l1: MaskedLinear
    weight_l2: MaskedLinear
    embedded_indices: jnp.ndarray = buffer(default=None)
    nonembedded_indices: jnp.ndarray = buffer(default=None)
    vector_dimension: int = static(default=4)
    embedding_dimension: int = static(default=8)

    @classmethod
    def create(cls, key, n_features_in: int, embedding_dimension: int,
               embedded_indices: Optional[Sequence[int]] = None,
               vector_dimension: int = 4, hidden_layer_width: int = 32,
               dtype=None) -> 'FlipInvariantEmbedding':
        """Build a flip-invariant embedding.

        Parameters
        ----------
        key : jax.random.PRNGKey
            Initialization key for the two MLPs.
        n_features_in : int
            Total input features.
        embedding_dimension : int
            Output features per embedded vector.
        embedded_indices : sequence of int, optional
            Features forming the embedded vectors, in groups of
            ``vector_dimension`` consecutive indices (default: all).
        vector_dimension : int, optional
            Components per vector (4 for quaternions).
        hidden_layer_width : int, optional
            Width of the MLPs' single hidden layer.
        dtype : optional
            Parameter dtype.
        """
        if embedded_indices is None:
            embedded_indices = np.arange(n_features_in)
        else:
            embedded_indices = np.asarray(embedded_indices)
            if len(np.unique(embedded_indices)) < len(embedded_indices):
                raise ValueError(
                    'Found duplicated indices in embedded_indices.')
        nonembedded = remove_and_shift_sorted_indices(
            np.arange(n_features_in), np.sort(embedded_indices), shift=False)

        k1, k2, k3, k4 = jax.random.split(key, 4)
        return cls(
            embed_l1=MaskedLinear.create(k1, vector_dimension,
                                         hidden_layer_width, dtype=dtype),
            embed_l2=MaskedLinear.create(k2, hidden_layer_width,
                                         embedding_dimension, dtype=dtype),
            weight_l1=MaskedLinear.create(k3, vector_dimension,
                                          hidden_layer_width, dtype=dtype),
            weight_l2=MaskedLinear.create(k4, hidden_layer_width, 1,
                                          dtype=dtype),
            embedded_indices=jnp.asarray(embedded_indices),
            nonembedded_indices=jnp.asarray(nonembedded),
            vector_dimension=int(vector_dimension),
            embedding_dimension=int(embedding_dimension),
        )

    def _embed(self, v):
        return self.embed_l2(jax.nn.elu(self.embed_l1(v)))

    def _weight(self, v):
        return self.weight_l2(jax.nn.elu(self.weight_l1(v)))

    def __call__(self, x):
        batch_size = x.shape[0]
        vectors = x[:, self.embedded_indices].reshape(
            -1, self.vector_dimension)

        embedded = jnp.stack([self._embed(vectors), self._embed(-vectors)],
                             axis=1)
        weights = jax.nn.softmax(
            jnp.stack([self._weight(vectors), self._weight(-vectors)],
                      axis=1), axis=1)
        embedded = jnp.sum(weights * embedded, axis=1).reshape(batch_size, -1)

        return jnp.concatenate([x[:, self.nonembedded_indices], embedded],
                               axis=1)

    def get_degrees_out(self, degrees_in: np.ndarray) -> np.ndarray:
        degrees_in = np.asarray(degrees_in)
        vec_degrees = degrees_in[np.asarray(self.embedded_indices)].reshape(
            -1, self.vector_dimension)
        if not np.all(vec_degrees == vec_degrees[:, [0]]):
            raise ValueError('The same degree must be assigned to all '
                             'components of each embedded vectors.')
        vec_degrees = np.repeat(vec_degrees[:, 0], self.embedding_dimension)
        return np.concatenate([
            degrees_in[np.asarray(self.nonembedded_indices)], vec_degrees])


class MixedEmbedding(MAFEmbedding):
    """Compose multiple embeddings over disjoint feature groups.

    Each sub-embedding receives its assigned input slice (and must be
    constructed for that slice's feature count); features assigned to no
    embedding pass through unchanged. Output layout: non-embedded features
    first, then each embedding's output in layer order — matching
    /root/reference/tfep/nn/embeddings/mafembed.py:383-447. Used by
    :class:`~tfep_tpu.app.MixedMAFMap` to give torsions a periodic
    embedding while distances/angles/cartesians stay raw.
    """

    embedding_layers: tuple
    embedded_indices: tuple = static(default=())
    nonembedded_indices: jnp.ndarray = buffer(default=None)

    @classmethod
    def create(cls, n_features_in: int,
               embedding_layers: Sequence[MAFEmbedding],
               embedded_indices: Sequence[Sequence[int]]) -> 'MixedEmbedding':
        """Build a mixed embedding.

        Parameters
        ----------
        n_features_in : int
            Total input features.
        embedding_layers : sequence of MAFEmbedding
            The sub-embeddings.
        embedded_indices : sequence of sequence of int
            For each sub-embedding, the (disjoint) input features it
            receives; unassigned features pass through unchanged.
        """
        if len(embedding_layers) != len(embedded_indices):
            raise ValueError('Different number of layers and indices.')
        embedded_indices = [np.asarray(ind) for ind in embedded_indices]
        seen = set(embedded_indices[0].tolist())
        for ind in embedded_indices[1:]:
            if seen & set(ind.tolist()):
                raise ValueError('Different embedding layers must be assigned '
                                 'to different feature indices.')
            seen |= set(ind.tolist())
        all_embedded = np.sort(np.concatenate(embedded_indices))
        nonembedded = remove_and_shift_sorted_indices(
            np.arange(n_features_in), all_embedded, shift=False)
        return cls(
            embedding_layers=tuple(embedding_layers),
            embedded_indices=tuple(tuple(int(i) for i in ind)
                                   for ind in embedded_indices),
            nonembedded_indices=jnp.asarray(nonembedded),
        )

    def __call__(self, x):
        parts = [x[:, self.nonembedded_indices]]
        for layer, ind in zip(self.embedding_layers, self.embedded_indices):
            parts.append(layer(x[:, jnp.asarray(ind)]))
        return jnp.concatenate(parts, axis=1)

    def get_degrees_out(self, degrees_in: np.ndarray) -> np.ndarray:
        degrees_in = np.asarray(degrees_in)
        parts = [degrees_in[np.asarray(self.nonembedded_indices)]]
        for layer, ind in zip(self.embedding_layers, self.embedded_indices):
            parts.append(np.asarray(
                layer.get_degrees_out(degrees_in[np.asarray(ind)])))
        return np.concatenate(parts)
