"""Centered-centroid flow: constrains the (weighted) centroid of the points.

Translates the configuration so its (weighted) centroid sits at a chosen
origin, holds one point's DOFs out of the wrapped flow, restores the
centroid constraint on the output through that fixed point, and optionally
translates back. Functional (no in-place writes): scatter updates via
``.at[].set``. Reference behavior:
/root/reference/tfep/nn/flows/centroid.py:33-263.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from tfep_tpu.nn.flows.partial import PartialFlow
from tfep_tpu.nn.module import buffer, static

__all__ = ['CenteredCentroidFlow']


class CenteredCentroidFlow(PartialFlow):
    """Wraps a flow, fixing the centroid of (a subset of) the points.

    The flow removes the net-translation degrees of freedom from a point
    cloud before handing it to the wrapped flow. On the forward (and
    inverse) pass it:

    1. translates the configuration so the (weighted) centroid of the
       chosen point subset sits at ``origin``;
    2. runs the wrapped flow on all degrees of freedom except those of
       ``fixed_point_idx`` (held out through the :class:`PartialFlow`
       machinery);
    3. solves for the fixed point's coordinates so the output centroid is
       again at ``origin``;
    4. optionally (``translate_back=True``) undoes the initial translation
       so input and output live in the original frame.

    Because steps 1 and 4 are rigid translations and step 3 determines the
    fixed point's position from the constraint, the overall map is bijective
    on the full coordinate set and its log-Jacobian equals that of the
    wrapped flow on the reduced set.

    The transformation is purely functional — scatter updates go through
    ``jax.numpy``'s ``.at[].set`` so the whole flow stays jittable.

    Attributes
    ----------
    space_dimension : int
        Dimensionality of each point (3 for atoms).
    fixed_point_idx : int
        Index of the point whose coordinates absorb the centroid
        constraint. When ``subset_point_indices`` is given, this indexes
        into the subset.
    subset_point_indices : jax.Array, optional
        Point indices over which the centroid is computed. ``None`` means
        all points.
    weights : jax.Array, optional
        ``(n_subset_points, 1)`` normalized centroid weights (e.g. masses
        for a center-of-mass constraint). ``None`` means uniform.
    origin : jax.Array
        ``(space_dimension,)`` target centroid position.
    translate_back : bool
        Whether to restore the input frame on output. The inverse pass is
        only defined when this is ``True``.

    See Also
    --------
    tfep_tpu.nn.flows.OrientedFlow : removes net rotation instead.

    Reference behavior: /root/reference/tfep/nn/flows/centroid.py:33-263.
    """

    space_dimension: int = static(default=3)
    fixed_point_idx: int = static(default=0)
    subset_point_indices: Optional[jnp.ndarray] = buffer(default=None)
    weights: Optional[jnp.ndarray] = buffer(default=None)   # (n_points, 1)
    origin: Optional[jnp.ndarray] = buffer(default=None)    # (space_dim,)
    translate_back: bool = static(default=True)

    @classmethod
    def create(cls, flow, space_dimension: int, n_features: int,
               subset_point_indices: Optional[Sequence[int]] = None,
               weights: Optional[Sequence[float]] = None,
               fixed_point_idx: int = 0,
               origin: Optional[Sequence[float]] = None,
               translate_back: bool = True,
               return_partial: bool = False) -> 'CenteredCentroidFlow':
        """Build a centroid-constrained wrapper around ``flow``.

        Parameters
        ----------
        flow : Flow
            The wrapped flow. It will receive
            ``n_features - space_dimension`` features (the fixed point's
            DOFs are held out).
        space_dimension : int
            Dimensionality of each point (3 for atoms).
        n_features : int
            Total flattened DOF count of the input, i.e.
            ``n_points * space_dimension``. Passed explicitly so the
            held-out index sets can be built at construction time with
            static shapes (required under ``jit``).
        subset_point_indices : sequence of int, optional
            Point (atom) indices over which the centroid is computed.
            Default: all points.
        weights : sequence of float, optional
            Centroid weights, one per subset point (normalized internally).
            Pass masses for a center-of-mass constraint.
        fixed_point_idx : int, optional
            Which point absorbs the constraint. Indexes into
            ``subset_point_indices`` when one is given, into all points
            otherwise. Default 0.
        origin : sequence of float, optional
            ``(space_dimension,)`` target centroid position. Default: the
            origin of the coordinate system.
        translate_back : bool, optional
            If ``True`` (default) the output is translated back to the
            input frame; required for :meth:`inverse` to be defined.
        return_partial : bool, optional
            If ``True``, return only the propagated (non-fixed) features —
            used for testing. Incompatible with ``translate_back=True``.

        Returns
        -------
        CenteredCentroidFlow

        Raises
        ------
        ValueError
            If ``origin`` has the wrong length, ``weights`` and
            ``subset_point_indices`` disagree in length, or
            ``return_partial`` conflicts with ``translate_back``.
        """
        if return_partial and translate_back:
            raise ValueError("'return_partial=True' is supported only if "
                             "'translate_back=False'")
        if origin is None:
            origin = np.zeros(space_dimension)
        else:
            origin = np.asarray(origin, dtype=float)
            if len(origin) != space_dimension:
                raise ValueError(
                    "'origin' must have length equal to 'space_dimension'.")

        if subset_point_indices is None:
            subset_fixed_point_idx = fixed_point_idx
        else:
            subset_point_indices = np.asarray(subset_point_indices)
            subset_fixed_point_idx = int(
                subset_point_indices[fixed_point_idx])
            if weights is not None and \
                    len(weights) != len(subset_point_indices):
                raise ValueError("'weights' must have the same length as "
                                 "'subset_point_indices'.")

        # Flattened DOF indices of the fixed point (any space dimension).
        fixed_indices = (subset_fixed_point_idx * space_dimension
                         + np.arange(space_dimension))

        base = PartialFlow.create(flow, fixed_indices,
                                  n_features=n_features,
                                  return_partial=return_partial)

        if weights is not None:
            weights = np.asarray(weights, dtype=float)
            weights = weights / weights.sum()
            weights = jnp.asarray(weights[:, None])

        return cls(
            flow=base.flow,
            fixed_indices_buf=base.fixed_indices_buf,
            propagated_indices=base.propagated_indices,
            return_partial=return_partial,
            space_dimension=int(space_dimension),
            fixed_point_idx=int(fixed_point_idx),
            subset_point_indices=(
                None if subset_point_indices is None
                else jnp.asarray(subset_point_indices)),
            weights=weights,
            origin=jnp.asarray(origin),
            translate_back=translate_back,
        )

    # ------------------------------------------------------------------ #
    def forward(self, x):
        """Map ``x`` of shape ``(batch, n_features)`` forward.

        Returns
        -------
        y : jax.Array
            ``(batch, n_features)`` transformed configurations with the
            centroid constraint restored.
        log_det_J : jax.Array
            ``(batch,)`` log-absolute-Jacobian-determinant of the wrapped
            flow (the constraint and translations contribute zero).
        """
        return self._transform(x, inverse=False)

    def inverse(self, y):
        """Invert :meth:`forward`; requires ``translate_back=True``."""
        if not self.translate_back:
            raise ValueError(
                "The inverse of CenteredCentroidFlow can be computed only if "
                "'translate_back' is set to True during both the forward and "
                "inverse transformations.")
        return self._transform(y, inverse=True)

    def _transform(self, x, inverse: bool):
        d = self.space_dimension
        batch = x.shape[0]
        x_atoms = x.reshape(batch, -1, d)

        centroid = self._compute_centroid(x_atoms)
        translate = (self.origin[None, :] - centroid)[:, None, :]
        x_atoms = x_atoms + translate
        x_flat = x_atoms.reshape(batch, -1)

        out = (PartialFlow.inverse(self, x_flat) if inverse
               else PartialFlow.forward(self, x_flat))
        if self.return_partial:
            return out
        y, log_det_J = out[0], out[1]

        # Restore the centroid constraint through the fixed point.
        if self.subset_point_indices is None or \
                self.subset_point_indices.shape[0] > 1:
            y_atoms = y.reshape(batch, -1, d)
            y_centroid, fixed_weight = self._compute_centroid(
                y_atoms, exclude_fixed_point=True)
            fixed_value = (self.origin[None, :] - y_centroid) / fixed_weight
            y = y.at[:, self.fixed_indices_buf].set(fixed_value)

        if self.translate_back:
            y_atoms = y.reshape(batch, -1, d) - translate
            y = y_atoms.reshape(batch, -1)

        return (y, log_det_J, *out[2:])

    def _compute_centroid(self, x_atoms, exclude_fixed_point: bool = False):
        if self.subset_point_indices is None:
            subset = x_atoms
        else:
            subset = x_atoms[:, self.subset_point_indices]

        if self.weights is None:
            centroid = jnp.mean(subset, axis=1)
            fixed_weight = 1.0 / subset.shape[1]
        else:
            centroid = jnp.sum(subset * self.weights[None], axis=1)
            fixed_weight = self.weights[self.fixed_point_idx, 0]

        if exclude_fixed_point:
            centroid = centroid - subset[:, self.fixed_point_idx] * fixed_weight
            return centroid, fixed_weight
        return centroid
