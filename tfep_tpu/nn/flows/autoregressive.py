"""Generic autoregressive flow: conditioner + transformer composition.

Forward is a single conditioner pass plus a transformer apply. Inverse runs
one conditioner pass per autoregressive degree-group as a ``lax.fori_loop``
with masked updates — compiling to a rolled scan rather than the reference's
Python loop (/root/reference/tfep/nn/flows/autoregressive.py:179-229), so
compile time stays O(1) in the number of degrees while runtime stays
O(n_degree_groups) conditioner passes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tfep_tpu.nn.flows.flow import Flow
from tfep_tpu.nn.module import buffer, static

__all__ = ['AutoregressiveFlow']


class AutoregressiveFlow(Flow):
    """Autoregressive flow parametrized by a conditioner and a transformer.

    ``transformer_indices`` (host-side, at construction) groups the
    transformed feature indices by autoregressive order; features absent from
    it are fixed (propagated unchanged). Reference behavior:
    /root/reference/tfep/nn/flows/autoregressive.py:29-247.

    The forward direction is one conditioner pass (the conditioner — e.g.
    :class:`~tfep_tpu.nn.conditioners.MADE` — must itself be autoregressive
    over the same degree ordering) followed by one elementwise transformer
    apply. The inverse resolves one degree group per iteration: group
    ``i``'s inputs depend only on groups ``< i``, so after ``i`` masked
    conditioner passes those features are exact. The loop is a
    ``lax.fori_loop`` over the *groups* (typically few: MAF degree values),
    not the features, and compiles once regardless of dimension.

    Attributes
    ----------
    conditioner : Module
        Maps ``(batch, n_conditioner_features) -> (batch, n_parameters)``
        transformer parameters, autoregressively.
    transformer : Transformer
        Elementwise bijection applied with those parameters.
    transformer_indices_buf : jax.Array or None
        Sorted indices of transformed features, or ``None`` when every
        feature is transformed.
    inverse_masks : jax.Array
        ``(n_iterations, n_features)`` bool masks — which features become
        exact at each inverse iteration.
    fixed_indices : jax.Array
        Features propagated unchanged (possibly empty).
    conditioner_indices : jax.Array or None
        Optional subset of input features fed to the conditioner.
    """

    conditioner: object
    transformer: object
    # (n_transformed,) sorted indices of features fed to the transformer.
    transformer_indices_buf: Optional[jnp.ndarray] = buffer()
    # (n_iterations, n_features) bool: which features resolve at iteration i.
    inverse_masks: jnp.ndarray = buffer()
    # (n_fixed,) indices not transformed (may be empty).
    fixed_indices: jnp.ndarray = buffer()
    # Optional subset of features passed to the conditioner (None = all).
    conditioner_indices: Optional[jnp.ndarray] = buffer()
    n_features_in: int = static()
    # (n_iterations, g_max) group positions within the transformed set,
    # padded by repetition — the fast-inverse table (see create()). Static
    # (host tuple-of-tuples): not a pytree leaf, so checkpoints are
    # layout-compatible with flows saved before it existed.
    inverse_groups_t: Optional[tuple] = static(default=None)
    # (n_iterations, r_max) conditioner-output rows per degree group,
    # padded by repetition — the layout-agnostic fast-inverse table (set
    # by MAF.create from the transformer's get_degrees_out; see inverse()).
    inverse_param_rows: Optional[tuple] = static(default=None)

    @classmethod
    def create(cls, n_features_in: int, transformer_indices,
               conditioner, transformer,
               conditioner_indices=None,
               initialize_identity: bool = True,
               inverse_param_rows=None) -> 'AutoregressiveFlow':
        """Build the flow from index groups + conditioner + transformer.

        Parameters
        ----------
        n_features_in : int
            Total input feature count.
        transformer_indices : sequence of sequence of int
            Transformed feature indices grouped by autoregressive degree
            (group ``i`` may depend on groups ``< i`` only). Features in
            no group are propagated unchanged.
        conditioner : Conditioner
            Autoregressive parameter network (must respect the same degree
            ordering — see :func:`tfep_tpu.nn.conditioners.generate_degrees`).
        transformer : Transformer
            Elementwise bijection.
        conditioner_indices : sequence of int, optional
            Subset of input features the conditioner sees (default: all).
        initialize_identity : bool, optional
            If ``True`` (default), zero the conditioner's output layer and
            bias it to the transformer's identity parameters so the flow
            starts as the identity map.
        inverse_param_rows : sequence of sequence of int, optional
            For each degree group (in ``transformer_indices`` order), the
            conditioner-output rows holding that group's transformer
            parameters. Enables the layout-agnostic restricted inverse
            for transformers without ``slice_features`` (e.g. Mixed);
            :class:`~tfep_tpu.nn.flows.MAF` derives it from the
            transformer's ``get_degrees_out``.

        Returns
        -------
        AutoregressiveFlow
        """
        groups = [np.asarray(g).reshape(-1) for g in transformer_indices]
        for g in groups:
            if np.any((g < 0) | (g >= n_features_in)):
                raise ValueError('All indices must be 0 <= i < n_features_in.')
        # Empty groups are legal (e.g. programmatically generated from a
        # degree histogram) but contribute nothing: drop them — each would
        # only add a no-op inverse iteration — keeping any per-group
        # inverse_param_rows aligned.
        if inverse_param_rows is not None \
                and len(inverse_param_rows) != len(groups):
            raise ValueError(
                f'inverse_param_rows must have one entry per transformer '
                f'group ({len(groups)}), got {len(inverse_param_rows)}.')
        if any(len(g) == 0 for g in groups):
            keep = [i for i, g in enumerate(groups) if len(g)]
            if inverse_param_rows is not None:
                inverse_param_rows = [inverse_param_rows[i] for i in keep]
            groups = [groups[i] for i in keep]
        if conditioner_indices is not None:
            conditioner_indices = np.asarray(conditioner_indices)
            if np.any((conditioner_indices < 0) |
                      (conditioner_indices >= n_features_in)):
                raise ValueError('All indices must be 0 <= i < n_features_in.')

        inverse_masks = np.zeros((len(groups), n_features_in), dtype=bool)
        for i, g in enumerate(groups):
            inverse_masks[i, g] = True

        all_transformed = np.sort(np.concatenate(groups)) if groups else \
            np.zeros(0, dtype=np.int64)
        fixed = np.setdiff1d(np.arange(n_features_in), all_transformed)
        n_transformed = len(all_transformed)

        if initialize_identity:
            identity_parameters = transformer.get_identity_parameters(
                n_transformed)
            conditioner = conditioner.set_output(
                jnp.asarray(identity_parameters))

        # Fast-inverse group table: each group's feature positions WITHIN
        # the transformed set, padded (by repeating the first element) to a
        # rectangle so the inverse scan has static shapes. Stored static —
        # not a buffer — so the pytree (and thus checkpoints) are
        # unaffected. Padded duplicates are harmless: the scatter writes
        # the same value twice.
        position = {int(f): p for p, f in enumerate(all_transformed)}
        g_max = max((len(g) for g in groups), default=0)
        groups_t = tuple(
            tuple(position[int(f)] for f in g)
            + (position[int(g[0])],) * (g_max - len(g))
            for g in groups)

        if inverse_param_rows is not None:
            rows_list = [tuple(int(r) for r in np.asarray(rows).reshape(-1))
                         for rows in inverse_param_rows]
            if len(rows_list) != len(groups) or any(
                    len(r) == 0 for r in rows_list):
                raise ValueError(
                    'inverse_param_rows needs one non-empty row list per '
                    'transformer_indices group.')
            r_max = max(len(r) for r in rows_list)
            inverse_param_rows = tuple(
                r + (r[0],) * (r_max - len(r)) for r in rows_list)

        return cls(
            conditioner=conditioner,
            transformer=transformer,
            transformer_indices_buf=(
                jnp.asarray(all_transformed) if len(fixed) > 0 else None),
            inverse_masks=jnp.asarray(inverse_masks),
            fixed_indices=jnp.asarray(fixed),
            conditioner_indices=(
                None if conditioner_indices is None
                else jnp.asarray(conditioner_indices)),
            n_features_in=int(n_features_in),
            inverse_groups_t=groups_t,
            inverse_param_rows=inverse_param_rows,
        )

    @property
    def has_fixed_indices(self) -> bool:
        return self.transformer_indices_buf is not None

    def get_transformer_parameters(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.conditioner_indices is not None:
            x = x[:, self.conditioner_indices]
        return self.conditioner(x)

    def forward(self, x: jnp.ndarray):
        """One conditioner pass + one transformer apply.

        Returns ``(y, log_det_J)`` with shapes ``(batch, n_features)`` and
        ``(batch,)``.
        """
        x = jnp.asarray(x)  # .at[] update below requires a jax array
        parameters = self.get_transformer_parameters(x)
        if self.has_fixed_indices:
            idx = self.transformer_indices_buf
            y_t, log_det_J = self.transformer.forward(x[:, idx], parameters)
            y = x.at[:, idx].set(y_t)
        else:
            y, log_det_J = self.transformer.forward(x, parameters)
        return y, log_det_J

    @property
    def _can_fast_inverse(self) -> bool:
        """Whether the restricted (per-group) inverse path applies.

        Requires a conditioner exposing ``forward_rows`` (e.g. MADE), a
        transformer exposing ``slice_features`` — only implemented by
        transformers whose parameter layout is the standard tiling
        ``(batch, n_parameters_per_feature, n_features)`` — and the group
        table built by :meth:`create`.
        """
        return (self.inverse_groups_t is not None
                and len(self.inverse_groups_t) > 0
                and hasattr(self.conditioner, 'forward_rows')
                and hasattr(self.transformer, 'slice_features')
                and getattr(self.transformer, 'n_parameters_per_feature',
                            None) is not None)

    @property
    def _can_row_restricted_inverse(self) -> bool:
        """Whether the layout-agnostic restricted inverse applies: needs
        the per-group conditioner-row table (built by MAF.create from the
        transformer's get_degrees_out) and a row-restrictable conditioner.
        The transformer's identity parameters supply the fill for rows
        outside the current group; a transformer that cannot express the
        identity (get_identity_parameters raises) falls back to the full
        path at trace time."""
        return (self.inverse_param_rows is not None
                and len(self.inverse_param_rows) > 0
                and hasattr(self.conditioner, 'forward_rows'))

    def inverse(self, y: jnp.ndarray):
        """Exact inverse in ``n_degree_groups`` conditioner passes.

        Rolled as a ``lax.fori_loop`` with masked updates so compile time
        is O(1) in the number of groups. When the conditioner/transformer
        pair supports it (see :attr:`_can_fast_inverse`), each iteration
        computes only the current degree-group's conditioner output rows
        and transformer features — the full output matmul carries ~80% of
        a MADE pass's FLOPs and the elementwise transformer inverse is
        n_groups× too wide, yet each iteration consumes one group
        (measured ~5× on the fully-autoregressive bench config).

        Returns ``(x, log_det_J)`` where ``log_det_J`` is the inverse
        map's log-det, taken from the final (fully-resolved) full
        transformer pass — the same contract as the reference's last-pass
        log_det_J (and exact regardless of which path ran before it).

        The cost is intrinsically ~n_degree_groups conditioner passes;
        if generation dominates your workload, prefer coupling-style
        degree blocks (``generate_degrees(..., repeats=k)`` /
        the maps' ``degrees_repeats``) — measured ~1.35M inverse
        frames/s at two-block coupling vs ~145k fully autoregressive
        (docs/PERFORMANCE.md).
        """
        y = jnp.asarray(y)  # traced indexing below requires a jax array
        n_iterations = self.inverse_masks.shape[0]

        if self.has_fixed_indices:
            idx = self.transformer_indices_buf
            y_t = y[:, idx]
            # Masks over the transformer feature axis.
            inverse_masks_t = self.inverse_masks[:, idx]
        else:
            idx = None
            y_t = y
            inverse_masks_t = self.inverse_masks

        x0 = jnp.where(self.inverse_masks.any(axis=0)[None, :],
                       jnp.zeros_like(y), y)

        def step(i, x):
            parameters = self.get_transformer_parameters(x)
            x_temp, log_det_J = self.transformer.inverse(y_t, parameters)
            mask_t = inverse_masks_t[i]                # (n_transformed,)
            if idx is not None:
                x_new = x.at[:, idx].set(
                    jnp.where(mask_t[None, :], x_temp, x[:, idx]))
            else:
                x_new = jnp.where(mask_t[None, :], x_temp, x)
            return x_new, log_det_J

        if self._can_fast_inverse:
            groups_t = jnp.asarray(self.inverse_groups_t, dtype=jnp.int32)
            n_t = y_t.shape[1]
            n_per = self.transformer.n_parameters_per_feature

            def fast_step(i, x):
                g = groups_t[i]                        # (g_max,)
                # Conditioner output rows of group g's parameters in the
                # tiled layout: row k*n_t + g_j — ordered so the restricted
                # output IS the sliced transformer's parameter vector.
                rows = (jnp.arange(n_per, dtype=g.dtype)[:, None] * n_t
                        + g[None, :]).reshape(-1)
                x_cond = x
                if self.conditioner_indices is not None:
                    x_cond = x[:, self.conditioner_indices]
                params_g = self.conditioner.forward_rows(x_cond, rows)
                x_g, _ = self.transformer.slice_features(g).inverse(
                    y_t[:, g], params_g)
                # Full-input positions of the group features; padded
                # duplicates scatter identical values (harmless).
                pos = g if idx is None else idx[g]
                return x.at[:, pos].set(x_g)

            x = jax.lax.fori_loop(0, n_iterations - 1, fast_step, x0)
        elif self._can_row_restricted_inverse and (identity := \
                _identity_parameters_or_none(
                    self.transformer, y_t.shape[1], y.dtype)) is not None:
            # Layout-agnostic variant for transformers without
            # slice_features (e.g. Mixed): compute only the group's
            # conditioner-output rows, scatter them into an
            # identity-parameter fill, and run the transformer full-width
            # — positions outside the group see the identity transform
            # (finite everywhere) and are discarded by the masked update.
            # Saves the MADE output matmul (~80% of a pass's FLOPs); the
            # elementwise transformer inverse stays full-width.
            rows_t = jnp.asarray(self.inverse_param_rows, dtype=jnp.int32)

            def row_step(i, x):
                rows = rows_t[i]                       # (r_max,)
                x_cond = x
                if self.conditioner_indices is not None:
                    x_cond = x[:, self.conditioner_indices]
                values = self.conditioner.forward_rows(x_cond, rows)
                parameters = jnp.broadcast_to(
                    identity[None, :], (x.shape[0], identity.shape[0])
                ).at[:, rows].set(values)
                x_temp, _ = self.transformer.inverse(y_t, parameters)
                mask_t = inverse_masks_t[i]
                if idx is not None:
                    return x.at[:, idx].set(
                        jnp.where(mask_t[None, :], x_temp, x[:, idx]))
                return jnp.where(mask_t[None, :], x_temp, x)

            x = jax.lax.fori_loop(0, n_iterations - 1, row_step, x0)
        else:
            x = jax.lax.fori_loop(
                0, n_iterations - 1, lambda i, x: step(i, x)[0], x0)
        # Final iteration outside the loop: resolves the last group with a
        # full pass whose log_det_J is the total one (same contract as the
        # reference's last-pass log_det_J).
        x, log_det_J = step(n_iterations - 1, x)
        return x, log_det_J


def _identity_parameters_or_none(transformer, n_features: int, dtype):
    """The transformer's identity parameters as a device constant, or
    ``None`` when they cannot be obtained at trace time — either the
    transformer cannot express the identity (e.g. a neural spline with
    x0 != y0) or its buffers are themselves traced (the flow was passed
    as a jit *argument* rather than closed over, so host-side validation
    like ``np.allclose(x0, y0)`` cannot run). Both cases fall back to the
    full-pass inverse; for the fast generation path, close the flow over
    the jitted function instead of passing it as an argument."""
    try:
        identity = transformer.get_identity_parameters(n_features)
    except (ValueError, NotImplementedError,
            jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError):
        return None
    return jnp.asarray(identity, dtype=dtype)
