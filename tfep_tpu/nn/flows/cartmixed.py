"""Cartesian <-> mixed (internal + Cartesian) coordinate conversion flow.

Wraps a flow so it runs in mixed coordinates: Z-matrix atoms become
(bond, angle, torsion) triplets while Cartesian atoms are expressed in a
relative reference frame (origin atom at the origin, axis atom on the
positive x axis, plane atom on the xy plane with its position in polar
coordinates d02/a102). Constant roto-translational DOFs can be removed
from the flow input entirely, or kept as always-zero "reference" DOFs.
All index bookkeeping happens host-side at construction, so the conversion
compiles to static gathers + the scanned NeRF reconstruction. Reference
behavior: /root/reference/tfep/app/mixedmaf.py:954-1382 (built on bgflow's
RelativeInternalCoordinateTransformation, replaced here by
:mod:`tfep_tpu.ops.zmatrix`).

Layout of the mixed coordinates (n_ic = number of Z-matrix rows):
``[bonds (n_ic), angles (n_ic), torsions (n_ic), d01, d02, a102,
cartesian DOFs (with constant reference DOFs last)]``.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from tfep_tpu.nn.flows.flow import Flow
from tfep_tpu.nn.module import buffer, static
from tfep_tpu.ops.zmatrix import (
    build_placement_schedule,
    cartesian_to_internal, internal_to_cartesian, normalize_torsions_fn,
    unnormalize_torsions_fn,
)
from tfep_tpu.utils.geometry import (
    batchwise_rotate, cartesian_to_polar, get_axis_from_name,
    polar_to_cartesian, reference_frame_rotation_matrix,
)
from tfep_tpu.utils.misc import remove_and_shift_sorted_indices

__all__ = ['CartesianToMixedFlow']


class CartesianToMixedFlow(Flow):
    """Convert to mixed coordinates, run the wrapped flow, convert back.

    The workhorse of :class:`~tfep_tpu.app.MixedMAFMap`: Z-matrix atoms are
    expressed as (bond, angle, torsion) internal coordinates — much easier
    for an autoregressive flow to model than raw Cartesians — while bulky
    or weakly-coupled atoms (e.g. solvent) stay Cartesian in a relative
    reference frame defined by three reference atoms. The full round trip
    (Cartesian -> mixed -> flow -> Cartesian) is a bijection whose log-det
    sums the conversion Jacobians (computed analytically, including the
    global-frame volume elements the reference omits) with the wrapped
    flow's.

    Angles and torsions are normalized to the flow's domain; the NeRF
    reconstruction of IC atoms runs as a level-scheduled ``lax.scan`` over
    Z-matrix dependency depth (atoms at the same depth place in parallel),
    with the schedule precomputed host-side at :meth:`create` time.

    Attributes
    ----------
    flow : Flow
        The wrapped flow, operating on the mixed-coordinate vector.
    z_matrix : jax.Array
        ``(n_ic, 4)`` rows ``(atom, bond_ref, angle_ref, torsion_ref)``.
    cartesian_atom_indices : jax.Array
        Cartesian-represented atoms, the three reference atoms (origin,
        axis, plane) moved to the last three slots.
    cartesian_keep_indices : jax.Array
        Flattened relative-frame Cartesian DOFs the flow actually sees
        (constrained/reparametrized reference DOFs dropped, kept-constant
        reference DOFs last).
    placement_schedule : tuple
        Level-scheduled NeRF placement plan
        (:func:`tfep_tpu.ops.zmatrix.build_placement_schedule`).
    remove_ref_rototranslation : tuple of bool
        Per reference atom (origin, axis, plane): drop its constant
        roto-translational DOFs from the flow input entirely (``True``) or
        keep them as always-zero features (``False``).
    """

    flow: object
    z_matrix: jnp.ndarray = buffer(default=None)            # (n_ic, 4)
    cartesian_atom_indices: jnp.ndarray = buffer(default=None)  # ref last 3
    # Indices into the flattened relative-frame cartesian block that the
    # flow sees (constant reference DOFs last).
    cartesian_keep_indices: jnp.ndarray = buffer(default=None)
    #: Level-scheduled placement plan (targets, refs, cols), built at
    #: create time while the Z-matrix is concrete.
    placement_schedule: tuple = buffer(default=None)
    remove_ref_rototranslation: tuple = static(default=(True, True, True))
    n_atoms: int = static(default=0)

    @classmethod
    def create(cls, flow, cartesian_atom_indices: Sequence[int],
               z_matrix, reference_atom_indices: Sequence[int],
               remove_ref_rototranslation: Sequence[bool]
               ) -> 'CartesianToMixedFlow':
        """Build the conversion flow; all bookkeeping happens here.

        Parameters
        ----------
        flow : Flow
            The wrapped flow; must accept ``n_dofs_out`` features laid out
            as documented in the module docstring.
        cartesian_atom_indices : sequence of int
            Sorted indices (in the fixed-atoms-removed index space) of the
            atoms kept in Cartesian representation, including the three
            reference atoms.
        z_matrix : array_like
            ``(n_ic, 4)`` integer Z-matrix in the same index space.
        reference_atom_indices : sequence of int
            The (origin, axis, plane) atoms defining the relative frame.
        remove_ref_rototranslation : sequence of bool
            Length 3; whether each reference atom's constant DOFs are
            removed from the flow input (vs kept as zero features).

        Returns
        -------
        CartesianToMixedFlow
        """
        z_matrix = np.asarray(z_matrix, dtype=np.int64).reshape(-1, 4)
        cartesian_atom_indices = np.asarray(cartesian_atom_indices,
                                            dtype=np.int64)
        reference_atom_indices = np.asarray(reference_atom_indices,
                                            dtype=np.int64)

        # Move the reference atoms to the end (they are always Cartesian).
        cartesian_atom_indices = remove_and_shift_sorted_indices(
            cartesian_atom_indices,
            removed_indices=np.sort(reference_atom_indices),
            remove=True, shift=False)
        cartesian_atom_indices = np.concatenate(
            [cartesian_atom_indices, reference_atom_indices])

        n_atoms = len(cartesian_atom_indices) + len(z_matrix)

        # Flattened relative-frame cartesian DOFs to keep, mirroring
        # mixedmaf.py:1259-1271: constrained/represented-elsewhere DOFs drop,
        # kept-constant reference DOFs go last.
        n_cart_dofs = 3 * len(cartesian_atom_indices)
        remove = tuple(bool(b) for b in remove_ref_rototranslation)
        keep = np.ones(n_cart_dofs, dtype=bool)
        # The 9 reference-atom DOFs never stay in place: they are either
        # removed outright or re-appended last as kept-constant DOFs.
        keep[-9:] = False
        ref_kept = []
        if not remove[0]:
            # Origin atom: all three translations are kept constants.
            ref_kept.extend([n_cart_dofs - 9, n_cart_dofs - 8,
                             n_cart_dofs - 7])
        if not remove[1]:
            # Axis atom: x is d01; y, z are constant zeros.
            ref_kept.extend([n_cart_dofs - 5, n_cart_dofs - 4])
        if not remove[2]:
            # Plane atom: x, y are polar d02/a102; z is a constant zero.
            ref_kept.append(n_cart_dofs - 1)
        keep_indices = np.concatenate(
            [np.nonzero(keep)[0], np.asarray(ref_kept, dtype=np.int64)])

        return cls(flow=flow,
                   z_matrix=jnp.asarray(z_matrix),
                   cartesian_atom_indices=jnp.asarray(cartesian_atom_indices),
                   cartesian_keep_indices=jnp.asarray(
                       keep_indices.astype(np.int64)),
                   placement_schedule=build_placement_schedule(
                       z_matrix, int(n_atoms)),
                   remove_ref_rototranslation=remove,
                   n_atoms=int(n_atoms))

    # ------------------------------------------------------------------ #
    # Introspection (host side).
    # ------------------------------------------------------------------ #
    @property
    def n_ic_atoms(self) -> int:
        return int(self.z_matrix.shape[0])

    @property
    def n_cartesian_atoms(self) -> int:
        return int(self.cartesian_atom_indices.shape[0])

    @property
    def n_reference_dofs_kept(self) -> int:
        n = 0
        if not self.remove_ref_rototranslation[0]:
            n += 3
        if not self.remove_ref_rototranslation[1]:
            n += 2
        if not self.remove_ref_rototranslation[2]:
            n += 1
        return n

    @property
    def n_dofs_out(self) -> int:
        return 3 * self.n_ic_atoms + 3 + int(
            self.cartesian_keep_indices.shape[0])

    def get_dof_indices_by_type(self, conditioning_atom_indices=None
                                ) -> Dict[str, Optional[np.ndarray]]:
        """Mixed-coordinate DOF indices grouped by type.

        Keys: distances (incl. d01/d02), angles (incl. a102), torsions,
        cartesians, reference (kept constant roto-translational DOFs),
        conditioning. Reference behavior: mixedmaf.py:1073-1156.
        """
        n_ic = self.n_ic_atoms
        d01 = np.asarray([3 * n_ic])
        d02 = np.asarray([3 * n_ic + 1])
        a102 = np.asarray([3 * n_ic + 2])
        cart_start = 3 * n_ic + 3
        n_cart = int(self.cartesian_keep_indices.shape[0])
        cartesians = np.arange(cart_start, cart_start + n_cart)

        n_ref = self.n_reference_dofs_kept
        if n_ref > 0:
            reference = cartesians[-n_ref:]
            cartesians = cartesians[:-n_ref]
        else:
            reference = np.asarray([], dtype=np.int64)

        out = {
            'distances': np.concatenate([np.arange(n_ic), d01, d02]),
            'angles': np.concatenate([np.arange(n_ic, 2 * n_ic), a102]),
            'torsions': np.arange(2 * n_ic, 3 * n_ic),
            'd01': d01, 'd02': d02, 'a102': a102,
            'cartesians': cartesians,
            'reference': reference,
        }

        if conditioning_atom_indices is None:
            out['conditioning'] = None
            return out

        cond_set = set(np.asarray(conditioning_atom_indices).tolist())
        cart_atoms = np.asarray(self.cartesian_atom_indices)
        # Conditioning atoms are always Cartesian; find their DOF positions
        # among the non-reference cartesian atoms.
        positions = [i for i, v in enumerate(cart_atoms[:-3].tolist())
                     if v in cond_set]
        dof_positions = (np.asarray(positions, dtype=np.int64)[:, None] * 3
                         + np.arange(3)).reshape(-1)
        cond = [out['cartesians'][dof_positions]] if len(positions) else []

        axis_atom, plane_atom = cart_atoms[-2:].tolist()
        if axis_atom in cond_set:
            cond.append(d01)
        if plane_atom in cond_set:
            cond.append(d02)
            cond.append(a102)
        if cond:
            out['conditioning'] = np.sort(np.concatenate(cond))
        else:
            out['conditioning'] = None
        return out

    # ------------------------------------------------------------------ #
    # Conversion.
    # ------------------------------------------------------------------ #
    def forward(self, x):
        """Map ``(batch, 3*n_atoms)`` Cartesians through the wrapped flow.

        Returns ``(y, log_det_J, *extras)`` in Cartesian coordinates; the
        log-det includes both conversion Jacobians and the flow's.
        """
        return self._pass(x, inverse=False)

    def inverse(self, y):
        """Invert :meth:`forward` (runs the wrapped flow's inverse between
        the same coordinate conversions)."""
        return self._pass(y, inverse=True)

    def _pass(self, x, inverse: bool):
        y, ldj, origin_position, rotation = self.cartesian_to_mixed(x)
        out = self.flow.inverse(y) if inverse else self.flow.forward(y)
        y, flow_ldj = out[0], out[1]
        ldj = ldj + flow_ldj
        x_out, inv_ldj = self.mixed_to_cartesian(y, origin_position, rotation)
        return (x_out, ldj + inv_ldj, *out[2:])

    def cartesian_to_mixed(self, x):
        """(batch, n_atoms*3) -> mixed coords + frame info for the way back."""
        batch = x.shape[0]
        x_atoms = x.reshape(batch, self.n_atoms, 3)

        bonds, angles, torsions, ldj = cartesian_to_internal(
            x_atoms, self.z_matrix, normalize_angles=True)

        x_cart = x_atoms[:, self.cartesian_atom_indices]

        # Relative reference frame: origin at the origin atom, axis atom on
        # +x (the spline keeps d01 positive, so projecting on the positive
        # axis remains invertible), plane atom on the xy plane.
        origin_position = x_cart[:, -3]
        x_cart = x_cart - origin_position[:, None, :]
        rotation = reference_frame_rotation_matrix(
            axis_atom_positions=x_cart[:, -2],
            plane_atom_positions=x_cart[:, -1],
            axis=get_axis_from_name('x').astype(x.dtype),
            plane_axis=get_axis_from_name('y').astype(x.dtype),
            project_on_positive_axis=True)
        x_cart = batchwise_rotate(x_cart, rotation)

        d01 = x_cart[:, -2, 0]
        d02, a102 = cartesian_to_polar(
            x_cart[:, -1, 0], x_cart[:, -1, 1])
        # Global-frame volume element: the axis atom carries weight d01^2
        # (its two angular DOFs parametrize the frame rotation applied to
        # every atom), the plane atom d02^2 sin(a102) (its azimuth about the
        # axis is the third frame angle). The reference counts only 1/d02
        # here (mixedmaf.py:1243-1254), which leaves its log_det_J off by
        # the frame-weight ratio; these terms make the full map's log-det
        # match the autograd oracle exactly.
        ldj = ldj - 2.0 * jnp.log(d01) - 2.0 * jnp.log(d02) \
            - jnp.log(jnp.abs(jnp.sin(a102)))
        a102n, tor_ldj = normalize_torsions_fn(a102[:, None])
        a102 = a102n[:, 0]
        ldj = ldj + tor_ldj

        x_cart_flat = x_cart.reshape(batch, -1)
        x_cart_kept = x_cart_flat[:, self.cartesian_keep_indices]

        y = jnp.concatenate([
            bonds, angles, torsions,
            d01[:, None], d02[:, None], a102[:, None], x_cart_kept,
        ], axis=-1)
        return y, ldj, origin_position, rotation

    def mixed_to_cartesian(self, y, origin_position, rotation):
        """Inverse of :meth:`cartesian_to_mixed` given the stored frame."""
        batch = y.shape[0]
        n_ic = self.n_ic_atoms
        dtype = y.dtype

        bonds = y[:, :n_ic]
        angles = y[:, n_ic:2 * n_ic]
        torsions = y[:, 2 * n_ic:3 * n_ic]
        d01 = y[:, 3 * n_ic]
        d02 = y[:, 3 * n_ic + 1]
        a102 = y[:, 3 * n_ic + 2]
        y_cart_kept = y[:, 3 * n_ic + 3:]

        a102u, ldj = unnormalize_torsions_fn(a102[:, None])
        a102 = a102u[:, 0]
        plane_x, plane_y = polar_to_cartesian(d02, a102)
        # Inverse of the global-frame volume element (see cartesian_to_mixed).
        ldj = ldj + 2.0 * jnp.log(d01) + 2.0 * jnp.log(d02) \
            + jnp.log(jnp.abs(jnp.sin(a102)))

        # Rebuild the full relative-frame cartesian block.
        n_cart_dofs = 3 * self.n_cartesian_atoms
        cart_full = jnp.zeros((batch, n_cart_dofs), dtype=dtype)
        cart_full = cart_full.at[:, self.cartesian_keep_indices].set(
            y_cart_kept)
        cart_full = cart_full.at[:, n_cart_dofs - 6].set(d01)      # axis x
        cart_full = cart_full.at[:, n_cart_dofs - 3].set(plane_x)  # plane x
        cart_full = cart_full.at[:, n_cart_dofs - 2].set(plane_y)  # plane y

        cart_atoms = cart_full.reshape(batch, -1, 3)
        cart_atoms = batchwise_rotate(cart_atoms, rotation, inverse=True)
        cart_atoms = cart_atoms + origin_position[:, None, :]

        # Scatter the cartesian atoms into the full positions array and
        # reconstruct the IC atoms.
        positions_init = jnp.zeros((batch, self.n_atoms, 3), dtype=dtype)
        positions_init = positions_init.at[
            :, self.cartesian_atom_indices].set(cart_atoms)
        positions, rec_ldj = internal_to_cartesian(
            bonds, angles, torsions, positions_init, self.z_matrix,
            normalize_angles=True, schedule=self.placement_schedule)
        ldj = ldj + rec_ldj

        return positions.reshape(batch, -1), ldj

    def n_parameters(self) -> int:
        return self.flow.n_parameters()
