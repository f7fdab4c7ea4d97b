"""Mixed internal/Cartesian MAF map — the flagship TFEP map.

Automatically builds a Z-matrix per connected molecular fragment from the
bond graph (BFS with a 4-level priority heuristic: closeness to the atom,
closeness to its bond atom, recency in the Z-matrix, hydrogen
de-prioritization), validates Z-matrix independence and non-collinearity
over a dataset pass, computes per-DOF min/max over subsampled frames to
initialize neural-spline domains, and wires a MixedTransformer (splines for
distances/angles/torsions/Cartesians; kept constant reference DOFs pass
through as conditioning so the map's log-det stays exact) with a periodic
embedding for torsions inside a stack of MAF layers wrapped by the
Cartesian<->mixed conversion flow.

Model construction is host-side (numpy/networkx) — the model *shape*
depends on the dataset (bond topology, observed coordinate ranges), and
resolving it before tracing keeps every device shape static (SURVEY §3.4).
Reference behaviors: /root/reference/tfep/app/mixedmaf.py:275-948.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import networkx as nx
import numpy as np

from tfep_tpu.app.base import TFEPMapBase
from tfep_tpu.nn.conditioners.made import generate_degrees
from tfep_tpu.nn.embeddings import PeriodicEmbedding
from tfep_tpu.nn.flows import MAF, SequentialFlow
from tfep_tpu.nn.flows.cartmixed import CartesianToMixedFlow
from tfep_tpu.nn.transformers import (
    MixedTransformer, NeuralSplineTransformer,
)
from tfep_tpu.utils.misc import remove_and_shift_sorted_indices

__all__ = ['MixedMAFMap', 'check_independent', 'is_collinear']

logger = logging.getLogger(__name__)


def check_independent(z_matrix):
    """Raise if two Z-matrix rows share the same bond atom and reference set.

    (Dependent rows make the coordinate map non-invertible; check from
    bgmol, reference mixedmaf.py:876-895.)
    """
    dependent_rows = []
    all234 = [(row[1], frozenset(row[2:])) for row in z_matrix]
    for i, other in enumerate(all234):
        if other in all234[:i]:
            dependent_rows.append(i)
    if len(dependent_rows) > 1:
        err_msg = 'The following Z-matrix rows are not independent:\n'
        for i in dependent_rows:
            err_msg += f'\tRow {i}: {list(z_matrix[i])}\n'
        raise RuntimeError(err_msg)


def is_collinear(points, tol: float = 1e-2) -> bool:
    """True if any sample's three points are (nearly) collinear.

    ``points``: (batch, 3, 3). Reference: mixedmaf.py:898-920.
    """
    points = np.asarray(points)
    p0, p1, p2 = points[:, 0], points[:, 1], points[:, 2]
    v01 = p1 - p0
    v12 = p2 - p1
    v01 = v01 / np.linalg.norm(v01, axis=-1, keepdims=True)
    v12 = v12 / np.linalg.norm(v12, axis=-1, keepdims=True)
    cos = np.abs(np.sum(v01 * v12, axis=-1))
    return bool(np.any(np.isclose(cos, 1.0, atol=tol, rtol=0.0)))


class MixedMAFMap(TFEPMapBase):
    """TFEP map on mixed internal/Cartesian coordinates (the flagship map).

    Molecular fragments with at least 4 bonded atoms are represented in
    internal coordinates (bonds/angles/torsions from an automatically
    built Z-matrix); smaller fragments and solvent stay Cartesian. Every
    internal coordinate is transformed by a rational-quadratic spline
    whose domain comes from the dataset's observed ranges; torsions are
    circular splines with a periodic (cos, sin) conditioner embedding.
    The Cartesian<->internal conversion carries the exact log-det
    (including the frame volume element the reference omits), so the
    mapped ensemble's work values are exact in Cartesian space.

    Accepts every :class:`TFEPMapBase` argument plus the ones below.

    Parameters
    ----------
    n_maf_layers : int
        Number of MAF layers (alternating ascending/descending degrees).
    distance_lower_limit_displacement : float
        Widens the spline domain below the observed minimum of each bond
        distance (same positions units as the data), leaving room for the
        map to contract bonds.
    remove_translation, remove_rotation : bool
        Drop the reference atoms' roto-translational DOFs even when those
        atoms are mapped.
    n_bins : int
        Spline bins per internal coordinate.
    flow_kwargs : dict, optional
        Extra keyword arguments for :meth:`tfep_tpu.nn.flows.MAF.create`.
    remat : bool
        Rematerialize MAF layers in the backward pass (roughly halves
        training-step memory for deep stacks).
    degrees_repeats : int, optional
        Consecutive DOFs per autoregressive degree (default 1 = fully
        autoregressive). ``k > 1`` buys a ``~k`` times faster inverse
        (generation) at coupling-style expressiveness per layer — see
        :class:`~tfep_tpu.app.CartesianMAFMap` for the tradeoff.
    """

    def __init__(self, *args, n_maf_layers: int = 6,
                 distance_lower_limit_displacement: float = 0.3,
                 remove_translation: bool = False,
                 remove_rotation: bool = False,
                 n_bins: int = 5,
                 flow_kwargs: Optional[Dict] = None,
                 remat: bool = False, degrees_repeats: int = 1, **kwargs):
        super().__init__(*args, **kwargs)
        self.n_maf_layers = int(n_maf_layers)
        self.distance_lower_limit_displacement = float(
            distance_lower_limit_displacement)
        self.remove_translation = bool(remove_translation)
        self.remove_rotation = bool(remove_rotation)
        self.n_bins = int(n_bins)
        self.flow_kwargs = dict(flow_kwargs or {})
        self.remat = bool(remat)
        # Coupling-style degree blocks: ceil(n/k) inverse conditioner
        # passes instead of n (see CartesianMAFMap.degrees_repeats).
        self.degrees_repeats = int(degrees_repeats)
        self.hparams.update(
            n_maf_layers=self.n_maf_layers,
            distance_lower_limit_displacement=(
                self.distance_lower_limit_displacement),
            remove_translation=self.remove_translation,
            remove_rotation=self.remove_rotation,
            n_bins=self.n_bins, flow_kwargs=self.flow_kwargs,
            remat=self.remat, degrees_repeats=self.degrees_repeats)

    # ------------------------------------------------------------------ #
    def configure_flow(self):
        """Build the mixed internal/Cartesian flow: Z-matrix from the bond
        graph, one dataset pass for spline domains + collinearity checks,
        then the Cartesian<->internal conversion wrapping a spline MAF
        stack with periodic torsion embedding (cf.
        /root/reference/tfep/app/mixedmaf.py:275-357)."""
        cartesian_atom_indices, z_matrix = self._build_z_matrix()
        if len(z_matrix) == 0:
            raise ValueError('There are no internal coordinates to map. '
                             'Consider using a Cartesian flow.')

        reference_atom_indices = self.get_reference_atoms_indices(
            remove_fixed=True)
        conditioning_atom_indices = self.get_conditioning_indices(
            idx_type='atom', remove_fixed=True)
        if conditioning_atom_indices is None:
            is_ref_conditioning = [False, False, False]
        else:
            is_ref_conditioning = np.isin(
                reference_atom_indices, conditioning_atom_indices).tolist()

        conversion = CartesianToMixedFlow.create(
            flow=None,
            cartesian_atom_indices=cartesian_atom_indices,
            z_matrix=z_matrix,
            reference_atom_indices=reference_atom_indices,
            remove_ref_rototranslation=[
                self.remove_translation or is_ref_conditioning[0],
                self.remove_rotation or is_ref_conditioning[1],
                self.remove_rotation or is_ref_conditioning[2],
            ])

        min_dof_vals, max_dof_vals = self._analyze_dataset(z_matrix,
                                                           conversion)
        maf_dof_indices = conversion.get_dof_indices_by_type(
            conditioning_atom_indices)

        transformer = self._get_transformer(
            conversion, min_dof_vals, max_dof_vals, maf_dof_indices)
        degrees_in = self._get_maf_degrees_in(
            n_dofs_in=conversion.n_dofs_out,
            maf_dof_indices=maf_dof_indices)

        keys = jax.random.split(jax.random.key(self.seed), self.n_maf_layers)
        maf_layers = []
        for layer_idx in range(self.n_maf_layers):
            maf_layers.append(MAF.create(
                keys[layer_idx],
                degrees_in=degrees_in[layer_idx % 2],
                transformer=transformer,
                embedding=PeriodicEmbedding.create(
                    n_features_in=conversion.n_dofs_out,
                    # Angles are normalized to [0, 1] by the conversion.
                    limits=[0.0, 1.0],
                    periodic_indices=maf_dof_indices['torsions']),
                **self.flow_kwargs))
        flow = SequentialFlow.create(*maf_layers, remat=self.remat)
        return conversion.replace(flow=flow)

    # ------------------------------------------------------------------ #
    # Z-matrix construction (host side).
    # ------------------------------------------------------------------ #
    def _build_z_matrix(self):
        """Z-matrix + Cartesian atoms; auto-picks reference atoms if unset."""
        mapped_w_fixed = self.get_mapped_indices(idx_type='atom',
                                                 remove_fixed=False)
        conditioning_w_fixed = self.get_conditioning_indices(
            idx_type='atom', remove_fixed=False)
        if conditioning_w_fixed is None:
            nonfixed_w_fixed = np.asarray(mapped_w_fixed)
        else:
            nonfixed_w_fixed = np.sort(np.concatenate(
                [mapped_w_fixed, conditioning_w_fixed]))

        graph = self._create_networkx_graph(nonfixed_w_fixed)

        ref_atom_indices = self.get_reference_atoms_indices(
            remove_fixed=False)
        ref_atom_indices = ([] if ref_atom_indices is None
                            else list(np.asarray(ref_atom_indices).tolist()))
        if not set(ref_atom_indices).issubset(set(nonfixed_w_fixed.tolist())):
            raise ValueError(
                'The origin and axes atoms must be mapped or conditioning.')

        mapped_set = set(np.asarray(mapped_w_fixed).tolist())

        frags_z_matrices = []
        for nodes in nx.connected_components(graph):
            subgraph = graph.subgraph(nodes).copy()
            frags_z_matrices.append(self._build_connected_graph_z_matrix(
                subgraph, ref_atom_indices))

        # Auto-select the reference frame from the largest fragment.
        largest = frags_z_matrices[int(np.argmax(
            [len(z) for z in frags_z_matrices]))]
        if self._origin_atom_idx is None:
            self._origin_atom_idx = int(largest[0][0])
        if self._axes_atoms_indices is None:
            self._axes_atoms_indices = np.asarray(
                [largest[1][0], largest[2][0]], dtype=np.int64)

        cartesian_atom_indices = []
        ic_z_matrix = []
        for z_matrix in frags_z_matrices:
            # The first three atoms of each fragment are Cartesian.
            cartesian_atom_indices.extend(row[0] for row in z_matrix[:3])
            is_mapped = False
            for row in z_matrix[3:]:
                if row[0] in mapped_set:
                    ic_z_matrix.append(row)
                    is_mapped = True
                else:
                    # Conditioning atoms stay Cartesian.
                    cartesian_atom_indices.append(row[0])
            if is_mapped:
                check_independent(z_matrix)

        # Convert from with-fixed to fixed-removed indexing.
        nonfixed_list = nonfixed_w_fixed.tolist()
        indices_map = {nonfixed_list[i]: i for i in range(len(nonfixed_list))}
        logger.info('Determined Z-Matrix:\n%s', np.asarray(ic_z_matrix))

        cartesian_atom_indices = sorted(
            indices_map[i] for i in cartesian_atom_indices)
        ic_z_matrix = [[indices_map[i] for i in row] for row in ic_z_matrix]
        return (np.asarray(cartesian_atom_indices, dtype=np.int64),
                np.asarray(ic_z_matrix, dtype=np.int64).reshape(-1, 4))

    def _create_networkx_graph(self, atom_indices: np.ndarray) -> nx.Graph:
        """Bond graph over the given atoms (edges only within the set)."""
        atom_set = set(atom_indices.tolist())
        graph = nx.Graph()
        graph.add_nodes_from(atom_indices.tolist())
        for a, b in self._system.topology.bonds.tolist():
            if a in atom_set and b in atom_set:
                graph.add_edge(a, b)
        return graph

    def _is_hydrogen(self, atom_idx: int) -> bool:
        element = str(self._system.topology.elements[atom_idx]).upper()
        if element == '':
            raise ValueError(
                'The topology has no information on the atom elements, '
                'which is required to infer a robust Z-matrix.')
        return element == 'H'

    def _build_connected_graph_z_matrix(self, graph: nx.Graph,
                                        ref_atom_indices: Sequence[int]):
        """BFS Z-matrix for one connected fragment (reference :482-566)."""
        ref_atoms_in_graph = [i for i in ref_atom_indices
                              if graph.has_node(i)]
        if len(ref_atoms_in_graph) == 0:
            ref_atoms_in_graph = [nx.center(graph)[0]]

        n_ref = len(ref_atoms_in_graph)

        z_matrix = [[-1] * 4 for _ in range(n_ref)]
        for row_idx in range(n_ref):
            z_matrix[row_idx][:row_idx + 1] = list(
                reversed(ref_atoms_in_graph[:row_idx + 1]))

        atoms_order = {atom: row for row, atom
                       in enumerate(ref_atoms_in_graph)}

        graph_distances = dict(
            nx.all_pairs_shortest_path_length(graph, cutoff=3))
        # Axes atoms might be far from the BFS source: add their distances.
        for axes_atom in ref_atoms_in_graph[1:]:
            dists = nx.single_source_shortest_path_length(graph, axes_atom)
            for target, dist in dists.items():
                graph_distances[axes_atom][target] = dist
                graph_distances[target][axes_atom] = dist

        for _, added_atom in nx.bfs_edges(graph,
                                          source=ref_atoms_in_graph[0]):
            if added_atom in ref_atoms_in_graph[1:]:
                continue

            row = [added_atom]
            is_h = self._is_hydrogen(added_atom)
            priorities = self._get_atom_zmatrix_priorities(
                added_atom, graph_distances, atoms_order, is_h)
            row.append(priorities[0][0])

            bond_atom = row[-1]
            priorities = self._get_atom_zmatrix_priorities(
                added_atom, graph_distances, atoms_order, is_h, bond_atom)
            row.extend(p[0] for p in priorities[:2])

            if len(row) < 4:
                # Only possible while the fragment's first rows are filling.
                assert len(z_matrix) < 4
                row = row + [-1] * (4 - len(row))

            z_matrix.append(row)
            atoms_order[added_atom] = len(atoms_order)

        return z_matrix

    def _get_atom_zmatrix_priorities(self, atom, graph_distances,
                                     atoms_order, is_h, bond_atom=None):
        """Sorted priority rows (reference :568-615): closest to the atom,
        closest to the bond atom, most recent in the Z-matrix, heavy-first."""
        priorities = []
        for prev_atom, dist in graph_distances[atom].items():
            if prev_atom not in atoms_order or prev_atom == atom:
                continue
            if bond_atom is None:
                bond_atom_dist = 0
            elif prev_atom == bond_atom:
                continue
            elif prev_atom not in graph_distances[bond_atom]:
                continue
            else:
                bond_atom_dist = graph_distances[bond_atom][prev_atom]
            priorities.append([
                prev_atom, dist, bond_atom_dist, -atoms_order[prev_atom],
                float(not is_h and self._is_hydrogen(prev_atom)),
            ])
        priorities.sort(key=lambda k: tuple(k[1:]))
        return priorities

    # ------------------------------------------------------------------ #
    # Dataset analysis (host side, pre-jit).
    # ------------------------------------------------------------------ #
    def _analyze_dataset(self, z_matrix, conversion):
        """Collinearity checks + per-DOF min/max over <=5x1024 frames."""
        ref_atoms = self.get_reference_atoms_indices(remove_fixed=True)

        partial = self.create_partial_flow(
            _IdentityFlow(), return_partial=True)

        batch_size = 1024
        max_n_samples = 5 * batch_size
        n = len(self.dataset)
        if n > max_n_samples:
            step = int(np.ceil(n / max_n_samples))
            sample_indices = np.arange(0, n, step)
        else:
            sample_indices = np.arange(n)

        min_dofs = None
        max_dofs = None
        convert = jax.jit(lambda p: conversion.cartesian_to_mixed(p)[0])
        for start in range(0, len(sample_indices), batch_size):
            batch_idx = sample_indices[start:start + batch_size]
            batch = self.dataset.get_batch(batch_idx)
            positions = jnp.asarray(batch['positions'])
            positions = partial.forward(positions)[0]

            atoms = np.asarray(positions).reshape(positions.shape[0], -1, 3)
            for row_idx, row in enumerate(np.asarray(z_matrix)):
                if (is_collinear(atoms[:, row[:3]])
                        or is_collinear(atoms[:, row[1:]])):
                    raise RuntimeError(
                        f'Row {row_idx + 1} have collinear atoms.')
            if is_collinear(atoms[:, ref_atoms]):
                raise RuntimeError('Axes atoms are collinear!')

            dofs = np.asarray(convert(positions))
            batch_min = dofs.min(axis=0)
            batch_max = dofs.max(axis=0)
            if min_dofs is None:
                min_dofs, max_dofs = batch_min, batch_max
            else:
                min_dofs = np.minimum(min_dofs, batch_min)
                max_dofs = np.maximum(max_dofs, batch_max)

        return min_dofs, max_dofs

    # ------------------------------------------------------------------ #
    # Transformer + degree assignment.
    # ------------------------------------------------------------------ #
    def _get_transformer(self, conversion, min_dof_vals, max_dof_vals,
                         dof_indices):
        x0 = np.array(min_dof_vals, dtype=np.float64)
        xf = np.array(max_dof_vals, dtype=np.float64)

        x0[dof_indices['distances']] = np.maximum(
            0.0, x0[dof_indices['distances']]
            - self.distance_lower_limit_displacement)

        # Kept constant reference DOFs are treated like conditioning: the
        # reference shifts them with a VolumePreservingShiftTransformer
        # (mixedmaf.py:814-821), but shifting those always-zero DOFs only
        # rigidly displaces the output while coupling into the frame
        # reconstruction with a Jacobian term its log_det_J does not track.
        # Propagating them unchanged loses no TFEP expressiveness and keeps
        # the map's log-det exact (verified against the autograd oracle).
        excluded = dof_indices['conditioning']
        if len(dof_indices['reference']) > 0:
            excluded = (dof_indices['reference'] if excluded is None
                        else np.sort(np.concatenate(
                            [excluded, dof_indices['reference']])))
        if excluded is not None:
            mask = ~np.isin(np.arange(conversion.n_dofs_out), excluded)
            x0 = x0[mask]
            xf = xf[mask]
            dof_indices = dof_indices.copy()
            for key in ('distances', 'angles', 'torsions', 'cartesians'):
                dof_indices[key] = remove_and_shift_sorted_indices(
                    np.sort(dof_indices[key]), removed_indices=excluded)

        transformer_indices = [
            dof_indices['distances'],
            dof_indices['angles'],
            dof_indices['torsions'],
        ]
        transformers = [
            NeuralSplineTransformer.create(
                x0=jnp.asarray(x0[dof_indices['distances']]),
                xf=jnp.asarray(xf[dof_indices['distances']]),
                n_bins=self.n_bins, circular=False,
                identity_boundary_slopes=True,
                learn_lower_bound=False, learn_upper_bound=True),
            NeuralSplineTransformer.create(
                x0=jnp.zeros(len(dof_indices['angles'])),
                xf=jnp.ones(len(dof_indices['angles'])),
                n_bins=self.n_bins, circular=False),
            NeuralSplineTransformer.create(
                x0=jnp.zeros(len(dof_indices['torsions'])),
                xf=jnp.ones(len(dof_indices['torsions'])),
                n_bins=self.n_bins, circular=True),
        ]

        if len(dof_indices['cartesians']) > 0:
            transformers.append(NeuralSplineTransformer.create(
                x0=jnp.asarray(x0[dof_indices['cartesians']]),
                xf=jnp.asarray(xf[dof_indices['cartesians']]),
                n_bins=self.n_bins, circular=False,
                identity_boundary_slopes=True,
                learn_lower_bound=True, learn_upper_bound=True))
            transformer_indices.append(dof_indices['cartesians'])

        return MixedTransformer.create(transformers=transformers,
                                       indices=transformer_indices)

    def _get_maf_degrees_in(self, n_dofs_in, maf_dof_indices):
        """[ascending, descending] degree vectors; kept constant reference
        DOFs are conditioning (propagated unchanged — see _get_transformer;
        the reference instead gives them the last degree + a shift,
        mixedmaf.py:828-869)."""
        conditioning = maf_dof_indices['conditioning']
        reference = maf_dof_indices['reference']
        if len(reference) > 0:
            conditioning = (reference if conditioning is None
                            else np.concatenate([conditioning, reference]))

        degrees_in = []
        for order in ('ascending', 'descending'):
            degrees_in.append(generate_degrees(
                n_features=n_dofs_in, order=order,
                conditioning_indices=(None if conditioning is None
                                      else np.sort(conditioning)),
                repeats=self.degrees_repeats))
        return degrees_in


class _IdentityFlow:
    """Identity flow used during the dataset-analysis pass."""

    def forward(self, x):
        return x, jnp.zeros(x.shape[0], dtype=x.dtype)

    __call__ = forward

    def inverse(self, y):
        return y, jnp.zeros(y.shape[0], dtype=y.dtype)

    def n_parameters(self):
        return 0
