"""Graph primitives for molecular graph networks.

TPU-first note: XLA requires static shapes, so cutoff "pruning" is a mask,
not a shrinking filter — downstream ops multiply by the mask (the reference's
``prune_long_edges`` returns fewer edges, /root/reference/tfep/nn/graph.py:266;
here the edge count is fixed and pruned edges are zero-weighted). Sparse
(edge-list) helpers are provided for parity; the EGNN dynamics uses a dense
all-pairs formulation instead, which maps better onto the MXU/VPU for the
system sizes TFEP targets.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tfep_tpu.nn.module import Module, buffer, static

__all__ = ['FixedGraph', 'get_all_edges', 'fix_node_indices_batch_size',
           'compute_edge_distances', 'prune_long_edges',
           'unsorted_segment_sum']


def get_all_edges(n_nodes: int) -> np.ndarray:
    """All directed edges of a complete graph (no self loops), shape (2, E).

    Host-side, used at model-construction time (static shapes).
    """
    src, dest = np.meshgrid(np.arange(n_nodes), np.arange(n_nodes),
                            indexing='ij')
    mask = src != dest
    return np.stack([src[mask], dest[mask]])


def fix_node_indices_batch_size(edges: np.ndarray, batch_size: int,
                                n_nodes: int) -> np.ndarray:
    """Tile single-graph edges into a batch-flattened disconnected graph.

    Node ``i`` of batch sample ``b`` becomes node ``b*n_nodes + i``; no edges
    cross samples. Reference behavior: graph.py:169-225.
    """
    offsets = (np.arange(batch_size) * n_nodes)[None, None, :]
    return (edges[:, :, None] + offsets).reshape(2, -1)


def compute_edge_distances(x: jnp.ndarray, edges,
                           normalize_directions: bool = True):
    """Distances (and direction vectors dest-src) for an edge list.

    ``x``: (n_total_nodes, 3); ``edges``: (2, n_edges). Directions point
    src -> dest (i.e. ``x[edges[1]] - x[edges[0]]``).
    """
    diff = x[edges[1]] - x[edges[0]]
    distances = jnp.linalg.norm(diff, axis=-1)
    if normalize_directions:
        safe = jnp.where(distances > 0, distances, 1.0)
        diff = diff / safe[:, None]
    return distances, diff


def prune_long_edges(r_cutoff: float, edges, distances, directions=None):
    """Mask edges beyond the cutoff (static shapes: mask, not removal).

    Returns ``(mask, edges, distances, directions)`` where ``mask`` is a
    boolean (n_edges,) array; callers weight contributions by it.
    """
    mask = distances <= r_cutoff
    return mask, edges, distances, directions


def unsorted_segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray,
                         n_segments: int) -> jnp.ndarray:
    """Sum ``data`` rows into ``n_segments`` buckets (message aggregation)."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=n_segments)


class FixedGraph(Module):
    """Base class for networks over a fixed molecular graph.

    Holds one-hot node-type features and the (host-side precomputed) complete
    edge list; batched graphs are the standard disconnected-union layout.
    Reference behavior: graph.py:30-118.
    """

    node_types_one_hot: jnp.ndarray = buffer(default=None)  # (n_nodes, n_types)
    edges_template: jnp.ndarray = buffer(default=None)      # (2, E) one sample
    n_nodes: int = static(default=0)

    @staticmethod
    def build_node_features(node_types) -> np.ndarray:
        node_types = np.asarray(node_types)
        n_types = int(node_types.max()) + 1
        return np.eye(n_types)[node_types]

    def get_edges(self, batch_size: int) -> jnp.ndarray:
        """Batch-flattened edges, shape (2, batch_size * E)."""
        offsets = (jnp.arange(batch_size) * self.n_nodes)[None, None, :]
        return (self.edges_template[:, :, None] + offsets).reshape(2, -1)
