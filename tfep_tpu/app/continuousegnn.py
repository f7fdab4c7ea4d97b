"""Continuous-flow TFEP map with E(n)-equivariant GNN dynamics.

First-class app map for the CNF path: the reference exercises this
combination only through an inline test map
(/root/reference/tfep/tests/app/test_maps.py:68-93, ContinuousFlow + EGNN
from /root/reference/tfep/nn/flows/continuous.py and
/root/reference/tfep/nn/dynamics/egnn.py); here it is a supported map with
the full :class:`~tfep_tpu.app.TFEPMapBase` contract (atom partitioning,
logging, checkpointing, resume).

Design notes (TPU-first):

- The ODE is a fixed-grid ``lax.scan`` (``tfep_tpu/nn/ode.py``) so the
  whole training step is one statically-shaped XLA program; gradients are
  discretize-then-optimize (exact for the discrete map).
- Conditioning atoms are expressed as velocity masking
  (:class:`~tfep_tpu.nn.dynamics.MaskedVelocityDynamics`): the EGNN sees
  the conditioning coordinates (they shape every message) but their
  velocities are zeroed, so they are transported identically and
  contribute nothing to ``log_det_J``.
- Hutchinson probes are refreshed per batch: the probe key is derived
  from the batch's sample indices, so training steps see varying probes
  (unbiased in expectation across an epoch) while evaluation and resume
  stay exactly reproducible.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tfep_tpu.app.base import TFEPMapBase

__all__ = ['ContinuousEGNNMap']


class ContinuousEGNNMap(TFEPMapBase):
    """TFEP map: continuous normalizing flow with EGNN dynamics.

    The velocity field is an E(n)-equivariant graph network over the
    non-fixed atoms (node types = chemical elements by default), so the
    learned map commutes with rotations, translations, and permutations
    of same-type atoms — no reference-frame atoms are needed (and none
    are accepted). Accepts every :class:`~tfep_tpu.app.TFEPMapBase`
    argument plus the ones below.

    Parameters
    ----------
    r_cutoff : float, optional
        Radial message-passing cutoff in the positions unit (angstrom).
    n_egnn_layers : int, optional
        Number of message-passing layers.
    node_feat_dim, distance_feat_dim, time_feat_dim : int, optional
        Node-feature width, radial-basis size, and Gaussian
        time-embedding size.
    node_types : sequence of int, optional
        Integer type per *non-fixed* atom. Defaults to one type per
        chemical element; pass explicit types to distinguish chemically
        distinct same-element atoms.
    solver : str, optional
        Fixed-grid integrator: ``'euler'``, ``'midpoint'``, ``'rk4'``, or
        ``'dopri5'`` (see :class:`~tfep_tpu.nn.flows.ContinuousFlow`).
    n_steps : int, optional
        Integration steps from t=0 to 1.
    trace_estimator : str, optional
        ``'hutchinson'`` (default) or ``'exact'``.
    n_hutchinson_samples : int, optional
        Probes per trace estimate.
    regularization : bool, optional
        Add the Finlay kinetic + Frobenius regularizer to the loss.
    egnn_kwargs : dict, optional
        Extra arguments for :meth:`tfep_tpu.nn.dynamics.EGNNDynamics.create`
        (e.g. ``speed_factor``, ``compute_dtype='bfloat16'``,
        ``pairwise='pallas'``).
    cnf_kwargs : dict, optional
        Extra arguments for :meth:`tfep_tpu.nn.flows.ContinuousFlow.create`
        (e.g. ``checkpoint=False``).
    """

    def __init__(self, *args, r_cutoff: float = 6.0, n_egnn_layers: int = 4,
                 node_feat_dim: int = 64, distance_feat_dim: int = 64,
                 time_feat_dim: int = 16,
                 node_types: Optional[Sequence[int]] = None,
                 solver: str = 'rk4', n_steps: int = 10,
                 trace_estimator: str = 'hutchinson',
                 n_hutchinson_samples: int = 1, regularization: bool = True,
                 egnn_kwargs=None, cnf_kwargs=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.r_cutoff = float(r_cutoff)
        self.n_egnn_layers = int(n_egnn_layers)
        self.node_feat_dim = int(node_feat_dim)
        self.distance_feat_dim = int(distance_feat_dim)
        self.time_feat_dim = int(time_feat_dim)
        self.node_types = (None if node_types is None
                           else list(int(t) for t in node_types))
        self.solver = solver
        self.n_steps = int(n_steps)
        self.trace_estimator = trace_estimator
        self.n_hutchinson_samples = int(n_hutchinson_samples)
        self.regularization = bool(regularization)
        self.egnn_kwargs = dict(egnn_kwargs or {})
        self.cnf_kwargs = dict(cnf_kwargs or {})
        self.hparams.update(
            r_cutoff=self.r_cutoff, n_egnn_layers=self.n_egnn_layers,
            node_feat_dim=self.node_feat_dim,
            distance_feat_dim=self.distance_feat_dim,
            time_feat_dim=self.time_feat_dim, node_types=self.node_types,
            solver=self.solver, n_steps=self.n_steps,
            trace_estimator=self.trace_estimator,
            n_hutchinson_samples=self.n_hutchinson_samples,
            regularization=self.regularization,
            egnn_kwargs=self.egnn_kwargs, cnf_kwargs=self.cnf_kwargs)

    # ------------------------------------------------------------------ #
    def determine_atom_indices(self):
        super().determine_atom_indices()
        if (self._origin_atom_idx is not None
                or self._axes_atoms_indices is not None):
            raise ValueError(
                'ContinuousEGNNMap does not accept origin_atom/axes_atoms: '
                'the EGNN velocity field is already equivariant under '
                'rigid motions, so reference-frame fixing is unnecessary.')

    def configure_flow(self):
        from tfep_tpu.nn.dynamics import EGNNDynamics, MaskedVelocityDynamics
        from tfep_tpu.nn.flows import ContinuousFlow

        node_types = self.node_types
        if node_types is None:
            elements = np.asarray(self._system.topology.elements)
            nonfixed = np.setdiff1d(
                np.arange(len(elements)),
                np.zeros(0, np.int64) if self._fixed_atom_indices is None
                else np.asarray(self._fixed_atom_indices))
            elements = elements[nonfixed]
            unique = {e: i for i, e in enumerate(sorted(set(elements)))}
            node_types = [unique[e] for e in elements]
        if len(node_types) != self.n_nonfixed_atoms:
            raise ValueError(
                f'node_types has {len(node_types)} entries but the map has '
                f'{self.n_nonfixed_atoms} non-fixed atoms.')

        dynamics = EGNNDynamics.create(
            jax.random.key(self.seed), node_types=node_types,
            r_cutoff=self.r_cutoff, time_feat_dim=self.time_feat_dim,
            node_feat_dim=self.node_feat_dim,
            distance_feat_dim=self.distance_feat_dim,
            n_layers=self.n_egnn_layers, **self.egnn_kwargs)

        conditioning_dofs = self.get_conditioning_indices(
            idx_type='dof', remove_fixed=True)
        if conditioning_dofs is not None and len(conditioning_dofs):
            dynamics = MaskedVelocityDynamics.create(
                dynamics, conditioning_dofs,
                dim=3 * self.n_nonfixed_atoms)

        return ContinuousFlow.create(
            dynamics, trace_estimator=self.trace_estimator,
            solver=self.solver, n_steps=self.n_steps,
            n_hutchinson_samples=self.n_hutchinson_samples,
            regularization=self.regularization, seed=self.seed,
            **self.cnf_kwargs)

    # ------------------------------------------------------------------ #
    #: Ask the trainer to inject the global step into each batch so the
    #: Hutchinson probes refresh every optimization step (see _run_flow).
    needs_global_step = True

    def _run_flow(self, flow, batch, inverse: bool):
        """Like the base, but with a per-batch Hutchinson probe key.

        The key is folded from the batch's dataset sample indices AND the
        trainer's global step (when present in the batch): probes refresh
        every optimization step even with ``shuffle=False``, where the
        same batches recur each epoch — without the step fold their trace
        noise would be a fixed per-sample offset the optimizer can
        exploit, breaking the unbiased-in-expectation-across-an-epoch
        property. A given (batch, step) pair stays exactly reproducible
        because the step is checkpointed — evaluation (no step key),
        crash/resume, and the engine-overlap pipeline all see
        deterministic values.
        """
        x = batch['positions']
        kwargs = {}
        if self.trace_estimator == 'hutchinson':
            idx = batch['dataset_sample_index'].astype(jnp.uint32)
            weights = 2 * jnp.arange(idx.shape[0], dtype=jnp.uint32) + 1
            key = jax.random.fold_in(
                jax.random.key(self.seed + 1), jnp.sum(idx * weights))
            if 'global_step' in batch:
                key = jax.random.fold_in(key, batch['global_step'])
            kwargs['key'] = key
        out = (flow.inverse(x, **kwargs) if inverse
               else flow.forward(x, **kwargs))
        result = dict(positions=out[0], log_det_J=out[1])
        if len(out) > 2:
            result['regularization'] = out[2]
        return result
