"""OpenMM potential: classical MM energies/forces via the OpenMM Context.

Engine units kJ/mol and nanometer. A module-level ``global_context_cache``
keyed by ``system_name`` avoids re-creating Contexts (expensive) across
batches and across pool workers; ``batch_cell`` rows are interpreted as box
lengths/vectors. Reference behaviors:
/root/reference/tfep/potentials/openmm.py:38-492.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from tfep_tpu.potentials.engine import EnginePotential

__all__ = ['OpenMMPotential', 'global_context_cache']

try:
    import openmm  # noqa: F401
    OPENMM_INSTALLED = True
except ImportError:
    OPENMM_INSTALLED = False

#: Cache of Context objects, keyed by system_name.
global_context_cache: dict = {}


class OpenMMPotential(EnginePotential):
    """Differentiable potential energy via an OpenMM System."""

    DEFAULT_ENERGY_UNIT = 'kilojoule_per_mole'
    DEFAULT_POSITIONS_UNIT = 'nanometer'
    ENGINE_ENERGY_UNIT = 'kilojoule_per_mole'
    ENGINE_POSITIONS_UNIT = 'nanometer'

    def __init__(self, system, positions_unit=None, energy_unit=None,
                 platform_name: Optional[str] = None,
                 platform_properties: Optional[dict] = None,
                 system_name: Optional[str] = None,
                 parallelization_strategy=None,
                 precompute_gradient: bool = True):
        """``system`` is an ``openmm.System``; ``system_name`` keys the
        global Context cache (pass one to reuse Contexts across batches)."""
        if not OPENMM_INSTALLED:
            raise ImportError(
                'OpenMMPotential requires the openmm package to be installed.')
        super().__init__(positions_unit=positions_unit,
                         energy_unit=energy_unit,
                         parallelization_strategy=parallelization_strategy,
                         precompute_gradient=precompute_gradient)
        self.system = system
        self.platform_name = platform_name
        self.platform_properties = platform_properties or {}
        self.system_name = system_name

    def _compute_batch(self, positions: np.ndarray,
                       cell: Optional[np.ndarray], compute_forces: bool):
        task_args = []
        for i in range(positions.shape[0]):
            box_vectors = None
            if cell is not None:
                c = np.asarray(cell[i])
                if c.shape == (3, 3):
                    box_vectors = c
                elif c.shape == (3,):
                    box_vectors = np.diag(c)
                elif c.shape == (6,):
                    # Lengths (already engine units) + angles: only
                    # orthorhombic boxes supported here.
                    box_vectors = np.diag(c[:3])
                else:
                    raise ValueError(f'Unsupported cell shape {c.shape}.')
            task_args.append((self.system, self.platform_name,
                              self.platform_properties, self.system_name,
                              compute_forces, positions[i].reshape(-1, 3),
                              box_vectors))
        results = self.parallelization_strategy.run(
            _run_single_point_calculation, task_args)
        energies = np.asarray([r[0] for r in results])
        forces = (np.stack([np.asarray(r[1]).reshape(-1) for r in results])
                  if compute_forces else None)
        return energies, forces


def _run_single_point_calculation(system, platform_name, platform_properties,
                                  system_name, return_forces, positions,
                                  box_vectors):
    """One OpenMM single point (nm in, kJ/mol out), Context cached."""
    global global_context_cache

    try:
        context = global_context_cache[system_name]
    except KeyError:
        if system is None:
            raise
        from openmm import Context, Platform, VerletIntegrator

        integrator = VerletIntegrator(0.001)
        if platform_name is None:
            context = Context(system, integrator)
        else:
            platform = Platform.getPlatformByName(platform_name)
            for name, value in platform_properties.items():
                platform.setPropertyDefaultValue(name, value)
            context = Context(system, integrator, platform)
        if system_name is not None:
            global_context_cache[system_name] = context

    if box_vectors is not None:
        context.setPeriodicBoxVectors(*box_vectors)
    context.setPositions(positions)
    state = context.getState(getEnergy=True, getForces=return_forces)

    energy = state.getPotentialEnergy()._value
    if return_forces:
        return energy, state.getForces(asNumpy=True)._value
    return energy, None
