"""MiMiC potential: QM/MM with CPMD + GROMACS running concurrently (MPMD).

Each single point launches CPMD and ``gmx mdrun`` together (one
``launcher.run(cpmd_cmd, mdrun_cmd)`` call — on SLURM typically an
``SRunLauncher`` with ``multiprog=True``). Per sample, the CPMD input is
rewritten (&MIMIC PATHS working directory, &MIMIC BOX, QM atom coordinates
in the &ATOMS block via the &MIMIC OVERLAPS index map) and the ``.tpr`` is
regenerated through grompp from a ``.g96`` written with the new positions.
Energies come from the CPMD ``ENERGIES`` file and forces from
``FTRAJECTORY`` (reordered CPMD->GROMACS). Failure handling: ``n_attempts``
retries on crash-without-error-file, ``LocalError-*.log`` detection, and
``DENSITY NOT CONVERGED`` stdout parsing with
``on_unconverged='raise'|'nan'|'success'`` and ``on_local_error`` policies.
Engine units hartree/bohr. Reference behaviors:
/root/reference/tfep/potentials/mimic.py:53-1488 (the grompp input file is
written natively in .g96 format here instead of via MDAnalysis).
"""

from __future__ import annotations

import copy
import glob
import os
import re
import shutil
import subprocess
from typing import Optional

import numpy as np

from tfep_tpu.parallel.cli import CLITool
from tfep_tpu.parallel.launcher import Launcher
from tfep_tpu.potentials.engine import EnginePotential
from tfep_tpu.potentials.gromacs import (
    GmxGrompp, GmxMdrun, _create_g96_file,
)
from tfep_tpu.units import Quantity, ureg
from tfep_tpu.utils.misc import temporary_cd

__all__ = ['MiMiCPotential', 'Cpmd']

# bohr -> nm conversion for the grompp .g96 input.
_BOHR_TO_NM = float(Quantity(1.0, ureg.bohr).to(ureg.nanometer).magnitude)


class Cpmd(CLITool):
    """The CPMD command: ``cpmd input.inp [pseudopotential_dir]``.

    >>> Cpmd('input.in', 'path/to/pseudo/').to_subprocess()
    ['cpmd', 'input.in', 'path/to/pseudo/']
    """
    EXECUTABLE_PATH = 'cpmd'


class MiMiCPotential(EnginePotential):
    """Differentiable QM/MM potential energy via MiMiC (CPMD + GROMACS)."""

    DEFAULT_ENERGY_UNIT = 'hartree'
    DEFAULT_POSITIONS_UNIT = 'bohr'
    ENGINE_ENERGY_UNIT = 'hartree'
    ENGINE_POSITIONS_UNIT = 'bohr'

    def __init__(self, cpmd_cmd: Cpmd, mdrun_cmd: GmxMdrun,
                 grompp_cmd: GmxGrompp,
                 launcher: Optional[Launcher] = None,
                 positions_unit=None, energy_unit=None,
                 precompute_gradient: bool = True,
                 working_dir_path=None,
                 cleanup_working_dir: bool = False,
                 parallelization_strategy=None,
                 launcher_kwargs: Optional[dict] = None,
                 grompp_launcher: Optional[Launcher] = None,
                 grompp_launcher_kwargs: Optional[dict] = None,
                 n_attempts: int = 1,
                 on_unconverged: str = 'raise',
                 on_local_error: str = 'raise'):
        """``cpmd_cmd.args[0]`` is the template CPMD input (rewritten per
        sample); ``working_dir_path`` may be a per-sample list so parallel
        frames don't collide on the communication files."""
        super().__init__(positions_unit=positions_unit,
                         energy_unit=energy_unit,
                         parallelization_strategy=parallelization_strategy,
                         precompute_gradient=precompute_gradient)
        if on_unconverged not in ('raise', 'nan', 'success'):
            raise ValueError(
                "on_unconverged must be 'raise', 'nan', or 'success'.")
        if on_local_error not in ('raise', 'nan'):
            raise ValueError("on_local_error must be 'raise' or 'nan'.")
        self.cpmd_cmd = cpmd_cmd
        self.mdrun_cmd = mdrun_cmd
        self.grompp_cmd = grompp_cmd
        self.launcher = launcher
        self.working_dir_path = working_dir_path
        self.cleanup_working_dir = cleanup_working_dir
        self.launcher_kwargs = launcher_kwargs
        self.grompp_launcher = grompp_launcher
        self.grompp_launcher_kwargs = grompp_launcher_kwargs
        self.n_attempts = n_attempts
        self.on_unconverged = on_unconverged
        self.on_local_error = on_local_error

    def _compute_batch(self, positions: np.ndarray,
                       cell: Optional[np.ndarray], compute_forces: bool):
        n_samples = positions.shape[0]
        task_args = []
        for i in range(n_samples):
            if isinstance(self.working_dir_path, (list, tuple)):
                wdir = self.working_dir_path[i]
            else:
                wdir = self.working_dir_path
            box = None if cell is None else np.asarray(cell[i])[:3]
            task_args.append((
                self.cpmd_cmd, self.mdrun_cmd, self.grompp_cmd,
                self.grompp_launcher, compute_forces,
                self.cleanup_working_dir, self.launcher_kwargs,
                self.grompp_launcher_kwargs, self.n_attempts,
                self.on_unconverged, self.on_local_error,
                positions[i].reshape(-1, 3), box, self.launcher, wdir))
        results = self.parallelization_strategy.run(_run_mimic_task,
                                                    task_args)
        energies = np.asarray([r[0] for r in results])
        forces = (np.stack([r[1].reshape(-1) for r in results])
                  if compute_forces else None)
        return energies, forces


# =============================================================================
# CPMD input parsing (engine-independent; tested without the engine)
# =============================================================================

def _parse_cpmd_mimic_block(lines, line_idx, parsed):
    """Parse the &MIMIC block: PATHS line, BOX line, OVERLAPS index map."""
    parsed['paths_line_idx'] = None
    parsed['box_vectors_line_idx'] = None
    parsed['gromacs_to_cpmd_qm_atom_indices'] = {}

    while line_idx < len(lines):
        line = lines[line_idx].strip()
        if line.startswith('PATHS'):
            # Line+1: number of layers; line+2: the working-directory path.
            parsed['paths_line_idx'] = line_idx + 2
            line_idx += 3
        elif line.startswith('BOX'):
            parsed['box_vectors_line_idx'] = line_idx + 1
            line_idx += 2
        elif line.startswith('OVERLAPS'):
            n_atoms = int(lines[line_idx + 1])
            line_idx += 2
            for i in range(n_atoms):
                fields = lines[line_idx + i].split()
                gromacs_idx, cpmd_idx = int(fields[1]) - 1, int(fields[3]) - 1
                if fields[0] == '1':
                    gromacs_idx, cpmd_idx = cpmd_idx, gromacs_idx
                parsed['gromacs_to_cpmd_qm_atom_indices'][gromacs_idx] = \
                    cpmd_idx
            line_idx += n_atoms
        elif line.startswith('&END'):
            break
        else:
            line_idx += 1
    return line_idx + 1


def _parse_cpmd_atoms_block(lines, line_idx, parsed):
    """Parse the &ATOMS block: CPMD atom index -> coordinate line index."""
    parsed['cpmd_atom_to_line_idx'] = {}
    current_atom_idx = 0
    while line_idx < len(lines):
        line = lines[line_idx].strip()
        if line.startswith('*'):
            # New atom type: line+1 nonlocality, line+2 number of atoms.
            n_atoms = int(lines[line_idx + 2])
            line_idx += 3
            for j in range(n_atoms):
                parsed['cpmd_atom_to_line_idx'][current_atom_idx] = \
                    line_idx + j
                current_atom_idx += 1
            line_idx += n_atoms
        elif line.startswith('&END'):
            break
        else:
            line_idx += 1
    return line_idx + 1


_parse_cpmd_block_dispatch = {
    '&MIMIC': _parse_cpmd_mimic_block,
    '&ATOMS': _parse_cpmd_atoms_block,
}


def _parse_cpmd_input(cpmd_input_file_path):
    """Parse a CPMD input file; see the block parsers for what is extracted."""
    with open(cpmd_input_file_path) as f:
        lines = f.readlines()

    parsed = {}
    line_idx = 0
    while line_idx < len(lines):
        line = lines[line_idx].strip()
        if line in _parse_cpmd_block_dispatch:
            line_idx = _parse_cpmd_block_dispatch[line](
                lines, line_idx + 1, parsed)
        else:
            line_idx += 1

    return (lines, parsed.get('paths_line_idx'),
            parsed.get('box_vectors_line_idx'),
            parsed.get('gromacs_to_cpmd_qm_atom_indices', {}),
            parsed.get('cpmd_atom_to_line_idx', {}))


def _read_first_energy(cpmd_dir_path):
    """First-step energy (hartree) from the CPMD ENERGIES trajectory file."""
    with open(os.path.join(cpmd_dir_path, 'ENERGIES')) as f:
        for line in f:
            fields = line.split()
            if int(fields[0]) == 1:
                return float(fields[3])
    raise FileNotFoundError('No step-1 energy found in ENERGIES.')


def _read_first_force(cpmd_dir_path, gromacs_to_cpmd_atom_indices):
    """First-step forces (hartree/bohr) from FTRAJECTORY, GROMACS-ordered."""
    force = []
    with open(os.path.join(cpmd_dir_path, 'FTRAJECTORY')) as f:
        for line in f:
            fields = line.split()
            if fields and fields[0] == '1':
                force.append([float(x) for x in fields[7:]])
    n_atoms = len(force)
    force = [force[gromacs_to_cpmd_atom_indices.get(i, i)]
             for i in range(n_atoms)]
    return np.asarray(force)


# =============================================================================
# Command preparation
# =============================================================================

def _prepare_cpmd_command(cpmd_cmd, working_dir_path, positions_bohr=None,
                          box_bohr=None):
    """Point &MIMIC.PATHS at the working dir and rewrite QM coordinates/box.

    ``positions_bohr``: (n_atoms, 3) full-system positions in bohr, indexed by
    GROMACS atom order; only the QM atoms present in the OVERLAPS map are
    written into the &ATOMS block. Returns a (possibly copied) Cpmd command
    whose input file is ``cpmd.inp`` in the working directory.
    """
    OUTPUT_CPMD_FILE_NAME = 'cpmd.inp'

    with temporary_cd(working_dir_path):
        cpmd_input_file_path = os.path.realpath(cpmd_cmd.args[0])

    (lines, paths_line_idx, box_line_idx, gromacs_to_cpmd_qm,
     cpmd_atom_to_line_idx) = _parse_cpmd_input(cpmd_input_file_path)

    modified = False
    if paths_line_idx is not None:
        paths_value = lines[paths_line_idx].strip()
        if working_dir_path != os.path.realpath(paths_value):
            lines[paths_line_idx] = working_dir_path + '\n'
            modified = True

    if positions_bohr is not None:
        if box_bohr is not None and box_line_idx is not None:
            lines[box_line_idx] = ' '.join(str(x) for x in box_bohr) + '\n'
        for gromacs_idx, cpmd_idx in gromacs_to_cpmd_qm.items():
            line_idx = cpmd_atom_to_line_idx[cpmd_idx]
            lines[line_idx] = ' '.join(
                str(x) for x in positions_bohr[gromacs_idx]) + '\n'
        modified = True

    if modified:
        with open(os.path.join(working_dir_path,
                               OUTPUT_CPMD_FILE_NAME), 'w') as f:
            f.writelines(lines)
        cpmd_cmd = copy.deepcopy(cpmd_cmd)
        cpmd_cmd.args = (OUTPUT_CPMD_FILE_NAME,) + tuple(cpmd_cmd.args[1:])

    return cpmd_cmd, gromacs_to_cpmd_qm


def _prepare_mdrun_command(mdrun_cmd, grompp_cmd, working_dir_path,
                           positions_bohr=None, box_bohr=None,
                           grompp_launcher=None, **kwargs):
    """Regenerate the .tpr via grompp with the new positions (.g96 input)."""
    if positions_bohr is None:
        return mdrun_cmd

    tpr_file_name = 'gromacs.tpr'
    g96_file_name = 'configuration.g96'

    if grompp_launcher is None:
        grompp_launcher = Launcher()

    positions_nm = np.asarray(positions_bohr) * _BOHR_TO_NM
    box_vectors_nm = (None if box_bohr is None
                      else np.diag(np.asarray(box_bohr) * _BOHR_TO_NM))
    _create_g96_file(working_dir_path, positions_nm, box_vectors_nm)

    mdrun_cmd = copy.deepcopy(mdrun_cmd)
    grompp_cmd = copy.deepcopy(grompp_cmd)
    grompp_cmd.trajectory_input_file_path = g96_file_name
    grompp_cmd.tpr_output_file_path = tpr_file_name
    grompp_launcher.run(grompp_cmd, cwd=working_dir_path, **kwargs)

    mdrun_cmd.tpr_file_path = tpr_file_name
    return mdrun_cmd


# =============================================================================
# Task
# =============================================================================

def _run_mimic_task(cpmd_cmd, mdrun_cmd, grompp_cmd, grompp_launcher,
                    return_forces, cleanup_working_dir, launcher_kwargs,
                    grompp_launcher_kwargs, n_attempts, on_unconverged,
                    on_local_error, positions_bohr, box_bohr, launcher,
                    working_dir_path):
    """One MiMiC single point (bohr in, hartree out) with retries."""
    launcher_kwargs = dict(launcher_kwargs or {})
    grompp_launcher_kwargs = grompp_launcher_kwargs or {}

    check_convergence = on_unconverged != 'success'
    if check_convergence and \
            launcher_kwargs.get('stdout') != subprocess.PIPE:
        raise ValueError(
            f"If on_unconverged={on_unconverged}, then 'launcher_kwargs' "
            'must include stdout=subprocess.PIPE')

    if working_dir_path is None:
        working_dir_path = os.getcwd()
    working_dir_path = os.path.realpath(working_dir_path)

    cpmd_cmd, gromacs_to_cpmd_qm = _prepare_cpmd_command(
        cpmd_cmd, working_dir_path, positions_bohr, box_bohr)
    mdrun_cmd = _prepare_mdrun_command(
        mdrun_cmd, grompp_cmd, working_dir_path, positions_bohr, box_bohr,
        grompp_launcher, **grompp_launcher_kwargs)

    if launcher is None:
        launcher = Launcher()

    has_local_error = False
    is_unconverged = False
    energy = None
    forces = None

    # MiMiC's file-based communication is fragile: a crash before the
    # ENERGIES file is written raises FileNotFoundError -> retry.
    for attempt_idx in range(n_attempts):
        try:
            result = launcher.run(cpmd_cmd, mdrun_cmd, cwd=working_dir_path,
                                  **launcher_kwargs)
            result_cpmd = result[0] if isinstance(result, list) else result

            if check_convergence:
                is_unconverged = result_cpmd.stdout is not None and \
                    re.search(b'DENSITY NOT CONVERGED',
                              result_cpmd.stdout) is not None

            if not is_unconverged:
                energy = _read_first_energy(working_dir_path)
                if return_forces:
                    forces = _read_first_force(working_dir_path,
                                               gromacs_to_cpmd_qm)
            break
        except FileNotFoundError:
            local_errors = glob.glob(
                os.path.join(working_dir_path, 'LocalError-*.log'))
            if local_errors:
                has_local_error = True
                break
            if attempt_idx == n_attempts - 1:
                raise RuntimeError('Cannot run MiMiC.')

    if is_unconverged or has_local_error:
        if ((is_unconverged and on_unconverged == 'nan')
                or (has_local_error and on_local_error == 'nan')):
            energy = np.nan
            forces = np.zeros_like(positions_bohr) if return_forces else None
        elif is_unconverged:
            raise RuntimeError(
                'The self consistent calculation did not converge.')
        else:
            raise RuntimeError('Detected LocalError-X-X-X.log file.')

    if cleanup_working_dir:
        for name in os.listdir(working_dir_path):
            path = os.path.join(working_dir_path, name)
            if os.path.isfile(path) or os.path.islink(path):
                os.unlink(path)
            elif os.path.isdir(path):
                shutil.rmtree(path)

    return energy, forces
