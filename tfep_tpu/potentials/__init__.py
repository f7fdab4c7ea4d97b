"""Potential-energy backends (the engine boundary).

Pure-JAX potentials trace into the training step directly; external engines
go through the pure_callback bridge. Engine backends (ase/openmm/psi4/tblite)
require their packages installed; gromacs/mimic need the CLI executables.
"""

from tfep_tpu.potentials.base import PotentialBase  # noqa: F401
from tfep_tpu.potentials.engine import EnginePotential  # noqa: F401
from tfep_tpu.potentials.bridge import make_callback_potential  # noqa: F401
from tfep_tpu.potentials import ase, openmm, psi4, tblite, gromacs, mimic  # noqa: F401
from tfep_tpu.potentials.ase import ASEPotential  # noqa: F401
from tfep_tpu.potentials.openmm import OpenMMPotential  # noqa: F401
from tfep_tpu.potentials.psi4 import Psi4Potential  # noqa: F401
from tfep_tpu.potentials.tblite import TBLitePotential  # noqa: F401
from tfep_tpu.potentials.gromacs import GROMACSPotential  # noqa: F401
from tfep_tpu.potentials.mimic import MiMiCPotential  # noqa: F401
