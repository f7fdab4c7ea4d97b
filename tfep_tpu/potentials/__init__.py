"""Potential-energy backends (the engine boundary).

Pure-JAX potentials trace into the training step directly; external engines
go through the pure_callback bridge. Engine backends (ase/openmm/psi4/tblite)
require their packages installed; gromacs/mimic need the CLI executables.
"""

from tfep_tpu.potentials.base import PotentialBase  # noqa: F401
from tfep_tpu.potentials.engine import EnginePotential  # noqa: F401
from tfep_tpu.potentials.bridge import make_callback_potential  # noqa: F401
from tfep_tpu.potentials import ase, openmm, psi4, tblite, gromacs, mimic  # noqa: F401
from tfep_tpu.potentials.ase import (  # noqa: F401
    ASEPotential, ase_potential_energy,
)
from tfep_tpu.potentials.openmm import (  # noqa: F401
    OpenMMPotential, openmm_potential_energy,
)
from tfep_tpu.potentials.psi4 import (  # noqa: F401
    Psi4Potential, psi4_potential_energy,
)
from tfep_tpu.potentials.tblite import (  # noqa: F401
    TBLitePotential, tblite_potential_energy,
)
from tfep_tpu.potentials.gromacs import (  # noqa: F401
    GROMACSPotential, gromacs_potential_energy,
)
from tfep_tpu.potentials.mimic import (  # noqa: F401
    MiMiCPotential, mimic_potential_energy,
)
