"""tfep_tpu: a TPU-native targeted free energy perturbation framework.

A ground-up JAX/XLA/Pallas implementation of targeted free-energy perturbation
with normalizing flows, covering the capabilities of the reference ``tfep``
package (see SURVEY.md) with a TPU-first architecture: pure-functional pytree
flows, pjit/GSPMD data parallelism over trajectory frames, and an async
host-callback bridge to external potential-energy engines.
"""

__version__ = '0.1.0'

from tfep_tpu import analysis, app, io, nn, ops, parallel, potentials, utils  # noqa: F401
from tfep_tpu.loss import boltzmann_kl_div_loss, BoltzmannKLDivLoss  # noqa: F401
