from tfep_tpu.nn.dynamics.egnn import EGNNDynamics  # noqa: F401
from tfep_tpu.nn.dynamics.masked import MaskedVelocityDynamics  # noqa: F401
