from tfep_tpu.nn.dynamics.egnn import EGNNDynamics  # noqa: F401
