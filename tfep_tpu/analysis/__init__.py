"""Post-hoc analysis: FEP estimator and device-vectorized bootstrap."""

from tfep_tpu.analysis.estimator import fep_estimator  # noqa: F401
from tfep_tpu.analysis.bootstrap import bootstrap  # noqa: F401
