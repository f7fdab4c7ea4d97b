"""Post-hoc analysis: FEP estimator and device-vectorized bootstrap."""

from tfep_tpu.analysis.estimator import (  # noqa: F401
    estimate_from_logger, fep_estimator,
)
from tfep_tpu.analysis.bootstrap import bootstrap  # noqa: F401
