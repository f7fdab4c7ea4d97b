"""App layer: trainer and TFEP maps."""

from tfep_tpu.app.trainer import Trainer, load_map_from_checkpoint  # noqa: F401
from tfep_tpu.app.base import TFEPMapBase  # noqa: F401
from tfep_tpu.app.cartesianmaf import CartesianMAFMap  # noqa: F401
from tfep_tpu.app.continuousegnn import ContinuousEGNNMap  # noqa: F401
from tfep_tpu.app.mixedmaf import MixedMAFMap  # noqa: F401
