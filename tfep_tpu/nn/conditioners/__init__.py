from tfep_tpu.nn.conditioners.conditioner import Conditioner  # noqa: F401
from tfep_tpu.nn.conditioners.made import MADE, generate_degrees  # noqa: F401
