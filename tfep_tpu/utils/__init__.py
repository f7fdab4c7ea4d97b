from tfep_tpu.utils import misc, math, geometry  # noqa: F401
