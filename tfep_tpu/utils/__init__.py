from tfep_tpu.utils import misc, math  # noqa: F401
