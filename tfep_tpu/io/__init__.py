"""Data and persistence: datasets, stateful sampler, TFEP logger."""

from tfep_tpu.io.dataset import Dataset, DictDataset, MergedDataset, Subset  # noqa: F401
from tfep_tpu.io.sampler import StatefulBatchSampler  # noqa: F401
from tfep_tpu.io.log import TFEPLogger  # noqa: F401
