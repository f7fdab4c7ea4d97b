"""Execution runtime: strategies, CLI tools, launchers, device-mesh sharding."""

from tfep_tpu.parallel.strategies import (  # noqa: F401
    ParallelizationStrategy, SerialStrategy, ProcessPoolStrategy,
    ThreadPoolStrategy,
)
from tfep_tpu.parallel.cli import (  # noqa: F401
    CLITool, CLIOption, KeyValueOption, AbsolutePathOption, FlagOption,
)
from tfep_tpu.parallel.launcher import Launcher, SRunTool, SRunLauncher  # noqa: F401
from tfep_tpu.parallel import sharding  # noqa: F401
