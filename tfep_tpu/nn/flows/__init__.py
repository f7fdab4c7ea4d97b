from tfep_tpu.nn.flows.flow import Flow  # noqa: F401
from tfep_tpu.nn.flows.autoregressive import AutoregressiveFlow  # noqa: F401
from tfep_tpu.nn.flows.maf import MAF  # noqa: F401
from tfep_tpu.nn.flows.sequential import SequentialFlow  # noqa: F401
from tfep_tpu.nn.flows.partial import PartialFlow  # noqa: F401
from tfep_tpu.nn.flows.centroid import CenteredCentroidFlow  # noqa: F401
from tfep_tpu.nn.flows.oriented import OrientedFlow  # noqa: F401
from tfep_tpu.nn.flows.pca import PCAWhitenedFlow  # noqa: F401
