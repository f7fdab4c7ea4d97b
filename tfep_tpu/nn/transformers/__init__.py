from tfep_tpu.nn.transformers.transformer import Transformer, MAFTransformer  # noqa: F401
from tfep_tpu.nn.transformers.affine import (  # noqa: F401
    AffineTransformer, VolumePreservingShiftTransformer,
    affine_transformer, affine_transformer_inverse,
    volume_preserving_shift_transformer,
    volume_preserving_shift_transformer_inverse,
)
