from tfep_tpu.nn.embeddings.mafembed import (  # noqa: F401
    MAFEmbedding, PeriodicEmbedding, FlipInvariantEmbedding, MixedEmbedding,
)
from tfep_tpu.nn.embeddings.radial import (  # noqa: F401
    GaussianBasisExpansion, BehlerParrinelloRadialExpansion,
    behler_parrinello_cosine_switching_function,
)
