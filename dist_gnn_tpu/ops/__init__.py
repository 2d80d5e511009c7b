from dist_gnn_tpu.ops import prng  # noqa: F401
from dist_gnn_tpu.ops.relabel import RelabeledFrontier, unique_and_relabel  # noqa: F401
from dist_gnn_tpu.ops.sampling import (  # noqa: F401
    SampledNeighbors,
    sample_biased,
    sample_neighbors,
    sample_uniform,
)
