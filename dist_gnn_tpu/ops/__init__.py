from dist_gnn_tpu.ops import prng  # noqa: F401
from dist_gnn_tpu.ops.relabel import (  # noqa: F401
    RelabeledFrontier,
    unique_and_relabel,
    unique_and_relabel_dense,
)
from dist_gnn_tpu.ops.sampling import (  # noqa: F401
    SampledNeighbors,
    sample_biased,
    sample_biased_alias,
    sample_neighbors,
    sample_uniform,
)
