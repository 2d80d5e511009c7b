from dist_gnn_tpu.parallel.mesh import make_mesh  # noqa: F401
from dist_gnn_tpu.parallel.feature_store import ShardedFeatureStore  # noqa: F401
from dist_gnn_tpu.parallel.trainer_dist import DistTrainer  # noqa: F401
from dist_gnn_tpu.parallel.host_dist import (  # noqa: F401
    DistHostFeatureStore,
    DistHostTrainer,
)
from dist_gnn_tpu.parallel.host_struct import DistHostCSCStore  # noqa: F401
