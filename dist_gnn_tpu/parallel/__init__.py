from dist_gnn_tpu.parallel.mesh import make_mesh  # noqa: F401
from dist_gnn_tpu.parallel.feature_store import ShardedFeatureStore  # noqa: F401
from dist_gnn_tpu.parallel.trainer_dist import DistTrainer  # noqa: F401
