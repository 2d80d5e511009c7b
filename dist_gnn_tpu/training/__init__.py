from dist_gnn_tpu.training.trainer import Trainer, TrainState  # noqa: F401
from dist_gnn_tpu.training.pipeline import HostTierTrainer  # noqa: F401
