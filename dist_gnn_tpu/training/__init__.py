from dist_gnn_tpu.training.trainer import Trainer, TrainState  # noqa: F401
