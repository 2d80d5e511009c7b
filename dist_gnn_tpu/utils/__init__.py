from dist_gnn_tpu.utils import native  # noqa: F401
