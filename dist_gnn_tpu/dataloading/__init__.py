from dist_gnn_tpu.dataloading.seeds import SeedGenerator  # noqa: F401
