from dist_gnn_tpu.cache.cost_model import CostModel  # noqa: F401
from dist_gnn_tpu.cache.policy import (  # noqa: F401
    get_cache_nids_auto,
    get_cache_nids_selfish,
    get_cache_nids_selfless,
)
from dist_gnn_tpu.cache.autotune import (  # noqa: F401
    SamplerConfig,
    tune_sampler,
    tune_sampler_for,
)
