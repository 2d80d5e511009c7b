from dist_gnn_tpu.models.gat import GAT  # noqa: F401
from dist_gnn_tpu.models.gcn import GCN  # noqa: F401
from dist_gnn_tpu.models.sage import SAGE  # noqa: F401
