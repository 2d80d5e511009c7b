"""dist_gnn_tpu — a TPU-native distributed GNN training framework.

Built from scratch in JAX/XLA/Pallas with the capability set of the Dist-GNN
reference system (multi-GPU cached neighbor sampling + feature serving for
mini-batch GNN training), re-designed for TPU hardware:

* static-shape padded sampling blocks instead of nnz-sized COO tensors,
* Feistel-permutation samplers instead of curand reservoir kernels,
* sorted-lookup cache routing instead of a GPU CAS hashmap,
* sharded-HBM feature stores + all-to-all exchange instead of CUDA IPC peer
  pointers, and
* hot-row replication driven by the same heat/value knapsack policy.

Reference: CommediaJW/Dist-GNN (see SURVEY.md for the file:line map).
"""

from dist_gnn_tpu.graph import Graph, HostGraph  # noqa: F401
from dist_gnn_tpu import ops  # noqa: F401

__version__ = "0.1.0"
