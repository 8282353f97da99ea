"""DREAM-GNN-TPU: a TPU-native GNN message-passing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
DREAM-GNN drug-repositioning link predictor (reference:
Ryan-Yanlong/DREAM-GNN).  The reference is a single-device
PyTorch+DGL research repo; this framework re-designs every component
TPU-first:

- message passing over the drug-disease bipartite graph and the kNN
  similarity graphs compiles to dense MXU matmuls (small graphs) or
  padded-COO / ELL segment-sum kernels (large graphs), selected per
  graph by a unified ``kernels.spmm`` op;
- graph augmentation is expressed as random masks *inside* the jitted
  train step (the reference rebuilds host-side DGL graphs every
  iteration — its single biggest performance sin);
- the experiment protocol (10 seeds x 10-fold CV) vectorises over
  folds and shards over a ``jax.sharding.Mesh``;
- checkpointing, CSV metric logging, and the CLI mirror the reference
  artifact contract.
"""

__version__ = "0.1.0"

from dream_gnn_tpu.config import ModelConfig, TrainConfig  # noqa: F401
