"""cachedembedding_tpu — a TPU-native framework for training recommendation models
whose embedding tables are far larger than accelerator HBM.

Re-designed from scratch for TPU (JAX/XLA/Pallas/pjit) with the capabilities of
hpcaitech/CachedEmbedding (reference at /root/reference):

  * ``CachedEmbeddingBag`` — an EmbeddingBag whose full weight lives in TPU-VM host
    DRAM with a frequency-aware software cache of hot rows resident in HBM
    (reference contract: /root/reference/README.md:1-21 and the usage sites cited
    throughout this package).
  * ``ParallelCachedEmbeddingBag`` / ``ParallelCachedEmbeddingBagTablewise`` —
    column-wise and table-wise model parallelism over a ``jax.sharding.Mesh``.
  * DLRM / DeepFM model families, Criteo/Avazu/synthetic data pipelines, the
    far-sighted prefetch pipeline, and train/eval harnesses.

Unlike the reference (pure PyTorch on CUDA), cache bookkeeping runs in a
native C++ host directory fully overlapped with device compute (a jitted
device-side state machine remains as the alternative planner); training runs
one fused XLA program per prefetch window fed by a single packed transfer;
never-trained rows materialize on device from a canonical procedural init
(zero admit bandwidth); and row staging uses a native C++ helper with
asynchronous JAX dispatch. Beyond the reference: checkpoint/resume, row-wise
Adagrad with cache-tiered optimizer state, and an automatic sharding planner.
"""

from cachedembedding_tpu.cache import (  # noqa: F401
    CachedEmbeddingBag,
    CacheState,
    EvictionStrategy,
)
from cachedembedding_tpu.jagged import RaggedFeatures, Batch  # noqa: F401
from cachedembedding_tpu.config import DLRMConfig, CacheConfig  # noqa: F401

__version__ = "0.1.0"
