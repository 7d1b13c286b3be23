"""Column-wise model-parallel cached embedding — ``ParallelCachedEmbeddingBag``.

Reference contract (SURVEY.md §2.2; /root/reference/recsys/models/dlrm.py:70-82):
ONE logical bag whose embedding dim is partitioned across ranks (split math
mirrored at recsys/utils/misc.py:138-154 — here the mesh size must divide D
evenly, checked at construction); every rank consumes the GLOBAL batch and
produces (B_global, F, D/w); the fused all-to-all reshard to (B_local, F, D)
lives in the train step (parallel.hybrid).

TPU design: this is ``CachedEmbeddingBag`` with the HBM ``cache_weight`` laid
out P(None, mp) over the mesh. The cache METADATA state machine is replicated —
each rank computes the identical plan, so prepare_ids needs zero cross-rank
coordination — and host<->HBM row staging moves full-D rows that XLA splits
into per-device dim slices on transfer.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cachedembedding_tpu.cache.manager import CachedEmbeddingBag
from cachedembedding_tpu.parallel.mesh import AXIS


class ParallelCachedEmbeddingBag(CachedEmbeddingBag):
    def __init__(self, num_embeddings: int, embedding_dim: int, *, mesh: Mesh, **kw):
        w = mesh.devices.size
        if embedding_dim % w != 0:
            raise ValueError(
                f"embedding_dim {embedding_dim} must divide evenly over {w} devices "
                f"(uneven splits a la torch.tensor_split are not MXU-friendly)"
            )
        self.mesh = mesh
        super().__init__(num_embeddings, embedding_dim, **kw)
        self._shard_cache()

    def _shard_cache(self) -> None:
        sharding = NamedSharding(self.mesh, P(None, AXIS))
        self.cache_weight = jax.device_put(self.cache_weight, sharding)
        # Readbacks of dim-sharded values (eviction writebacks, flush) must be
        # replicated first when the mesh spans multiple processes: np.asarray
        # of a non-addressable array raises (parallel/multiproc.py rules).
        from cachedembedding_tpu.parallel.multiproc import replicate_fn

        self._rep = replicate_fn(self.mesh)

    @property
    def dim_per_rank(self) -> int:
        return self.embedding_dim // self.mesh.devices.size
