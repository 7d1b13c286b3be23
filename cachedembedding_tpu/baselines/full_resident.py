"""Fully-HBM-resident embedding bag — the comparison baseline.

The reference ships a torchrec baseline trainer with fused/uvm/uvm_lru/uvm_lfu
kernels for A/B against the cache (/root/reference/baselines/dlrm_main.py:725-750,
benchmark/benchmark_fbgemm_uvm.py). The TPU analog of "fused" is simply the whole
table resident in HBM; there is no UVM on TPU, so the capacity axis is covered by
bf16 storage (a 33.7M x 128 Criteo-Kaggle table is 17.3 GB in f32 — over a v5e's
16 GB — but 8.6 GB in bf16, which fits and doubles effective capacity).

Implements the same begin/finish/prepare protocol as CachedEmbeddingBag, with
identity remapping and no host traffic, so the pipelined trainer runs unchanged
(pass it as ``embed_override``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cachedembedding_tpu.cache.manager import CacheStats, default_table_init
from cachedembedding_tpu._native import hostops
from cachedembedding_tpu.jagged import RaggedFeatures
from cachedembedding_tpu.ops.embedding_bag import embedding_bag


class _NullWindow(NamedTuple):
    slot_ids: jnp.ndarray


class FullyResidentEmbeddingBag:
    def __init__(
        self,
        num_embeddings: int,
        embedding_dim: int,
        *,
        mode: str = "sum",
        dtype=jnp.float32,
        table_sizes: Optional[Sequence[int]] = None,
        seed: int = 1024,
        weight_init: str = "uniform",
        optimizer: str = "sgd",
        adagrad_initial: float = 0.0,
        **_ignored,
    ):
        self.num_embeddings = int(num_embeddings)
        self.embedding_dim = int(embedding_dim)
        self.mode = mode
        self.dtype = dtype
        self.capacity = self.num_embeddings
        self.table_sizes = list(table_sizes) if table_sizes else [num_embeddings]
        if weight_init == "uniform":
            host = hostops.alloc_table(self.num_embeddings, self.embedding_dim)
            default_table_init(self.table_sizes, self.embedding_dim, seed)(host)
            self.cache_weight = jnp.asarray(host, dtype=dtype)
        else:
            self.cache_weight = jnp.zeros(
                (self.num_embeddings, self.embedding_dim), dtype=dtype
            )
        self.stats = CacheStats()
        self.cache_op = True
        self.optimizer = optimizer
        self.adagrad_initial = float(adagrad_initial)
        # fully-resident rowwise-adagrad state: just an (N,) device array
        self.cache_accum = (
            jnp.full((self.num_embeddings,), adagrad_initial, jnp.float32)
            if optimizer == "rowwise_adagrad"
            else None
        )

    # trainer protocol ------------------------------------------------------
    def begin_prepare(self, ids, out_shape=None, device_put=True) -> _NullWindow:
        ids_np = np.ascontiguousarray(np.asarray(ids), np.int32)
        if out_shape is not None:
            ids_np = ids_np.reshape(out_shape)
        return _NullWindow(
            slot_ids=jnp.asarray(ids_np) if device_put else ids_np
        )

    def finish_prepare(self, pw) -> None:
        pass

    def prepare_ids(self, ids) -> jnp.ndarray:
        return jnp.asarray(ids, jnp.int32)

    def set_param(self, w) -> None:
        self.cache_weight = w

    def set_accum(self, a) -> None:
        self.cache_accum = a

    def get_param(self) -> jnp.ndarray:
        return self.cache_weight

    def set_cache_op(self, flag: bool) -> None:
        self.cache_op = flag

    def set_cache_mgr_async_copy(self, flag: bool) -> None:
        pass

    def flush(self) -> None:
        pass

    def element_size(self) -> int:
        return jnp.dtype(self.dtype).itemsize

    def print_comm_stats(self) -> None:
        print("FullyResidentEmbeddingBag: no host<->HBM traffic")

    def lookup(self, features: RaggedFeatures) -> jnp.ndarray:
        return embedding_bag(self.cache_weight, features, mode=self.mode)
