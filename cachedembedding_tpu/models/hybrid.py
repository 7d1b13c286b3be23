"""HybridParallelDLRM — model-parallel cached embedding + data-parallel dense
towers over one mesh (API parity with /root/reference/recsys/models/dlrm.py:144-235).

Composes:
  * sparse: ``ParallelCachedEmbeddingBag`` (column-wise) or
    ``ParallelCachedEmbeddingBagTablewise`` (use_tablewise) — the
    FusedSparseModules analog (recsys/models/dlrm.py:32-113), including the
    KJT collection step (on TPU the dataloader already produces the global
    batch in the single-controller model; per-host sharded loading feeds
    ``parallel.all_to_all`` instead);
  * dense: DLRM towers replicated, grads psum — the DDP'd FusedDenseModules
    (recsys/models/dlrm.py:116-141,193-200).

The jitted ``train_step``/``eval_step`` encapsulate the whole hybrid topology;
``model_stats`` mirrors the reference's parameter/storage printout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cachedembedding_tpu.cache.state import EvictionStrategy
from cachedembedding_tpu.config import DLRMConfig
from cachedembedding_tpu.models.dlrm import DLRMParams, init_dlrm_dense
from cachedembedding_tpu.parallel.column import ParallelCachedEmbeddingBag
from cachedembedding_tpu.parallel.hybrid import hybrid_train_step
from cachedembedding_tpu.parallel.mesh import AXIS, make_mesh
from cachedembedding_tpu.parallel.tablewise import (
    ParallelCachedEmbeddingBagTablewise,
    prepare_tablewise_config,
    tablewise_eval_step,
    tablewise_train_step,
    tablewise_window_step,
)


class HybridParallelDLRM:
    def __init__(
        self,
        cfg: DLRMConfig,
        mesh: Optional[Mesh] = None,
        id_freq_map: Optional[np.ndarray] = None,
        dataset: Optional[str] = None,
    ):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.world = self.mesh.devices.size
        cache = cfg.cache
        strategy = (
            EvictionStrategy.LFU
            if (cache.use_lfu_eviction or id_freq_map is None)
            else EvictionStrategy.DATASET
        )
        self.use_tablewise = cfg.use_tablewise

        if cfg.use_tablewise:
            configs = prepare_tablewise_config(
                cfg.num_embeddings_per_feature,
                cache.cache_ratio,
                id_freq_map,
                dataset or "criteo_kaggle",
                self.world,
            )
            self.embed = ParallelCachedEmbeddingBagTablewise(
                configs,
                cfg.embedding_dim,
                self.mesh,
                mode=cfg.reduction_mode,
                warmup_ratio=cache.warmup_ratio if cache.use_freq else 0.0,
                buffer_size=cache.buffer_size,
                evict_strategy=strategy,
                weight_init=cache.weight_init,
                seed=cfg.seed,
            )
        else:
            self.embed = ParallelCachedEmbeddingBag(
                cfg.total_num_embeddings,
                cfg.embedding_dim,
                mesh=self.mesh,
                mode=cfg.reduction_mode,
                cache_ratio=cache.cache_ratio,
                ids_freq_mapping=id_freq_map if cache.use_freq else None,
                warmup_ratio=cache.warmup_ratio,
                buffer_size=cache.buffer_size,
                evict_strategy=strategy,
                table_sizes=cfg.num_embeddings_per_feature,
                seed=cfg.seed,
                weight_init=cache.weight_init,
                transfer_dtype=cache.transfer_dtype,
            )

        self.dense_params: DLRMParams = init_dlrm_dense(
            jax.random.PRNGKey(cfg.seed),
            cfg.embedding_dim,
            cfg.num_sparse_features,
            cfg.dense_in_features,
            cfg.dense_arch_layer_sizes,
            cfg.over_arch_layer_sizes,
        )
        # explicitly-replicated global params (multi-process: committed
        # process-local arrays can't feed programs over the global mesh)
        self.dense_params = jax.device_put(
            self.dense_params, NamedSharding(self.mesh, P())
        )
        self._steps: dict = {}

    # -- reference-API parity -------------------------------------------------
    @property
    def sparse_modules(self):
        return self.embed

    @property
    def cache_weight_mgr(self):
        return self.embed

    def model_stats(self, prefix: str = "") -> str:
        param_amount = self.cfg.total_num_embeddings * self.cfg.embedding_dim
        param_storage = 4 * param_amount
        dense_amount = sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.dense_params)
        )
        param_amount += dense_amount
        param_storage += dense_amount * 4
        return (
            f"{prefix}: Number of model parameters: {param_amount:,}, "
            f"storage overhead: {param_storage / 1024**3:.2f} GB."
        )

    # -- step builders --------------------------------------------------------
    def train_step_fn(self, global_batch: int, pooling: int = 1):
        key = ("train", global_batch, pooling)
        if key not in self._steps:
            if self.use_tablewise:
                self._steps[key] = tablewise_train_step(
                    self.mesh,
                    feature_perm=self.embed.feature_select_perm(),
                    f_max=self.embed.F_max,
                    global_batch=global_batch,
                    mode=self.cfg.reduction_mode,
                    compute_dtype=jnp.dtype(self.cfg.compute_dtype),
                )
            else:
                self._steps[key] = hybrid_train_step(
                    self.mesh,
                    num_features=self.cfg.num_sparse_features,
                    global_batch=global_batch,
                    pooling=pooling,
                    mode=self.cfg.reduction_mode,
                    compute_dtype=jnp.dtype(self.cfg.compute_dtype),
                    fused_op=self.cfg.fused_op,
                )
        return self._steps[key]

    def shard_batch(self, dense: np.ndarray, labels: np.ndarray):
        from cachedembedding_tpu.parallel.multiproc import put_addressable

        return (
            put_addressable(self.mesh, np.asarray(dense), P(AXIS)),
            put_addressable(self.mesh, np.asarray(labels, np.float32), P(AXIS)),
        )

    def _replicated(self, x):
        """Small scalars/vectors as explicitly-replicated global arrays —
        committed process-local arrays can't feed a multi-process program
        (and device_put of host values would allgather them as an equality
        check; values here are deterministic per process)."""
        from cachedembedding_tpu.parallel.multiproc import put_addressable

        return put_addressable(self.mesh, np.asarray(x, np.float32), P())

    def _window_step_fn(self, kind: str, global_batch: int):
        key = (kind, global_batch)
        if key not in self._steps:
            build = tablewise_window_step if kind == "train_window" else tablewise_eval_step
            self._steps[key] = build(
                self.mesh,
                feature_perm=self.embed.feature_select_perm(),
                f_max=self.embed.F_max,
                global_batch=global_batch,
                mode=self.cfg.reduction_mode,
                compute_dtype=jnp.dtype(self.cfg.compute_dtype),
            )
        return self._steps[key]

    def train_window(self, dense_P, slot_ids, labels_P, sparse_lrs, dense_lrs):
        """Tablewise WINDOWED training: P stacked batches, one shard_map scan
        execute per window per mesh (slot_ids from begin_prepare_window)."""
        assert self.use_tablewise
        B = dense_P.shape[1]
        from cachedembedding_tpu.parallel.multiproc import put_addressable

        step = self._window_step_fn("train_window", B)
        self.dense_params, new_cache, losses = step(
            self.dense_params,
            self.embed.cache_weight,
            slot_ids,
            put_addressable(self.mesh, np.asarray(dense_P), P(None, AXIS)),
            put_addressable(
                self.mesh, np.asarray(labels_P, np.float32), P(None, AXIS)
            ),
            self._replicated(sparse_lrs),
            self._replicated(dense_lrs),
        )
        self.embed.cache_weight = new_cache
        return losses

    def eval_window(self, dense_P, slot_ids):
        """Tablewise windowed scoring -> (P, B_global) probabilities."""
        assert self.use_tablewise
        B = dense_P.shape[1]
        from cachedembedding_tpu.parallel.multiproc import put_addressable

        step = self._window_step_fn("eval_window", B)
        return step(
            self.dense_params,
            self.embed.cache_weight,
            slot_ids,
            put_addressable(self.mesh, np.asarray(dense_P), P(None, AXIS)),
        )

    def train_step(self, dense, sparse_slot_values, labels, sparse_lr, dense_lr):
        """One hybrid step on a GLOBAL batch. sparse_slot_values: slot-space ids —
        replicated (F*B*P,) for column-wise, stacked (w, F_max*B) for tablewise."""
        B = dense.shape[0]
        step = self.train_step_fn(B)
        dense_d, labels_d = self.shard_batch(dense, labels)
        self.dense_params, new_cache, loss = step(
            self.dense_params,
            self.embed.cache_weight,
            dense_d,
            sparse_slot_values,
            labels_d,
            self._replicated(sparse_lr),
            self._replicated(dense_lr),
        )
        self.embed.cache_weight = new_cache
        return loss
