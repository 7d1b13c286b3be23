"""Single-host trainer: cached embedding + DLRM dense towers.

Capability parity with the reference hot loop (/root/reference/recsys/dlrm_main.py:206-333):
  * far-sighted prefetch — every ``prefetch_num`` iterations, the ids of the next
    ``prefetch_num`` batches are concatenated and pushed through ``prepare_ids``
    once, then each batch trains on cache-slot ids with cache maintenance off
    (``cache_op=False`` analog, /root/reference/recsys/dlrm_main.py:243-269);
  * split sparse/dense SGD learning rates, dense LR scaled by data-parallel size
    (/root/reference/recsys/dlrm_main.py:455-461);
  * optional LR decay after a fraction of the epoch (--change_lr / --lr_change_point
    / --lr_after, /root/reference/recsys/dlrm_main.py:226-234);
  * eval with AUROC/Accuracy accumulated across batches
    (/root/reference/recsys/dlrm_main.py:300-333).

The jitted step donates the parameter buffers so SGD updates are in-place in HBM.
Host->HBM row staging for window k+1 overlaps with window k's compute when
``use_overlap`` is on (JAX async dispatch: the train steps for window k are already
enqueued when the host starts staging k+1).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cachedembedding_tpu.cache.manager import CachedEmbeddingBag
from cachedembedding_tpu.config import DLRMConfig
from cachedembedding_tpu.jagged import Batch, RaggedFeatures
from cachedembedding_tpu.models.dlrm import (
    DLRMParams,
    bce_with_logits,
    dlrm_dense_forward,
    init_dlrm_dense,
)
from cachedembedding_tpu.ops.embedding_bag import embedding_bag
from cachedembedding_tpu.utils.metrics import StreamingMetrics


@dataclasses.dataclass
class TrainReport:
    losses: List[float]
    it_per_s: float
    examples_per_s: float
    hit_rate: float
    eval_metrics: Optional[dict] = None


@partial(
    jax.jit,
    static_argnames=("mode", "compute_dtype_name", "use_pallas", "sparse_grad"),
    donate_argnames=("dense_params", "cache_weight"),
)
def _train_step(
    dense_params: DLRMParams,
    cache_weight: jnp.ndarray,
    dense_features: jnp.ndarray,
    slot_features: RaggedFeatures,
    labels: jnp.ndarray,
    sparse_lr: jnp.ndarray,
    dense_lr: jnp.ndarray,
    mode: str = "sum",
    compute_dtype_name: str = "float32",
    use_pallas: bool = False,
    sparse_grad: bool = False,
):
    """One SGD step. ``sparse_grad`` differentiates w.r.t. the GATHERED rows and
    applies a scatter-add update instead of materializing a dense (C, D) grad —
    the reference's --use_sparse_embed_grad (sparse EmbeddingBag). Essential when
    the table is fully HBM-resident (a dense grad would be a full-table pass per
    step); pointless for the small cached table."""
    compute_dtype = jnp.dtype(compute_dtype_name)

    if sparse_grad:
        rows0 = jnp.take(cache_weight, slot_features.values, axis=0)  # (L, D)

        def loss_fn_rows(dp, rows):
            F, B = slot_features.num_features, slot_features.batch_size
            P = slot_features.pooling
            assert P is not None, "sparse_grad path requires uniform pooling"
            pooled = rows.reshape(F, B, P, -1).astype(jnp.float32)
            if mode == "sum":
                pooled = pooled.sum(axis=2)
            else:
                pooled = pooled.mean(axis=2)
            sparse_bfd = jnp.transpose(pooled, (1, 0, 2))
            logits = dlrm_dense_forward(dp, dense_features, sparse_bfd, compute_dtype)
            return bce_with_logits(logits, labels)

        loss, (g_dense, g_rows) = jax.value_and_grad(loss_fn_rows, argnums=(0, 1))(
            dense_params, rows0
        )
        new_cache = cache_weight.at[slot_features.values].add(
            (-sparse_lr * g_rows).astype(cache_weight.dtype)
        )
    else:

        def loss_fn(dp, cw):
            sparse_bfd = embedding_bag(cw, slot_features, mode=mode, use_pallas=use_pallas)
            logits = dlrm_dense_forward(dp, dense_features, sparse_bfd, compute_dtype)
            return bce_with_logits(logits, labels)

        loss, (g_dense, g_cache) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            dense_params, cache_weight
        )
        new_cache = cache_weight - sparse_lr * g_cache
    new_dense = jax.tree_util.tree_map(lambda p, g: p - dense_lr * g, dense_params, g_dense)
    return new_dense, new_cache, loss


@partial(jax.jit, static_argnames=("mode", "compute_dtype_name", "use_pallas"))
def _eval_step(
    dense_params: DLRMParams,
    cache_weight: jnp.ndarray,
    dense_features: jnp.ndarray,
    slot_features: RaggedFeatures,
    mode: str = "sum",
    compute_dtype_name: str = "float32",
    use_pallas: bool = False,
):
    compute_dtype = jnp.dtype(compute_dtype_name)
    sparse_bfd = embedding_bag(cache_weight, slot_features, mode=mode, use_pallas=use_pallas)
    logits = dlrm_dense_forward(dense_params, dense_features, sparse_bfd, compute_dtype)
    return jax.nn.sigmoid(logits)


class CachedDLRMTrainer:
    def __init__(
        self,
        cfg: DLRMConfig,
        id_freq_map: Optional[np.ndarray] = None,
        embed_override=None,
    ):
        self.cfg = cfg
        from cachedembedding_tpu.cache.state import EvictionStrategy

        cache_cfg = cfg.cache
        self.embed = embed_override if embed_override is not None else CachedEmbeddingBag(
            cfg.total_num_embeddings,
            cfg.embedding_dim,
            mode=cfg.reduction_mode,
            cache_ratio=cache_cfg.cache_ratio,
            ids_freq_mapping=id_freq_map if cache_cfg.use_freq else None,
            warmup_ratio=cache_cfg.warmup_ratio,
            buffer_size=cache_cfg.buffer_size,
            evict_strategy=(
                EvictionStrategy.LFU if cache_cfg.use_lfu_eviction else (
                    EvictionStrategy.DATASET if (cache_cfg.use_freq and id_freq_map is not None)
                    else EvictionStrategy.LFU
                )
            ),
            table_sizes=cfg.num_embeddings_per_feature,
            seed=cfg.seed,
            approx_evict=cache_cfg.approx_evict,
            use_pallas_lookup=cache_cfg.use_pallas_lookup,
            weight_init=cache_cfg.weight_init,
            transfer_dtype=cache_cfg.transfer_dtype,
        )
        key = jax.random.PRNGKey(cfg.seed)
        self.dense_params = init_dlrm_dense(
            key,
            cfg.embedding_dim,
            cfg.num_sparse_features,
            cfg.dense_in_features,
            cfg.dense_arch_layer_sizes,
            cfg.over_arch_layer_sizes,
        )
        self.data_parallel_size = int(np.prod(cfg.mesh_shape))
        self._step_idx = 0

    # ------------------------------------------------------------------
    def _lrs(self, progress: float):
        cfg = self.cfg
        lr = cfg.learning_rate
        if cfg.change_lr and progress >= cfg.lr_change_point:
            lr = cfg.lr_after
        sparse_lr = jnp.asarray(lr, jnp.float32)
        dense_lr = jnp.asarray(lr * self.data_parallel_size, jnp.float32)
        return sparse_lr, dense_lr

    def _begin_window(self, batches: List[Batch]):
        """Dispatch the cache plan + remap for a window (device only; no row
        movement yet). Returns (PreparedWindow, per-batch slot features)."""
        all_ids = np.concatenate(
            [np.asarray(b.sparse_features.values) for b in batches]
        ).astype(np.int32)
        pw = self.embed.begin_prepare(all_ids)
        out: List[RaggedFeatures] = []
        off = 0
        for b in batches:
            f = b.sparse_features
            n = f.values.shape[0]
            out.append(
                RaggedFeatures(
                    values=jax.lax.dynamic_slice_in_dim(pw.slot_ids, off, n),
                    offsets=f.offsets,
                    num_features=f.num_features,
                    batch_size=f.batch_size,
                    pooling=f.pooling,
                )
            )
            off += n
        return pw, out

    def _dispatch_train(self, b: Batch, sf: RaggedFeatures, progress: float):
        cfg = self.cfg
        sparse_lr, dense_lr = self._lrs(progress)
        # Sparse-grad SGD (scatter-add of per-row grads) when the table is much
        # larger than the id stream — otherwise a dense (C, D) grad is cheaper.
        sparse_grad = (
            cfg.use_sparse_embed_grad
            or self.embed.capacity > 4 * int(sf.values.shape[0])
        ) and sf.pooling is not None
        self.dense_params, new_cache, loss = _train_step(
            self.dense_params,
            self.embed.cache_weight,
            jnp.asarray(b.dense_features),
            sf,
            jnp.asarray(b.labels),
            sparse_lr,
            dense_lr,
            mode=cfg.reduction_mode,
            compute_dtype_name=cfg.compute_dtype,
            use_pallas=cfg.cache.use_pallas_lookup,
            sparse_grad=sparse_grad,
        )
        self.embed.set_param(new_cache)
        return loss

    def train(
        self,
        data: Iterable[Batch],
        num_iters: Optional[int] = None,
        log_every: int = 0,
    ) -> TrainReport:
        """Pipelined far-sighted training. Per window k (prefetch_num batches):

            begin_prepare(k)                [device: plan + remap, metadata only]
            finish_prepare(k)               [host staging]
            dispatch train steps (k)        [device]
            begin_prepare(k+1)  <- BEFORE the device reaches window k's steps, so
            finish_prepare(k+1)    host staging for k+1 overlaps k's compute and
                                   the admit scatter lands between k and k+1.

        This realizes the reference's prefetch pipeline + async cache copy
        (/root/reference/recsys/dlrm_main.py:243-269) with JAX async dispatch
        instead of CUDA streams.
        """
        cfg = self.cfg
        pn = max(1, cfg.cache.prefetch_num)
        losses: List[jnp.ndarray] = []
        it = iter(data)
        total = num_iters
        done = 0
        examples = 0

        fetched = 0

        def fetch_window() -> List[Batch]:
            nonlocal fetched
            window: List[Batch] = []
            want = pn if total is None else min(pn, total - fetched)
            for _ in range(want):
                try:
                    window.append(next(it))
                except StopIteration:
                    break
            fetched += len(window)
            return window

        t0 = time.perf_counter()
        cur = fetch_window()
        if cur:
            pw_cur, sf_cur = self._begin_window(cur)
            self.embed.finish_prepare(pw_cur)
        while cur:
            # Plan the NEXT window FIRST: the metadata-only plan lands in the
            # device queue ahead of this window's train steps, so by the time
            # finish_prepare reads it back the wait is the plan itself, not the
            # whole window's compute.
            nxt = fetch_window()
            if nxt:
                pw_nxt, sf_nxt = self._begin_window(nxt)
            # Dispatch this window's train steps (async).
            for b, sf in zip(cur, sf_cur):
                progress = 0.0 if total is None else done / max(total, 1)
                losses.append(self._dispatch_train(b, sf, progress))
                examples += b.batch_size
                done += 1
                self._step_idx += 1
                if log_every and done % log_every == 0:
                    # NOTE: read as a (1,) array — 0-d readbacks are pathologically
                    # slow on tunneled device links.
                    loss_val = np.asarray(losses[-1].reshape(1))[0]
                    print(
                        f"it {done}: loss={loss_val:.5f} "
                        f"hit_rate={self.embed.stats.hit_rate(window=pn):.4f}"
                    )
            # Stage the next window's rows while this window computes (the admit
            # scatter lands on device between the two windows' train steps).
            if nxt:
                self.embed.finish_prepare(pw_nxt)
                cur, sf_cur = nxt, sf_nxt
            else:
                cur = []
        if losses:
            jax.block_until_ready(losses[-1])
        dt = time.perf_counter() - t0
        # single batched readback of all per-step losses (0-d reads are slow)
        loss_list = [float(x) for x in np.asarray(jnp.stack(losses))] if losses else []
        return TrainReport(
            losses=loss_list,
            it_per_s=done / dt if dt > 0 else 0.0,
            examples_per_s=examples / dt if dt > 0 else 0.0,
            hit_rate=self.embed.stats.hit_rate(),
        )

    def evaluate(self, data: Iterable[Batch]) -> dict:
        cfg = self.cfg
        metrics = StreamingMetrics()
        for b in data:
            # Eval runs with cache maintenance inline (cache_op=True analog,
            # /root/reference/recsys/models/dlrm.py:216-217).
            slot_ids = self.embed.prepare_ids(np.asarray(b.sparse_features.values))
            f = b.sparse_features
            sf = RaggedFeatures(
                values=slot_ids,
                offsets=f.offsets,
                num_features=f.num_features,
                batch_size=f.batch_size,
                pooling=f.pooling,
            )
            probs = _eval_step(
                self.dense_params,
                self.embed.cache_weight,
                jnp.asarray(b.dense_features),
                sf,
                mode=cfg.reduction_mode,
                compute_dtype_name=cfg.compute_dtype,
                use_pallas=cfg.cache.use_pallas_lookup,
            )
            metrics.update(np.asarray(probs), np.asarray(b.labels))
        return metrics.compute()
