"""Table-wise model parallelism: each mesh rank owns whole embedding tables and
their own HBM cache — the recsys analog of expert parallelism (SURVEY.md §2.4).

Capability parity with the reference's ``ParallelCachedEmbeddingBagTablewise`` +
``TablewiseEmbeddingBagConfig`` + placement helpers
(/root/reference/recsys/utils/misc.py:157-209, recsys/models/dlrm.py:58-68):

  * per-table config: ``num_embeddings``, ``cuda_row_num`` (per-table cache rows,
    ``int(cache_ratio*n)+2000`` clamped — misc.py:171-173), ``assigned_rank``,
    ``ids_freq_mapping``;
  * the reference's hand-tuned per-world-size table->rank maps are reproduced in
    ``get_tablewise_rank_arrange`` for parity, plus ``auto_rank_arrange`` (greedy
    balance on access frequency x size — the "TODO: automatic arrange" the
    reference left open, misc.py:161);
  * forward consumes the GLOBAL batch, each rank looks up its own tables, and an
    all-to-all reshards (B_global, F_local, D) -> (B_local, F, D).

TPU re-design (single-controller SPMD): per-rank cache metadata is STACKED along
a leading (w, ...) axis, padded to the max per-rank shape, and maintained by a
per-rank HOST cache directories; per-rank cache weights are a (w, C_max, D) array sharded
P(AXIS) so each device holds exactly its own cache. Host tables stay separate
per rank. Padded id lanes use a dedicated pad row per rank (index N_max) so they
never collide with real rows.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cachedembedding_tpu._native import hostops
from cachedembedding_tpu.cache.host_table import DenseHostTable, VirtualHostTable
from cachedembedding_tpu.cache.manager import CacheStats, _bucket, default_table_init
from cachedembedding_tpu.cache.host_directory import make_directory
from cachedembedding_tpu.cache.state import EvictionStrategy
from cachedembedding_tpu.parallel.mesh import AXIS


@dataclasses.dataclass
class TablewiseEmbeddingBagConfig:
    """Parity with ColossalAI's TablewiseEmbeddingBagConfig as used at
    /root/reference/recsys/utils/misc.py:175-181."""

    num_embeddings: int
    cuda_row_num: int
    assigned_rank: int
    ids_freq_mapping: Optional[np.ndarray] = None


def get_tablewise_rank_arrange(dataset: str, world_size: int) -> List[int]:
    """The reference's hand-tuned placements
    (/root/reference/recsys/utils/misc.py:184-209), kept for reproducibility."""
    if dataset and "criteo" in dataset and "kaggle" in dataset:
        table = {
            1: [0] * 26,
            2: [0, 1, 0, 1, 1, 1, 0, 0, 1, 0, 0, 1, 0, 1, 0, 0, 1, 0, 0, 1, 1, 1, 1, 0, 1, 0],
            3: [2, 1, 0, 1, 1, 2, 2, 1, 0, 0, 1, 1, 0, 1, 0, 2, 0, 2, 2, 0, 2, 2, 0, 1, 1, 0],
            4: [3, 1, 0, 3, 1, 0, 2, 1, 0, 2, 3, 1, 3, 1, 2, 3, 1, 2, 3, 0, 2, 0, 0, 2, 3, 2],
            8: [6, 6, 0, 4, 7, 2, 5, 7, 0, 5, 7, 1, 7, 3, 5, 3, 1, 6, 6, 0, 2, 2, 1, 4, 3, 4],
        }
    elif dataset and "criteo" in dataset:
        table = {
            1: [0] * 26,
            2: [1, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 1, 0, 0, 0, 0, 0],
            4: [1, 3, 3, 3, 3, 0, 2, 2, 1, 2, 2, 2, 0, 1, 2, 1, 0, 1, 0, 0, 2, 3, 3, 3, 1, 0],
        }
    else:
        raise NotImplementedError(f"no hand-tuned arrangement for {dataset!r}")
    if world_size not in table:
        raise NotImplementedError(
            f"no hand-tuned arrangement for world_size={world_size}; "
            f"use auto_rank_arrange"
        )
    return table[world_size]


def auto_rank_arrange(
    table_sizes: Sequence[int],
    world_size: int,
    id_freq_map: Optional[np.ndarray] = None,
) -> List[int]:
    """Greedy longest-processing-time placement balancing estimated per-rank cost
    (table access frequency when known, else row count)."""
    sizes = np.asarray(table_sizes, np.int64)
    if id_freq_map is not None:
        offs = np.concatenate([[0], np.cumsum(sizes)])
        cost = np.array(
            [id_freq_map[offs[i] : offs[i + 1]].sum() for i in range(len(sizes))],
            np.float64,
        )
    else:
        cost = sizes.astype(np.float64)
    order = np.argsort(-cost)
    load = np.zeros(world_size)
    out = [0] * len(sizes)
    for t in order:
        r = int(np.argmin(load))
        out[t] = r
        load[r] += cost[t]
    return out


def prepare_tablewise_config(
    num_embeddings_per_feature: Sequence[int],
    cache_ratio: float,
    id_freq_map_total: Optional[np.ndarray] = None,
    dataset: Optional[str] = "criteo_kaggle",
    world_size: int = 2,
    rank_arrange: Optional[Sequence[int]] = None,
) -> List[TablewiseEmbeddingBagConfig]:
    """Parity with /root/reference/recsys/utils/misc.py:157-182 (incl. the
    ``int(cache_ratio*n)+2000`` clamp), with auto placement fallback."""
    if rank_arrange is None:
        try:
            rank_arrange = get_tablewise_rank_arrange(dataset or "", world_size)
        except NotImplementedError:
            rank_arrange = auto_rank_arrange(
                num_embeddings_per_feature, world_size, id_freq_map_total
            )
    offs = np.concatenate([[0], np.cumsum(np.asarray(num_embeddings_per_feature, np.int64))])
    configs = []
    for i, n in enumerate(num_embeddings_per_feature):
        freq = None
        if id_freq_map_total is not None:
            freq = np.asarray(id_freq_map_total[offs[i] : offs[i + 1]])
        cuda_row_num = min(int(cache_ratio * n) + 2000, n)
        configs.append(
            TablewiseEmbeddingBagConfig(
                num_embeddings=int(n),
                cuda_row_num=cuda_row_num,
                assigned_rank=int(rank_arrange[i]),
                ids_freq_mapping=freq,
            )
        )
    return configs


class ParallelCachedEmbeddingBagTablewise:
    """Stacked per-rank cached embedding (single-controller SPMD).

    Host API mirrors CachedEmbeddingBag: ``begin_prepare/finish_prepare`` over a
    GLOBAL (B, F) id batch, producing stacked slot ids for the tablewise train
    step (parallel.tablewise_step). Lookup/training happens in shard_map where
    device r sees only its (C_max, D) cache shard.
    """

    def __init__(
        self,
        configs: List[TablewiseEmbeddingBagConfig],
        embedding_dim: int,
        mesh: Mesh,
        *,
        mode: str = "sum",
        warmup_ratio: float = 0.7,
        buffer_size: int = 0,
        evict_strategy: EvictionStrategy = EvictionStrategy.LFU,
        weight_init: str = "uniform",
        seed: int = 1024,
    ):
        self.configs = configs
        self.embedding_dim = int(embedding_dim)
        self.mesh = mesh
        self.mode = mode
        self.buffer_size = buffer_size
        self.evict_strategy = evict_strategy
        self.world = mesh.devices.size
        w = self.world
        F = len(configs)

        # per-rank table partition
        self.tables_of_rank: List[List[int]] = [[] for _ in range(w)]
        for t, c in enumerate(configs):
            assert 0 <= c.assigned_rank < w, f"rank {c.assigned_rank} out of mesh"
            self.tables_of_rank[c.assigned_rank].append(t)
        self.F_max = max(len(ts) for ts in self.tables_of_rank)
        # feature -> (rank, local feature position)
        self.feat_pos = np.zeros((F, 2), np.int64)
        for r, ts in enumerate(self.tables_of_rank):
            for j, t in enumerate(ts):
                self.feat_pos[t] = (r, j)

        # per-rank fused local id spaces (+1 pad row at local index N_r..N_max)
        self.local_sizes = np.array(
            [sum(configs[t].num_embeddings for t in ts) for ts in self.tables_of_rank],
            np.int64,
        )
        self.N_max = int(self.local_sizes.max()) + 1  # +1 pad row
        self.pad_row = self.N_max - 1
        self.capacities = np.array(
            [
                max(1, sum(configs[t].cuda_row_num for t in ts)) + 1  # +1 slot for pad row
                for ts in self.tables_of_rank
            ],
            np.int64,
        )
        self.C_max = int(self.capacities.max())
        # global table offset -> (rank, local offset)
        self.table_local_offset = np.zeros((F,), np.int64)
        for r, ts in enumerate(self.tables_of_rank):
            off = 0
            for t in ts:
                self.table_local_offset[t] = off
                off += configs[t].num_embeddings

        # host tables per rank
        self.host_tables = []
        for r, ts in enumerate(self.tables_of_rank):
            sizes = [configs[t].num_embeddings for t in ts] or [1]
            sizes = sizes + [1]  # pad row lives at the end
            if weight_init == "virtual":
                ht = VirtualHostTable(sizes, embedding_dim, seed=seed + r)
            else:
                arr = hostops.alloc_table(int(sum(sizes)), embedding_dim)
                if weight_init == "uniform":
                    default_table_init(sizes, embedding_dim, seed + r)(arr)
                elif weight_init == "zeros":
                    pass
                else:
                    raise ValueError(weight_init)
                ht = DenseHostTable(arr)
            self.host_tables.append(ht)

        # per-rank host cache directories (the host-authoritative planner,
        # cache/host_directory.py): one directory per rank's fused local id
        # space — zero device readbacks anywhere in the prepare path.
        self.dirs = [make_directory(self.N_max, self.C_max, evict_strategy) for _ in range(w)]
        if evict_strategy == EvictionStrategy.DATASET:
            for r, ts in enumerate(self.tables_of_rank):
                freq = np.zeros((self.N_max,), np.int64)
                off = 0
                for t in ts:
                    f = configs[t].ids_freq_mapping
                    n = configs[t].num_embeddings
                    if f is not None:
                        freq[off : off + n] = np.minimum(f, 2**31 - 1)
                    off += n
                self.dirs[r].set_dataset_freq(freq)
        self.cache_weight = jax.device_put(
            jnp.zeros((w, self.C_max, self.embedding_dim), jnp.float32),
            NamedSharding(mesh, P(AXIS)),
        )

        self.stats = CacheStats()
        self._pending_wb: list = []
        if warmup_ratio > 0 and any(
            c.ids_freq_mapping is not None for c in configs
        ):
            self._warmup(warmup_ratio)

    # ------------------------------------------------------------------
    def route_ids(self, ids_bf: np.ndarray) -> np.ndarray:
        """Global (B, F) table-local... raw per-feature ids -> stacked per-rank
        local id matrix (w, B * F_max), padded with each rank's pad row.
        Input ids are PER-FEATURE (0..num_embeddings_t), as loaded by the
        dataloader in tablewise mode."""
        B, F = ids_bf.shape
        out = np.full((self.world, B * self.F_max), self.pad_row, np.int64)
        for t in range(F):
            r, j = self.feat_pos[t]
            out[r, j * B : (j + 1) * B] = ids_bf[:, t] + self.table_local_offset[t]
        return out

    def begin_prepare(self, ids_bf: np.ndarray):
        """Plan all ranks' windows on the host (native C++ directories, no
        device work) and ship the stacked slot ids sharded over the mesh."""
        routed = self.route_ids(np.asarray(ids_bf))  # (w, B*F_max) local ids
        plans = [
            self.dirs[r].plan(np.ascontiguousarray(routed[r], np.int32))
            for r in range(self.world)
        ]
        slot_ids = jax.device_put(
            np.stack([p.slot_ids for p in plans]).astype(np.int32),
            NamedSharding(self.mesh, P(AXIS)),
        )
        return slot_ids, plans

    def begin_prepare_window(self, ids_bf_list):
        """Plan a WHOLE prefetch window (list of (B, F) per-feature id
        matrices): one directory plan per rank covering all P batches, one
        sharded device transfer of the stacked slot ids. Returns
        (slot_ids (P, w, B*F_max) P(None, AXIS)-sharded, plans)."""
        P_ = len(ids_bf_list)
        routed = np.stack(
            [self.route_ids(np.asarray(b)) for b in ids_bf_list]
        )  # (P, w, B*F_max)
        plans = []
        out = np.empty_like(routed, dtype=np.int32)
        for r in range(self.world):
            p = self.dirs[r].plan(
                np.ascontiguousarray(routed[:, r, :].reshape(-1), np.int32)
            )
            out[:, r, :] = p.slot_ids.reshape(P_, -1)
            plans.append(p)
        slot_ids = jax.device_put(
            out, NamedSharding(self.mesh, P(None, AXIS))
        )
        return slot_ids, plans

    def finish_prepare(self, plans) -> None:
        self._drain_writebacks()
        self.stats.prepare_calls += 1
        self.stats.num_hits_history.append(sum(p.n_hit_unique for p in plans))
        self.stats.num_miss_history.append(
            sum(int(p.admit_rows.shape[0]) for p in plans)
        )
        for r, p in enumerate(plans):
            self._stage_rank(r, p)

    def _stage_rank(self, r: int, p) -> None:
        n_miss = int(p.admit_rows.shape[0])
        if n_miss == 0:
            return
        b = _bucket(n_miss)
        slots_c = np.full((b,), -1, np.int32)
        slots_c[:n_miss] = p.admit_slots
        slots_dev = jnp.array(slots_c)
        wb_mask = p.evict_rows >= 0
        if wb_mask.any():
            vals_dev = _gather_rank(self.cache_weight, jnp.asarray(r), slots_dev)
            self._pending_wb.append((r, p.evict_rows[wb_mask], wb_mask, n_miss, vals_dev))
        t0 = __import__("time").perf_counter()
        rows_c = np.zeros((b,), np.int64)
        rows_c[:n_miss] = p.admit_rows
        vals = self.host_tables[r].gather(rows_c)
        self.cache_weight = _scatter_rank(
            self.cache_weight, jnp.asarray(r), slots_dev, jnp.array(vals)
        )
        self.stats.swap_in_bytes += n_miss * self.embedding_dim * 4
        self.stats.swap_in_time += __import__("time").perf_counter() - t0

    def _drain_writebacks(self) -> None:
        for r, ev_rows, wb_mask, n, vals_dev in self._pending_wb:
            vals = np.asarray(vals_dev)
            self.host_tables[r].scatter(ev_rows, vals[:n][wb_mask])
            self.stats.swap_out_bytes += ev_rows.shape[0] * self.embedding_dim * 4
        self._pending_wb.clear()

    def _warmup(self, warmup_ratio: float) -> None:
        cw = np.zeros((self.world, self.C_max, self.embedding_dim), np.float32)
        for r, ts in enumerate(self.tables_of_rank):
            freq = np.zeros((self.N_max,), np.int64)
            off = 0
            for t in ts:
                f = self.configs[t].ids_freq_mapping
                n = self.configs[t].num_embeddings
                if f is not None:
                    freq[off : off + n] = f
                off += n
            k = min(int(warmup_ratio * (self.capacities[r] - 1)), int(self.local_sizes[r]))
            if k <= 0:
                continue
            top = np.argpartition(freq[: self.local_sizes[r]], -k)[-k:].astype(np.int64)
            self.dirs[r].warmup(top, np.minimum(freq[top], 2**31 - 1))
            cw[r, :k] = self.host_tables[r].gather(top)
        self.cache_weight = jax.device_put(
            jnp.asarray(cw), NamedSharding(self.mesh, P(AXIS))
        )

    def flush(self) -> None:
        self._drain_writebacks()
        for r in range(self.world):
            slots, rows = self.dirs[r].resident()
            real = rows != self.pad_row
            slots, rows = slots[real], rows[real]
            if slots.size == 0:
                continue
            b = _bucket(slots.size)
            slots_c = np.full((b,), -1, np.int32)
            slots_c[: slots.size] = slots
            vals = np.asarray(
                _gather_rank(self.cache_weight, jnp.asarray(r), jnp.array(slots_c))
            )
            self.host_tables[r].scatter(rows, vals[: slots.size])

    def print_comm_stats(self) -> None:
        print(self.stats.summary())

    print_comm_stats_ = print_comm_stats

    def feature_select_perm(self) -> np.ndarray:
        """(F,) indices into the rank-major concat (w * F_max) selecting real
        features in original order — used after the tablewise all-to-all."""
        F = len(self.configs)
        perm = np.zeros((F,), np.int64)
        for t in range(F):
            r, j = self.feat_pos[t]
            perm[t] = r * self.F_max + j
        return perm


@partial(jax.jit, donate_argnums=(0,))
def _scatter_rank(cache, r, slots, vals):
    C = cache.shape[1]
    return cache.at[r, jnp.where(slots >= 0, slots, C)].set(vals, mode="drop")


@jax.jit
def _gather_rank(cache, r, slots):
    return cache[r, jnp.clip(slots, 0, cache.shape[1] - 1)]




def tablewise_train_step(
    mesh: Mesh,
    *,
    feature_perm: np.ndarray,  # (F,) indices into the w*F_max concat
    f_max: int,
    global_batch: int,
    mode: str = "sum",
    compute_dtype=jnp.float32,
):
    """Jitted tablewise-parallel train step.

    Device r holds cache shard (C_max, D) and the GLOBAL batch's slot ids for
    its own tables, pooled (B_global, F_max, D); an all_to_all (batch split,
    feature concat) reshards to (B_local, w*F_max, D); a static gather selects
    the F real features in original order (the reference's concatenated-layout
    shape hook, /root/reference/recsys/models/dlrm.py:29-30). Sparse grads stay
    rank-local; dense grads psum — exactly the hybrid step's math.
    """
    from cachedembedding_tpu.models.dlrm import bce_with_logits, dlrm_dense_forward
    from cachedembedding_tpu.ops.embedding_bag import bag_pool_uniform

    perm = jnp.asarray(feature_perm, jnp.int32)

    def local(dense_params, cache_r, dense_local, slot_ids_r, labels_local,
              sparse_lr, dense_lr):
        w = jax.lax.axis_size(AXIS)
        B_local = global_batch // w
        cache0 = cache_r[0]          # (C_max, D)
        ids0 = slot_ids_r[0]         # (F_max * B_global,)

        def loss_fn(dp, cw):
            ids_fbp = ids0.reshape(f_max, global_batch, 1)
            pooled = bag_pool_uniform(cw, ids_fbp, mode=mode)  # (B_global, F_max, D)
            pooled = jnp.transpose(pooled, (1, 0, 2))  # (F_max, B_global, D)
            # all_to_all: split batch (axis 1) -> concat features (axis 0)
            exchanged = jax.lax.all_to_all(
                pooled, AXIS, split_axis=1, concat_axis=0, tiled=True
            )  # (w*F_max, B_local, D)
            emb = jnp.transpose(exchanged[perm], (1, 0, 2))  # (B_local, F, D)
            logits = dlrm_dense_forward(dp, dense_local, emb, compute_dtype)
            return bce_with_logits(logits, labels_local) * (B_local / global_batch)

        loss, (g_dense, g_cache) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            dense_params, cache0
        )
        g_dense = jax.lax.psum(g_dense, AXIS)
        loss = jax.lax.psum(loss, AXIS)
        new_dense = jax.tree_util.tree_map(
            lambda p, g: p - dense_lr * g, dense_params, g_dense
        )
        return new_dense, (cache0 - sparse_lr * g_cache)[None], loss

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P()),
        out_specs=(P(), P(AXIS), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0, 1))


def tablewise_window_step(
    mesh: Mesh,
    *,
    feature_perm: np.ndarray,
    f_max: int,
    global_batch: int,
    mode: str = "sum",
    compute_dtype=jnp.float32,
):
    """WINDOWED tablewise-parallel training: an entire prefetch window of P
    steps as ONE shard_map'd lax.scan program (the mesh analog of the
    single-chip fused window — one execute per window per mesh instead of one
    per batch). Same math per step as tablewise_train_step.

    step(dense_params, cache (w, C_max, D) P(AXIS), slot_ids (P, w, F_max*B)
    P(None, AXIS), dense (P, B, Din) P(None, AXIS), labels (P, B)
    P(None, AXIS), sparse_lrs (P,), dense_lrs (P,))
    -> (dense_params, cache, (P,) losses)."""
    from cachedembedding_tpu.models.dlrm import bce_with_logits, dlrm_dense_forward
    from cachedembedding_tpu.ops.embedding_bag import bag_pool_uniform

    perm = jnp.asarray(feature_perm, jnp.int32)

    def inner(dense_params, cache_r, slot_ids_r, dense_local, labels_local,
              sparse_lrs, dense_lrs):
        w = jax.lax.axis_size(AXIS)
        B_local = global_batch // w
        cache0 = cache_r[0]  # (C_max, D)

        def body(carry, xs):
            dp, cw = carry
            ids_step, d_local, l_local, slr, dlr = xs
            ids0 = ids_step[0]  # (F_max * B_global,)

            def loss_fn(dp_, cw_):
                ids_fbp = ids0.reshape(f_max, global_batch, 1)
                pooled = bag_pool_uniform(cw_, ids_fbp, mode=mode)
                pooled = jnp.transpose(pooled, (1, 0, 2))  # (F_max, B, D)
                exchanged = jax.lax.all_to_all(
                    pooled, AXIS, split_axis=1, concat_axis=0, tiled=True
                )
                emb = jnp.transpose(exchanged[perm], (1, 0, 2))
                logits = dlrm_dense_forward(dp_, d_local, emb, compute_dtype)
                return bce_with_logits(logits, l_local) * (B_local / global_batch)

            loss, (g_dense, g_cache) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                dp, cw
            )
            g_dense = jax.lax.psum(g_dense, AXIS)
            loss = jax.lax.psum(loss, AXIS)
            dp = jax.tree_util.tree_map(lambda p_, g_: p_ - dlr * g_, dp, g_dense)
            return (dp, cw - slr * g_cache), loss

        (dense_params, cache0), losses = jax.lax.scan(
            body, (dense_params, cache0),
            (slot_ids_r, dense_local, labels_local, sparse_lrs, dense_lrs),
        )
        return dense_params, cache0[None], losses

    mapped = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(
            P(), P(AXIS), P(None, AXIS), P(None, AXIS), P(None, AXIS), P(), P(),
        ),
        out_specs=(P(), P(AXIS), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0, 1))


def tablewise_eval_step(
    mesh: Mesh,
    *,
    feature_perm: np.ndarray,
    f_max: int,
    global_batch: int,
    mode: str = "sum",
    compute_dtype=jnp.float32,
):
    """Forward-only windowed tablewise scoring: (P, B_global) Sigmoid probs."""
    from cachedembedding_tpu.models.dlrm import dlrm_dense_forward
    from cachedembedding_tpu.ops.embedding_bag import bag_pool_uniform

    perm = jnp.asarray(feature_perm, jnp.int32)

    def inner(dense_params, cache_r, slot_ids_r, dense_local):
        w = jax.lax.axis_size(AXIS)
        B_local = global_batch // w
        cache0 = cache_r[0]

        def score(ids_step, d_local):
            ids0 = ids_step[0]
            ids_fbp = ids0.reshape(f_max, global_batch, 1)
            pooled = bag_pool_uniform(cache0, ids_fbp, mode=mode)
            pooled = jnp.transpose(pooled, (1, 0, 2))
            exchanged = jax.lax.all_to_all(
                pooled, AXIS, split_axis=1, concat_axis=0, tiled=True
            )
            emb = jnp.transpose(exchanged[perm], (1, 0, 2))
            logits = dlrm_dense_forward(dense_params, d_local, emb, compute_dtype)
            return jax.nn.sigmoid(logits)  # (B_local,)

        return jax.vmap(score)(slot_ids_r, dense_local)  # (P, B_local)

    mapped = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(None, AXIS), P(None, AXIS)),
        out_specs=P(None, AXIS),
        check_vma=False,
    )
    return jax.jit(mapped)
