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
from cachedembedding_tpu.parallel.multiproc import global_max, put_addressable


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

        # Under REAL multi-process execution each controller owns ONLY the
        # ranks whose device it holds: its DRAM gets those ranks' host tables
        # and directories; remote ranks stay None (the >=2-host memory shape,
        # same contract as parallel.row_cached).
        self.multiproc = jax.process_count() > 1
        my_proc = jax.process_index()
        self.devices = list(mesh.devices.flat)
        self._dev_rank = {d: r for r, d in enumerate(self.devices)}
        self.local_ranks = [
            r for r, d in enumerate(self.devices)
            if not self.multiproc or d.process_index == my_proc
        ]
        is_local = set(self.local_ranks)

        # host tables per rank (local ranks only)
        self.host_tables: List = []
        for r, ts in enumerate(self.tables_of_rank):
            if r not in is_local:
                self.host_tables.append(None)
                continue
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
        # cache/host_directory.py): one directory per LOCAL rank's fused
        # local id space — zero device readbacks anywhere in the prepare path.
        self.dirs = [
            make_directory(self.N_max, self.C_max, evict_strategy)
            if r in is_local else None
            for r in range(w)
        ]
        if evict_strategy == EvictionStrategy.DATASET:
            for r, ts in enumerate(self.tables_of_rank):
                if self.dirs[r] is None:
                    continue
                freq = np.zeros((self.N_max,), np.int64)
                off = 0
                for t in ts:
                    f = configs[t].ids_freq_mapping
                    n = configs[t].num_embeddings
                    if f is not None:
                        freq[off : off + n] = np.minimum(f, 2**31 - 1)
                    off += n
                self.dirs[r].set_dataset_freq(freq)
        self.cache_weight = jax.make_array_from_callback(
            (w, self.C_max, self.embedding_dim),
            NamedSharding(mesh, P(AXIS)),
            lambda idx: np.zeros(
                (len(range(*idx[0].indices(w))), self.C_max, self.embedding_dim),
                np.float32,
            ),
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

    def _put(self, arr: np.ndarray, spec: P):
        return put_addressable(self.mesh, arr, spec)

    def begin_prepare(self, ids_bf: np.ndarray):
        """Plan the LOCAL ranks' batch on the host (native C++ directories, no
        device work) and ship the stacked slot ids sharded over the mesh —
        device_put of a P(AXIS) value transfers only this controller's
        addressable shards, so remote ranks' (zero-filled, planned by their
        own controller) lanes never ship from here."""
        routed = self.route_ids(np.asarray(ids_bf))  # (w, B*F_max) local ids
        plans = [
            self.dirs[r].plan(np.ascontiguousarray(routed[r], np.int32))
            if self.dirs[r] is not None else None
            for r in range(self.world)
        ]
        out = np.zeros(routed.shape, np.int32)
        for r in self.local_ranks:
            out[r] = plans[r].slot_ids
        slot_ids = self._put(out, P(AXIS))
        return slot_ids, plans

    def begin_prepare_window(self, ids_bf_list):
        """Plan a WHOLE prefetch window (list of (B, F) per-feature id
        matrices): one directory plan per LOCAL rank covering all P batches,
        one sharded device transfer of the stacked slot ids. Returns
        (slot_ids (P, w, B*F_max) P(None, AXIS)-sharded, plans)."""
        P_ = len(ids_bf_list)
        routed = np.stack(
            [self.route_ids(np.asarray(b)) for b in ids_bf_list]
        )  # (P, w, B*F_max)
        plans: List = [None] * self.world
        out = np.zeros_like(routed, dtype=np.int32)
        for r in self.local_ranks:
            p = self.dirs[r].plan(
                np.ascontiguousarray(routed[:, r, :].reshape(-1), np.int32)
            )
            out[:, r, :] = p.slot_ids.reshape(P_, -1)
            plans[r] = p
        slot_ids = self._put(out, P(None, AXIS))
        return slot_ids, plans

    def finish_prepare(self, plans) -> None:
        self._drain_writebacks()
        self.stats.prepare_calls += 1
        self.stats.num_hits_history.append(
            sum(p.n_hit_unique for p in plans if p is not None)
        )
        self.stats.num_miss_history.append(
            sum(int(p.admit_rows.shape[0]) for p in plans if p is not None)
        )
        self._stage_all(plans)

    def _stage_all(self, plans) -> None:
        """ONE lockstep device program stages every rank's window: gather the
        evicted occupants (writeback reads), then scatter the admits — every
        controller dispatches the identical global program (per-rank loops of
        device ops would diverge across processes and deadlock the SPMD
        stream). Padded width is agreed across processes."""
        n_miss = {
            r: int(plans[r].admit_rows.shape[0]) for r in self.local_ranks
            if plans[r] is not None
        }
        b = global_max(max(
            [_bucket(n) for n in n_miss.values() if n > 0], default=0
        ))
        if b == 0:
            return
        w, D = self.world, self.embedding_dim
        slots_all = np.full((w, b), -1, np.int32)
        vals_all = np.zeros((w, b, D), np.float32)
        wb_records = []
        t0 = __import__("time").perf_counter()
        for r, n in n_miss.items():
            if n == 0:
                continue
            p = plans[r]
            slots_all[r, :n] = p.admit_slots
            vals_all[r, :n] = self.host_tables[r].gather(
                np.ascontiguousarray(p.admit_rows, np.int64)
            )
            wb_mask = p.evict_rows >= 0
            if wb_mask.any():
                wb_records.append((r, p.evict_rows[wb_mask], wb_mask, n))
            self.stats.swap_in_bytes += n * D * 4
        self.stats.swap_in_time += __import__("time").perf_counter() - t0
        self.cache_weight, wb_vals = _stage_all_op(
            self.cache_weight,
            self._put(slots_all, P(AXIS)),
            self._put(vals_all, P(AXIS)),
        )
        if wb_records:
            self._pending_wb.append((wb_vals, wb_records))

    def _drain_writebacks(self) -> None:
        for wb_vals, records in self._pending_wb:
            by_rank = {
                self._dev_rank[sh.device]: sh.data
                for sh in wb_vals.addressable_shards
            }
            for r, ev_rows, wb_mask, n, in records:
                vals = np.asarray(by_rank[r]).reshape(-1, self.embedding_dim)
                self.host_tables[r].scatter(ev_rows, vals[:n][wb_mask])
                self.stats.swap_out_bytes += ev_rows.shape[0] * self.embedding_dim * 4
        self._pending_wb.clear()

    def _warmup(self, warmup_ratio: float) -> None:
        cw = np.zeros((self.world, self.C_max, self.embedding_dim), np.float32)
        for r in self.local_ranks:
            ts = self.tables_of_rank[r]
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
        # P(AXIS) device_put ships only this controller's addressable shards;
        # remote ranks' (zero) blocks are filled by their own controller.
        self.cache_weight = self._put(cw, P(AXIS))

    def flush(self) -> None:
        self._drain_writebacks()
        resident = {}
        for r in self.local_ranks:
            slots, rows = self.dirs[r].resident()
            real = rows != self.pad_row
            slots, rows = slots[real], rows[real]
            if slots.size:
                resident[r] = (slots, rows)
        b = global_max(max(
            [_bucket(s.size) for s, _ in resident.values()], default=0
        ))
        if b == 0:
            return
        slots_all = np.full((self.world, b), -1, np.int32)
        for r, (slots, _) in resident.items():
            slots_all[r, : slots.size] = slots
        vals_dev = _gather_all_op(
            self.cache_weight, self._put(slots_all, P(AXIS))
        )
        by_rank = {
            self._dev_rank[sh.device]: sh.data
            for sh in vals_dev.addressable_shards
        }
        for r, (slots, rows) in resident.items():
            vals = np.asarray(by_rank[r]).reshape(-1, self.embedding_dim)
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


def _stage_inner(cache_r, slots_r, vals_r):
    """Per-device window staging: read the admit slots' CURRENT occupants
    (the eviction writeback payload), then land the admits."""
    c0, s0, v0 = cache_r[0], slots_r[0], vals_r[0]
    C = c0.shape[0]
    wb = c0[jnp.clip(s0, 0, C - 1)]
    c0 = c0.at[jnp.where(s0 >= 0, s0, C)].set(v0, mode="drop")
    return c0[None], wb[None]


_STAGE_CACHE: dict = {}


def _stage_all_op(cache, slots, vals):
    """One lockstep shard_map program staging every rank's admits/writebacks —
    identical dispatch on every controller (multi-process safe)."""
    key = ("stage", cache.shape, slots.shape, cache.dtype, cache.sharding)
    if key not in _STAGE_CACHE:
        mesh = cache.sharding.mesh
        _STAGE_CACHE[key] = jax.jit(
            jax.shard_map(
                _stage_inner, mesh=mesh,
                in_specs=(P(AXIS), P(AXIS), P(AXIS)),
                out_specs=(P(AXIS), P(AXIS)), check_vma=False,
            ),
            donate_argnums=(0,),
        )
    return _STAGE_CACHE[key](cache, slots, vals)


def _gather_all_op(cache, slots):
    """Lockstep per-rank slot gather (flush reads)."""
    key = ("gather", cache.shape, slots.shape, cache.dtype, cache.sharding)
    if key not in _STAGE_CACHE:
        mesh = cache.sharding.mesh

        def inner(cache_r, slots_r):
            c0, s0 = cache_r[0], slots_r[0]
            return c0[jnp.clip(s0, 0, c0.shape[0] - 1)][None]

        _STAGE_CACHE[key] = jax.jit(
            jax.shard_map(
                inner, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
                out_specs=P(AXIS), check_vma=False,
            )
        )
    return _STAGE_CACHE[key](cache, slots)




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
    """Forward-only windowed tablewise scoring: (P, B_global) Sigmoid probs,
    REPLICATED (an in-program all_gather) so the host metric readback works
    when the mesh spans processes."""
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

        probs = jax.vmap(score)(slot_ids_r, dense_local)  # (P, B_local)
        return jax.lax.all_gather(probs, AXIS, axis=1, tiled=True)

    mapped = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(None, AXIS), P(None, AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(mapped)
