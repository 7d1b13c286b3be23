"""Row-sharded CACHED embedding over a device mesh — the >=2-host topology.

The reference analog is torchrec ROW_WISE sharding of big tables
(/root/reference/baselines/dlrm_main.py:709-721) combined with the per-device
software cache of ParallelCachedEmbeddingBag
(/root/reference/recsys/models/dlrm.py:70-82). The defining combination built
here (BASELINE.md >=2-host target):

  * the host-DRAM master table is sharded ROW-WISE across hosts — host h owns
    global rows [h*per, (h+1)*per) and holds ONLY that shard in its DRAM
    (``CachedEmbeddingBag`` instance per shard: its own host table, its own
    directory/planner over locally-owned rows, its own eviction state);
  * each host's chip holds an HBM cache of its LOCALLY-OWNED hot rows — the
    per-shard manager admits/evicts exactly as single-host, so no cross-host
    cache-coherence protocol is needed (a row has exactly one owner);
  * ids are routed to owners: host-side, each rank's id stream is split by
    ``owner = id // per`` and handed to the owner's planner (in a real
    multi-host deployment this id exchange rides the same device collective;
    in the single-controller simulation the planners share one process);
  * the DEVICE program (one ``shard_map``) does the data-plane routing with
    ``exchange_to_owners`` (one lax.all_to_all per phase — per-rank traffic
    O(L/world), the wire-correct shape for DCN): encoded slot ids out, owner
    rows back, then local pooling + DP dense towers. Backward is the exact
    transpose (JAX AD through all_to_all/gather), so grads land only on the
    owning shard's cache rows and the optimizer needs no extra collectives.

Numerics: training is bit-equal to single-host on the same stream (pooling
order per bag is preserved through the route/unroute round-trip; losses are
local-sum / global-batch, psum'd) — tested in tests/test_row_cached.py.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cachedembedding_tpu.cache.manager import CachedEmbeddingBag, CacheStats
from cachedembedding_tpu.cache.state import EvictionStrategy
from cachedembedding_tpu.parallel.mesh import AXIS
from cachedembedding_tpu.parallel.row import row_shard_bounds


class RowShardedCachedEmbeddingBag:
    """W independent per-host cache managers over disjoint row shards.

    ``prepare_ids_per_rank`` is the control plane: route ids to owners, run
    each owner's planner (admit/evict/writeback on ITS shard), and return the
    per-rank streams re-encoded into the global slot space
    ``enc = owner * capacity + slot`` that the device program consumes.
    """

    def __init__(
        self,
        num_embeddings: int,
        embedding_dim: int,
        *,
        mesh: Mesh,
        cache_ratio: float = 0.01,
        cuda_row_num: Optional[int] = None,
        ids_freq_mapping: Optional[np.ndarray] = None,
        warmup_ratio: float = 0.7,
        buffer_size: int = 0,
        evict_strategy: EvictionStrategy = EvictionStrategy.LFU,
        seed: int = 1024,
        dtype=jnp.float32,
        initial_weight: Optional[np.ndarray] = None,
        weight_init: str = "uniform",
        transfer_dtype: str = "float32",
    ):
        self.mesh = mesh
        self.devices = list(mesh.devices.flat)
        W = len(self.devices)
        self.world = W
        self.num_embeddings = int(num_embeddings)
        self.embedding_dim = int(embedding_dim)
        bounds = row_shard_bounds(num_embeddings, W)
        self.per = int(bounds[1] - bounds[0])  # equal (padded) shard rows
        cap = int(cuda_row_num) if cuda_row_num else max(1, int(cache_ratio * self.per))
        self.capacity = cap
        # Under REAL multi-process execution each controller constructs ONLY
        # the shards whose device it owns: its DRAM holds its host-table
        # shards and nothing else (the defining >=2-host memory shape).
        # Remote shards stay None; the slot-assignment exchange in
        # prepare_ids_per_rank fills in their contribution.
        self.multiproc = jax.process_count() > 1
        my_proc = jax.process_index()
        self.shards: List[Optional[CachedEmbeddingBag]] = []
        for h in range(W):
            if self.multiproc and self.devices[h].process_index != my_proc:
                self.shards.append(None)
                continue
            lo = int(bounds[h])
            hi = min(int(bounds[h + 1]), num_embeddings)
            iw = None
            if initial_weight is not None:
                iw = np.zeros((self.per, embedding_dim), np.float32)
                iw[: hi - lo] = initial_weight[lo:hi]
            freq_h = None
            if ids_freq_mapping is not None:
                freq_h = np.zeros((self.per,), np.float64)
                freq_h[: hi - lo] = np.asarray(ids_freq_mapping)[lo:hi]
            mgr = CachedEmbeddingBag(
                self.per,
                embedding_dim,
                cuda_row_num=cap,
                ids_freq_mapping=freq_h,
                warmup_ratio=warmup_ratio,
                buffer_size=buffer_size,
                evict_strategy=evict_strategy,
                seed=seed + 1,  # same canonical stream for every shard when
                # initial_weight is given; explicit weights dominate otherwise
                dtype=dtype,
                initial_weight=iw,
                weight_init=weight_init if iw is None else "uniform",
                planner="host",
                transfer_dtype=transfer_dtype,
                device=self.devices[h],
            )
            self.shards.append(mgr)
        # Per-shard caches may allocate device_rows >= capacity; the device
        # program addresses a uniform (W * capacity, D) array.
        self.stats = CacheStats()

    # -- control plane -----------------------------------------------------
    def prepare_ids_per_rank(self, ids_by_rank: np.ndarray) -> np.ndarray:
        """ids_by_rank: (W, L_local) int64/int32 global ids (rank r's stream).
        Routes to owners, runs each owner's prepare_ids, returns (W, L_local)
        int32 encoded slots (owner * capacity + slot)."""
        W, L = ids_by_rank.shape
        assert W == self.world
        if ids_by_rank.size:
            lo = int(ids_by_rank.min())
            hi = int(ids_by_rank.max())
            if lo < 0 or hi >= self.num_embeddings:
                # mirror the single-host range validation (manager._translate_ids
                # / directory.plan): an out-of-range id would otherwise leave
                # uninitialized garbage in `out` (no owner claims it) or train
                # the shard-padding rows in [num_embeddings, W*per)
                raise ValueError(
                    f"id out of range: {lo if lo < 0 else hi} not in "
                    f"[0, {self.num_embeddings})"
                )
        out = np.full((W, L), -1, np.int64)
        owners = ids_by_rank // self.per  # equal shards: owner is a division
        for h in range(W):
            if self.shards[h] is None:
                continue  # remote owner: its controller plans this sub-stream
            mask = owners == h
            if not mask.any():
                continue
            local = (ids_by_rank[mask] - h * self.per).astype(np.int64)
            pw = self.shards[h].begin_prepare(local, device_put=False)
            self.shards[h].finish_prepare(pw)
            slots = np.asarray(pw.slot_ids)
            out[mask] = slots.astype(np.int64) + h * self.capacity
        if self.multiproc:
            # Host-side slot-assignment exchange: every controller planned the
            # sub-stream its shards own; combine (valid enc >= 0 beats the -1
            # filler). Rides the device collective fabric — the DCN-correct
            # host exchange of the reference's KJT all_to_all control phase
            # (/root/reference/recsys/datasets/utils.py:29-41).
            from jax.experimental import multihost_utils

            gathered = multihost_utils.process_allgather(
                out.astype(np.int32)
            )  # (n_processes, W, L)
            out = np.max(gathered, axis=0)
            if (out < 0).any():
                raise RuntimeError(
                    "slot exchange left unassigned ids — a shard owner "
                    "failed to plan its sub-stream"
                )
        return out.astype(np.int32)

    def aggregate_stats(self) -> CacheStats:
        """Stats over THIS controller's shards (per-host numbers under
        multi-process execution, global when single-process)."""
        agg = CacheStats()
        for m in self.shards:
            if m is None:
                continue
            s = m.stats
            agg.prepare_calls += s.prepare_calls
            agg.swap_in_bytes += s.swap_in_bytes
            agg.swap_out_bytes += s.swap_out_bytes
            agg.num_hits_history += s.num_hits_history
            agg.num_miss_history += s.num_miss_history
            agg.num_write_back_history += s.num_write_back_history
        return agg

    # -- device-array assembly --------------------------------------------
    def global_cache(self) -> jax.Array:
        """(W * capacity, D) row-sharded P(AXIS) view assembled from the
        per-shard manager arrays WITHOUT data movement (each shard already
        lives on its own device). Under multi-process execution each
        controller contributes only its addressable shards — exactly
        make_array_from_single_device_arrays' multihost contract."""
        sharding = NamedSharding(self.mesh, P(AXIS, None))
        local = [
            (d, self.shards[h].cache_weight[: self.capacity])
            for h, d in enumerate(self.devices)
            if self.shards[h] is not None
        ]
        try:
            return jax.make_array_from_single_device_arrays(
                (self.world * self.capacity, self.embedding_dim),
                sharding,
                [jax.device_put(s, d) for d, s in local],
            )
        except Exception:
            if self.multiproc:
                raise
            # fallback: host-side concat (CPU test meshes where single-device
            # assembly is unsupported for the dtype)
            return jax.device_put(
                jnp.concatenate([s for _, s in local], axis=0), sharding
            )

    def sync_shards(self, global_cache: jax.Array) -> None:
        """Write the step's updated rows back into each shard manager (so the
        NEXT prepare's eviction writebacks read post-update values). Reads
        the process's ADDRESSABLE shards only — no cross-process traffic and
        no global slicing program (which would have to run on every
        controller in lockstep)."""
        dev_to_h = {d: h for h, d in enumerate(self.devices)}
        for sh in global_cache.addressable_shards:
            m = self.shards[dev_to_h[sh.device]]
            if m is None:  # pragma: no cover - addressable implies local
                continue
            block = sh.data  # (capacity, D), already on the shard's device
            if m.cache_weight.shape[0] > self.capacity:
                m.cache_weight = m.cache_weight.at[: self.capacity].set(
                    block.astype(m.cache_weight.dtype)
                )
            else:
                m.cache_weight = block.astype(m.cache_weight.dtype)

    def flush(self) -> None:
        for m in self.shards:
            if m is not None:
                m.flush()

    def dense_weight(self) -> np.ndarray:
        """Full (num_embeddings, D) master after flush (test/checkpoint path).
        Multi-process: every controller returns the SAME full master — each
        shard is broadcast from its owner ONE SHARD AT A TIME, so peak extra
        DRAM is one (per, D) block, never n_processes full-table copies."""
        self.flush()
        if not self.multiproc:
            rows = [
                np.asarray(
                    m.host_table.gather(np.arange(self.per, dtype=np.int64))
                )
                for m in self.shards
            ]
            return np.concatenate(rows, axis=0)[: self.num_embeddings]
        from jax.experimental import multihost_utils

        blocks = []
        for m in self.shards:
            blk = (
                np.asarray(
                    m.host_table.gather(np.arange(self.per, dtype=np.int64)),
                    np.float32,
                )
                if m is not None
                else np.zeros((self.per, self.embedding_dim), np.float32)
            )
            blocks.append(
                multihost_utils.broadcast_one_to_all(blk, is_source=m is not None)
            )
        return np.concatenate(blocks, axis=0)[: self.num_embeddings]


def _bucket_with_positions(enc: jnp.ndarray, owners: jnp.ndarray, w: int, V: int):
    """Like parallel.all_to_all.bucket_by_owner but also returns each element's
    flat bucket position (owner*V + rank-within-owner) for the un-route gather."""
    oh = (owners[:, None] == jnp.arange(w)[None, :]).astype(jnp.int32)
    rank_within = (jnp.cumsum(oh, axis=0) - oh)[jnp.arange(enc.shape[0]), owners]
    counts = oh.sum(axis=0)
    pos = owners * V + rank_within
    target = jnp.where(rank_within < V, pos, w * V)
    out = jnp.zeros((w * V,), enc.dtype).at[target].set(enc, mode="drop")
    return out.reshape(w, V), jnp.minimum(counts, V), pos


def build_rowwise_cached_window(
    mesh: Mesh,
    *,
    num_features: int,
    global_batch: int,
    pooling: int,
    capacity: int,
    mode: str = "sum",
    compute_dtype=jnp.float32,
    model: str = "dlrm",
    per_pair_budget: Optional[int] = None,
):
    """WINDOWED row-sharded cached train step: a whole prefetch window of P
    batches as ONE shard_map scan — the rowwise analog of the single-chip
    fused window (train/mesh_window.py). The control plane plans the window
    ONCE (ids deduped across batches, far-sighted prefetch semantics) and the
    cache assembles/syncs once per window instead of once per batch.

    step(dense_params, global_cache,
         enc (P, W, L_local), dense (P, W, B_local, Din),
         labels (P, W, B_local), sparse_lrs (P,), dense_lrs (P,))
      -> (dense_params, global_cache, (P,) losses)
    """
    from cachedembedding_tpu.train.trainer import _model_loss

    w = mesh.devices.size
    B_local = global_batch // w
    L_local = num_features * B_local * pooling
    V = per_pair_budget or L_local

    def inner(dense_params, cache_shard, enc_w, dense_w, labels_w, slrs, dlrs):
        # shard_map blocks: enc (P, 1, L), dense (P, 1, B, Din), labels (P, 1, B)
        my = jax.lax.axis_index(AXIS)

        def body(carry, xs):
            dp, cw = carry
            enc_local, dense_local, labels_local, slr, dlr = xs
            dense_local = dense_local[0]
            labels_local = labels_local.reshape(-1)
            enc = enc_local.reshape(-1)
            owners = enc // capacity
            buckets, counts, pos = _bucket_with_positions(enc, owners, w, V)
            received = jax.lax.all_to_all(
                buckets, AXIS, split_axis=0, concat_axis=0, tiled=True
            )
            local_slots = jnp.clip(received - my * capacity, 0, capacity - 1)

            def compute(dp_, cw_):
                rows_owned = jnp.take(
                    cw_, local_slots.reshape(-1), axis=0
                ).reshape(w, V, -1)
                rows_back = jax.lax.all_to_all(
                    rows_owned, AXIS, split_axis=0, concat_axis=0, tiled=True
                )
                # over-budget ids (pos >= w*V when an owner received more
                # than V) contribute ZERO rows instead of clipping to an
                # arbitrary last row — bounded degradation, never corruption
                rows = jnp.take(
                    rows_back.reshape(w * V, -1), pos, axis=0,
                    mode="fill", fill_value=0,
                )
                rows = rows.astype(jnp.float32)
                fbp = rows.reshape(num_features, B_local, pooling, -1)
                pooled = fbp.sum(axis=2) if mode == "sum" else fbp.mean(axis=2)
                emb = jnp.transpose(pooled, (1, 0, 2))
                loss = _model_loss(
                    model, dp_, dense_local, emb, compute_dtype, labels_local
                )
                return loss * (B_local / global_batch)

            loss, (g_dense, g_cache) = jax.value_and_grad(
                compute, argnums=(0, 1)
            )(dp, cw)
            g_dense = jax.lax.psum(g_dense, AXIS)
            loss = jax.lax.psum(loss, AXIS)
            dp = jax.tree_util.tree_map(
                lambda p_, g_: p_ - dlr * g_, dp, g_dense
            )
            cw = (
                cw.astype(jnp.float32) - slr * g_cache.astype(jnp.float32)
            ).astype(cw.dtype)
            return (dp, cw), loss

        (dense_params, cache_shard), losses = jax.lax.scan(
            body, (dense_params, cache_shard),
            (enc_w, dense_w, labels_w, slrs, dlrs),
        )
        return dense_params, cache_shard, losses

    mapped = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(
            P(),                     # dense params replicated
            P(AXIS, None),           # global cache row-sharded
            P(None, AXIS, None),     # enc (P, W, L_local)
            P(None, AXIS, None, None),  # dense (P, W, B_local, Din)
            P(None, AXIS, None),     # labels (P, W, B_local)
            P(), P(),
        ),
        out_specs=(P(), P(AXIS, None), P()), check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(1,))


def build_rowwise_cached_step(
    mesh: Mesh,
    *,
    num_features: int,
    global_batch: int,
    pooling: int,
    capacity: int,
    mode: str = "sum",
    compute_dtype=jnp.float32,
    model: str = "dlrm",
    per_pair_budget: Optional[int] = None,
    train: bool = True,
):
    """One fused shard_map step for the row-sharded cached embedding.

    step(dense_params, global_cache, enc_ids (W, L_local), dense (W, B_local,
    Din), labels (W, B_local), sparse_lr, dense_lr) ->
      train: (dense_params, global_cache, loss)
      eval:  (W, B_local) probabilities
    """
    from cachedembedding_tpu.train.trainer import _model_loss, _model_probs

    w = mesh.devices.size
    B_local = global_batch // w
    L_local = num_features * B_local * pooling
    V = per_pair_budget or L_local  # worst case: one owner gets everything

    def inner(dense_params, cache_shard, enc_local, dense_local, labels_local,
              slr, dlr):
        # shard_map blocks keep their singleton leading axis: (1, L), (1, B,
        # Din), (1, B)
        dense_local = dense_local[0]
        labels_local = labels_local.reshape(-1)
        enc = enc_local.reshape(-1)  # (L_local,)
        owners = enc // capacity
        buckets, counts, pos = _bucket_with_positions(enc, owners, w, V)
        # phase 1: ids to owners (control data — int32, non-diff)
        recv_counts = jax.lax.all_to_all(
            counts.reshape(w, 1), AXIS, split_axis=0, concat_axis=0, tiled=True
        ).reshape(w)
        received = jax.lax.all_to_all(
            buckets, AXIS, split_axis=0, concat_axis=0, tiled=True
        )
        my = jax.lax.axis_index(AXIS)
        local_slots = jnp.clip(received - my * capacity, 0, capacity - 1)

        def compute(dp, cw):
            # phase 2: owner gathers ITS cached rows, ships them back
            rows_owned = jnp.take(cw, local_slots.reshape(-1), axis=0).reshape(
                w, V, -1
            )
            rows_back = jax.lax.all_to_all(
                rows_owned, AXIS, split_axis=0, concat_axis=0, tiled=True
            )
            rows = jnp.take(
                rows_back.reshape(w * V, -1), pos, axis=0,
                mode="fill", fill_value=0,  # over-budget ids -> zero rows
            )  # (L, D)
            rows = rows.astype(jnp.float32)
            fbp = rows.reshape(num_features, B_local, pooling, -1)
            pooled = fbp.sum(axis=2) if mode == "sum" else fbp.mean(axis=2)
            emb = jnp.transpose(pooled, (1, 0, 2))  # (B_local, F, D)
            if not train:
                return _model_probs(
                    model, dp, dense_local, emb, compute_dtype
                ).reshape(1, -1)
            loss = _model_loss(
                model, dp, dense_local, emb, compute_dtype, labels_local
            )
            return loss * (B_local / global_batch)

        if not train:
            return compute(dense_params, cache_shard)

        loss, (g_dense, g_cache) = jax.value_and_grad(
            compute, argnums=(0, 1)
        )(dense_params, cache_shard)
        g_dense = jax.lax.psum(g_dense, AXIS)
        loss = jax.lax.psum(loss, AXIS)
        new_dense = jax.tree_util.tree_map(
            lambda p_, g_: p_ - dlr * g_, dense_params, g_dense
        )
        new_cache = (
            cache_shard.astype(jnp.float32) - slr * g_cache.astype(jnp.float32)
        ).astype(cache_shard.dtype)
        return new_dense, new_cache, loss

    in_specs = (
        P(),            # dense params replicated
        P(AXIS, None),  # global cache row-sharded
        P(AXIS, None),  # enc ids per rank
        P(AXIS, None, None),  # dense (W, B_local, Din)
        P(AXIS, None),  # labels (W, B_local)
        P(), P(),
    )
    if train:
        mapped = jax.shard_map(
            inner, mesh=mesh, in_specs=in_specs,
            out_specs=(P(), P(AXIS, None), P()), check_vma=False,
        )
        return jax.jit(mapped, donate_argnums=(1,))

    def inner_eval(dense_params, cache_shard, enc_local, dense_local, slr, dlr):
        return inner(
            dense_params, cache_shard, enc_local, dense_local,
            jnp.zeros((B_local,), jnp.float32), slr, dlr,
        )

    mapped = jax.shard_map(
        inner_eval, mesh=mesh,
        in_specs=(P(), P(AXIS, None), P(AXIS, None), P(AXIS, None, None), P(), P()),
        out_specs=P(AXIS, None),
        check_vma=False,
    )
    return jax.jit(mapped)
