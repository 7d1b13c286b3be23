"""The jit-compatible cache state machine.

This is the TPU re-design of the reference's cache manager (``cache_weight_mgr`` in
ColossalAI's ``cache_embedding``; external API reconstructed in SURVEY.md §2.2 from
its usage sites, e.g. /root/reference/recsys/dlrm_main.py:259 ``prepare_ids`` and
/root/reference/benchmark/benchmark_cache.py:39-75).

Design stance (SURVEY.md §7): instead of the reference's eager CUDA tensor
bookkeeping with dynamic shapes, ALL cache metadata lives in fixed-size device
arrays and ``plan_ids`` is a single jitted function

    (state, ids) -> (new_state, Plan)

that uniques the ids, splits hits/misses, picks eviction victims (LFU or
dataset-frequency order), and emits a fixed-capacity admit/evict plan. The actual
row movement between TPU-VM host DRAM and HBM happens OUTSIDE jit, orchestrated by
``cachedembedding_tpu.cache.manager.CachedEmbeddingBag`` which reads the small plan
arrays back to the host, gathers rows from the host table (native C++ helper), and
dispatches jitted scatters into the HBM-resident ``cache_weight``.

Memory budget: for N total rows and capacity C the metadata is
``row_to_slot`` (N) + ``slot_to_row`` (C) + ``slot_freq`` (C) int32 — e.g. 712 MB
for Criteo-1TB's 177.9M rows, well within a v5e chip's HBM next to the ~1 GB
cache itself.
"""

from __future__ import annotations

import enum
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from cachedembedding_tpu.ops.unique import unique_mask


class EvictionStrategy(enum.Enum):
    """Mirror of the reference's ``EvictionStrategy`` enum
    (/root/reference/recsys/dlrm_main.py:131-132, recsys/models/dlrm.py:66)."""

    LFU = "lfu"          # runtime frequency counters
    DATASET = "dataset"  # static dataset id frequency


class CacheState(NamedTuple):
    """Device-resident cache metadata. All shapes static.

    slot_to_row: (C,) int32 — global row held by each cache slot; -1 = empty.
    row_to_slot: (N,) int32 — inverse map; -1 = not cached.
    slot_freq:   (C,) int32 — LFU: running hit counters; DATASET: static dataset
                 frequency of the resident row. Used as the eviction priority.
    """

    slot_to_row: jnp.ndarray
    row_to_slot: jnp.ndarray
    slot_freq: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.slot_to_row.shape[0]

    @property
    def num_rows(self) -> int:
        return self.row_to_slot.shape[0]


class Plan(NamedTuple):
    """Fixed-capacity admit/evict plan emitted by ``plan_ids``.

    Packed for cheap host readback (host<->device round-trips are the scarce
    resource in the staging path — one scalar read + one index-block read per
    window):

    indices: (3, U) int32 — rows [admit_rows, admit_slots, evict_rows]; lanes
             past ``n_miss`` are inactive (-1).
        admit_rows:  global row ids that must be copied host->HBM.
        admit_slots: destination cache slots (same slots are the evict victims).
        evict_rows:  previous occupant of each admit slot (-1 if it was empty) —
                     written back HBM->host before the admit lands.
    scalars: (6,) int32 — [n_miss, n_unique, capacity_ok, n_hit_unique,
             n_hit_weighted, n_ids]. capacity_ok==0 means the working set
             exceeded capacity (hard error). Hit stats give
             ``num_hits_history`` parity (/root/reference/recsys/dlrm_main.py:286-290).
    """

    indices: jnp.ndarray
    scalars: jnp.ndarray

    @property
    def admit_rows(self):
        return self.indices[0]

    @property
    def admit_slots(self):
        return self.indices[1]

    @property
    def evict_rows(self):
        return self.indices[2]

    @property
    def n_miss(self):
        return self.scalars[0]

    @property
    def n_unique(self):
        return self.scalars[1]

    @property
    def capacity_ok(self):
        return self.scalars[2]

    @property
    def n_hit_unique(self):
        return self.scalars[3]

    @property
    def n_hit_weighted(self):
        return self.scalars[4]

    @property
    def n_ids(self):
        return self.scalars[5]


def init_cache_state(num_rows: int, capacity: int) -> CacheState:
    return CacheState(
        slot_to_row=jnp.full((capacity,), -1, jnp.int32),
        row_to_slot=jnp.full((num_rows,), -1, jnp.int32),
        slot_freq=jnp.zeros((capacity,), jnp.int32),
    )


@partial(
    jax.jit,
    static_argnames=("unique_budget", "strategy", "approx_evict"),
    donate_argnames=("state",),
)
def plan_ids(
    state: CacheState,
    ids: jnp.ndarray,
    dataset_freq: Optional[jnp.ndarray] = None,
    *,
    unique_budget: int,
    strategy: EvictionStrategy = EvictionStrategy.LFU,
    approx_evict: bool = False,
) -> tuple[CacheState, Plan]:
    """One cache-maintenance step: make every id in ``ids`` resident (in plan form).

    ids: (L,) int32 global row ids, all >= 0.
    dataset_freq: (N,) int32 — required for EvictionStrategy.DATASET.
    unique_budget: static U >= expected unique count. If the true unique count
        exceeds U (or C), the plan is incomplete — detect via ``n_unique``.
    """
    C = state.capacity
    N = state.num_rows
    U = min(unique_budget, C)

    # Sort-free unique over the bounded row domain — see unique_mask. Falls back
    # to the sort-based path only if the domain were unbounded (it never is).
    uids, counts, n_unique = unique_mask(ids, U, N)
    valid = uids >= 0
    safe_uids = jnp.where(valid, uids, 0)
    slots = state.row_to_slot[safe_uids]  # (U,)
    is_hit = valid & (slots >= 0)
    miss = valid & (slots < 0)
    n_miss = jnp.sum(miss.astype(jnp.int32))

    # Protect slots that the current id set needs (hits must survive eviction).
    hit_slots = jnp.where(is_hit, slots, C)
    protected = jnp.zeros((C,), jnp.bool_).at[hit_slots].set(True, mode="drop")

    # Victim priority: empty slots first, then lowest-frequency residents;
    # protected slots are not evictable.
    empty = state.slot_to_row < 0
    score = jnp.where(empty, -1.0, state.slot_freq.astype(jnp.float32))
    score = jnp.where(protected, jnp.inf, score)
    if approx_evict:
        # TPU-fast approximate selection. approx_min_k's recall < 1 can let a
        # protected (inf-score) slot into the k while missing a true-minimum
        # unprotected one; re-sorting WITHIN the k (U << C, cheap) pushes any
        # inf entries past the unprotected ones so they only become active
        # victims when the selected k genuinely has fewer than n_miss
        # unprotected slots. A residual false 'capacity exhausted' is still
        # possible under extreme pressure (recall missed enough unprotected
        # slots) — it fails loudly via capacity_ok, never corrupts silently.
        k_scores, k_slots = jax.lax.approx_min_k(score, k=U)
        order_k = jnp.argsort(k_scores)
        victim_slots = k_slots[order_k]
        victim_scores = k_scores[order_k]
    else:
        order = jnp.argsort(score)
        victim_slots = order[:U]
        victim_scores = score[victim_slots]

    # Compact missing uids to the front: admit i goes to victim slot i.
    miss_rank = jnp.cumsum(miss.astype(jnp.int32)) - 1
    target = jnp.where(miss, miss_rank, U)
    admit_rows = jnp.full((U,), -1, jnp.int32).at[target].set(uids, mode="drop")
    admit_counts = jnp.zeros((U,), jnp.int32).at[target].set(counts, mode="drop")

    lane = jnp.arange(U, dtype=jnp.int32)
    active = lane < n_miss
    admit_slots = jnp.where(active, victim_slots, -1)
    prev_rows = state.slot_to_row[jnp.clip(victim_slots, 0, C - 1)]
    evict_rows = jnp.where(active, prev_rows, -1)
    # If any active victim is protected (score inf), the working set exceeded C.
    capacity_ok = jnp.logical_not(jnp.any(active & jnp.isinf(victim_scores)))

    # --- state updates ---
    r2s = state.row_to_slot
    r2s = r2s.at[jnp.where(evict_rows >= 0, evict_rows, N)].set(-1, mode="drop")
    r2s = r2s.at[jnp.where(active, admit_rows, N)].set(admit_slots, mode="drop")
    s2r = state.slot_to_row.at[jnp.where(active, admit_slots, C)].set(admit_rows, mode="drop")

    freq = state.slot_freq
    safe_admit_slots = jnp.where(active, admit_slots, C)
    if strategy == EvictionStrategy.LFU:
        freq = freq.at[safe_admit_slots].set(admit_counts, mode="drop")
        freq = freq.at[hit_slots].add(jnp.where(is_hit, counts, 0), mode="drop")
    else:
        if dataset_freq is None:
            raise ValueError("EvictionStrategy.DATASET requires dataset_freq")
        admit_freq = dataset_freq[jnp.clip(admit_rows, 0, N - 1)].astype(jnp.int32)
        freq = freq.at[safe_admit_slots].set(admit_freq, mode="drop")

    new_state = CacheState(slot_to_row=s2r, row_to_slot=r2s, slot_freq=freq)
    plan = Plan(
        indices=jnp.stack([admit_rows, admit_slots, evict_rows]),
        scalars=jnp.stack(
            [
                n_miss,
                n_unique,
                capacity_ok.astype(jnp.int32),
                jnp.sum(is_hit.astype(jnp.int32)),
                jnp.sum(jnp.where(is_hit, counts, 0)),
                jnp.asarray(ids.shape[0], jnp.int32),
            ]
        ),
    )
    return new_state, plan


@partial(jax.jit, static_argnames=("nb",))
def slice_plan_indices(indices: jnp.ndarray, nb: int) -> jnp.ndarray:
    """First nb lanes of the packed (3, U) plan — one bucketed readback."""
    return jax.lax.dynamic_slice(indices, (0, 0), (3, min(nb, indices.shape[1])))


@jax.jit
def remap_ids(state: CacheState, ids: jnp.ndarray) -> jnp.ndarray:
    """Global row ids -> cache-slot ids (valid only after ``plan_ids`` made them
    resident). This is the 'ids in cache-slot space' handoff of the reference's
    prepare_ids (/root/reference/recsys/dlrm_main.py:259-269, cache_op=False path)."""
    return state.row_to_slot[ids]


@partial(jax.jit, static_argnames=("out_dtype",))
def gather_slots(
    cache_weight: jnp.ndarray, slots: jnp.ndarray, out_dtype: Optional[str] = None
) -> jnp.ndarray:
    """Read rows out of the HBM cache (used for eviction writeback / flush).
    ``slots`` may contain -1 padding; those rows are garbage and must be filtered
    host-side via the matching evict_rows >= 0 mask. ``out_dtype`` (e.g.
    "bfloat16") halves the device->host transfer."""
    rows = cache_weight[jnp.clip(slots, 0, cache_weight.shape[0] - 1)]
    return rows.astype(out_dtype) if out_dtype else rows


@jax.jit
def gather_slots_q8(cache_weight: jnp.ndarray, slots: jnp.ndarray):
    """Eviction readback at 129 bytes/row instead of 258 (bf16) or 516 (f32):
    per-row symmetric int8 quantization ON DEVICE. Returns (q (n, D) int8,
    scales (n,) f32); host reconstructs q * scale. Round-to-nearest error is
    <= absmax/254 per element — the same order as one bf16 rounding for
    typical embedding rows, gated by the AUROC-retention test."""
    rows = cache_weight[jnp.clip(slots, 0, cache_weight.shape[0] - 1)].astype(
        jnp.float32
    )
    absmax = jnp.max(jnp.abs(rows), axis=1)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(rows / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


@partial(jax.jit, donate_argnames=("cache_weight",))
def scatter_admits_q8(
    cache_weight: jnp.ndarray,
    slots: jnp.ndarray,
    q: jnp.ndarray,       # (n, D) int8
    scales: jnp.ndarray,  # (n,) f32
) -> jnp.ndarray:
    """Land int8-quantized admitted rows (dequantized on device)."""
    C = cache_weight.shape[0]
    vals = q.astype(jnp.float32) * scales[:, None]
    return cache_weight.at[jnp.where(slots >= 0, slots, C)].set(
        vals.astype(cache_weight.dtype), mode="drop"
    )


def dequant_rows_q4(packed, scales, D: int):
    """Device inverse of manager._quant_rows_host4: (n, D//2) uint8 nibble
    pairs (low nibble = element 2k, biased by 8) + (n,) f32 per-row scales
    -> (n, D) f32 rows. The ONE definition of the int4 wire decode — used by
    the admit scatter, the fused window program and the mesh sharded-admit
    path, so the format can never desynchronize between them."""
    n = packed.shape[0]
    u = packed.astype(jnp.int32)
    q = jnp.stack([(u & 0xF) - 8, (u >> 4) - 8], axis=-1).reshape(n, D)
    return q.astype(jnp.float32) * scales[:, None]


@partial(jax.jit, donate_argnames=("cache_weight",))
def scatter_admits_q4(
    cache_weight: jnp.ndarray,
    slots: jnp.ndarray,
    packed: jnp.ndarray,  # (n, D//2) uint8 nibble pairs (low nibble = elem 2k)
    scales: jnp.ndarray,  # (n,) f32
) -> jnp.ndarray:
    """Land 4-bit-quantized admitted rows (biased-by-8 nibbles, dequantized
    on device with the per-row scale)."""
    C, D = cache_weight.shape
    vals = dequant_rows_q4(packed, scales, D)
    return cache_weight.at[jnp.where(slots >= 0, slots, C)].set(
        vals.astype(cache_weight.dtype), mode="drop"
    )


@partial(jax.jit, donate_argnames=("cache_weight",))
def scatter_admits(
    cache_weight: jnp.ndarray, slots: jnp.ndarray, values: jnp.ndarray
) -> jnp.ndarray:
    """Land admitted host rows into their cache slots (donated, in-place on TPU).
    ``values`` may arrive in a narrower transfer dtype (bf16) and is upcast."""
    C = cache_weight.shape[0]
    return cache_weight.at[jnp.where(slots >= 0, slots, C)].set(
        values.astype(cache_weight.dtype), mode="drop"
    )
