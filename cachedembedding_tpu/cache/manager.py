"""CachedEmbeddingBag — host-DRAM embedding table with an HBM hot-row cache.

Drop-in capability match for the reference's ``CachedEmbeddingBag``
(constructor surface reconstructed in SURVEY.md §2.2 from
/root/reference/benchmark/benchmark_cache.py:29-40 and
/root/reference/recsys/models/dlrm.py:70-81): the full ``(num_embeddings, dim)``
weight lives in TPU-VM host DRAM (numpy), and ``int(cache_ratio * num_embeddings)``
rows are resident in an HBM ``cache_weight`` array that is the *trainable
parameter* seen by jitted train steps.

Split of responsibilities:
  * device (jit): ``plan_ids`` state machine, slot gather/scatter, lookup+pool.
  * host (this class): reads the small plan arrays back, gathers/scatters rows of
    the host table (multithreaded C++ when built), buckets transfer sizes to bound
    recompilation, tracks swap statistics, and runs the optional async staging
    thread that overlaps host->HBM row movement with the train step (the analog of
    ``set_cache_mgr_async_copy``, /root/reference/recsys/dlrm_main.py:121,354).
"""

from __future__ import annotations

import threading
from functools import partial
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Callable, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cachedembedding_tpu._native import hostops
import ml_dtypes

from cachedembedding_tpu.cache.state import (
    CacheState,
    EvictionStrategy,
    Plan,
    gather_slots,
    init_cache_state,
    plan_ids,
    remap_ids,
    scatter_admits,
    scatter_admits_q4,
    scatter_admits_q8,
    slice_plan_indices,
)
from cachedembedding_tpu.cache.host_directory import HostPlan, make_directory
from cachedembedding_tpu.cache.host_table import (
    DenseAccumStore,
    DenseHostTable,
    OverlayAccumStore,
    VirtualHostTable,
)
from cachedembedding_tpu.jagged import RaggedFeatures
from cachedembedding_tpu.ops.embedding_bag import embedding_bag
from cachedembedding_tpu.ops.synth_rows import scatter_synth_admits, synth_rows


@dataclass
class CacheStats:
    """Swap/hit statistics — ``print_comm_stats`` parity
    (/root/reference/benchmark/benchmark_cache.py:74-75,
    /root/reference/recsys/dlrm_main.py:284-294)."""

    num_hits_history: List[int] = field(default_factory=list)
    num_miss_history: List[int] = field(default_factory=list)
    num_write_back_history: List[int] = field(default_factory=list)
    swap_in_bytes: int = 0
    swap_out_bytes: int = 0
    swap_in_time: float = 0.0
    swap_out_time: float = 0.0
    prepare_calls: int = 0
    synth_rows: int = 0  # admits materialized on device (no link bytes)

    def hit_rate(self, window: int = 0) -> float:
        hits = self.num_hits_history[-window:] if window else self.num_hits_history
        miss = self.num_miss_history[-window:] if window else self.num_miss_history
        tot = sum(hits) + sum(miss)
        return sum(hits) / tot if tot else 0.0

    def summary(self) -> str:
        gib = 1024 ** 3
        in_bw = self.swap_in_bytes / self.swap_in_time / gib if self.swap_in_time else 0.0
        out_bw = self.swap_out_bytes / self.swap_out_time / gib if self.swap_out_time else 0.0
        return (
            f"CacheStats: prepare_calls={self.prepare_calls} "
            f"hit_rate={self.hit_rate():.4f} "
            f"swap_in={self.swap_in_bytes / gib:.3f}GiB @ {in_bw:.2f}GiB/s "
            f"swap_out={self.swap_out_bytes / gib:.3f}GiB @ {out_bw:.2f}GiB/s "
            f"synth_rows={self.synth_rows}"
        )


class PreparedWindow(NamedTuple):
    """A dispatched-but-not-staged cache window (device-planner begin_prepare)."""

    slot_ids: "jnp.ndarray"
    plan: Plan
    budget: int


class HostPreparedWindow(NamedTuple):
    """begin_prepare output under the host-directory planner: the plan is
    already known on the host (no readback will ever be needed); slot_ids are
    in flight to the device."""

    slot_ids: "jnp.ndarray"
    hplan: HostPlan


class WindowStaging(NamedTuple):
    """Everything the fused window program needs to make this window's rows
    resident, as host arrays ready to be packed into the SINGLE input
    transfer (trainer packed path): bucketed synth admits (device-generated)
    and fetched admits (host-table rows). Produced by begin_window_staging;
    the matching eviction writebacks are enqueued by enqueue_writebacks."""

    slot_ids: np.ndarray      # (P, L) int32 remapped ids
    synth_slots: np.ndarray   # (sb,) int32, -1 padded; sb == 0 when none
    synth_rows: np.ndarray    # (sb,) int32
    synth_bounds: np.ndarray  # (sb,) float32
    fetch_slots: np.ndarray   # (fb,) int32, -1 padded; fb == 0 when none
    fetch_payload: np.ndarray  # (fb, D) in the transfer dtype (f32/bf16/int8),
    #                            or (fb, D//2) uint8 nibble pairs (int4)
    fetch_scales: np.ndarray  # (fb,) f32 per-row scales (int8/int4) or (0,)
    fetch_accum: np.ndarray   # (fb,) f32 optimizer state (rowwise adagrad) or (0,)
    admit_slots: np.ndarray   # (n_miss,) full plan arrays for the writebacks
    evict_rows: np.ndarray    # (n_miss,)


@partial(jax.jit, donate_argnames=("accum",))
def _scatter_accum(accum: jnp.ndarray, slots: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    """Land per-row optimizer state for admitted slots (-1 padding drops)."""
    C = accum.shape[0]
    return accum.at[jnp.where(slots >= 0, slots, C)].set(
        vals.astype(accum.dtype), mode="drop"
    )


def _bucket(n: int, lo: int = 2048) -> int:
    """Round a transfer size up to a power-of-two bucket: distinct shapes cost a
    (remote) XLA compile each, but padding costs real transfer bytes on a link
    measured at only ~60 MB/s — pow2 caps padding waste at 2x."""
    b = lo
    while b < n:
        b <<= 1
    return b


def _quant_rows_host(rows: np.ndarray):
    """Per-row symmetric int8 quantization of host rows for the wire."""
    rows = np.asarray(rows, np.float32)
    absmax = np.abs(rows).max(axis=1)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(rows / scale[:, None]), -127, 127).astype(np.int8)
    return q, scale


def _quant_rows_host4(rows: np.ndarray):
    """Per-row symmetric 4-bit quantization, nibble-packed in element pairs
    (element 2k in the low nibble), biased by 8 so the stored nibble is in
    [1, 15]. Quarter the admit wire of f32; device dequantizes with the
    per-row f32 scale. Gated by the AUROC-retention tests / scripts/run_ab.py."""
    rows = np.asarray(rows, np.float32)
    absmax = np.abs(rows).max(axis=1)
    scale = np.where(absmax > 0, absmax / 7.0, 1.0).astype(np.float32)
    q = (np.clip(np.round(rows / scale[:, None]), -7, 7) + 8).astype(np.uint8)
    return (q[:, 0::2] | (q[:, 1::2] << 4)).astype(np.uint8), scale


def default_table_init(
    table_sizes: Sequence[int], embedding_dim: int, seed: int
) -> Callable[[np.ndarray], None]:
    """Per-table U(-1/sqrt(n), 1/sqrt(n)) init (torchrec EmbeddingBagConfig
    default, used by the reference models' EBC path), generated by the
    CANONICAL per-(row, col, seed) hash so dense tables, virtual tables and
    the device-side lazy init (ops/synth_rows.py) all agree on every value."""

    def init(host_weight: np.ndarray) -> None:
        off = 0
        for n in table_sizes:
            bound = float(n) ** -0.5
            hostops.fill_rows_canonical(host_weight[off : off + n], off, seed, bound)
            off += n
        assert off == host_weight.shape[0]

    return init


class CachedEmbeddingBag:
    """Frequency-aware software-cached EmbeddingBag (single device).

    Parameters mirror the reference (SURVEY.md §2.2). ``table_sizes`` optionally
    records the logical tables fused into this bag's global id space (the reference
    fuses tables by offsetting ids in the dataloader,
    /root/reference/recsys/datasets/criteo.py:118,170-173).
    """

    def __init__(
        self,
        num_embeddings: int,
        embedding_dim: int,
        *,
        mode: str = "sum",
        include_last_offset: bool = True,
        cache_ratio: float = 0.01,
        cuda_row_num: Optional[int] = None,  # reference's explicit capacity knob
        ids_freq_mapping: Optional[np.ndarray] = None,
        warmup_ratio: float = 0.7,
        buffer_size: int = 50_000,
        pin_weight: bool = True,
        evict_strategy: EvictionStrategy = EvictionStrategy.LFU,
        dtype=jnp.float32,
        table_sizes: Optional[Sequence[int]] = None,
        seed: int = 1024,
        unique_budget: Optional[int] = None,
        initial_weight: Optional[np.ndarray] = None,
        weight_init: str = "uniform",  # "uniform" | "zeros" (lazy pages; for
        # tables about to be loaded from a checkpoint) | "virtual" (procedural
        # VirtualHostTable: host memory = touched working set only)
        host_table=None,  # explicit HostTable instance (overrides weight_init)
        approx_evict: bool = False,
        planner: str = "auto",  # "host" (native C++ directory, zero readbacks)
        # | "device" (jitted plan_ids state machine) | "auto" (host if native
        # lib present). See cache/host_directory.py for the why.
        use_pallas_lookup: bool = False,
        device_init: str = "auto",  # lazy DEVICE-side materialization of
        # never-trained rows (ops/synth_rows.py): "auto" = on when the host
        # table is procedural (uniform/virtual init) and the planner is host;
        # "off" disables. Removes the host->HBM transfer for the (majority)
        # of admits that are cold tail rows still holding their init value.
        optimizer: str = "sgd",  # "sgd" | "rowwise_adagrad" — rowwise adagrad
        # keeps a per-ROW accumulator that TIERS WITH THE CACHE: (capacity,)
        # f32 in HBM, admitted/evicted alongside the rows, master copy in a
        # host accumulator store. Beyond-reference feature (reference is
        # SGD-only); standard for production DLRM embedding training.
        adagrad_initial: float = 0.0,
        transfer_dtype: str = "float32",  # "bfloat16" halves host<->HBM row
        # payloads (cache + host master stay float32; rows are rounded once on
        # admission and once on writeback)
        device: Optional[jax.Device] = None,
        resident_tables: Optional[Sequence[int]] = None,  # MIXED-KERNEL
        # execution: indices into table_sizes of tables kept FULLY HBM-resident
        # in a region appended after the cache slots of the SAME device array
        # (addresses [capacity, capacity+R)). The planner's per-table kernel
        # decisions (parallel/planner.py, torchrec DMP analog
        # /root/reference/baselines/dlrm_main.py:764-792) execute in ONE bag:
        # small hot tables never touch the directory/host link; only the big
        # tables' ids are planned/cached. Requires the host planner.
    ):
        self.num_embeddings = int(num_embeddings)
        self.embedding_dim = int(embedding_dim)
        self.mode = mode
        self.include_last_offset = include_last_offset

        # --- mixed-kernel resident region ---------------------------------
        sizes = list(table_sizes) if table_sizes is not None else [int(num_embeddings)]
        self.resident_tables = sorted(set(int(t) for t in (resident_tables or [])))
        goff = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
        self._goff = goff
        res_set = set(self.resident_tables)
        if res_set and not all(0 <= t < len(sizes) for t in res_set):
            raise ValueError(f"resident_tables out of range: {self.resident_tables}")
        self.resident_total = int(sum(sizes[t] for t in self.resident_tables))
        num_cached_rows = self.num_embeddings - self.resident_total

        capacity = (
            cuda_row_num if cuda_row_num is not None
            else int(cache_ratio * num_cached_rows)
        )
        self.capacity = max(1, min(int(capacity), max(num_cached_rows, 1)))
        self.buffer_size = int(buffer_size)
        self.evict_strategy = evict_strategy
        self.dtype = dtype
        self.table_sizes = sizes
        assert sum(self.table_sizes) == self.num_embeddings

        # Per-table id translation for the resident region: resident feature's
        # fused global id g maps to device address g + delta[t]; cached ids
        # pass through UNCHANGED (directory + host table keep the full fused
        # id space, so canonical init values are identical with/without a
        # resident split).
        if self.resident_tables:
            self._res_delta = np.zeros(len(sizes), np.int64)
            self._is_res_table = np.zeros(len(sizes), bool)
            base = self.capacity
            res_rows = []
            for t in self.resident_tables:
                self._is_res_table[t] = True
                self._res_delta[t] = base - goff[t]
                res_rows.append(np.arange(goff[t], goff[t + 1], dtype=np.int64))
                base += sizes[t]
            self._res_rows = np.concatenate(res_rows)
        else:
            self._res_delta = None
            self._is_res_table = None
            self._res_rows = None
        self.unique_budget = unique_budget  # resolved lazily per ids-length
        self.approx_evict = approx_evict
        self.use_pallas_lookup = use_pallas_lookup
        self.device = device

        # --- host-DRAM master weight ---
        if host_table is not None:
            assert host_table.num_rows == self.num_embeddings
            assert host_table.dim == self.embedding_dim
            self.host_table = host_table
        elif initial_weight is not None:
            assert initial_weight.shape == (self.num_embeddings, self.embedding_dim)
            self.host_table = DenseHostTable(
                np.ascontiguousarray(initial_weight, dtype=np.float32)
            )
        elif weight_init == "virtual":
            self.host_table = VirtualHostTable(
                self.table_sizes, self.embedding_dim, seed=seed,
                capacity_hint=max(4 * self.capacity, 1 << 16),
            )
        else:
            arr = hostops.alloc_table(self.num_embeddings, self.embedding_dim)
            if weight_init == "uniform":
                default_table_init(self.table_sizes, self.embedding_dim, seed)(arr)
                self.host_table = DenseHostTable(
                    arr, procedural_seed=seed, table_sizes=self.table_sizes
                )
            elif weight_init == "zeros":
                self.host_table = DenseHostTable(arr)
            else:
                raise ValueError(f"unknown weight_init {weight_init!r}")

        # --- planner: host directory (default; C++ when built, numpy
        # fallback otherwise) or the jitted device state machine ---
        if planner == "auto":
            planner = "host"
        if planner not in ("host", "device"):
            raise ValueError(f"unknown planner {planner!r}")
        if self.resident_tables and planner != "host":
            raise ValueError("resident_tables (mixed-kernel) requires the host planner")
        self.planner = planner
        self._dir = (
            make_directory(self.num_embeddings, self.capacity, evict_strategy)
            if planner == "host"
            else None
        )

        # --- device cache ---
        # state is only materialized for the device planner (row_to_slot alone
        # is 4 bytes/row of HBM — the host directory keeps it in host DRAM).
        self.state = (
            init_cache_state(self.num_embeddings, self.capacity)
            if planner == "device"
            else None
        )
        self.cache_weight = jnp.zeros(
            (self.capacity + self.resident_total, self.embedding_dim), dtype=dtype
        )

        # --- optimizer state (rowwise adagrad accumulators) ---
        if optimizer not in ("sgd", "rowwise_adagrad"):
            raise ValueError(f"unknown optimizer {optimizer!r}")
        if optimizer == "rowwise_adagrad" and self._dir is None:
            raise ValueError(
                "rowwise_adagrad on a cached bag requires the host planner "
                "(the accumulator tiers with the cache through the staged "
                "admit/evict paths)"
            )
        self.optimizer = optimizer
        if optimizer == "rowwise_adagrad":
            self.cache_accum = jnp.full(
                (self.capacity + self.resident_total,), adagrad_initial, jnp.float32
            )
            self.host_accum = (
                OverlayAccumStore(adagrad_initial)
                if isinstance(self.host_table, VirtualHostTable)
                else DenseAccumStore(self.num_embeddings, adagrad_initial)
            )
            self.adagrad_initial = float(adagrad_initial)
        else:
            self.cache_accum = None
            self.host_accum = None

        self.dataset_freq: Optional[jnp.ndarray] = None
        if ids_freq_mapping is not None:
            freq = np.ascontiguousarray(ids_freq_mapping, dtype=np.int64)
            assert freq.shape[0] == self.num_embeddings
            self._host_freq = freq
            if evict_strategy == EvictionStrategy.DATASET:
                if self._dir is not None:
                    self._dir.set_dataset_freq(freq)
                else:
                    self.dataset_freq = jnp.asarray(
                        np.minimum(freq, 2**31 - 1), dtype=jnp.int32
                    )
        else:
            self._host_freq = None
            if evict_strategy == EvictionStrategy.DATASET:
                raise ValueError("DATASET eviction requires ids_freq_mapping")

        if device_init not in ("auto", "on", "off"):
            raise ValueError(f"unknown device_init {device_init!r}")
        self.device_init = (
            device_init != "off"
            and getattr(self.host_table, "supports_device_init", False)
            and self._dir is not None
        )
        if device_init == "on" and not self.device_init:
            raise ValueError(
                "device_init requires a procedural host table (uniform/virtual "
                "init) and the host planner"
            )
        self._seed_u32 = jnp.uint32(getattr(self.host_table, "seed", 0) or 0)

        # Warmup must never spend cache slots on resident rows (the hottest
        # tables are typically the resident ones).
        if self.resident_tables and self._host_freq is not None:
            wf = self._host_freq.copy()
            for t in self.resident_tables:
                wf[self._goff[t] : self._goff[t + 1]] = 0
            self._warm_freq = wf
        else:
            self._warm_freq = self._host_freq

        self.stats = CacheStats()
        self.cache_op = True
        self._async = False
        self._pending_wb: list = []  # deferred eviction writebacks (not yet submitted)
        if transfer_dtype not in ("float32", "bfloat16", "int8", "int4"):
            raise ValueError(transfer_dtype)
        if transfer_dtype == "int4" and embedding_dim % 2:
            raise ValueError("int4 transfers require an even embedding_dim")
        self.transfer_mode = transfer_dtype
        self._transfer_bf16 = transfer_dtype == "bfloat16"
        # Async writeback drain: the device->host readback of evicted rows runs
        # on a worker thread, overlapping the next window's compute. The host
        # table is guarded by a lock; correctness against re-admission of a
        # still-in-flight row is enforced by _ensure_clean's intersection check.
        self._host_lock = threading.Lock()
        self._wb_exec = ThreadPoolExecutor(max_workers=1)
        self._wb_futures: list = []  # (future, concatenated evicted row ids)
        # Device->host readback hook: identity here; the column-parallel bag
        # replaces it with a jitted replicate (all-gather) so readbacks of
        # dim-sharded values work when the mesh spans multiple PROCESSES
        # (np.asarray of a non-addressable array raises).
        self._rep = lambda x: x

        if self.resident_total:
            self._init_resident_region()
        self.warmup_ratio = float(warmup_ratio)
        if self._host_freq is not None and warmup_ratio > 0:
            self._warmup(warmup_ratio)

    # -- reference-API aliases ------------------------------------------------
    @property
    def cache_weight_mgr(self) -> "CachedEmbeddingBag":
        # The reference exposes the manager as ``embed.cache_weight_mgr``
        # (/root/reference/recsys/dlrm_main.py:259); here bag and manager are one.
        return self

    def set_cache_op(self, cache_op: bool) -> None:
        self.cache_op = cache_op

    def set_cache_mgr_async_copy(self, flag: bool) -> None:
        self._async = bool(flag)

    def element_size(self) -> int:
        return jnp.dtype(self.dtype).itemsize

    @property
    def num_hits_history(self) -> List[int]:
        return self.stats.num_hits_history

    @property
    def num_miss_history(self) -> List[int]:
        return self.stats.num_miss_history

    def print_comm_stats(self) -> None:
        print(self.stats.summary())

    print_comm_stats_ = print_comm_stats

    # -- warmup ---------------------------------------------------------------
    def _warmup(self, warmup_ratio: float) -> None:
        """Preload the hottest ``warmup_ratio * capacity`` rows by dataset frequency
        (reference default 0.7, /root/reference/recsys/dlrm_main.py:133)."""
        freq = self._warm_freq
        k = min(
            int(warmup_ratio * self.capacity),
            self.num_embeddings - self.resident_total,
            # only rows the dataset actually hits: resident rows have their
            # frequency zeroed in _warm_freq and must never spend cache slots
            # (argpartition would otherwise pick them once positive-frequency
            # cached rows run out)
            int((freq > 0).sum()),
        )
        if k <= 0:
            return
        top = np.argpartition(freq, -k)[-k:].astype(np.int64)
        # Seed eviction priority with (capped) dataset frequency so warm rows
        # are not immediately evicted before earning runtime hits.
        warm_freq = np.minimum(freq[top], 2**31 - 1)
        if self._dir is not None:
            self._dir.warmup(top, warm_freq)
        else:
            # state arrays built host-side, then shipped once
            s2r = np.full((self.capacity,), -1, np.int32)
            r2s = np.full((self.num_embeddings,), -1, np.int32)
            s2r[:k] = top
            r2s[top] = np.arange(k, dtype=np.int32)
            sfreq = np.zeros((self.capacity,), np.int32)
            sfreq[:k] = warm_freq
            self.state = CacheState(
                slot_to_row=jnp.asarray(s2r),
                row_to_slot=jnp.asarray(r2s),
                slot_freq=jnp.asarray(sfreq),
            )
        t0 = time.perf_counter()
        slots = np.arange(k, dtype=np.int32)
        if self.device_init:
            written = self.host_table.written_mask(top)
        else:
            written = np.ones((k,), np.bool_)
        n_fresh = int(k - written.sum())
        if n_fresh:
            # never-trained warm rows materialize on device — zero link bytes
            bounds = self.host_table.row_bounds(top[~written]).astype(np.float32)
            self.cache_weight = scatter_synth_admits(
                self.cache_weight,
                jnp.array(slots[~written]),
                jnp.array(top[~written].astype(np.int32)),
                jnp.array(bounds),
                self._seed_u32,
            )
            self.stats.synth_rows += n_fresh
        if n_fresh < k:
            rows = self.host_table.gather(top[written])
            payload = rows.astype(ml_dtypes.bfloat16) if self._transfer_bf16 else rows
            slots_dev = jnp.array(slots[written])
            self.cache_weight = scatter_admits(
                self.cache_weight, slots_dev, jnp.array(payload)
            )
            if self.cache_accum is not None:
                # previously-trained warm rows resume with their persisted
                # optimizer state (checkpoint-restore + warmup path)
                acc = self.host_accum.gather(top[written]).astype(np.float32)
                self.cache_accum = _scatter_accum(
                    self.cache_accum, slots_dev, jnp.array(acc)
                )
            self.stats.swap_in_bytes += rows.nbytes
        self.stats.swap_in_time += time.perf_counter() - t0

    # -- mixed-kernel resident region -----------------------------------------
    @property
    def device_rows(self) -> int:
        """Total rows of the device array: cache slots + resident region."""
        return self.capacity + self.resident_total

    def _init_resident_region(self) -> None:
        """Land the resident tables' rows at [capacity, capacity+R): device
        synthesis for never-trained rows (zero link bytes; values are the SAME
        canonical init as the all-cached mode, since the fused global row id
        drives the generator), host fetch for already-trained rows
        (checkpoint restore)."""
        R = self.resident_total
        rows = self._res_rows
        addrs = np.arange(self.capacity, self.capacity + R, dtype=np.int32)
        if self.device_init:
            written = self.host_table.written_mask(rows)
        else:
            written = np.ones((R,), np.bool_)
        n_fresh = int(R - written.sum())
        if n_fresh:
            # Donated jitted synth+scatter over big padded chunks. The old
            # per-131k-chunk eager ``.at[].set`` re-compiled AND full-copied
            # the (device_rows, D) array once per chunk — ~47 s of the
            # round-3 bench's 322.9 s init regression (cProfile). Padding the
            # tail chunk (slots=-1 -> mode="drop") keeps ONE compile total.
            f_rows = rows[~written].astype(np.int32)
            f_addrs = addrs[~written]
            bounds = self.host_table.row_bounds(f_rows).astype(np.float32)
            chunk = min(n_fresh, 1 << 21)  # bounds the (n, D) f32 transient
            for s in range(0, n_fresh, chunk):
                e = min(s + chunk, n_fresh)
                pad = chunk - (e - s)
                self.cache_weight = scatter_synth_admits(
                    self.cache_weight,
                    jnp.asarray(np.pad(f_addrs[s:e], (0, pad), constant_values=-1)),
                    jnp.asarray(np.pad(f_rows[s:e], (0, pad))),
                    jnp.asarray(np.pad(bounds[s:e], (0, pad))),
                    self._seed_u32,
                )
        if n_fresh < R:
            w_rows = rows[written]
            w_addrs = addrs[written]
            n_w = int(w_rows.shape[0])
            chunk = min(n_w, 1 << 17)  # bounds the host-staged payload put
            for s in range(0, n_w, chunk):
                e = min(s + chunk, n_w)
                pad = chunk - (e - s)
                vals = self.host_table.gather(w_rows[s:e])
                payload = (
                    vals.astype(ml_dtypes.bfloat16) if self._transfer_bf16 else vals
                )
                if pad:
                    payload = np.pad(payload, ((0, pad), (0, 0)))
                slots_dev = jnp.asarray(
                    np.pad(w_addrs[s:e], (0, pad), constant_values=-1)
                )
                self.cache_weight = scatter_admits(
                    self.cache_weight, slots_dev, jnp.asarray(payload)
                )
                if self.cache_accum is not None:
                    acc = self.host_accum.gather(w_rows[s:e]).astype(np.float32)
                    if pad:
                        acc = np.pad(acc, (0, pad))
                    self.cache_accum = _scatter_accum(
                        self.cache_accum, slots_dev, jnp.asarray(acc)
                    )
            self.stats.swap_in_bytes += n_w * self.embedding_dim * 4

    def _translate_ids(self, ids_np: np.ndarray):
        """Split a fused-global-id stream: resident ids become final device
        addresses immediately; cached ids pass through to the directory.
        Returns (out_template int32 with resident addresses placed,
        cached_positions bool mask, cached_ids)."""
        if ids_np.size:
            lo = int(ids_np.min())
            hi = int(ids_np.max())
            if lo < 0 or hi >= self.num_embeddings:
                # Without this check a negative id would searchsorted into
                # table 0 and, when table 0 is resident, silently address a
                # cache slot — corrupting cache rows (the cached sub-stream is
                # already validated by PyDirectory.plan).
                raise ValueError(
                    f"embedding ids out of range [0, {self.num_embeddings}): "
                    f"min={lo} max={hi}"
                )
        t = np.searchsorted(self._goff[1:], ids_np, side="right")
        is_res = self._is_res_table[t]
        out = np.empty(ids_np.shape, np.int32)
        out[is_res] = (ids_np[is_res] + self._res_delta[t[is_res]]).astype(np.int32)
        return out, ~is_res, np.ascontiguousarray(ids_np[~is_res], np.int32)

    def _plan_window_uniform(self, ids_np: np.ndarray, P: int, Bp: int):
        """Layout-aware _plan_window for uniform packed windows: ids arrive as
        P stacked (F, Bp) blocks, so each element's TABLE is known from its
        position — no per-id searchsorted, no boolean-mask passes (those cost
        ~80 ms/window = half the host budget at the headline config;
        benchmark/microbench_hostplan.py). Same validation and identical
        output as _translate_ids + _dir.plan on the flat stream."""
        F = len(self.table_sizes)
        v = ids_np.reshape(P, F, Bp)
        if ids_np.size:
            lo, hi = int(ids_np.min()), int(ids_np.max())
            if lo < 0 or hi >= self.num_embeddings:
                raise ValueError(
                    f"embedding ids out of range [0, {self.num_embeddings}): "
                    f"min={lo} max={hi}"
                )
        res_t = np.nonzero(self._is_res_table[:F])[0]
        cac_t = np.nonzero(~self._is_res_table[:F])[0]
        out = np.empty((P, F, Bp), np.int32)
        if res_t.size:
            # one vectorized add per window: (P, n_res, Bp) + per-table delta
            out[:, res_t, :] = v[:, res_t, :] + self._res_delta[res_t].astype(
                np.int32
            )[None, :, None]
        # cached sub-stream in FLAT order ((p, t, b) lexicographic == flat):
        cids = np.ascontiguousarray(v[:, cac_t, :].reshape(-1))
        hp = self._dir.plan(cids)
        out[:, cac_t, :] = hp.slot_ids.reshape(P, cac_t.size, Bp)
        return hp, out.reshape(-1)

    def _flush_resident(self) -> None:
        """Write the resident region back to the host table (checkpoint/eval
        snapshot coherence — resident rows otherwise live only in HBM)."""
        if not self.resident_total:
            return
        R = self.resident_total
        chunk = self.buffer_size if self.buffer_size > 0 else (1 << 17)
        for s in range(0, R, chunk):
            e = min(s + chunk, R)
            vals = np.asarray(self._rep(
                self.cache_weight[self.capacity + s : self.capacity + e]
            )).astype(np.float32)
            self.host_table.scatter(self._res_rows[s:e], vals)
            if self.cache_accum is not None:
                acc = np.asarray(self._rep(
                    self.cache_accum[self.capacity + s : self.capacity + e]
                ))
                self.host_accum.scatter(self._res_rows[s:e], acc)
        self.stats.swap_out_bytes += R * self.embedding_dim * 4

    def onehot_backward_plan(self, max_rows: int = 2048) -> tuple:
        """Static (feature, device_base, rows) triples for resident tables
        small enough that their embedding backward is cheaper as a one-hot
        MXU matmul than as part of the unsorted scatter-add. XLA's TPU
        scatter costs ~16 ns PER INDEX regardless of table size
        (benchmark/microbench_scatter2.py: per-element rate constant from
        cap=64 to 337k), so each batch's worth of ids into a tiny table
        wastes ~0.26 ms/step; a (rows, B) x (B, D) one-hot matmul computes
        the same f32-accumulated sum in microseconds once rows is small
        enough that building/reading the (B, rows) one-hot stays under the
        scatter cost (break-even ~2k rows at B=16384, D=128, bf16)."""
        if not self.resident_tables:
            return ()
        out = []
        for t in self.resident_tables:
            r = int(self.table_sizes[t])
            if r <= max_rows:
                base = int(self._goff[t] + self._res_delta[t])
                out.append((int(t), base, r))
        return tuple(out)

    def pf_pack_spec(self, n_per_feature: int):
        """Per-feature (pack_width_bits, device_delta) for the mixed-kernel id
        wire format: each feature's window block is bit-packed at ITS OWN
        width — resident features ship their narrow raw local ids (a static
        address delta is added on device for free), cached features ship slot
        ids at the cache-capacity width. On Criteo-Kaggle this cuts the id
        block from 20 bits/id uniform to ~14 bits/id average (~34% of window
        wire). None when the bag has no resident split."""
        if not self.resident_tables:
            return None
        spec = []
        for t, size in enumerate(self.table_sizes):
            if self._is_res_table[t]:
                delta = int(self._goff[t] + self._res_delta[t])
                w = hostops.nibble_width(size, n_per_feature)
            else:
                delta = 0
                w = hostops.nibble_width(self.capacity, n_per_feature)
            spec.append((w, delta))
        return tuple(spec)

    def _plan_window(self, ids_np: np.ndarray):
        """Directory plan with mixed-kernel translation. Returns
        (hp, slot_ids_full): the HostPlan over the CACHED sub-stream and the
        full-stream device addresses (resident ids already resolved)."""
        if not self.resident_tables:
            hp = self._dir.plan(ids_np)
            return hp, hp.slot_ids
        out, cmask, cids = self._translate_ids(ids_np)
        hp = self._dir.plan(cids)
        out[cmask] = hp.slot_ids
        return hp, out

    # -- the core: prepare_ids ------------------------------------------------
    def prepare_ids(self, ids) -> jnp.ndarray:
        """Make every id resident and return ids remapped to cache-slot space
        (/root/reference/recsys/dlrm_main.py:259). Accepts numpy or jnp int ids."""
        pw = self.begin_prepare(ids)
        self.finish_prepare(pw)
        return pw.slot_ids

    def begin_prepare(self, ids, out_shape=None, device_put=True):
        """Compute the cache plan + id remap for a window WITHOUT doing any row
        movement. The pipelined trainer calls this while the device is busy with
        the previous window's train steps, so plan time overlaps compute (the
        TPU re-design of --use_overlap + async cache copy,
        /root/reference/recsys/dlrm_main.py:121,354).

        Host planner: the plan is computed synchronously in native C++ (tens of
        ms for millions of ids) and the remapped slot ids start their async
        host->device transfer immediately. Device planner: the jitted plan_ids
        state machine is dispatched; the small plan arrays are read back in
        finish_prepare."""
        if self._dir is not None:
            ids_np = np.ascontiguousarray(np.asarray(ids), dtype=np.int32)
            hplan, slot_full = self._plan_window(ids_np)
            host_slot_ids = slot_full.reshape(out_shape) if out_shape else slot_full
            # device_put=False lets the caller pack slot ids into a single
            # combined input transfer (each separate device_put costs a link
            # round-trip on tunneled PJRT backends).
            slot_ids = (
                jax.device_put(host_slot_ids, self.device)
                if device_put
                else host_slot_ids
            )
            return HostPreparedWindow(slot_ids=slot_ids, hplan=hplan)
        # Range-validate BEFORE the jitted planner: an out-of-range id would be
        # silently dropped by the planning scatter and then aliased to a wrong
        # row by remap_ids' clamping gather — mirror the host planners'
        # ValueError (PyDirectory.plan / native dir_plan / _translate_ids).
        ids_host = np.asarray(ids)
        if ids_host.size:
            lo, hi = int(ids_host.min()), int(ids_host.max())
            if lo < 0 or hi >= self.num_embeddings:
                raise ValueError(
                    f"id out of range: {lo if lo < 0 else hi} not in "
                    f"[0, {self.num_embeddings}) — check table-size/hash "
                    "configuration"
                )
        ids_dev = jnp.asarray(ids, dtype=jnp.int32)
        L = int(ids_dev.shape[0])
        budget = self.unique_budget or L
        new_state, plan = plan_ids(
            self.state,
            ids_dev,
            self.dataset_freq,
            unique_budget=budget,
            strategy=self.evict_strategy,
            approx_evict=self.approx_evict,
        )
        self.state = new_state
        slot_ids = remap_ids(self.state, ids_dev)
        if out_shape is not None:
            slot_ids = slot_ids.reshape(out_shape)
        return PreparedWindow(slot_ids=slot_ids, plan=plan, budget=budget)

    def finish_prepare(self, pw) -> None:
        """Execute the row movement for a prepared window. Device-order contract
        (enqueue order): [prev window's train steps] -> writeback gather ->
        scatter admits -> [this window's train steps]. Host work here overlaps
        the previous window's compute; evicted-row values are read back lazily on
        the NEXT finish_prepare/flush (deferred writeback), by which point the
        device has long finished them."""
        if isinstance(pw, HostPreparedWindow):
            return self._finish_prepare_host(pw.hplan)
        plan, budget = pw.plan, pw.budget
        # ONE scalar readback for all counts/flags (round-trips are ~0.1s on the
        # tunneled link — the packed Plan exists to keep this to 2 transfers).
        scal = np.asarray(plan.scalars)
        n_miss, n_unique, cap_ok = int(scal[0]), int(scal[1]), bool(scal[2])
        U = min(budget, self.capacity)
        if n_unique > U:
            raise RuntimeError(
                f"prepare_ids overflow: {n_unique} unique ids > unique budget {U} "
                f"(capacity {self.capacity}). Reduce prefetch_num/batch or raise "
                f"cache_ratio/unique_budget."
            )
        if not cap_ok:
            raise RuntimeError(
                f"cache capacity exhausted: working set of this prepare_ids call "
                f"needs more than {self.capacity} slots."
            )
        self.stats.prepare_calls += 1
        self.stats.num_hits_history.append(int(scal[3]))
        self.stats.num_miss_history.append(n_miss)

        if n_miss == 0:
            self.stats.num_write_back_history.append(0)
            self._ensure_clean(None, block=False)
            return

        # ONE bucketed readback of the packed index block. The device-side slice
        # is also kept: its row 1 (admit slots) feeds the gather/scatter ops
        # directly, so the slots never round-trip back to the device.
        nb = min(_bucket(n_miss), plan.indices.shape[1])
        idx_dev = slice_plan_indices(plan.indices, nb)  # (3, nb) on device
        idx_block = np.asarray(idx_dev)
        admit_rows = idx_block[0, :n_miss]
        evict_rows = idx_block[2, :n_miss]

        # Evicted rows from earlier windows must reach the host table before we
        # gather any admit row that intersects them (a row evicted in window k
        # can be re-admitted in window k+1 and must come back with its trained
        # value). Disjoint in-flight writebacks keep draining in the background.
        self._ensure_clean(admit_rows, block=False)

        chunk = self.buffer_size if self.buffer_size > 0 else n_miss
        n_wb = 0
        for s in range(0, n_miss, chunk):
            e = min(s + chunk, n_miss)
            b = min(_bucket(e - s), nb)
            rows_c, slots_c, vals = self._stage_bufs(b)
            if s == 0 and e == n_miss and b == nb:
                slots_dev = idx_dev[1]  # fast path: slots already on device
            else:
                slots_c[: e - s] = idx_block[1, s:e]
                slots_dev = jnp.array(slots_c)
            # ---- enqueue writeback read of evicted rows (HBM->host, deferred) ----
            ev_rows_c = evict_rows[s:e]
            wb_mask = ev_rows_c >= 0
            if wb_mask.any():
                vals_dev = gather_slots(
                    self.cache_weight, slots_dev,
                    out_dtype="bfloat16" if self._transfer_bf16 else None,
                )
                self._pending_wb.append(
                    (ev_rows_c[wb_mask], wb_mask, e - s, vals_dev, None)
                )
                n_wb += int(wb_mask.sum())
            # ---- admit missing rows (host -> HBM) ----
            t0 = time.perf_counter()
            rows_c.fill(0)
            rows_c[: e - s] = admit_rows[s:e]
            with self._host_lock:
                self.host_table.gather(rows_c, vals)
            payload = (
                vals.astype(ml_dtypes.bfloat16) if self._transfer_bf16 else vals
            )
            self.cache_weight = scatter_admits(
                self.cache_weight, slots_dev, jnp.array(payload)
            )
            self.stats.swap_in_bytes += (e - s) * self.embedding_dim * 4
            self.stats.swap_in_time += time.perf_counter() - t0
        self.stats.num_write_back_history.append(n_wb)
        self._submit_writebacks()

    # -- staged window API (fused-program admits; trainer packed path) --------
    def begin_window_staging(self, ids, out_shape, uniform_fbp=None) -> WindowStaging:
        """Plan a window and prepare its admits as PACKABLE host arrays: the
        trainer folds them into the window program's single input transfer and
        the program itself lands the rows (synth + fetched scatters) before
        its train steps — steady state is ONE device_put + ONE execute per
        window. Caller must also call enqueue_writebacks(ws) after dispatching
        the PREVIOUS window (and before dispatching this one)."""
        assert self._dir is not None, "staged windows require the host planner"
        ids_np = np.ascontiguousarray(np.asarray(ids), dtype=np.int32)
        if uniform_fbp is not None and self.resident_tables:
            # caller guarantees P stacked (F, Bp) feature-major blocks —
            # positional table mapping, no per-id searchsorted
            Pw, Fw, Bp = uniform_fbp
            assert Fw == len(self.table_sizes) and Pw * Fw * Bp == ids_np.size
            hp, slot_full = self._plan_window_uniform(ids_np, Pw, Bp)
        else:
            hp, slot_full = self._plan_window(ids_np)
        self.stats.prepare_calls += 1
        self.stats.num_hits_history.append(hp.n_hit_unique)
        n_miss = int(hp.admit_rows.shape[0])
        self.stats.num_miss_history.append(n_miss)
        empty_i = np.zeros((0,), np.int32)
        empty_f = np.zeros((0,), np.float32)
        pay_dt = {
            "float32": np.float32, "bfloat16": ml_dtypes.bfloat16,
            "int8": np.int8, "int4": np.uint8,
        }[self.transfer_mode]
        pay_cols = (
            self.embedding_dim // 2
            if self.transfer_mode == "int4"
            else self.embedding_dim
        )
        if n_miss == 0:
            return WindowStaging(
                slot_ids=slot_full.reshape(out_shape),
                synth_slots=empty_i, synth_rows=empty_i, synth_bounds=empty_f,
                fetch_slots=empty_i,
                fetch_payload=np.zeros((0, pay_cols), pay_dt),
                fetch_scales=empty_f,
                fetch_accum=empty_f,
                admit_slots=hp.admit_slots, evict_rows=hp.evict_rows,
            )
        # ALL in-flight writebacks must LAND before the written-mask check:
        # correctness-wise a trained row's writeback must reach the host table
        # before it can be re-admitted (else its INIT value re-synthesizes,
        # losing training), and determinism-wise the synth/fetch split decides
        # the window's bucket sizes — i.e. the jit signature set. Draining
        # fully here makes signatures a pure function of the id stream
        # (bounded compile set) instead of a function of worker-thread timing.
        # Cost ~0 in steady state: these readbacks were enqueued BEFORE the
        # previous window's program, so they are long done by now.
        self._ensure_clean(None, block=True)
        if self.device_init:
            with self._host_lock:
                written = self.host_table.written_mask(hp.admit_rows)
        else:
            written = np.ones((n_miss,), np.bool_)
        n_fresh = int(n_miss - written.sum())
        if n_fresh:
            sb = _bucket(n_fresh, lo=1024)
            synth_slots = np.full((sb,), -1, np.int32)
            synth_rows = np.zeros((sb,), np.int32)
            synth_bounds = np.zeros((sb,), np.float32)
            f_rows = hp.admit_rows[~written]
            synth_slots[:n_fresh] = hp.admit_slots[~written]
            synth_rows[:n_fresh] = f_rows
            synth_bounds[:n_fresh] = self.host_table.row_bounds(f_rows)
            self.stats.synth_rows += n_fresh
        else:
            synth_slots, synth_rows, synth_bounds = empty_i, empty_i, empty_f
        n_fetch = n_miss - n_fresh
        if n_fetch:
            w_rows = hp.admit_rows[written]
            # no _ensure_clean needed: the full drain above already landed
            # every in-flight writeback and nothing was submitted since
            fb = _bucket(n_fetch, lo=1024)
            fetch_slots = np.full((fb,), -1, np.int32)
            fetch_slots[:n_fetch] = hp.admit_slots[written]
            rows_c = np.zeros((fb,), np.int64)
            rows_c[:n_fetch] = w_rows
            t0 = time.perf_counter()
            with self._host_lock:
                vals = self.host_table.gather(rows_c)
                fetch_accum = (
                    self.host_accum.gather(rows_c).astype(np.float32)
                    if self.host_accum is not None
                    else empty_f
                )
            if self.transfer_mode == "int8":
                fetch_payload, fetch_scales = _quant_rows_host(vals)
            elif self.transfer_mode == "int4":
                fetch_payload, fetch_scales = _quant_rows_host4(vals)
            else:
                fetch_payload = vals.astype(pay_dt) if vals.dtype != pay_dt else vals
                fetch_scales = empty_f
            self.stats.swap_in_bytes += n_fetch * self.embedding_dim * 4
            self.stats.swap_in_time += time.perf_counter() - t0
        else:
            fetch_slots = empty_i
            fetch_payload = np.zeros((0, pay_cols), pay_dt)
            fetch_scales = empty_f
            fetch_accum = empty_f
        return WindowStaging(
            slot_ids=slot_full.reshape(out_shape),
            synth_slots=synth_slots, synth_rows=synth_rows,
            synth_bounds=synth_bounds, fetch_slots=fetch_slots,
            fetch_payload=fetch_payload, fetch_scales=fetch_scales,
            fetch_accum=fetch_accum,
            admit_slots=hp.admit_slots, evict_rows=hp.evict_rows,
        )

    def enqueue_writebacks(self, ws: WindowStaging) -> None:
        """Enqueue the device gathers of this window's evicted occupants.
        MUST run after the previous window's execute is dispatched (so the
        values read are its outputs) and before this window's execute (which
        overwrites the slots)."""
        n_miss = int(ws.admit_slots.shape[0])
        if n_miss == 0:
            self.stats.num_write_back_history.append(0)
            self._ensure_clean(None, block=False)
            return
        # Fixed-size chunks bound the pow2 bucket padding: eviction readbacks
        # ride the (serialized) link, so padded rows are pure wasted wall time.
        chunk = self.buffer_size if self.buffer_size > 0 else 16384
        n_wb = 0
        for s in range(0, n_miss, chunk):
            e = min(s + chunk, n_miss)
            ev_rows_c = ws.evict_rows[s:e]
            wb_mask = ev_rows_c >= 0
            if wb_mask.any():
                slots_c = np.full((_bucket(e - s),), -1, np.int32)
                slots_c[: e - s] = ws.admit_slots[s:e]
                slots_dev = jnp.array(slots_c)
                # Writebacks land in the f32 host master at >= bf16 even in
                # int8 transfer mode: evict/re-admit churn would otherwise apply
                # a fresh per-row quantization each cycle, growing master error
                # with churn count. Admits (the wire-dominant direction) still
                # ship int8.
                vals_dev = self._rep(gather_slots(
                    self.cache_weight, slots_dev,
                    out_dtype=None if self.transfer_mode == "float32" else "bfloat16",
                ))
                accum_dev = (
                    self._rep(gather_slots(self.cache_accum[:, None], slots_dev))
                    if self.cache_accum is not None
                    else None
                )
                self._pending_wb.append(
                    (ev_rows_c[wb_mask], wb_mask, e - s, vals_dev, accum_dev)
                )
                n_wb += int(wb_mask.sum())
        self.stats.num_write_back_history.append(n_wb)
        self._submit_writebacks()

    def _finish_prepare_host(self, hp: HostPlan) -> None:
        """Row movement under the host-directory planner: everything is already
        known on the host — no device readback happens here, ever. Enqueue
        order on the device: [writeback gathers of evicted slots] -> [synth
        scatter of never-trained admits] -> [scatters of fetched admits], all
        landing between the previous and next windows' train steps."""
        self.stats.prepare_calls += 1
        self.stats.num_hits_history.append(hp.n_hit_unique)
        n_miss = int(hp.admit_rows.shape[0])
        self.stats.num_miss_history.append(n_miss)
        if n_miss == 0:
            self.stats.num_write_back_history.append(0)
            self._ensure_clean(None, block=False)
            return
        self._ensure_clean(hp.admit_rows, block=False)
        chunk = self.buffer_size if self.buffer_size > 0 else n_miss
        # ---- 1) enqueue writeback reads of evicted occupants (deferred) ------
        n_wb = 0
        for s in range(0, n_miss, chunk):
            e = min(s + chunk, n_miss)
            ev_rows_c = hp.evict_rows[s:e]
            wb_mask = ev_rows_c >= 0
            if wb_mask.any():
                slots_c = np.full((_bucket(e - s),), -1, np.int32)
                slots_c[: e - s] = hp.admit_slots[s:e]
                slots_dev_wb = jnp.array(slots_c)
                # bf16 (not int8) writebacks — see note in the device-planner
                # writeback path above.
                vals_dev = self._rep(gather_slots(
                    self.cache_weight, slots_dev_wb,
                    out_dtype=None if self.transfer_mode == "float32" else "bfloat16",
                ))
                accum_dev = (
                    self._rep(gather_slots(self.cache_accum[:, None], slots_dev_wb))
                    if self.cache_accum is not None
                    else None
                )
                self._pending_wb.append(
                    (ev_rows_c[wb_mask], wb_mask, e - s, vals_dev, accum_dev)
                )
                n_wb += int(wb_mask.sum())
        self.stats.num_write_back_history.append(n_wb)
        # ---- 2) split admits: never-trained rows synthesize ON DEVICE --------
        if self.device_init:
            with self._host_lock:
                written = self.host_table.written_mask(hp.admit_rows)
        else:
            written = np.ones((n_miss,), np.bool_)
        n_fresh = int(n_miss - written.sum())
        if n_fresh:
            f_rows = hp.admit_rows[~written]
            f_slots = hp.admit_slots[~written]
            f_bounds = self.host_table.row_bounds(f_rows).astype(np.float32)
            b = _bucket(n_fresh, lo=1024)
            rows_c = np.zeros((b,), np.int32)
            slots_c = np.full((b,), -1, np.int32)
            bounds_c = np.zeros((b,), np.float32)
            rows_c[:n_fresh] = f_rows
            slots_c[:n_fresh] = f_slots
            bounds_c[:n_fresh] = f_bounds
            slots_dev = jnp.array(slots_c)
            self.cache_weight = scatter_synth_admits(
                self.cache_weight, slots_dev, jnp.array(rows_c),
                jnp.array(bounds_c), self._seed_u32,
            )
            if self.cache_accum is not None:
                self.cache_accum = _scatter_accum(
                    self.cache_accum, slots_dev,
                    jnp.full((b,), self.adagrad_initial, jnp.float32),
                )
            self.stats.synth_rows += n_fresh
        # ---- 3) fetch previously-trained rows from the host table ------------
        if n_fresh < n_miss:
            w_rows = hp.admit_rows[written]
            w_slots = hp.admit_slots[written]
            n_fetch = int(w_rows.shape[0])
            for s in range(0, n_fetch, chunk):
                e = min(s + chunk, n_fetch)
                b = _bucket(e - s)
                rows_c, slots_c, vals = self._stage_bufs(b)
                slots_c[: e - s] = w_slots[s:e]
                t0 = time.perf_counter()
                rows_c[: e - s] = w_rows[s:e]
                with self._host_lock:
                    self.host_table.gather(rows_c, vals)
                slots_dev = jnp.array(slots_c)
                if self.transfer_mode == "int8":
                    q, scales = _quant_rows_host(vals)
                    self.cache_weight = scatter_admits_q8(
                        self.cache_weight, slots_dev, jnp.array(q), jnp.array(scales)
                    )
                elif self.transfer_mode == "int4":
                    q, scales = _quant_rows_host4(vals)
                    self.cache_weight = scatter_admits_q4(
                        self.cache_weight, slots_dev, jnp.array(q), jnp.array(scales)
                    )
                else:
                    payload = (
                        vals.astype(ml_dtypes.bfloat16) if self._transfer_bf16 else vals
                    )
                    self.cache_weight = scatter_admits(
                        self.cache_weight, slots_dev, jnp.array(payload)
                    )
                if self.cache_accum is not None:
                    acc_c = np.zeros((b,), np.float32)
                    with self._host_lock:
                        acc_c[: e - s] = self.host_accum.gather(rows_c[: e - s])
                    self.cache_accum = _scatter_accum(
                        self.cache_accum, slots_dev, jnp.array(acc_c)
                    )
                self.stats.swap_in_bytes += (e - s) * self.embedding_dim * 4
                self.stats.swap_in_time += time.perf_counter() - t0
        self._submit_writebacks()

    def _submit_writebacks(self) -> None:
        """Hand the pending writeback readbacks to the worker thread."""
        items, self._pending_wb = self._pending_wb, []
        if not items:
            return
        rows = np.concatenate([item[0] for item in items])
        fut = self._wb_exec.submit(self._do_drain, items)
        self._wb_futures.append((fut, rows))

    def _do_drain(self, items) -> None:
        t0 = time.perf_counter()
        for ev_rows, wb_mask, n, vals_dev, accum_dev in items:
            # writebacks are always bf16/f32 (never int8/int4 — see the
            # churn-compounding note at the gather sites)
            vals = np.asarray(vals_dev)  # blocks until the enqueued gather ran
            if vals.dtype != np.float32:
                vals = vals.astype(np.float32)
            with self._host_lock:
                self.host_table.scatter(ev_rows, vals[:n][wb_mask])
                if accum_dev is not None:
                    acc = np.asarray(accum_dev).reshape(-1)
                    self.host_accum.scatter(ev_rows, acc[:n][wb_mask])
            self.stats.swap_out_bytes += ev_rows.shape[0] * self.embedding_dim * 4
        self.stats.swap_out_time += time.perf_counter() - t0

    def _ensure_clean(self, admit_rows: Optional[np.ndarray], block: bool) -> None:
        """Wait for in-flight writebacks that intersect ``admit_rows`` (or all of
        them when block=True / admit_rows is None and block requested)."""
        still = []
        for fut, rows in self._wb_futures:
            if fut.done():
                fut.result()
            elif block or (admit_rows is not None and np.isin(admit_rows, rows).any()):
                fut.result()
            else:
                still.append((fut, rows))
        self._wb_futures = still

    def _stage_bufs(self, b: int):
        """FRESH per-chunk staging buffers. These must NOT be reused across
        dispatches: ``jnp.array``/``device_put`` of a numpy buffer may defer or
        zero-copy the host->device transfer (observed on the CPU backend), so a
        reused buffer refilled for window k+1 can be read torn by window k's
        still-pending scatter. Allocation cost is kept off the page-fault path
        by hostops.tune_malloc (heap arena reuse instead of fresh mmaps)."""
        idx = np.zeros((b,), np.int64)
        slots = np.full((b,), -1, np.int32)
        vals = np.zeros((b, self.embedding_dim), np.float32)
        return idx, slots, vals

    def _drain_writebacks(self) -> None:
        """Synchronous full drain: all in-flight + pending writebacks land."""
        self._ensure_clean(None, block=True)
        items, self._pending_wb = self._pending_wb, []
        if items:
            self._do_drain(items)

    # -- lookup / forward -----------------------------------------------------
    def lookup(self, features: RaggedFeatures) -> jnp.ndarray:
        """Pooled lookup of cache-slot-space features: (B, F, D)."""
        return embedding_bag(
            self.cache_weight, features, mode=self.mode, use_pallas=self.use_pallas_lookup
        )

    def forward(
        self,
        values,
        offsets=None,
        per_sample_weights=None,
        shape_hook: Optional[Callable] = None,
        *,
        num_features: int = 1,
        batch_size: Optional[int] = None,
    ) -> jnp.ndarray:
        """Stateful EmbeddingBag-style forward (the benchmark/bare-module path,
        /root/reference/benchmark/benchmark_cache.py:58-72). ``values``/``offsets``
        follow include_last_offset semantics. When ``self.cache_op`` the ids are
        global and cache maintenance runs inline; otherwise they are already
        cache-slot ids from a prior prepare_ids."""
        values = jnp.asarray(values, dtype=jnp.int32)
        if self.cache_op:
            values = self.prepare_ids(values)
        if offsets is not None and not self.include_last_offset:
            # torch EmbeddingBag(include_last_offset=False): offsets carry only
            # bag starts; append the trailing boundary the kernel expects
            offsets = jnp.concatenate(
                [
                    jnp.asarray(offsets, jnp.int32),
                    jnp.asarray([values.shape[0]], jnp.int32),
                ]
            )
        if batch_size is None:
            nb = (offsets.shape[0] - 1) if offsets is not None else values.shape[0]
            batch_size = nb // num_features
        feats = RaggedFeatures(
            values=values,
            offsets=None if offsets is None else jnp.asarray(offsets, jnp.int32),
            num_features=num_features,
            batch_size=batch_size,
            pooling=1 if offsets is None else None,
        )
        out = embedding_bag(
            self.cache_weight, feats, mode=self.mode,
            use_pallas=self.use_pallas_lookup,
            per_sample_weights=(
                None if per_sample_weights is None
                else jnp.asarray(per_sample_weights, jnp.float32)
            ),
        )
        if shape_hook is not None:
            out = shape_hook(out)
        return out

    __call__ = forward

    # -- checkpoint/flush -----------------------------------------------------
    def flush(self) -> None:
        """Write every resident (dirty) cached row back to the host table — needed
        before checkpoint/eval snapshots (SURVEY.md §5 notes the reference implies
        this capability)."""
        self._drain_writebacks()
        self._flush_resident()
        if self._dir is not None:
            resident_slots, resident_rows = self._dir.resident()
        else:
            s2r = np.asarray(self.state.slot_to_row)
            resident_slots = np.nonzero(s2r >= 0)[0]
            resident_rows = s2r[resident_slots].astype(np.int64)
        if resident_slots.size == 0:
            return
        n = resident_slots.size
        chunk = self.buffer_size if self.buffer_size > 0 else n
        t0 = time.perf_counter()
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            b = _bucket(e - s)
            slots_c = np.full((b,), -1, np.int32)
            slots_c[: e - s] = resident_slots[s:e]
            slots_dev = jnp.asarray(slots_c)
            vals = np.asarray(self._rep(gather_slots(self.cache_weight, slots_dev)))
            self.host_table.scatter(resident_rows[s:e], vals[: e - s])
            if self.cache_accum is not None:
                acc = np.asarray(self._rep(
                    gather_slots(self.cache_accum[:, None], slots_dev)
                )).reshape(-1)
                self.host_accum.scatter(resident_rows[s:e], acc[: e - s])
        self.stats.swap_out_bytes += n * self.embedding_dim * 4
        self.stats.swap_out_time += time.perf_counter() - t0

    def reset_cache(self) -> None:
        """Drop all cache contents/metadata and re-warm from the id-frequency
        map (cache contents are derived state — used after checkpoint load)."""
        self._drain_writebacks()
        if self._dir is not None:
            self._dir = make_directory(
                self.num_embeddings, self.capacity, self.evict_strategy
            )
            if self._host_freq is not None and self.evict_strategy == EvictionStrategy.DATASET:
                self._dir.set_dataset_freq(self._host_freq)
        else:
            self.state = init_cache_state(self.num_embeddings, self.capacity)
        self.cache_weight = jnp.zeros_like(self.cache_weight)
        if self.cache_accum is not None:
            self.cache_accum = jnp.full_like(self.cache_accum, self.adagrad_initial)
        if self.resident_total:
            # already-trained resident rows come back from the host table
            # (checkpoint restore); fresh ones re-synthesize on device
            self._init_resident_region()
        if self._host_freq is not None and self.warmup_ratio > 0:
            self._warmup(self.warmup_ratio)

    @property
    def host_weight(self) -> np.ndarray:
        """The materialized host array (DenseHostTable only)."""
        if not isinstance(self.host_table, DenseHostTable):
            raise AttributeError("host_weight is only available for dense host tables")
        return self.host_table.array

    def dense_weight(self) -> np.ndarray:
        """Full logically-consistent weight (flushes first). For tests/checkpoints."""
        self.flush()
        return self.host_weight

    # -- functional-param plumbing -------------------------------------------
    def get_param(self) -> jnp.ndarray:
        return self.cache_weight

    def set_param(self, cache_weight: jnp.ndarray) -> None:
        """Rebind the trainable cache weight after an optimizer step."""
        self.cache_weight = cache_weight

    def set_accum(self, cache_accum: jnp.ndarray) -> None:
        self.cache_accum = cache_accum
