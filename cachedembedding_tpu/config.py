"""Structured configuration for the framework.

The reference drives everything through argparse flags extended from ColossalAI's
default parser (/root/reference/recsys/dlrm_main.py:23-174) plus env-var matrices in
bash (/root/reference/scripts/kaggle.sh:8-16,64-83). Here the single source of truth
is a pair of dataclasses; the CLI (cachedembedding_tpu/train/dlrm_main.py) maps
flags onto them 1:1 so every reference flag has a home.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass
class CacheConfig:
    """Software-cache knobs (reference contract: SURVEY.md §2.2;
    /root/reference/recsys/dlrm_main.py:124-135)."""

    cache_ratio: float = 0.01          # --cache_ratio
    warmup_ratio: float = 0.7          # --warmup_ratio
    buffer_size: int = 50_000          # --buffer_size; 0 disables the bounded staging buffer
    use_lfu_eviction: bool = False     # --use_lfu: LFU vs DATASET eviction
    use_freq: bool = True              # --use_freq: seed cache with dataset id frequency
    prefetch_num: int = 8              # --prefetch_num: far-sighted prefetch
    # depth. Default 8 = the measured-best fused-window configuration (the
    # benchmarked one; docs/AB_REPORT.md prefetch sweep) so the quick-start
    # runs the fast path unchanged. 1 gives the reference's unpipelined
    # per-batch semantics (/root/reference/recsys/dlrm_main.py:128 default 1).
    use_overlap: bool = True           # --use_overlap (flag parity; overlap is
    # structural in the window pipeline and always on)
    pin_weight: bool = True            # pin host weight (numpy is always "pinned" on TPU-VM)
    # TPU-specific knobs (no reference analog):
    planner: str = "auto"              # "host" (native C++ directory) | "device"
    # (jitted state machine) | "auto" — see cache/host_directory.py
    approx_evict: bool = False         # use approx_min_k for victim selection
    weight_init: str = "uniform"       # host table init: "uniform" | "zeros" | "virtual"
    transfer_dtype: str = "float32"    # host<->HBM admit payload: bfloat16 /
    # int8 / int4 cut fetch wire 2x/4x/8x (writebacks stay >= bf16; int8/int4
    # are AUROC-gated — tests/test_cache.py, scripts/run_ab.py)
    cache_dtype: str = "bfloat16"      # HBM cache-row storage dtype. bf16 rows
    # gather 4x faster on TPU (256B rows hit XLA's vectorized gather) and halve
    # cache HBM; the host master table stays float32, update arithmetic runs in
    # f32 with one rounding per step, and pooling accumulates in f32.
    ship_sort_perm: bool = False       # ship a per-iteration bin-grouping
    # permutation with each window (hostops.sort_plan) and run the embedding
    # backward as the Pallas binned MXU scatter-add (ops/binned_scatter.py)
    # instead of XLA's scalar-rate scatter. Costs ~2 x id-block wire per
    # window + ~4.5 ms/iter host sort (pipelined): right for real TPU-VM
    # links, off for tunnel-class links where wire is wall time.
    stochastic_rounding: str = "auto"  # "auto" | "on" | "off" — stochastic
    # rounding of the per-step f32 update back into low-precision cache rows
    # (ops/rounding.py: pltpu.stochastic_round on TPU, exact emulation
    # elsewhere). "auto" enables it for fp8 cache dtypes, where deterministic
    # round-to-nearest stagnates under small late-stage LRs (sub-ulp updates
    # always snap back). Applies to the fused-window dense-grad path; forces
    # the dense-grad path when on.
    id_wire: str = "escape"            # id wire format: "plain" (per-feature
    # fixed widths), "escape" (narrow base + escape list, see escape_pack),
    # or "ranktier" — per-feature 2-bit tier selector + 4 packed substreams,
    # with cached features remapped through a per-window top-K dictionary so
    # the wire carries frequency RANKS (head-heavy: top-64 slots carry ~88%
    # of the stream, benchmark/wire_entropy.py). Models at ~6-8 bits/id vs
    # escape's 9.9; costs a cumsum+gather merge per feature on device, so
    # the right default depends on link speed (docs/AB_REPORT.md round-5).
    escape_pack: bool = True           # escape-coded id wire format: learn
    # per-feature NARROW base widths from the live stream (hot-ranked ids are
    # small) + one window-level (pos, addr) escape list for the overflow tail.
    # Learned over the first 12 windows, then frozen; falls back to the plain
    # per-feature-width format on budget overflow. ~20-30% off the id wire.
    use_pallas_lookup: bool = False    # Pallas gather+pool kernel vs XLA take/segment-sum
    onehot_max_rows: int = 2048        # resident tables with <= this many rows
    # take their embedding backward as one-hot MXU matmuls instead of joining
    # the unsorted scatter's index stream (cache/manager.py
    # onehot_backward_plan; break-even ~2k rows at B=16384, D=128 — the
    # (B, rows) one-hot materialization costs ~rows*B*2 bytes of HBM vs the
    # scatter's ~16 ns/index)
    resident_threshold: int = 0        # MIXED-KERNEL execution: tables with
    # <= this many rows are kept fully HBM-resident (planner kernel HBM_FULL)
    # inside the same device array as the cache slots; only bigger tables are
    # cached. 0 disables. The torchrec-planner per-table kernel decision
    # (/root/reference/baselines/dlrm_main.py:725-792) executing in ONE model.


@dataclasses.dataclass
class DLRMConfig:
    """Model + training hyperparameters (defaults mirror
    /root/reference/recsys/dlrm_main.py:102-174 and BASELINE.md)."""

    # model
    model: str = "dlrm"                # "dlrm" | "deepfm" (second family,
    # /root/reference/baselines/models/deepfm.py:199)
    deep_fm_dimension: int = 16        # DeepFM deep-interaction width
    num_embeddings_per_feature: Sequence[int] = ()
    embedding_dim: int = 128
    dense_in_features: int = 13
    dense_arch_layer_sizes: Tuple[int, ...] = (512, 256, 128)
    over_arch_layer_sizes: Tuple[int, ...] = (1024, 1024, 512, 256, 1)
    reduction_mode: str = "sum"

    # training
    batch_size: int = 16384
    learning_rate: float = 1.0         # sparse LR; dense LR is scaled by data-parallel size
    epochs: int = 1
    seed: int = 1024
    change_lr: bool = False            # --change_lr / --lr_change_point / --lr_after
    lr_change_point: float = 0.8
    lr_after: float = 0.2
    shuffle_batches: bool = False

    # evaluation
    validation_freq_within_epoch: Optional[int] = None

    # parallelism
    mesh_shape: Tuple[int, ...] = (1,)
    use_tablewise: bool = False        # tablewise (EP-style) vs column-wise sharding
    fused_op: str = "all_to_all"       # --fused_op: all_to_all | gather_scatter

    # precision
    compute_dtype: str = "float32"     # dense tower matmul dtype ("bfloat16" for MXU speed)
    interaction_impl: str = "bmm"      # "bmm" (batched matmul + triu gather)
    # or "gather" (fused static-gather multiply-reduce over the 351 needed
    # pairs — avoids the (B, F, F) tensor and its layout copies; see
    # models/dlrm.py INTERACTION_IMPL and docs/PERF_NOTES.md round-5)
    dense_input_dtype: str = "bfloat16"  # host->device payload dtype of DENSE
    # features (ids/labels are integral either way); inputs are upcast to
    # compute_dtype on device. bfloat16 halves input-link bytes; "int8"
    # quarters them with per-window range scaling (the dense features are
    # log-transformed counts on a narrow range, so 8-bit fixed point sits far
    # below dataset noise — E2E AUROC lift is tested for both). "int4" halves
    # the block again (nibble pairs, PER-FEATURE scale/lo so the 16-level
    # grid tracks each column's range; AUROC-gated in tests/test_e2e.py;
    # mesh mode floors at int8 — nibble pairing doesn't survive the batch
    # shard).
    use_sparse_embed_grad: bool = False  # --use_sparse_embed_grad: force scatter-add SGD

    # embedding optimizer (beyond-reference: the reference is SGD-only).
    # "rowwise_adagrad": per-row accumulator that tiers with the cache
    # (HBM (capacity,) state + host master store; admitted/evicted with rows).
    embedding_optimizer: str = "sgd"
    adagrad_eps: float = 1e-10
    adagrad_initial: float = 0.0

    cache: CacheConfig = dataclasses.field(default_factory=CacheConfig)

    @property
    def num_sparse_features(self) -> int:
        return len(self.num_embeddings_per_feature)

    @property
    def total_num_embeddings(self) -> int:
        return int(sum(self.num_embeddings_per_feature))


# Dataset constants mirrored from the reference
# (/root/reference/recsys/datasets/criteo.py:29-34, recsys/datasets/avazu.py:30-36).
CRITEO_1TB_NUM_EMBEDDINGS_PER_FEATURE = [
    45833188, 36746, 17245, 7413, 20243, 3, 7114, 1441, 62, 29275261, 1572176,
    345138, 10, 2209, 11267, 128, 4, 974, 14, 48937457, 11316796, 40094537,
    452104, 12606, 104, 35,
]
CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE = [
    1460, 583, 10131227, 2202608, 305, 24, 12517, 633, 3, 93145, 5683, 8351593,
    3194, 27, 14992, 5461306, 10, 5652, 2173, 4, 7046547, 18, 15, 286181, 105,
    142572,
]
AVAZU_NUM_EMBEDDINGS_PER_FEATURE = [
    7, 7, 4737, 7745, 26, 8552, 559, 36, 2686408, 6729486, 8251, 5, 4,
]

CRITEO_NUM_DENSE = 13
AVAZU_NUM_DENSE = 8
CRITEO_KAGGLE_TOTAL_TRAINING_SAMPLES = 39_291_954  # criteo.py:36
AVAZU_TOTAL_TRAINING_SAMPLES = 36_386_071  # avazu.py:35
