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

The jitted window program donates the parameter buffers so updates are
in-place in HBM. Host planning/packing/staging for window k+1 structurally
overlaps window k's compute (the reference's --use_overlap is always-on here:
window k's execute is dispatched before window k+1's host work begins).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Iterable, List, Optional

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from cachedembedding_tpu.cache.manager import CachedEmbeddingBag, WindowStaging
from cachedembedding_tpu.config import DLRMConfig
from cachedembedding_tpu.jagged import Batch, RaggedFeatures
from cachedembedding_tpu.models.dlrm import (
    DLRMParams,
    bce_with_logits,
    dlrm_dense_forward,
    init_dlrm_dense,
)
from cachedembedding_tpu.models.deepfm import bce_probs, deepfm_forward, init_deepfm
from cachedembedding_tpu.ops.embedding_bag import embedding_bag
from cachedembedding_tpu.ops.synth_rows import synth_rows
from cachedembedding_tpu.utils.metrics import StreamingMetrics

# Round-5 gather fix: materialize the transposed id array behind an
# optimization_barrier before the row gather, so the gather's index operand
# is a plain s32 array rather than fused index math. Measured on chip
# (scripts/ceiling_r5.py, 2026-08-19): window ceiling 15.35 -> 14.31 ms/iter
# — the fused transpose was knocking the emitter off the vectorized-gather
# path (in-scan gather ran ~9 ns/row vs 2.8 standalone). Default ON;
# CET_ISOLATE_GATHER=0 restores the fused form for A/B.
import os as _os

_ISOLATE_GATHER = _os.environ.get("CET_ISOLATE_GATHER", "1") == "1"


def _quant_dense_window(batches) -> tuple:
    """Range-scaled uint8 dense-feature wire: ONE (scale, lo) f32 pair per
    window. The single definition of the int8 dense format — used by the
    packed, ragged and mesh window paths (decode: _unpack_dense / the mesh
    step's tail-meta dequant)."""
    raw = np.stack([np.asarray(b.dense_features, np.float32) for b in batches])
    lo = float(raw.min())
    scale = (float(raw.max()) - lo) / 255.0 or 1.0
    q = np.round((raw - lo) / scale).astype(np.uint8)
    return q, np.array([scale, lo], np.float32)


def _quant_dense_window4(batches) -> tuple:
    """Nibble-packed int4 dense-feature wire with PER-FEATURE (scale, lo)
    pairs (4 bits is too coarse for one global range; per-column ranges keep
    the grid where each feature lives). Din is zero-padded to even so nibble
    pairs never straddle a feature row. Decode: _unpack_dense "int4".
    Halves the int8 dense block: 0.213 -> 0.107 MB/iter at the headline
    config (docs/AB_REPORT.md round-5)."""
    raw = np.stack([np.asarray(b.dense_features, np.float32) for b in batches])
    P, B, Din = raw.shape
    Dp = Din + (Din & 1)
    lo = raw.min(axis=(0, 1))
    scale = (raw.max(axis=(0, 1)) - lo) / 15.0
    scale[scale == 0.0] = 1.0
    q = np.round((raw - lo) / scale).astype(np.uint8)
    if Dp != Din:
        q = np.concatenate([q, np.zeros((P, B, 1), np.uint8)], axis=2)
    packed = q[:, :, 0::2] | (q[:, :, 1::2] << 4)
    meta = np.zeros((2, Dp), np.float32)
    meta[0, :Din] = scale
    meta[1, :Din] = lo
    return packed, meta.reshape(-1)


def _fetch_mode(payload: np.ndarray) -> str:
    """Static wire format of the fetched-admit payload block."""
    if payload.dtype == np.uint8:
        return "int4"  # nibble-packed pairs, (fb, D//2) bytes
    if payload.dtype == np.int8:
        return "int8"
    if payload.dtype == ml_dtypes.bfloat16:
        return "bfloat16"
    return "float32"


def _model_loss(model, dp, dense, sparse_bfd, compute_dtype, labels):
    """Model-family dispatch (static): DLRM trains on logits, DeepFM on
    Sigmoid outputs (/root/reference/baselines/models/deepfm.py:171-195)."""
    if model == "dlrm":
        return bce_with_logits(dlrm_dense_forward(dp, dense, sparse_bfd, compute_dtype), labels)
    if model == "deepfm":
        return bce_probs(deepfm_forward(dp, dense, sparse_bfd, compute_dtype), labels)
    raise ValueError(f"unknown model {model!r}")


def _model_probs(model, dp, dense, sparse_bfd, compute_dtype):
    if model == "dlrm":
        return jax.nn.sigmoid(dlrm_dense_forward(dp, dense, sparse_bfd, compute_dtype))
    if model == "deepfm":
        return deepfm_forward(dp, dense, sparse_bfd, compute_dtype)
    raise ValueError(f"unknown model {model!r}")


@dataclasses.dataclass
class TrainReport:
    losses: List[float]
    it_per_s: float
    examples_per_s: float
    hit_rate: float
    eval_metrics: Optional[dict] = None


@partial(
    jax.jit,
    static_argnames=("mode", "compute_dtype_name", "use_pallas", "sparse_grad", "model"),
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
    model: str = "dlrm",
):
    """One SGD step. ``sparse_grad`` differentiates w.r.t. the GATHERED rows and
    applies a scatter-add update instead of materializing a dense (C, D) grad —
    the reference's --use_sparse_embed_grad (sparse EmbeddingBag). Essential when
    the table is fully HBM-resident (a dense grad would be a full-table pass per
    step); pointless for the small cached table."""
    compute_dtype = jnp.dtype(compute_dtype_name)

    if sparse_grad:
        # wrap = identity for the validated in-range ids; keeps the gather
        # vectorized (clip/fill cost 4-7 ms at this L — ops/embedding_bag.py)
        rows0 = jnp.take(cache_weight, slot_features.values, axis=0, mode="wrap")  # (L, D)

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
            return _model_loss(model, dp, dense_features, sparse_bfd, compute_dtype, labels)

        loss, (g_dense, g_rows) = jax.value_and_grad(loss_fn_rows, argnums=(0, 1))(
            dense_params, rows0
        )
        new_cache = cache_weight.at[slot_features.values].add(
            (-sparse_lr * g_rows.astype(jnp.float32)).astype(cache_weight.dtype),
            mode="promise_in_bounds",  # ids validated upstream; skip clamps
        )
    else:

        def loss_fn(dp, cw):
            sparse_bfd = embedding_bag(cw, slot_features, mode=mode, use_pallas=use_pallas)
            return _model_loss(model, dp, dense_features, sparse_bfd, compute_dtype, labels)

        loss, (g_dense, g_cache) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            dense_params, cache_weight
        )
        new_cache = (
            cache_weight.astype(jnp.float32) - sparse_lr * g_cache.astype(jnp.float32)
        ).astype(cache_weight.dtype)
    new_dense = jax.tree_util.tree_map(lambda p, g: p - dense_lr * g, dense_params, g_dense)
    return new_dense, new_cache, loss


@partial(
    jax.jit,
    static_argnames=(
        "num_features", "batch_size", "pooling", "mode", "compute_dtype_name",
        "use_pallas", "sparse_grad", "model", "optimizer", "adagrad_eps",
        "onehot_plan",
    ),
    donate_argnames=("dense_params", "cache_weight", "cache_accum"),
)
def _train_window_step(
    dense_params: DLRMParams,
    cache_weight: jnp.ndarray,
    dense_feats: jnp.ndarray,   # (P, B, Din)
    slot_values: jnp.ndarray,   # (P, L) cache-slot ids
    labels: jnp.ndarray,        # (P, B)
    sparse_lrs: jnp.ndarray,    # (P,)
    dense_lrs: jnp.ndarray,     # (P,)
    cache_accum: jnp.ndarray = None,
    sr_seed: jnp.ndarray = None,  # stochastic-rounding seed (None = off)
    *,
    num_features: int,
    batch_size: int,
    pooling: int,
    mode: str,
    compute_dtype_name: str,
    use_pallas: bool,
    sparse_grad: bool,
    model: str = "dlrm",
    optimizer: str = "sgd",
    adagrad_eps: float = 1e-10,
    onehot_plan: tuple = (),
):
    """One ENTIRE prefetch window of SGD steps as a single ``lax.scan``.

    Why: each PJRT execute/transfer costs real dispatch latency (tunneled links
    especially), and a window at prefetch_num=8 would otherwise be ~50 host
    round-trips. Fusing the window into one program is also what lets XLA keep
    params/cache resident in HBM across steps with zero re-materialization. The
    reference's prefetch pipeline trains the window as 8 separate CUDA-graph
    launches (/root/reference/recsys/dlrm_main.py:264-279); this is its
    compiled-once TPU equivalent."""
    return _scan_window(
        dense_params, cache_weight,
        (dense_feats, slot_values, labels, sparse_lrs, dense_lrs),
        num_features=num_features, batch_size=batch_size, pooling=pooling,
        mode=mode, compute_dtype=jnp.dtype(compute_dtype_name),
        use_pallas=use_pallas, sparse_grad=sparse_grad, model=model,
        optimizer=optimizer, adagrad_eps=adagrad_eps, cache_accum=cache_accum,
        sr_seed=sr_seed, onehot_plan=onehot_plan,
    )


def _scan_window(
    dense_params, cache_weight, xs,
    *, num_features, batch_size, pooling, mode, compute_dtype, use_pallas,
    sparse_grad, model="dlrm", optimizer="sgd", adagrad_eps=1e-10,
    cache_accum=None, ragged=False, sr_seed=None, plan=None, onehot_plan=(),
):
    """``ragged=True`` scans (dense, padded values, per-bag lengths, labels,
    lrs): offsets rebuild on device from lengths and pad-tail values fall past
    the last offset, where segment_ids() maps them out of range and
    segment_sum drops them — the fused-window path for variable-pooling
    (fbgemm-trace) workloads.

    ``sr_seed`` (traced scalar, or None): stochastic rounding of the per-step
    f32 update back to the cache storage dtype (ops/rounding.py) — the fp8
    small-LR accumulation fix. Dense-grad path only: the scatter-add path
    accumulates IN storage dtype, where per-addend rounding cannot be made
    unbiased."""
    if plan is not None:
        assert not ragged, "binned backward requires uniform windows"
        xs = tuple(xs) + plan  # (perm, grouped ids, bin starts) per step
    if sr_seed is not None:
        assert not sparse_grad, "stochastic rounding requires the dense-grad path"
        P_steps = xs[0].shape[0]
        step_seeds = (
            jnp.uint32(sr_seed) * jnp.uint32(0x9E3779B9)
            + jnp.arange(P_steps, dtype=jnp.uint32)
        )
        xs = tuple(xs) + (step_seeds,)

    def body(carry, xs):
        if sr_seed is not None:
            *xs, step_seed = xs
        else:
            step_seed = None
        if plan is not None:
            *xs, perm_p, grouped_p, bins_p = xs
        if optimizer == "rowwise_adagrad":
            dp, cw, acc = carry
        else:
            dp, cw = carry
            acc = None
        if ragged:
            d, v, ln, l, slr, dlr = xs
            offsets = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(ln).astype(jnp.int32)]
            )
            feats = RaggedFeatures(
                values=v, offsets=offsets, num_features=num_features,
                batch_size=batch_size, pooling=None,
            )
        else:
            d, v, l, slr, dlr = xs
            feats = RaggedFeatures(
                values=v, offsets=None, num_features=num_features,
                batch_size=batch_size, pooling=pooling,
            )
        if plan is not None:
            # Binned MXU backward: rows-grad via autodiff (no scatter in the
            # VJP — loss is a function of the gathered rows), then the
            # host-planned Pallas binned scatter-add builds the full (C, D)
            # grad at MXU rate and the update applies it in one f32 pass.
            from cachedembedding_tpu.ops.binned_scatter import (
                binned_scatter_add,
            )

            rows_p = jnp.take(cw, v, axis=0, mode="wrap")
            if step_seed is not None:
                # sr regime: differentiate w.r.t. the f32 UPCAST — a grad
                # taken w.r.t. a storage-dtype leaf is cast back through that
                # dtype by AD, and at fp8 that flushes the small late-stage
                # grads stochastic rounding exists to preserve
                rows_p = rows_p.astype(jnp.float32)

            def loss_fn(dp_, rows):
                F, B, Pl = num_features, batch_size, pooling
                pooled = rows.reshape(F, B, Pl, -1).astype(jnp.float32)
                pooled = (
                    pooled.sum(axis=2) if mode == "sum" else pooled.mean(axis=2)
                )
                sparse_bfd = jnp.transpose(pooled, (1, 0, 2))
                return _model_loss(model, dp_, d, sparse_bfd, compute_dtype, l)

            loss, (g_dense, g_rows) = jax.value_and_grad(
                loss_fn, argnums=(0, 1)
            )(dp, rows_p)
            if optimizer == "sgd" and step_seed is None:
                # FUSED backward+optimizer: never materializes the (C, D) f32
                # grad and runs no separate full-array update pass — the two
                # biggest device costs of the dense path (10-17 ms/iter at
                # C~900k measured; benchmark/microbench_resident.py)
                from cachedembedding_tpu.ops.binned_scatter import (
                    binned_sgd_update,
                )

                cw = binned_sgd_update(
                    cw, g_rows.astype(cw.dtype), perm_p, grouped_p, bins_p,
                    slr,
                )
            else:
                gdt = cw.dtype
                if step_seed is not None and jnp.dtype(cw.dtype).itemsize == 1:
                    # fp8 grads would flush the sub-ulp updates sr preserves;
                    # bf16 keeps f32's exponent range at the same kernel speed
                    gdt = jnp.bfloat16
                g32 = binned_scatter_add(
                    g_rows.astype(gdt), perm_p, grouped_p, bins_p,
                    cw.shape[0],
                )
                if optimizer == "rowwise_adagrad":
                    acc = acc + jnp.mean(g32 * g32, axis=1)
                    g32 = g32 / (jnp.sqrt(acc) + adagrad_eps)[:, None]
                new32 = cw.astype(jnp.float32) - slr * g32
                if step_seed is not None:
                    from cachedembedding_tpu.ops.rounding import (
                        stochastic_astype,
                    )

                    cw = stochastic_astype(new32, cw.dtype, step_seed)
                else:
                    cw = new32.astype(cw.dtype)
        elif sparse_grad:
            rows0 = jnp.take(cw, v, axis=0, mode="wrap")

            if ragged:
                seg = feats.segment_ids()

                def loss_fn(dp_, rows):
                    F, B = num_features, batch_size
                    pooled = jax.ops.segment_sum(
                        rows.astype(jnp.float32), seg, num_segments=F * B,
                        indices_are_sorted=True,
                    )
                    if mode == "mean":
                        counts = jax.ops.segment_sum(
                            jnp.ones((v.shape[0],), jnp.float32), seg,
                            num_segments=F * B, indices_are_sorted=True,
                        )
                        pooled = pooled / jnp.maximum(counts, 1.0)[:, None]
                    sparse_bfd = jnp.transpose(
                        pooled.reshape(F, B, -1), (1, 0, 2)
                    )
                    return _model_loss(model, dp_, d, sparse_bfd, compute_dtype, l)
            else:

                def loss_fn(dp_, rows):
                    F, B, P = num_features, batch_size, pooling
                    pooled = rows.reshape(F, B, P, -1).astype(jnp.float32)
                    pooled = pooled.sum(axis=2) if mode == "sum" else pooled.mean(axis=2)
                    sparse_bfd = jnp.transpose(pooled, (1, 0, 2))
                    return _model_loss(model, dp_, d, sparse_bfd, compute_dtype, l)

            loss, (g_dense, g_rows) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                dp, rows0
            )
            cw = cw.at[v].add(
                (-slr * g_rows.astype(jnp.float32)).astype(cw.dtype),
                mode="promise_in_bounds",
            )
        elif not ragged and not use_pallas:
            # Default dense-grad path, restructured to differentiate w.r.t.
            # the GATHERED ROWS (f32 upcast) rather than the whole cache
            # array. Numerically identical — AD of take is exactly the
            # scatter-add built below, and the f32 upcast point matches the
            # old path's f32 activations — but it keeps the row gather in the
            # storage dtype: differentiating w.r.t. a bf16 cw forces bf16
            # cotangents (losing f32 duplicate-id accumulation), while the
            # old cw.astype(f32)-adjacent graph let XLA rewire the gather to
            # read a full-N f32 convert of the cache (2x bytes on the
            # program's hottest op).
            ids_bfp = jnp.transpose(feats.to_fbp(), (1, 0, 2))  # (B, F, P)
            if _ISOLATE_GATHER:
                ids_bfp = jax.lax.optimization_barrier(ids_bfp)
            rows_bf = jnp.take(cw, ids_bfp, axis=0, mode="wrap")
            # Differentiate w.r.t. the rows in the STORAGE dtype when P == 1:
            # an explicit f32 upcast here gets folded into the gather (f32
            # output = 2x write bytes) and never folded back out. The grad
            # values are identical either way — the model's compute-dtype
            # cast rounds the cotangent to bf16 at the einsum boundary before
            # it reaches this point — and f32 duplicate-id ACCUMULATION is
            # preserved by upcasting inside the scatter-add below. fp8
            # storage still upcasts (8-bit cotangents would flush the small
            # grads), as does P > 1 (pooling accumulates in f32).
            # ... and stochastic rounding upcasts too: SR's whole point is
            # keeping sub-ulp f32 grad signal alive, and mesh_window.py's
            # structurally-identical program upcasts under SR — the condition
            # must match or cross-program grad parity breaks.
            upcast = (
                jnp.dtype(cw.dtype).itemsize == 1
                or ids_bfp.shape[2] > 1
                or step_seed is not None
            )
            rows_in = rows_bf.astype(jnp.float32) if upcast else rows_bf

            def loss_fn_rows(dp_, rows):
                if rows.shape[2] == 1:
                    sparse_bfd = rows[:, :, 0]  # pooling over P=1 = identity
                else:
                    sparse_bfd = (
                        rows.sum(axis=2) if mode == "sum" else rows.mean(axis=2)
                    )
                return _model_loss(model, dp_, d, sparse_bfd, compute_dtype, l)

            loss, (g_dense, g_rows) = jax.value_and_grad(
                loss_fn_rows, argnums=(0, 1)
            )(dp, rows_in)
            D = cw.shape[1]
            # Small-table one-hot backward (mixed-kernel resident split):
            # XLA's TPU scatter is per-INDEX bound (~16 ns each), so the
            # tiny Criteo tables burn ~0.26 ms/step per feature for a sum
            # into a handful of rows. Their grads compute instead as
            # (rows, B) x (B, D) one-hot MXU matmuls into the STATIC device
            # block each resident table owns — the same f32-accumulated
            # addends, microseconds on the MXU — and those features drop out
            # of the scatter's index stream entirely.
            oh_plan = onehot_plan if ids_bfp.shape[2] == 1 else ()
            if oh_plan:
                small = {f for (f, _, _) in oh_plan}
                big = [f for f in range(num_features) if f not in small]
                ids_sc = ids_bfp[:, big, :]
                g_sc = g_rows[:, big]
            else:
                ids_sc = ids_bfp
                g_sc = g_rows
            # barrier: without it XLA hoists the f32 upcast below ahead of
            # the reshape/layout fix-ups, running them on 2x the bytes; the
            # convert belongs fused into the scatter's update computation
            g_flat = jax.lax.optimization_barrier(g_sc.reshape(-1, D))
            g32 = jnp.zeros(cw.shape, jnp.float32).at[ids_sc.reshape(-1)].add(
                g_flat.astype(jnp.float32), mode="promise_in_bounds"
            )
            for f, base, r in oh_plan:
                rel = ids_bfp[:, f, 0] - base  # (B,) in [0, r)
                oh = (
                    rel[:, None] == jnp.arange(r, dtype=rel.dtype)
                ).astype(g_rows.dtype)
                gblk = jnp.einsum(
                    "br,bd->rd", oh, g_rows[:, f, 0],
                    preferred_element_type=jnp.float32,
                )
                # SET, not add: feature id spaces are disjoint device blocks,
                # so the scatter above never touches [base, base + r)
                g32 = g32.at[base : base + r].set(gblk)
            if optimizer == "rowwise_adagrad":
                acc = acc + jnp.mean(g32 * g32, axis=1)
                g32 = g32 / (jnp.sqrt(acc) + adagrad_eps)[:, None]
            cw_upd = jax.lax.optimization_barrier(cw)
            new32 = cw_upd.astype(jnp.float32) - slr * g32
            if step_seed is not None:
                from cachedembedding_tpu.ops.rounding import stochastic_astype

                cw = stochastic_astype(new32, cw.dtype, step_seed)
            else:
                cw = new32.astype(cw.dtype)
        else:

            def loss_fn(dp_, cw_):
                sparse_bfd = embedding_bag(cw_, feats, mode=mode, use_pallas=use_pallas)
                return _model_loss(model, dp_, d, sparse_bfd, compute_dtype, l)

            # sr regime: grads w.r.t. the f32 upcast (a storage-dtype grad is
            # cast back through that dtype by AD; fp8 flushes the small
            # late-stage grads sr exists to preserve)
            cw_in = cw.astype(jnp.float32) if step_seed is not None else cw
            loss, (g_dense, g_cache) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                dp, cw_in
            )
            g32 = g_cache.astype(jnp.float32)
            if optimizer == "rowwise_adagrad":
                # torchrec ROWWISE_ADAGRAD: acc += mean_d(g^2); w -= lr*g/(sqrt(acc)+eps).
                # Rows untouched this step have g == 0, so their state is a no-op.
                acc = acc + jnp.mean(g32 * g32, axis=1)
                g32 = g32 / (jnp.sqrt(acc) + adagrad_eps)[:, None]
            # update arithmetic in f32, ONE rounding back to the storage dtype
            # (stochastic when sr_seed is set: E[stored] == f32 value, so
            # sub-ulp fp8 updates accumulate instead of snapping back).
            # optimization_barrier: without it XLA CSEs this f32 upcast with
            # the forward lookup's operand and rewires the row GATHER to read
            # the converted f32 array — 2x random-read+write bytes on the
            # hottest op of the program. The barrier forks the value so the
            # gather keeps reading storage-dtype rows; the update fusion
            # converts inline (fused with the subtract) at no extra pass.
            cw_upd = jax.lax.optimization_barrier(cw)
            new32 = cw_upd.astype(jnp.float32) - slr * g32
            if step_seed is not None:
                from cachedembedding_tpu.ops.rounding import stochastic_astype

                cw = stochastic_astype(new32, cw.dtype, step_seed)
            else:
                cw = new32.astype(cw.dtype)
        dp = jax.tree_util.tree_map(lambda p, g: p - dlr * g, dp, g_dense)
        if optimizer == "rowwise_adagrad":
            return (dp, cw, acc), loss
        return (dp, cw), loss

    if optimizer == "rowwise_adagrad":
        assert not sparse_grad, "rowwise adagrad uses the dense-grad path"
        (dense_params, cache_weight, cache_accum), losses = jax.lax.scan(
            body, (dense_params, cache_weight, cache_accum), xs
        )
        return dense_params, cache_weight, cache_accum, losses
    (dense_params, cache_weight), losses = jax.lax.scan(
        body, (dense_params, cache_weight), xs
    )
    return dense_params, cache_weight, losses


def _apply_packed_admits(cache_weight, cache_accum, packed, c, layout, seed,
                         optimizer, adagrad_initial=0.0):
    """Decode the synth/fetch admit blocks at offset ``c`` of the packed window
    buffer and land them in the cache (and optimizer state) — shared by the
    fused train and eval window programs."""
    P, L, B, Din, dmode, id_width, sb, fb, fmode = layout
    D = cache_weight.shape[1]
    C_pad = cache_weight.shape[0]
    if sb:
        s0, s1, s2 = c, c + 4 * sb, c + 8 * sb
        c = c + 12 * sb
        s_slots = jax.lax.bitcast_convert_type(packed[s0:s1].reshape(sb, 4), jnp.int32)
        s_rows = jax.lax.bitcast_convert_type(packed[s1:s2].reshape(sb, 4), jnp.int32)
        s_bounds = jax.lax.bitcast_convert_type(packed[s2:c].reshape(sb, 4), jnp.float32)
        vals = synth_rows(s_rows, s_bounds, seed, D)
        safe = jnp.where(s_slots >= 0, s_slots, C_pad)
        cache_weight = cache_weight.at[safe].set(
            vals.astype(cache_weight.dtype), mode="drop"
        )
        if optimizer == "rowwise_adagrad":
            # fresh rows start from the initial accumulator
            cache_accum = cache_accum.at[safe].set(adagrad_initial, mode="drop")
    if fb:
        f0, f1 = c, c + 4 * fb
        fsize = {"float32": 4, "bfloat16": 2, "int8": 1, "int4": 1}[fmode]
        c2 = f1 + (fb * D // 2 if fmode == "int4" else fb * D * fsize)
        f_slots = jax.lax.bitcast_convert_type(packed[f0:f1].reshape(fb, 4), jnp.int32)
        if fmode == "int4":
            from cachedembedding_tpu.cache.state import dequant_rows_q4

            scales = jax.lax.bitcast_convert_type(
                packed[c2 : c2 + 4 * fb].reshape(fb, 4), jnp.float32
            )
            payload = dequant_rows_q4(
                packed[f1:c2].reshape(fb, D // 2), scales, D
            )
            c2 = c2 + 4 * fb
        elif fmode == "int8":
            q = jax.lax.bitcast_convert_type(
                packed[f1:c2].reshape(fb, D, 1), jnp.int8
            ).reshape(fb, D)
            scales = jax.lax.bitcast_convert_type(
                packed[c2 : c2 + 4 * fb].reshape(fb, 4), jnp.float32
            )
            c2 = c2 + 4 * fb
            payload = q.astype(jnp.float32) * scales[:, None]
        else:
            fetch_dt = jnp.bfloat16 if fmode == "bfloat16" else jnp.float32
            payload = jax.lax.bitcast_convert_type(
                packed[f1:c2].reshape(fb, D, fsize), fetch_dt
            )
        safe = jnp.where(f_slots >= 0, f_slots, C_pad)
        cache_weight = cache_weight.at[safe].set(
            payload.astype(cache_weight.dtype), mode="drop"
        )
        if optimizer == "rowwise_adagrad":
            f_accum = jax.lax.bitcast_convert_type(
                packed[c2 : c2 + 4 * fb].reshape(fb, 4), jnp.float32
            )
            cache_accum = cache_accum.at[safe].set(f_accum, mode="drop")
    return cache_weight, cache_accum


def _unpack_dense(packed, a, P, B, Din, dmode):
    """Decode the dense-features block at offset ``a``; returns (feats, end)."""
    if dmode == "int4":
        Dp = Din + (Din & 1)
        meta = jax.lax.bitcast_convert_type(
            packed[a : a + 8 * Dp].reshape(2, Dp, 4), jnp.float32
        )
        a += 8 * Dp
        end = a + P * B * Dp // 2
        b = packed[a:end].reshape(P, B, Dp // 2).astype(jnp.int32)
        q = jnp.stack([b & 0xF, b >> 4], axis=-1).reshape(P, B, Dp)
        feats = q.astype(jnp.float32) * meta[0] + meta[1]
        return feats[:, :, :Din], end
    if dmode == "int8":
        meta = jax.lax.bitcast_convert_type(packed[a : a + 8].reshape(2, 4), jnp.float32)
        a += 8
        end = a + P * B * Din
        q = packed[a:end].reshape(P, B, Din).astype(jnp.float32)
        return q * meta[0] + meta[1], end
    dsize = 2 if dmode == "bfloat16" else 4
    end = a + P * B * Din * dsize
    dense_dt = jnp.bfloat16 if dmode == "bfloat16" else jnp.float32
    feats = jax.lax.bitcast_convert_type(
        packed[a:end].reshape(P, B, Din, dsize), dense_dt
    ).astype(jnp.float32)
    return feats, end


def _unpack_flat(b: jnp.ndarray, n: int, width: int) -> jnp.ndarray:
    """Decode n ids bit-packed at any nibble-aligned width 4..32 (the device
    inverse of hostops.pack_ids_any). A handful of VPU shift/or ops."""
    if width == 32:
        return jax.lax.bitcast_convert_type(b.reshape(n, 4), jnp.int32)
    u = b.astype(jnp.int32)
    if width == 8:
        return u
    if width == 16:
        u = u.reshape(n, 2)
        return u[:, 0] | (u[:, 1] << 8)
    if width == 24:
        u = u.reshape(n, 3)
        return u[:, 0] | (u[:, 1] << 8) | (u[:, 2] << 16)
    if width == 4:
        u = u.reshape(n // 2)
        return jnp.stack([u & 0xF, u >> 4], axis=-1).reshape(n)
    if width == 12:
        u = u.reshape(n // 2, 3)
        e0 = u[:, 0] | ((u[:, 1] & 0xF) << 8)
        e1 = (u[:, 1] >> 4) | (u[:, 2] << 4)
        return jnp.stack([e0, e1], axis=-1).reshape(n)
    if width == 20:
        u = u.reshape(n // 2, 5)
        e0 = u[:, 0] | (u[:, 1] << 8) | ((u[:, 2] & 0xF) << 16)
        e1 = (u[:, 2] >> 4) | (u[:, 3] << 4) | (u[:, 4] << 12)
        return jnp.stack([e0, e1], axis=-1).reshape(n)
    if width == 28:
        u = u.reshape(n // 2, 7)
        e0 = u[:, 0] | (u[:, 1] << 8) | (u[:, 2] << 16) | ((u[:, 3] & 0xF) << 24)
        e1 = (u[:, 3] >> 4) | (u[:, 4] << 4) | (u[:, 5] << 12) | (u[:, 6] << 20)
        return jnp.stack([e0, e1], axis=-1).reshape(n)
    raise ValueError(f"unsupported pack width {width}")


def _decode_window_ids(packed: jnp.ndarray, layout: tuple):
    """Decode the id block of a packed window buffer. Returns
    (slot_values (P, L) int32, end_offset). ``layout[5]`` is either an int
    (single-width block) or a per-feature tuple of (width, delta) pairs —
    the mixed-kernel format where each feature's block is packed at its own
    width and resident features add a static address delta on device."""
    P, L, B = layout[0], layout[1], layout[2]
    id_spec = layout[5]
    esc_budget = 0
    if isinstance(id_spec, tuple) and id_spec and id_spec[0] == "rt":
        # Rank-tier format (trainer._tier_encode): per feature either
        #   ("p", w, delta)                       — plain block, may carry
        #                                           window-level escapes, or
        #   ("t", (w0..w3), delta, caps, dict_k)  — 2-bit selector + 4 packed
        #     substreams; symbols are per-window dictionary RANKS for dict
        #     features (tier 3 = raw addresses at plain width). Decode merges
        #     the streams back to position order with a one-hot cumsum and a
        #     single gather, then remaps ranks through the shipped dict.
        _, entries, ne = id_spec
        Bf = L // len(entries)
        n = P * Bf
        a = 0
        cols = []
        for ent in entries:
            if ent[0] == "p":
                _, w, delta = ent
                nb = (n * w) // 8
                v = _unpack_flat(packed[a : a + nb], n, w).reshape(P, Bf)
                cols.append(v + delta if delta else v)
                a += nb
                continue
            _, (w0, w1, w2, w3), delta, (c0, c1, c2, c3), dict_k = ent
            sb = n // 4
            u = packed[a : a + sb].astype(jnp.int32)
            a += sb
            sel = jnp.stack(
                [u & 3, (u >> 2) & 3, (u >> 4) & 3, (u >> 6) & 3], axis=-1
            ).reshape(-1)
            dv = None
            if dict_k:
                db = 4 * dict_k
                dv = jax.lax.bitcast_convert_type(
                    packed[a : a + db].reshape(dict_k, 4), jnp.int32
                )
                a += db
            streams = []
            for ck, wk in ((c0, w0), (c1, w1), (c2, w2), (c3, w3)):
                nb = (ck * wk) // 8
                streams.append(_unpack_flat(packed[a : a + nb], ck, wk))
                a += nb
            T = jnp.concatenate(streams)
            offs = jnp.array([0, c0, c0 + c1, c0 + c1 + c2], jnp.int32)
            onehot = (sel[:, None] == jnp.arange(4, dtype=jnp.int32)).astype(
                jnp.int32
            )
            pos = jnp.cumsum(onehot, axis=0) - onehot  # exclusive per tier
            idx = (pos * onehot).sum(axis=1) + offs[sel]
            sym = jnp.take(T, idx, mode="wrap")
            if dv is not None:
                v = jnp.where(
                    sel == 3,
                    sym,
                    jnp.take(dv, jnp.clip(sym, 0, dict_k - 1), mode="wrap"),
                )
            else:
                v = sym
            v = v.reshape(P, Bf)
            cols.append(v + delta if delta else v)
        v = jnp.stack(cols, axis=1).reshape(P, L)
        if ne:
            pos = jax.lax.bitcast_convert_type(
                packed[a : a + 4 * ne].reshape(ne, 4), jnp.int32
            )
            val = jax.lax.bitcast_convert_type(
                packed[a + 4 * ne : a + 8 * ne].reshape(ne, 4), jnp.int32
            )
            a += 8 * ne
            v = v.reshape(P * L).at[pos].set(val, mode="drop").reshape(P, L)
        return v, a
    if isinstance(id_spec, tuple) and id_spec and id_spec[0] == "esc":
        # Escape-coded mixed-kernel format: per-feature base blocks at widths
        # NARROWER than the feature's full address range (learned from the
        # live stream: hot-ranked ids are small, so e.g. a 20-bit cached
        # feature ships 12-bit base ids), plus ONE window-level escape list of
        # (u32 flat position, u32 final device address) pairs overwriting the
        # few ids that overflow their base width. Padding entries carry
        # pos = P*L, dropped by the scatter.
        _, id_spec, esc_budget = id_spec
    if isinstance(id_spec, tuple):
        # Per-feature blocks carry L//F elements each (= B * pooling), matching
        # the encoder's (P, F, Bf) layout — NOT B, which differs when pooling>1.
        Bf = L // len(id_spec)
        a = 0
        cols = []
        for w, delta in id_spec:
            nb = (P * Bf * w) // 8
            v = _unpack_flat(packed[a : a + nb], P * Bf, w).reshape(P, Bf)
            cols.append(v + delta if delta else v)
            a += nb
        v = jnp.stack(cols, axis=1).reshape(P, L)
        if esc_budget:
            ne = esc_budget
            pos = jax.lax.bitcast_convert_type(
                packed[a : a + 4 * ne].reshape(ne, 4), jnp.int32
            )
            val = jax.lax.bitcast_convert_type(
                packed[a + 4 * ne : a + 8 * ne].reshape(ne, 4), jnp.int32
            )
            a += 8 * ne
            v = v.reshape(P * L).at[pos].set(val, mode="drop").reshape(P, L)
        return v, a
    a = P * {16: 2 * L, 20: 5 * (L // 2), 24: 3 * L, 32: 4 * L}[id_spec]
    return _unpack_ids(packed[:a], P, L, id_spec), a


def _unpack_labels(packed, b, P, B, lbits):
    """Decode the labels block: 1 BIT per label when the window was packed
    with binary labels (lbits), else u8. Returns ((P, B) f32 labels, end)."""
    if not lbits:
        c = b + P * B
        return packed[b:c].reshape(P, B).astype(jnp.float32), c
    c = b + (P * B) // 8
    bytes_ = packed[b:c].astype(jnp.int32)  # little-endian bit order
    bits = (bytes_[:, None] >> jnp.arange(8, dtype=jnp.int32)[None, :]) & 1
    return bits.reshape(P, B).astype(jnp.float32), c


def _unpack_ids(b: jnp.ndarray, P: int, L: int, width: int) -> jnp.ndarray:
    """Decode the host-side bit-packing (hostops.pack_ids) back to (P, L) int32
    slot ids — a handful of VPU shift/or ops, free next to the step's matmuls.
    Slot ids are < cache capacity (19-21 bits typically), so shipping them at
    16/20/24 bits cuts the dominant input-transfer bytes by 2x/1.6x/1.33x."""
    if width == 32:
        return jax.lax.bitcast_convert_type(b.reshape(P, L, 4), jnp.int32)
    u = b.astype(jnp.int32)
    if width == 16:
        u = u.reshape(P, L, 2)
        return u[..., 0] | (u[..., 1] << 8)
    if width == 24:
        u = u.reshape(P, L, 3)
        return u[..., 0] | (u[..., 1] << 8) | (u[..., 2] << 16)
    # 20-bit pairs: 2 ids in 5 bytes
    u = u.reshape(P, L // 2, 5)
    id0 = u[..., 0] | (u[..., 1] << 8) | ((u[..., 2] & 0xF) << 16)
    id1 = (u[..., 2] >> 4) | (u[..., 3] << 4) | (u[..., 4] << 12)
    return jnp.stack([id0, id1], axis=-1).reshape(P, L)


@partial(
    jax.jit,
    static_argnames=(
        "layout", "num_features", "batch_size", "pooling", "mode",
        "compute_dtype_name", "use_pallas", "sparse_grad", "model",
        "optimizer", "adagrad_eps", "adagrad_initial", "onehot_plan",
    ),
    donate_argnames=("dense_params", "cache_weight", "cache_accum"),
)
def _train_window_packed(
    dense_params: DLRMParams,
    cache_weight: jnp.ndarray,
    packed: jnp.ndarray,        # (total_bytes,) uint8 — ONE combined transfer
    sparse_lrs: jnp.ndarray,    # (P,)
    dense_lrs: jnp.ndarray,     # (P,)
    seed: jnp.ndarray,          # () uint32 — canonical init seed (synth admits)
    cache_accum: jnp.ndarray = None,  # (C,) f32 rowwise-adagrad state
    sr_seed: jnp.ndarray = None,  # stochastic-rounding seed (None = off)
    *,
    layout: tuple,  # (P, L, B, Din, dense_mode, id_width_bits, synth_bucket,
    # fetch_bucket, fmode) — sb/fb are 0 when the window has no such admits
    num_features: int,
    batch_size: int,
    pooling: int,
    mode: str,
    compute_dtype_name: str,
    use_pallas: bool,
    sparse_grad: bool,
    model: str = "dlrm",
    optimizer: str = "sgd",
    adagrad_eps: float = 1e-10,
    adagrad_initial: float = 0.0,
    onehot_plan: tuple = (),
):
    """Fused window step fed by ONE packed uint8 buffer.

    Tunneled PJRT backends pay a link round-trip per device_put and dispatch
    latency per execute; packing [slot_ids | dense | labels | synth admits |
    fetched admits] into a single transfer and applying the admits INSIDE the
    program makes the steady state exactly one put + one execute per window.
    Unpacking is a handful of bitcasts/shifts on device — free next to the
    matmuls. Admit scatters are sequenced before the train steps by the data
    dependency on cache_weight."""
    P, L, B, Din, dmode, id_width, sb, fb, fmode = layout[:9]
    lbits = layout[9] if len(layout) > 9 else False
    slot_values, a = _decode_window_ids(packed, layout)
    dense_feats, b = _unpack_dense(packed, a, P, B, Din, dmode)
    labels, c = _unpack_labels(packed, b, P, B, lbits)
    cache_weight, cache_accum = _apply_packed_admits(
        cache_weight, cache_accum, packed, c, layout[:9], seed, optimizer,
        adagrad_initial,
    )
    plan = None
    if len(layout) > 10 and layout[10]:
        # bin-grouping plan blocks live at the END of the buffer
        spw, gpw, nbp1 = layout[10], layout[11], layout[12]
        per_iter = (L * spw) // 8 + (L * gpw) // 8 + nbp1 * 4
        a0 = packed.shape[0] - P * per_iter
        perms, groupeds, binses = [], [], []
        for p_i in range(P):
            o = a0 + p_i * per_iter
            o2 = o + (L * spw) // 8
            o3 = o2 + (L * gpw) // 8
            perms.append(_unpack_flat(packed[o:o2], L, spw))
            groupeds.append(_unpack_flat(packed[o2:o3], L, gpw))
            binses.append(
                jax.lax.bitcast_convert_type(
                    packed[o3 : o3 + nbp1 * 4].reshape(nbp1, 4), jnp.int32
                )
            )
        plan = (jnp.stack(perms), jnp.stack(groupeds), jnp.stack(binses))
    return _scan_window(
        dense_params, cache_weight,
        (dense_feats, slot_values, labels, sparse_lrs, dense_lrs),
        num_features=num_features, batch_size=batch_size, pooling=pooling,
        mode=mode, compute_dtype=jnp.dtype(compute_dtype_name),
        use_pallas=use_pallas, sparse_grad=sparse_grad, model=model,
        optimizer=optimizer, adagrad_eps=adagrad_eps, cache_accum=cache_accum,
        sr_seed=sr_seed, plan=plan, onehot_plan=onehot_plan,
    )


def _unpack_lengths(packed, a, P, n_bags, len16):
    """Decode the per-bag lengths block of a ragged window; returns
    ((P, n_bags) int32 lengths, end_offset)."""
    if len16:
        end = a + P * n_bags * 2
        u = packed[a:end].astype(jnp.int32).reshape(P, n_bags, 2)
        return u[..., 0] | (u[..., 1] << 8), end
    end = a + P * n_bags
    return packed[a:end].reshape(P, n_bags).astype(jnp.int32), end


@partial(
    jax.jit,
    static_argnames=(
        "layout", "num_features", "batch_size", "mode", "compute_dtype_name",
        "sparse_grad", "model", "optimizer", "adagrad_eps", "adagrad_initial",
    ),
    donate_argnames=("dense_params", "cache_weight", "cache_accum"),
)
def _train_window_ragged(
    dense_params: DLRMParams,
    cache_weight: jnp.ndarray,
    packed: jnp.ndarray,
    sparse_lrs: jnp.ndarray,
    dense_lrs: jnp.ndarray,
    seed: jnp.ndarray,
    cache_accum: jnp.ndarray = None,
    *,
    layout: tuple,  # (P, Vp, B, Din, dense_mode, id_width, sb, fb,
    # fmode, len16) — Vp is the pow2-padded per-step value budget
    num_features: int,
    batch_size: int,
    mode: str,
    compute_dtype_name: str,
    sparse_grad: bool,
    model: str = "dlrm",
    optimizer: str = "sgd",
    adagrad_eps: float = 1e-10,
    adagrad_initial: float = 0.0,
):
    """Fused RAGGED window: variable-pooling batches (the fbgemm-trace
    workload, /root/reference/baselines/data/synth.py:69) padded to a pow2
    per-step value budget and trained as ONE packed transfer + ONE scan
    program, exactly like the uniform path. Lengths ship as u8/u16; offsets
    rebuild on device; pad values fall past the last offset and are dropped
    by the segment sums."""
    P, Vp, B, Din, dmode, id_width, sb, fb, fmode, len16 = layout
    F = num_features
    a = (P * Vp * id_width) // 8
    slot_values = _unpack_flat(packed[:a], P * Vp, id_width).reshape(P, Vp)
    lens, b0 = _unpack_lengths(packed, a, P, F * B, len16)
    dense_feats, b1 = _unpack_dense(packed, b0, P, B, Din, dmode)
    c = b1 + P * B
    labels = packed[b1:c].reshape(P, B).astype(jnp.float32)
    cache_weight, cache_accum = _apply_packed_admits(
        cache_weight, cache_accum, packed, c, layout[:9], seed, optimizer,
        adagrad_initial,
    )
    return _scan_window(
        dense_params, cache_weight,
        (dense_feats, slot_values, lens, labels, sparse_lrs, dense_lrs),
        num_features=F, batch_size=batch_size, pooling=None,
        mode=mode, compute_dtype=jnp.dtype(compute_dtype_name),
        use_pallas=False, sparse_grad=sparse_grad, model=model,
        optimizer=optimizer, adagrad_eps=adagrad_eps, cache_accum=cache_accum,
        ragged=True,
    )


@partial(
    jax.jit,
    static_argnames=(
        "layout", "num_features", "batch_size", "mode", "compute_dtype_name",
        "model", "optimizer", "adagrad_initial",
    ),
    donate_argnames=("cache_weight", "cache_accum"),
)
def _eval_window_ragged(
    dense_params: DLRMParams,
    cache_weight: jnp.ndarray,
    packed: jnp.ndarray,
    seed: jnp.ndarray,
    cache_accum: jnp.ndarray = None,
    *,
    layout: tuple,
    num_features: int,
    batch_size: int,
    mode: str,
    compute_dtype_name: str,
    model: str = "dlrm",
    optimizer: str = "sgd",
    adagrad_initial: float = 0.0,
):
    """Forward-only fused ragged window; returns (cache, accum, (P, B) probs)."""
    compute_dtype = jnp.dtype(compute_dtype_name)
    P, Vp, B, Din, dmode, id_width, sb, fb, fmode, len16 = layout
    F = num_features
    a = (P * Vp * id_width) // 8
    slot_values = _unpack_flat(packed[:a], P * Vp, id_width).reshape(P, Vp)
    lens, b0 = _unpack_lengths(packed, a, P, F * B, len16)
    dense_feats, c = _unpack_dense(packed, b0, P, B, Din, dmode)
    c = c + P * B  # skip labels
    cache_weight, cache_accum = _apply_packed_admits(
        cache_weight, cache_accum, packed, c, layout[:9], seed, optimizer,
        adagrad_initial,
    )

    def score(d, v, ln):
        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(ln).astype(jnp.int32)]
        )
        feats = RaggedFeatures(
            values=v, offsets=offsets, num_features=F, batch_size=batch_size,
            pooling=None,
        )
        sparse_bfd = embedding_bag(cache_weight, feats, mode=mode)
        return _model_probs(model, dense_params, d, sparse_bfd, compute_dtype)

    probs = jax.vmap(score)(dense_feats, slot_values, lens)
    return cache_weight, cache_accum, probs


@partial(
    jax.jit,
    static_argnames=(
        "layout", "num_features", "batch_size", "pooling", "mode",
        "compute_dtype_name", "use_pallas", "model", "optimizer",
        "adagrad_initial",
    ),
    donate_argnames=("cache_weight", "cache_accum"),
)
def _eval_window_packed(
    dense_params: DLRMParams,
    cache_weight: jnp.ndarray,
    packed: jnp.ndarray,
    seed: jnp.ndarray,
    cache_accum: jnp.ndarray = None,
    *,
    layout: tuple,
    num_features: int,
    batch_size: int,
    pooling: int,
    mode: str,
    compute_dtype_name: str,
    use_pallas: bool,
    model: str = "dlrm",
    optimizer: str = "sgd",
    adagrad_initial: float = 0.0,
):
    """Forward-only fused window: same single packed transfer + in-program
    admits as training, scoring P batches in one execute. Returns
    (cache_weight, cache_accum, (P, B) probabilities)."""
    compute_dtype = jnp.dtype(compute_dtype_name)
    P, L, B, Din, dmode, id_width, sb, fb, fmode = layout[:9]
    lbits = layout[9] if len(layout) > 9 else False
    slot_values, a = _decode_window_ids(packed, layout)
    dense_feats, c = _unpack_dense(packed, a, P, B, Din, dmode)
    c = c + ((P * B) // 8 if lbits else P * B)  # skip labels (unused in eval)
    cache_weight, cache_accum = _apply_packed_admits(
        cache_weight, cache_accum, packed, c, layout[:9], seed, optimizer,
        adagrad_initial,
    )

    def score(d, v):
        feats = RaggedFeatures(
            values=v, offsets=None, num_features=num_features,
            batch_size=batch_size, pooling=pooling,
        )
        sparse_bfd = embedding_bag(cache_weight, feats, mode=mode, use_pallas=use_pallas)
        return _model_probs(model, dense_params, d, sparse_bfd, compute_dtype)

    probs = jax.vmap(score)(dense_feats, slot_values)
    return cache_weight, cache_accum, probs


@partial(jax.jit, static_argnames=("mode", "compute_dtype_name", "use_pallas", "model"))
def _eval_step(
    dense_params: DLRMParams,
    cache_weight: jnp.ndarray,
    dense_features: jnp.ndarray,
    slot_features: RaggedFeatures,
    mode: str = "sum",
    compute_dtype_name: str = "float32",
    use_pallas: bool = False,
    model: str = "dlrm",
):
    compute_dtype = jnp.dtype(compute_dtype_name)
    sparse_bfd = embedding_bag(cache_weight, slot_features, mode=mode, use_pallas=use_pallas)
    return _model_probs(model, dense_params, dense_features, sparse_bfd, compute_dtype)


class CachedDLRMTrainer:
    def __init__(
        self,
        cfg: DLRMConfig,
        id_freq_map: Optional[np.ndarray] = None,
        embed_override=None,
        mesh=None,
    ):
        """``mesh``: train over a jax.sharding.Mesh — column-sharded cached
        embedding x data-parallel dense towers, with the SAME packed-window
        pipeline as single-chip (one replicated buffer + batch-sharded
        dense/labels + one fused shard_map execute per window). Numerically
        identical to the single-chip trainer on the same data."""
        self.cfg = cfg
        self.mesh = mesh
        from cachedembedding_tpu.cache.state import EvictionStrategy

        cache_cfg = cfg.cache
        resident = (
            [
                i for i, n in enumerate(cfg.num_embeddings_per_feature)
                if n <= cache_cfg.resident_threshold
            ]
            if cache_cfg.resident_threshold > 0
            else None
        )
        if mesh is not None and embed_override is None:
            from cachedembedding_tpu.parallel.column import (
                ParallelCachedEmbeddingBag,
            )

            embed_override = ParallelCachedEmbeddingBag(
                cfg.total_num_embeddings,
                cfg.embedding_dim,
                mesh=mesh,
                mode=cfg.reduction_mode,
                cache_ratio=cache_cfg.cache_ratio,
                ids_freq_mapping=id_freq_map if cache_cfg.use_freq else None,
                warmup_ratio=cache_cfg.warmup_ratio,
                buffer_size=cache_cfg.buffer_size,
                evict_strategy=(
                    EvictionStrategy.LFU if cache_cfg.use_lfu_eviction else (
                        EvictionStrategy.DATASET
                        if (cache_cfg.use_freq and id_freq_map is not None)
                        else EvictionStrategy.LFU
                    )
                ),
                table_sizes=cfg.num_embeddings_per_feature,
                seed=cfg.seed,
                dtype=jnp.dtype(cache_cfg.cache_dtype),
                approx_evict=cache_cfg.approx_evict,
                planner=cache_cfg.planner,
                optimizer=cfg.embedding_optimizer,
                adagrad_initial=cfg.adagrad_initial,
                weight_init=cache_cfg.weight_init,
                transfer_dtype=cache_cfg.transfer_dtype,
                resident_tables=resident,
            )
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
            dtype=jnp.dtype(cache_cfg.cache_dtype),
            approx_evict=cache_cfg.approx_evict,
            planner=cache_cfg.planner,
            optimizer=cfg.embedding_optimizer,
            adagrad_initial=cfg.adagrad_initial,
            use_pallas_lookup=cache_cfg.use_pallas_lookup,
            weight_init=cache_cfg.weight_init,
            transfer_dtype=cache_cfg.transfer_dtype,
            resident_tables=resident,
        )
        # int seed, not a device PRNGKey: dense init is host-side numpy and a
        # device key readback would sync on the whole async cache init
        key = cfg.seed
        if cfg.model == "deepfm":
            self.dense_params = init_deepfm(
                key,
                cfg.embedding_dim,
                cfg.num_sparse_features,
                cfg.dense_in_features,
                hidden_layer_size=cfg.dense_arch_layer_sizes[0],
                deep_fm_dimension=cfg.deep_fm_dimension,
            )
        else:
            self.dense_params = init_dlrm_dense(
                key,
                cfg.embedding_dim,
                cfg.num_sparse_features,
                cfg.dense_in_features,
                cfg.dense_arch_layer_sizes,
                cfg.over_arch_layer_sizes,
            )
        # Mesh-mode losses are psum'd GLOBAL means, so the dense LR needs no
        # world-size scaling (the reference scales LR to compensate for
        # local-mean grads, /root/reference/recsys/dlrm_main.py:455-461 —
        # same effective update either way).
        self._ship_plan = bool(getattr(cache_cfg, "ship_sort_perm", False))
        # interaction implementation switch (module-level: the model fns are
        # pure and traced inside jit; see models/dlrm.py INTERACTION_IMPL)
        import cachedembedding_tpu.models.dlrm as _dlrm_mod

        _dlrm_mod.INTERACTION_IMPL = getattr(cfg, "interaction_impl", "bmm")
        srm = cache_cfg.stochastic_rounding
        # fp8 rows stagnate under deterministic rounding at small LRs; the
        # fused-window dense-grad path rounds stochastically (ops/rounding.py)
        self._sr = srm == "on" or (
            srm == "auto" and str(cache_cfg.cache_dtype).startswith("float8")
        )
        self.data_parallel_size = 1 if mesh is not None else int(np.prod(cfg.mesh_shape))
        self._step_idx = 0
        # Static small-resident-table one-hot backward plan (see
        # _scan_window / CachedEmbeddingBag.onehot_backward_plan); empty for
        # embeds without a mixed-kernel resident split.
        _ohp = getattr(self.embed, "onehot_backward_plan", None)
        _ohmax = int(getattr(cache_cfg, "onehot_max_rows", 2048))
        self._onehot_plan = _ohp(_ohmax) if callable(_ohp) else ()
        self._lr_cache: dict = {}
        self._mesh_steps: dict = {}
        # Escape-coded id wire format (see _escape_encode): learned from the
        # live stream during the first _esc_learn_windows windows, then frozen
        # so the jit layout stays stable.
        self._escape_pack = bool(getattr(cache_cfg, "escape_pack", True))
        self._esc_learn_windows = 12
        self._esc_seen = 0
        self._esc_counts = None   # (F, n_widths) counts of subsampled ids >= 2^w
        self._esc_totals = 0      # subsampled ids per feature accumulated
        self._esc_spec = None     # frozen ("esc", ((w, delta), ...), ne)
        # Rank-tier id wire (config id_wire="ranktier"; see _tier_encode):
        self._id_wire = str(getattr(cache_cfg, "id_wire", "escape"))
        if self._id_wire == "plain":
            self._escape_pack = False
        self._rt_seen = 0
        self._rt_stats = None     # per-feature symbol-magnitude histograms
        self._rt_spec = None      # frozen per-feature ("p", ...) / ("t", ...)
        self._rt_caps_cache = {}  # n -> per-feature caps (native encoder)
        self._rt_encoders = {}    # n -> hostops.RankTierEncoder (native state)
        self._rt_enc_windows = 0

    # ------------------------------------------------------------------
    def _lrs(self, progress: float) -> tuple[float, float]:
        cfg = self.cfg
        lr = cfg.learning_rate
        if cfg.change_lr and progress >= cfg.lr_change_point:
            lr = cfg.lr_after
        return lr, lr * self.data_parallel_size

    def _device_rows(self) -> int:
        """Row count of the device embedding array (cache slots + mixed-kernel
        resident region) — the id range for pack-width and grad heuristics."""
        return int(getattr(self.embed, "device_rows", self.embed.capacity))

    # -- escape-coded id wire format ----------------------------------------
    # Hot-ranked ids are small: freq-warmup puts the hottest rows in the low
    # cache slots and the synthetic/real long-tail streams hit the head almost
    # always, so a 20-bit feature's ids fit 12 bits ~97% of the time. Shipping
    # per-feature BASE blocks at a learned narrow width plus one window-level
    # list of (flat position, full address) pairs for the overflows cuts the
    # dominant id wire by another ~20-30% on top of per-feature widths.
    _ESC_WIDTHS = (4, 8, 12, 16, 20, 24)
    _ESC_SUB = 8          # learning subsample stride (stats only)
    _ESC_MAX_RATE = 0.05  # never narrow a feature past 5% overflow
    _ESC_BITS = 64        # wire cost of one escape entry (u32 pos + u32 val)

    def _escape_encode(self, slot3: np.ndarray, spec, P: int, L: int, Bf: int):
        """Encode the per-feature id blocks of one window. Returns
        (ids_bytes, id_width_layout, expected_nbytes). While learning (first
        _esc_learn_windows windows) and whenever the escape budget would
        overflow, falls back to the plain per-feature-width format — both
        layouts get compiled during warmup, so a rare fallback never triggers
        a mid-run compile."""
        from cachedembedding_tpu._native import hostops

        n = P * Bf
        if self._escape_pack and self._esc_spec is None:
            sub = slot3[:, :, :: self._ESC_SUB]
            F = len(spec)
            if self._esc_counts is None:
                self._esc_counts = np.zeros((F, len(self._ESC_WIDTHS)), np.int64)
            for f, (w, delta) in enumerate(spec):
                local = sub[:, f, :].reshape(-1)
                if delta:
                    local = local - delta
                for k, wc in enumerate(self._ESC_WIDTHS):
                    if wc >= w:
                        break
                    self._esc_counts[f, k] += int((local >= (1 << wc)).sum())
            self._esc_totals += sub.shape[0] * sub.shape[2]
            self._esc_seen += 1
            if self._esc_seen >= self._esc_learn_windows:
                self._freeze_escape_spec(spec, n, Bf)
        if self._esc_spec:
            out = self._try_escape_encode(slot3, P, L, Bf)
            if out is not None:
                return out
        ws = np.array([w for w, _ in spec], np.int32)
        ds = np.array([d for _, d in spec], np.int32)
        res = hostops.escape_pack_window(slot3, ws, ws, ds, 0)
        if res is not None and res is not False:
            return res[0], spec, sum((n * w) // 8 for w, _ in spec)
        blocks = []
        for f, (w, delta) in enumerate(spec):
            v = slot3[:, f, :]
            blocks.append(hostops.pack_ids_any(v - delta if delta else v, w))
        return np.concatenate(blocks), spec, sum((n * w) // 8 for w, _ in spec)

    def _freeze_escape_spec(self, plain_spec, n: int, Bf: int) -> None:
        """Pick each feature's base width minimizing expected bits/id
        (base width + overflow_rate * escape entry bits), then freeze the
        layout. Sets _esc_spec to False when nothing narrows."""
        tot = max(self._esc_totals, 1)
        spec = []
        exp_escapes = 0.0
        # odd-nibble widths (4/12/20) pack element PAIRS: legal only when Bf
        # is even, so every window's n = P*Bf stays even for ANY P (a final
        # short window may have odd P) — mirrors hostops.nibble_width's guard
        pairs_ok = Bf % 2 == 0
        for f, (w, delta) in enumerate(plain_spec):
            best_w, best_cost = w, float(w)
            for k, wc in enumerate(self._ESC_WIDTHS):
                if wc >= w:
                    break
                if wc % 8 and not pairs_ok:
                    continue
                rate = self._esc_counts[f, k] / tot
                cost = wc + rate * self._ESC_BITS
                if rate <= self._ESC_MAX_RATE and cost < best_cost:
                    best_w, best_cost = wc, cost
            if best_w < w:
                k = self._ESC_WIDTHS.index(best_w)
                exp_escapes += self._esc_counts[f, k] / tot * n
            spec.append((best_w, delta))
        if all(w == pw for (w, _), (pw, _) in zip(spec, plain_spec)):
            self._esc_spec = False
            return
        ne = int(2.0 * exp_escapes) + 512
        self._esc_plain_spec = tuple(plain_spec)
        self._esc_spec = ("esc", tuple(spec), ne)

    def _try_escape_encode(self, slot3: np.ndarray, P: int, L: int, Bf: int):
        """Escape-format encode; None when the window's overflow count
        exceeds the frozen budget (caller falls back to the plain format)."""
        from cachedembedding_tpu._native import hostops

        tag, spec, ne = self._esc_spec
        n = P * Bf
        res = hostops.escape_pack_window(
            slot3,
            np.array([w for w, _ in spec], np.int32),
            np.array([w for w, _ in self._esc_plain_spec], np.int32),
            np.array([d for _, d in spec], np.int32),
            ne,
        )
        if res is False:
            return None  # over the frozen escape budget -> plain format
        if res is not None:
            packed, epos, eval_ = res
            count = epos.shape[0]
            pos = np.full((ne,), P * L, np.uint32)
            val = np.zeros((ne,), np.int32)
            pos[:count] = epos
            val[:count] = eval_
            expect = sum((n * w) // 8 for w, _ in spec) + 8 * ne
            return (
                np.concatenate([packed, pos.view(np.uint8), val.view(np.uint8)]),
                self._esc_spec,
                expect,
            )
        blocks = []
        pos_parts, val_parts = [], []
        count = 0
        for f, ((w, delta), (wp, _)) in enumerate(
            zip(spec, self._esc_plain_spec)
        ):
            v = slot3[:, f, :]
            local = (v - delta) if delta else v
            if w < wp:
                lim = 1 << w
                over = local >= lim
                cnt = int(over.sum())
                if cnt:
                    count += cnt
                    if count > ne:
                        return None
                    pp, jj = np.nonzero(over)
                    pos_parts.append(
                        (pp.astype(np.int64) * L + f * Bf + jj).astype(np.uint32)
                    )
                    val_parts.append(np.ascontiguousarray(v[pp, jj], np.int32))
                    local = local & (lim - 1)
            blocks.append(hostops.pack_ids_any(local, w))
        pos = np.full((ne,), P * L, np.uint32)
        val = np.zeros((ne,), np.int32)
        if count:
            pos[:count] = np.concatenate(pos_parts)
            val[:count] = np.concatenate(val_parts)
        blocks += [pos.view(np.uint8), val.view(np.uint8)]
        expect = sum((n * w) // 8 for w, _ in spec) + 8 * ne
        return np.concatenate(blocks), self._esc_spec, expect

    # ---- rank-tier id wire (config id_wire="ranktier") -------------------
    # Per-feature 2-bit tier selector + 4 packed substreams; cached features
    # are remapped through a per-window top-K dictionary so the wire carries
    # frequency RANKS. The stream is head-heavy (top-64 slots carry ~88%,
    # benchmark/wire_entropy.py), so ranks/local-ids compress to ~6-8 bits/id
    # vs the escape format's 9.9. Device decode: selector unpack -> one-hot
    # cumsum -> single merge gather (+ dict gather for cached features) —
    # see _decode_window_ids. Small features where tiers don't pay keep the
    # escape-narrowed plain encoding inside the same window format.
    _RT_WIDTHS = (4, 8, 12, 16)
    _RT_SKIP_WINDOWS = 12     # coldest windows: distributions unrepresentative
    _RT_LEARN_WINDOWS = 24    # accumulate stats over windows 13..24, freeze
    _RT_CAP_MARGIN = 1.06     # cap padding is REAL wire: keep it tight and
    _RT_T3_MARGIN = 1.5       # let the plain fallback absorb rare overflows
    _RT_FALLBACK_RESET = 4    # consecutive cap-overflow fallbacks -> relearn
    _RT_DICT_W = 12           # dict rank width during learning (1<<12 entries)
    _RT_REBUILD = 8           # native encoder: re-rank dictionaries every
    # this many windows (a stale dict decodes exactly — it ships per window —
    # and amortizing the ranking pass keeps the one-core host off the
    # critical path; drift is guarded by the frozen caps)

    def _rt_dict_features(self, F: int) -> list:
        """Which features get the per-window dictionary: cached ones (their
        slot ids are arbitrary in [0, capacity)); resident locals are already
        rank-like. All-cached bags dict every feature."""
        isres = getattr(self.embed, "_is_res_table", None)
        if isres is not None:
            return [not bool(isres[f]) for f in range(F)]
        return [isinstance(self.embed, CachedEmbeddingBag)] * F

    @staticmethod
    def _rt_rank_sym(vals: np.ndarray, dict_k: int):
        """In-window rank symbols: sym[i] = frequency rank (hot -> 0) of
        vals[i] among the window's top dict_k-1 values, -1 otherwise;
        also returns the (dict_k,) i32 rank -> value table."""
        uniq, inv, cnt = np.unique(vals, return_inverse=True, return_counts=True)
        k = min(dict_k - 1, uniq.size)
        if uniq.size > k:
            part = np.argpartition(cnt, uniq.size - k)[-k:]
            order = part[np.argsort(-cnt[part], kind="stable")]
        else:
            order = np.argsort(-cnt, kind="stable")
        rank_of_uniq = np.full(uniq.size, -1, np.int64)
        rank_of_uniq[order] = np.arange(order.size)
        sym = rank_of_uniq[inv]
        dv = np.zeros((dict_k,), np.int32)
        dv[: order.size] = uniq[order]
        return sym, dv

    def _tier_learn(self, slot3: np.ndarray, spec, P: int, Bf: int) -> None:
        F = len(spec)
        if self._rt_stats is None:
            self._rt_stats = {
                "ge": np.zeros((F, len(self._RT_WIDTHS)), np.int64),
                "t3": np.zeros((F,), np.int64),
                "n": 0,
            }
        dictf = self._rt_dict_features(F)
        st = self._rt_stats
        for f, (w, delta) in enumerate(spec):
            vals = slot3[:, f, :].reshape(-1)
            if dictf[f] and w > 4:
                sym, _ = self._rt_rank_sym(vals, 1 << self._RT_DICT_W)
                st["t3"][f] += int((sym < 0).sum())
                sym = sym[sym >= 0]
            else:
                sym = (vals - delta) if delta else vals
            for k, wc in enumerate(self._RT_WIDTHS):
                if wc >= w:
                    break
                st["ge"][f, k] += int((sym >= (1 << wc)).sum())
        st["n"] += P * Bf
        self._rt_seen += 1
        if self._rt_seen >= self._RT_LEARN_WINDOWS - self._RT_SKIP_WINDOWS:
            self._tier_freeze(spec)

    def _tier_freeze(self, spec) -> None:
        """Per feature, pick the cheaper of tier coding and escape-narrowed
        plain (both costed from the learned histograms); freeze fractions so
        per-window caps scale with P. Sets _rt_spec to False if nothing
        improves on the plain widths."""
        st = self._rt_stats
        n_tot = max(st["n"], 1)
        dictf = self._rt_dict_features(len(spec))
        WS = self._RT_WIDTHS
        entries = []
        exp_escapes = 0.0
        any_win = False
        for f, (w, delta) in enumerate(spec):
            ge = st["ge"][f] / n_tot          # P(sym >= 2^w), over ALL ids
            t3_dict = st["t3"][f] / n_tot     # dict misses (dict features)
            use_dict = dictf[f] and w > 4
            p_ge = {wc: (ge[k] if wc < w else 0.0) for k, wc in enumerate(WS)}
            # escape-narrowed plain cost (the existing format's rule). For
            # dict features the learned histogram is over RANKS, not raw
            # values, so escape costing is skipped (plain cost = w) — escape
            # was weakest exactly there (arbitrary slot values).
            esc_w, esc_cost = w, float(w)
            for k, wc in enumerate(WS):
                if wc >= w or use_dict:
                    break
                rate = ge[k]
                if rate <= self._ESC_MAX_RATE and wc + rate * self._ESC_BITS < esc_cost:
                    esc_w, esc_cost = wc, wc + rate * self._ESC_BITS
            # tier cost: selector 2 + share-weighted widths + dict wire.
            # 1-3 real sub-widths; unused tier slots are padded with the
            # plain width w (their share is 0 by construction, so they cost
            # nothing and the encoder's thresholds make them unreachable).
            from itertools import combinations

            best = None
            cand = [
                wc for wc in WS
                if wc < w and (not use_dict or wc <= self._RT_DICT_W)
            ]
            pge = lambda wc: p_ge[wc] if wc < w else 0.0
            n_win = n_tot / max(self._rt_seen, 1)
            for r in (1, 2, 3):
                for combo in combinations(cand, r):
                    widths = tuple(combo) + (w,) * (3 - r)
                    if use_dict:
                        # the frozen dict holds 2^w_last - 1 entries: ranks
                        # beyond it are UNRANKED at run time (raw tier 3),
                        # even though learning ranked up to 2^_RT_DICT_W
                        wl = widths[r - 1]
                        s = (
                            1.0 - t3_dict - pge(widths[0]),
                            (pge(widths[0]) - pge(widths[1])) if r >= 2 else 0.0,
                            (pge(widths[1]) - pge(widths[2])) if r >= 3 else 0.0,
                            t3_dict + pge(wl),
                        )
                    else:
                        # values above the last real width land in the first
                        # PAD tier at the plain width (encoder thresholds),
                        # which the pge(pad)=0 convention prices correctly
                        s = (
                            1.0 - pge(widths[0]),
                            pge(widths[0]) - pge(widths[1]),
                            pge(widths[1]) - pge(widths[2]),
                            pge(widths[2]),
                        )
                    cost = 2.0 + sum(
                        sk * wk for sk, wk in zip(s[:3], widths)
                    ) + s[3] * w
                    if use_dict:
                        cost += 32.0 * (1 << widths[r - 1]) / n_win
                    if best is None or cost < best[0]:
                        dict_k = (1 << widths[r - 1]) if use_dict else 0
                        best = (cost, widths + (w,), s, dict_k)
            if best is not None and best[0] < min(esc_cost, w) - 0.25:
                _, widths, shares, dict_k = best
                entries.append(("t", widths, delta, shares, dict_k))
                any_win = True
            elif esc_w < w:
                entries.append(("p", esc_w, delta, w))
                exp_escapes += p_ge[esc_w]
                any_win = True
            else:
                entries.append(("p", w, delta, w))
        if not any_win:
            self._rt_spec = False
            return
        self._rt_ne = int(2.0 * exp_escapes * (n_tot / self._rt_seen)) + 512
        self._rt_spec = tuple(entries)
        self._rt_caps_cache = {}
        self._rt_encoders = {}

    @staticmethod
    def _rt_cap(share: float, n: int, margin: float = None) -> int:
        m = CachedDLRMTrainer._RT_CAP_MARGIN if margin is None else margin
        c = int(np.ceil(share * n * m)) + 256
        c = min(c + (c % 2), n + (n % 2))
        return c

    def _tier_encode_native(self, slot3, P: int, L: int, n: int, ne: int, plain):
        """One-call C++ steady-state rank-tier encode
        (hostops.RankTierEncoder). Returns the (bytes, layout, nbytes)
        triple, or None when the native lib is absent (caller runs the numpy
        encoder). The numpy path costs ~220 ms per headline window (np.unique
        sorts 131k values per dict feature) — far over the ~115 ms device
        budget on this one-core host — so the native encoder is what makes
        ranktier defaultable. Rank dictionaries persist in the C++ state and
        rebuild every _RT_REBUILD windows (the dict ships per window, so a
        stale dict decodes exactly; drift is guarded by the frozen caps).
        Dict rank tie-breaks may differ from numpy; the decode is invariant."""
        from cachedembedding_tpu._native import hostops

        # caps and encoder state are functions of the frozen spec: invalidate
        # both whenever the spec object changes (freeze, relearn, or a test
        # poking _rt_spec directly)
        if getattr(self, "_rt_caps_spec", None) is not self._rt_spec:
            self._rt_caps_cache = {}
            self._rt_encoders = {}
            self._rt_caps_spec = self._rt_spec
        caps_pf = self._rt_caps_cache.get(n)
        if caps_pf is None:
            caps_pf = []
            for ent in self._rt_spec:
                if ent[0] == "t":
                    shares = ent[3]
                    caps_pf.append(tuple(
                        self._rt_cap(
                            s, n, self._RT_T3_MARGIN if k == 3 else None
                        )
                        for k, s in enumerate(shares)
                    ))
                else:
                    caps_pf.append((0, 0, 0, 0))
            self._rt_caps_cache[n] = caps_pf
        enc = self._rt_encoders.get(n)
        if enc is None:
            enc = hostops.make_ranktier_encoder(
                self._rt_spec, caps_pf, self._device_rows()
            )
            if enc is None:
                return None
            self._rt_encoders[n] = enc
            enc._needs_rebuild = True  # fresh state: dictionaries are empty
        rebuild = enc._needs_rebuild or (
            self._rt_enc_windows % self._RT_REBUILD == 0
        )
        enc._needs_rebuild = False
        self._rt_enc_windows += 1
        res = enc.encode(slot3, ne, rebuild)
        if res == "esc_overflow":
            return plain()
        if isinstance(res, tuple) and isinstance(res[0], str):  # "overflow"
            _, f, cnts, caps = res
            self._rt_overflows = getattr(self, "_rt_overflows", 0) + 1
            self._rt_overflow_info = (f, cnts, caps)
            if self._rt_overflows >= self._RT_FALLBACK_RESET:
                self._rt_spec = None
                self._rt_stats = None
                self._rt_seen = 0
                self._rt_skip = self._RT_SKIP_WINDOWS  # already warm
                self._rt_overflows = 0
                self._rt_caps_cache = {}
                self._rt_encoders = {}
            return plain()
        self._rt_overflows = 0
        fblocks, opos, oval = res
        entries_out = tuple(
            ("p", ent[1], ent[2]) if ent[0] == "p"
            else ("t", ent[1], ent[2], caps_pf[f], ent[4])
            for f, ent in enumerate(self._rt_spec)
        )
        pos = np.full((ne,), P * L, np.uint32)
        val = np.zeros((ne,), np.int32)
        if opos.size:
            pos[: opos.size] = opos
            val[: oval.size] = oval
        out = np.concatenate(
            [fblocks, pos.view(np.uint8), val.view(np.uint8)]
        )
        return out, ("rt", entries_out, ne), out.nbytes

    def _tier_encode(self, slot3: np.ndarray, spec, P: int, L: int, Bf: int):
        """Rank-tier window encode. Returns (bytes, layout_spec, nbytes);
        ships the plain per-feature format while learning, after a freeze
        with no winners, or when a window overflows its frozen caps."""
        from cachedembedding_tpu._native import hostops

        n = P * Bf
        if self._rt_spec is None and n % 4 == 0:
            self._rt_skip = getattr(self, "_rt_skip", 0) + 1
            if self._rt_skip > self._RT_SKIP_WINDOWS:
                self._tier_learn(slot3, spec, P, Bf)

        def plain():
            ws = np.array([w for w, _ in spec], np.int32)
            ds = np.array([d for _, d in spec], np.int32)
            res = hostops.escape_pack_window(slot3, ws, ws, ds, 0)
            nb = sum((n * w) // 8 for w, _ in spec)
            if res is not None and res is not False:
                return res[0], tuple(spec), nb
            blocks = [
                hostops.pack_ids_any(
                    slot3[:, f, :] - d if d else slot3[:, f, :], w
                )
                for f, (w, d) in enumerate(spec)
            ]
            return np.concatenate(blocks), tuple(spec), nb

        if not self._rt_spec or n % 4:
            return plain()

        ne = self._rt_ne
        native = self._tier_encode_native(slot3, P, L, n, ne, plain)
        if native is not None:
            return native
        entries_out = []
        blocks = []
        pos_parts, val_parts = [], []
        esc_count = 0
        for f, ent in enumerate(self._rt_spec):
            vals = np.ascontiguousarray(slot3[:, f, :]).reshape(-1)
            if ent[0] == "p":
                _, w, delta, wp = ent
                local = (vals - delta) if delta else vals
                if w < wp:
                    lim = 1 << w
                    over = local >= lim
                    cnt = int(over.sum())
                    if cnt:
                        esc_count += cnt
                        if esc_count > ne:
                            return plain()
                        (pp,) = np.nonzero(over)
                        pos_parts.append(
                            ((pp // Bf) * L + f * Bf + (pp % Bf)).astype(np.uint32)
                        )
                        val_parts.append(
                            np.ascontiguousarray(vals[pp], np.int32)
                        )
                        local = local & (lim - 1)
                entries_out.append(("p", w, delta))
                blocks.append(hostops.pack_ids_any(local, w))
                continue
            _, (w0, w1, w2, w3), delta, shares, dict_k = ent
            if dict_k:
                sym, dv = self._rt_rank_sym(vals, dict_k)
                sym3 = (vals - delta) if delta else vals
                tier = np.digitize(sym, [1 << w0, 1 << w1]).astype(np.int8)
                tier[sym < 0] = 3
            else:
                sym = (vals - delta) if delta else vals
                sym3 = sym
                tier = np.digitize(
                    sym, [1 << w0, 1 << w1, 1 << w2]
                ).astype(np.int8)
            caps = tuple(
                self._rt_cap(
                    s, n, self._RT_T3_MARGIN if k == 3 else None
                )
                for k, s in enumerate(shares)
            )
            cnts = np.bincount(tier, minlength=4)
            if any(int(cnts[k]) > caps[k] for k in range(4)):
                # drift: the frozen shares no longer describe the stream.
                # Ship plain; after _RT_FALLBACK_RESET consecutive overflows
                # drop the spec and relearn from the live stream.
                self._rt_overflows = getattr(self, "_rt_overflows", 0) + 1
                self._rt_overflow_info = (
                    f, [int(x) for x in cnts], tuple(caps)
                )
                if self._rt_overflows >= self._RT_FALLBACK_RESET:
                    self._rt_spec = None
                    self._rt_stats = None
                    self._rt_seen = 0
                    self._rt_skip = self._RT_SKIP_WINDOWS  # already warm
                    self._rt_overflows = 0
                    self._rt_caps_cache = {}
                    self._rt_encoders = {}
                return plain()
            self._rt_overflows = 0
            t8 = tier.astype(np.uint8)
            sel = (
                t8[0::4] | (t8[1::4] << 2) | (t8[2::4] << 4) | (t8[3::4] << 6)
            )
            blocks.append(sel)
            if dict_k:
                blocks.append(dv.view(np.uint8))
            for k, wk in enumerate((w0, w1, w2, w3)):
                s = sym3[tier == 3] if k == 3 else sym[tier == k]
                padded = np.zeros((caps[k],), np.int64)
                padded[: s.size] = s
                blocks.append(hostops.pack_ids_any(padded.astype(np.int32), wk))
            entries_out.append(("t", (w0, w1, w2, w3), delta, caps, dict_k))
        pos = np.full((ne,), P * L, np.uint32)
        val = np.zeros((ne,), np.int32)
        if esc_count:
            pos[:esc_count] = np.concatenate(pos_parts)
            val[:esc_count] = np.concatenate(val_parts)
        blocks += [pos.view(np.uint8), val.view(np.uint8)]
        out = np.concatenate(blocks)
        return out, ("rt", tuple(entries_out), ne), out.nbytes

    def _begin_window(self, batches: List[Batch]):
        """Plan the window's cache maintenance (host directory / device state
        machine; no row movement yet). Returns (pw, window_input):
          * uniform-pooling windows: window_input is the (P, L) device slot-id
            array consumed whole by the fused window step;
          * ragged windows: a per-batch list of slot-space RaggedFeatures for
            the per-step fallback path."""
        vals = [np.asarray(b.sparse_features.values) for b in batches]
        f0 = batches[0].sparse_features
        uniform = (
            f0.pooling is not None
            and all(
                b.sparse_features.pooling == f0.pooling
                and b.sparse_features.offsets is None
                and b.sparse_features.num_features == f0.num_features
                and b.sparse_features.batch_size == f0.batch_size
                for b in batches
            )
            and len({v.shape[0] for v in vals}) == 1
        )
        all_ids = np.concatenate(vals).astype(np.int32)
        if uniform:
            P, L = len(batches), vals[0].shape[0]
            staged = (
                isinstance(self.embed, CachedEmbeddingBag)
                and self.embed._dir is not None
            )
            if staged:
                ws = self.embed.begin_window_staging(
                    all_ids, (P, L),
                    uniform_fbp=(P, f0.num_features, L // f0.num_features),
                )
                slot_ids_np, extras = ws.slot_ids, ws
            else:
                pw = self.embed.begin_prepare(
                    all_ids, out_shape=(P, L), device_put=False
                )
                if not isinstance(pw.slot_ids, np.ndarray):
                    return pw, pw.slot_ids
                slot_ids_np, extras = pw.slot_ids, None
            # Pack the whole window's inputs — and, in the staged case, its
            # admits — into ONE host->device transfer (_train_window_packed).
            # Mesh mode ships dense/labels as SEPARATE batch-sharded arrays
            # (they are per-rank data) and packs only ids + admits replicated.
            B, Din = f0.batch_size, self.cfg.dense_in_features
            dmode = self.cfg.dense_input_dtype
            if self.mesh is not None:
                # Mesh mode ships dense as a separate batch-sharded array;
                # int4's nibble pairing doesn't survive the batch-axis shard,
                # so the mesh wire floors at int8 (ICI/DCN links make the
                # difference immaterial there).
                if dmode == "int4":
                    dmode = "int8"
                dense = labels = dense_meta = None
            elif dmode == "int4":
                dense, dense_meta = _quant_dense_window4(batches)
            elif dmode == "int8":
                dense, dense_meta = _quant_dense_window(batches)
            else:
                ddt = ml_dtypes.bfloat16 if dmode == "bfloat16" else np.float32
                dense = np.stack([np.asarray(b.dense_features, ddt) for b in batches])
                dense_meta = None
            lbits = False
            if self.mesh is None:
                labels = np.stack(
                    [np.asarray(b.labels).astype(np.uint8) for b in batches]
                )
                if labels.size % 8 == 0 and labels.max(initial=0) <= 1:
                    # binary labels ship at 1 bit each (little-endian bit order)
                    labels = np.packbits(labels.reshape(-1), bitorder="little")
                    lbits = True
            from cachedembedding_tpu._native import hostops

            F = f0.num_features
            spec = None
            if L % F == 0:
                # Mixed-kernel per-feature wire format: each feature's block
                # at its own width (resident raw ids are much narrower than
                # slot ids), device adds the static address delta.
                spec = getattr(self.embed, "pf_pack_spec", lambda n: None)(
                    P * (L // F)
                )
                if spec is None and self._escape_pack and isinstance(
                    self.embed, CachedEmbeddingBag
                ):
                    # All-cached bags have no per-feature width variation, but
                    # their hot-ranked slot ids are still small — synthesize a
                    # uniform spec so the escape format applies to them too.
                    w = hostops.nibble_width(self._device_rows(), P * (L // F))
                    spec = tuple((w, 0) for _ in range(F))
            if spec is not None:
                Bf = L // F
                slot3 = slot_ids_np.reshape(P, F, Bf)
                if self._id_wire == "ranktier":
                    ids_bytes, id_width, expect = self._tier_encode(
                        slot3, spec, P, L, Bf
                    )
                else:
                    ids_bytes, id_width, expect = self._escape_encode(
                        slot3, spec, P, L, Bf
                    )
            else:
                # Gate the pack width on L (the per-step id count), not P*L:
                # 20-bit packing pairs ids over the flat stream, and the device
                # unpack decodes (P, L//2, 5) per-row blocks — identical only
                # when L itself is even.
                id_width = hostops.id_pack_width(self._device_rows(), L)
                ids_bytes = (
                    slot_ids_np.reshape(-1).view(np.uint8)
                    if id_width == 32
                    else hostops.pack_ids(slot_ids_np, id_width)
                )
                expect = P * {16: 2 * L, 20: 5 * (L // 2), 24: 3 * L, 32: 4 * L}[id_width]
            assert ids_bytes.nbytes == expect, (
                f"packed id block {ids_bytes.nbytes}B != layout {expect}B "
                f"(P={P}, L={L}, width={id_width})"
            )
            parts = [ids_bytes]
            if self.mesh is None:
                if dense_meta is not None:
                    parts.append(dense_meta.view(np.uint8))
                parts += [
                    np.ascontiguousarray(dense).reshape(-1).view(np.uint8),
                    labels.reshape(-1),
                ]
            sb = fb = 0
            fmode = "float32"
            if extras is not None:
                sb = int(extras.synth_slots.shape[0])
                fb = int(extras.fetch_slots.shape[0])
                fmode = _fetch_mode(extras.fetch_payload)
                if sb:
                    parts += [
                        extras.synth_slots.view(np.uint8),
                        extras.synth_rows.view(np.uint8),
                        extras.synth_bounds.view(np.uint8),
                    ]
                if fb:
                    parts += [
                        extras.fetch_slots.view(np.uint8),
                        np.ascontiguousarray(extras.fetch_payload).reshape(-1).view(np.uint8),
                    ]
                    if fmode in ("int8", "int4"):
                        parts.append(extras.fetch_scales.view(np.uint8))
                    if getattr(self.embed, "cache_accum", None) is not None:
                        acc = np.zeros((fb,), np.float32)
                        acc[: extras.fetch_accum.shape[0]] = extras.fetch_accum
                        parts.append(acc.view(np.uint8))
            spw = gpw = nbp1 = 0
            if (
                getattr(self, "_ship_plan", False)
                and not getattr(self, "_plan_suspended", False)
                and self.mesh is None
                and f0.pooling is not None
            ):
                # Bin-grouping plans for the Pallas binned MXU scatter-add
                # backward (ops/binned_scatter.py): per iteration, a grouping
                # permutation + grouped ids + bin element offsets. ~2x the id
                # block of extra wire; pays for itself when the link is fast
                # (config ship_sort_perm).
                NR = self._device_rows()
                nbp1 = -(-NR // 512) + 1  # kernel block_rows (sweet spot:
                # onehot tile 512x2048 bf16 = 2 MB VMEM, ~460 visits)
                spw = hostops.nibble_width(L, L)
                gpw = hostops.nibble_width(NR, L)
                for p_i in range(P):
                    perm, grouped, bins = hostops.sort_plan(
                        slot_ids_np[p_i], NR, 512
                    )
                    parts += [
                        hostops.pack_ids_any(perm, spw),
                        hostops.pack_ids_any(grouped, gpw),
                        bins.view(np.uint8),
                    ]
            layout = (
                P, L, B, Din, dmode, id_width, sb, fb, fmode, lbits,
                spw, gpw, nbp1,
            )
            pw_out = extras if extras is not None else pw
            if self.mesh is not None:
                from jax.sharding import PartitionSpec as PS

                from cachedembedding_tpu.parallel.mesh import AXIS
                from cachedembedding_tpu.parallel.multiproc import (
                    put_addressable,
                )

                # put_addressable, not device_put: multi-process device_put
                # of a host value allgathers the FULL value across processes
                # as an equality check (jax dispatch.py) — a per-window DCN
                # tax on pods. Values here are deterministic per process.
                rep, shd = PS(), PS(None, AXIS)  # batch axis 1
                if dmode == "int8":
                    # same range-scaled uint8 wire as the single-chip packed
                    # path; the (scale, lo) meta rides the TAIL of the
                    # replicated packed buffer (no extra per-window put) and
                    # the mesh step dequantizes per element.
                    dense_np, dmeta_np = _quant_dense_window(batches)
                    parts = parts + [dmeta_np.view(np.uint8)]
                else:
                    ddt = np.float32 if dmode == "float32" else ml_dtypes.bfloat16
                    dense_np = np.stack(
                        [np.asarray(b.dense_features, ddt) for b in batches]
                    )
                buf_dev = put_addressable(self.mesh, np.concatenate(parts), rep)
                dense_dev = put_addressable(self.mesh, dense_np, shd)
                labels_dev = put_addressable(
                    self.mesh,
                    np.stack(
                        [np.asarray(b.labels, np.float32) for b in batches]
                    ),
                    shd,
                )
                return pw_out, ("mesh", buf_dev, layout, dense_dev, labels_dev)
            buf_dev = jax.device_put(np.concatenate(parts))
            return pw_out, ("packed", buf_dev, layout)
        if self.mesh is not None:
            raise NotImplementedError(
                "mesh-windowed training requires uniform pooling (Criteo/Avazu "
                "shapes); ragged batches run via the per-batch hybrid path"
            )
        same_fb = all(
            b.sparse_features.num_features == f0.num_features
            and b.sparse_features.batch_size == f0.batch_size
            for b in batches
        )
        if (
            same_fb
            and isinstance(self.embed, CachedEmbeddingBag)
            and self.embed._dir is not None
        ):
            return self._begin_window_ragged(batches, vals)
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

    def _begin_window_ragged(self, batches: List[Batch], vals: List[np.ndarray]):
        """Fused RAGGED window staging (variable pooling — the fbgemm-trace
        workload): pad each step's slot-id stream to a pow2 value budget
        (bounded recompiles), ship [ids | per-bag lengths u8/u16 | dense |
        labels | admits] as ONE transfer for _train_window_ragged."""
        from cachedembedding_tpu._native import hostops
        from cachedembedding_tpu.cache.manager import _bucket

        f0 = batches[0].sparse_features
        P = len(batches)
        F, B = f0.num_features, f0.batch_size
        all_ids = np.concatenate(vals).astype(np.int32)
        ws = self.embed.begin_window_staging(all_ids, out_shape=(-1,))
        counts = [int(v.shape[0]) for v in vals]
        Vp = _bucket(max(counts), lo=2048)
        slot_pad = np.zeros((P, Vp), np.int32)
        off = 0
        for i, n in enumerate(counts):
            slot_pad[i, :n] = ws.slot_ids[off : off + n]
            off += n
        lens = np.stack(
            [
                np.diff(np.asarray(b.sparse_features.offsets))
                if b.sparse_features.offsets is not None
                else np.full((F * B,), b.sparse_features.pooling, np.int64)
                for b in batches
            ]
        )
        len16 = bool(lens.max() >= 256)
        assert lens.max() < 65536, "per-bag pooling over u16 not supported"
        lens_bytes = (
            lens.astype("<u2").reshape(-1).view(np.uint8)
            if len16
            else lens.astype(np.uint8).reshape(-1)
        )
        id_width = hostops.id_pack_width(self._device_rows(), Vp)
        ids_bytes = (
            slot_pad.reshape(-1).view(np.uint8)
            if id_width == 32
            else hostops.pack_ids(slot_pad, id_width)
        )
        dmode = self.cfg.dense_input_dtype
        parts = [ids_bytes, lens_bytes]
        if dmode in ("int8", "int4"):
            q, meta = (
                _quant_dense_window4(batches)
                if dmode == "int4"
                else _quant_dense_window(batches)
            )
            parts.append(meta.view(np.uint8))
            parts.append(q.reshape(-1))
        else:
            ddt = ml_dtypes.bfloat16 if dmode == "bfloat16" else np.float32
            parts.append(
                np.stack([np.asarray(b.dense_features, ddt) for b in batches])
                .reshape(-1)
                .view(np.uint8)
            )
        parts.append(
            np.stack([np.asarray(b.labels).astype(np.uint8) for b in batches]).reshape(-1)
        )
        sb = int(ws.synth_slots.shape[0])
        fb = int(ws.fetch_slots.shape[0])
        fmode = _fetch_mode(ws.fetch_payload)
        if sb:
            parts += [
                ws.synth_slots.view(np.uint8),
                ws.synth_rows.view(np.uint8),
                ws.synth_bounds.view(np.uint8),
            ]
        if fb:
            parts += [
                ws.fetch_slots.view(np.uint8),
                np.ascontiguousarray(ws.fetch_payload).reshape(-1).view(np.uint8),
            ]
            if fmode in ("int8", "int4"):
                parts.append(ws.fetch_scales.view(np.uint8))
            if getattr(self.embed, "cache_accum", None) is not None:
                acc = np.zeros((fb,), np.float32)
                acc[: ws.fetch_accum.shape[0]] = ws.fetch_accum
                parts.append(acc.view(np.uint8))
        buf_dev = jax.device_put(np.concatenate(parts))
        layout = (
            P, Vp, B, self.cfg.dense_in_features, dmode, id_width, sb, fb,
            fmode, len16,
        )
        return ws, ("ragged", buf_dev, layout)

    def _finish_window(self, pw) -> None:
        """Complete a begun window: staged windows (in-program admits) only
        need their eviction writebacks enqueued — the admits ride inside the
        window program itself; other window kinds stage rows now."""
        if isinstance(pw, WindowStaging):
            self.embed.enqueue_writebacks(pw)
        elif hasattr(self.embed, "finish_prepare"):
            self.embed.finish_prepare(pw)

    def _dispatch_window(
        self, batches: List[Batch], window_input, progresses: List[float]
    ) -> jnp.ndarray:
        """Train one whole uniform window in a single fused device call.
        Returns the (P,) per-step losses (device array, not yet read back)."""
        cfg = self.cfg
        f0 = batches[0].sparse_features
        lrs = [self._lrs(p) for p in progresses]
        key = tuple(lrs)
        if key not in self._lr_cache:  # reuse device arrays: no put per window
            self._lr_cache[key] = (
                jnp.asarray(np.asarray([a for a, _ in lrs], np.float32)),
                jnp.asarray(np.asarray([b for _, b in lrs], np.float32)),
            )
        sparse_lrs, dense_lrs = self._lr_cache[key]
        common = dict(
            num_features=f0.num_features,
            batch_size=f0.batch_size,
            pooling=f0.pooling,
            mode=cfg.reduction_mode,
            compute_dtype_name=cfg.compute_dtype,
            use_pallas=cfg.cache.use_pallas_lookup,
            model=cfg.model,
            onehot_plan=self._onehot_plan,
        )
        accum = getattr(self.embed, "cache_accum", None)
        if accum is not None:
            common["optimizer"] = "rowwise_adagrad"
            common["adagrad_eps"] = cfg.adagrad_eps
        if isinstance(window_input, tuple) and window_input[0] == "mesh":
            _, buf_dev, layout, dense_dev, labels_dev = window_input
            L = layout[1]
            sparse_grad = accum is None and (
                cfg.use_sparse_embed_grad or self._device_rows() > 4 * L
            ) and f0.pooling is not None and not self._sr
            key = ("train", layout, sparse_grad, self._sr)
            if key not in self._mesh_steps:
                from cachedembedding_tpu.train.mesh_window import (
                    build_mesh_window_train,
                )

                self._mesh_steps[key] = build_mesh_window_train(
                    self.mesh,
                    layout=layout,
                    num_features=f0.num_features,
                    batch_size=f0.batch_size,
                    pooling=f0.pooling,
                    mode=cfg.reduction_mode,
                    compute_dtype_name=cfg.compute_dtype,
                    model=cfg.model,
                    fused_op=cfg.fused_op,
                    d_full=cfg.embedding_dim,
                    optimizer="rowwise_adagrad" if accum is not None else "sgd",
                    adagrad_eps=cfg.adagrad_eps,
                    adagrad_initial=getattr(self.embed, "adagrad_initial", 0.0),
                    sparse_grad=sparse_grad,
                    stochastic_rounding=self._sr,
                )
            sr_extra = (jnp.uint32(self._step_idx),) if self._sr else ()
            self.dense_params, new_cache, new_accum, losses = self._mesh_steps[key](
                self.dense_params, self.embed.cache_weight,
                accum if accum is not None else jnp.zeros((0,), jnp.float32),
                buf_dev, dense_dev, labels_dev, sparse_lrs, dense_lrs,
                getattr(self.embed, "_seed_u32", jnp.uint32(0)), *sr_extra,
            )
            if accum is not None:
                self.embed.set_accum(new_accum)
            self.embed.set_param(new_cache)
            return losses
        if isinstance(window_input, tuple) and window_input[0] == "ragged":
            _, buf_dev, layout = window_input
            Vp = layout[1]
            sparse_grad = accum is None and (
                cfg.use_sparse_embed_grad or self._device_rows() > 4 * Vp
            )
            out = _train_window_ragged(
                self.dense_params, self.embed.cache_weight, buf_dev,
                sparse_lrs, dense_lrs,
                getattr(self.embed, "_seed_u32", jnp.uint32(0)),
                accum,
                layout=layout,
                num_features=f0.num_features,
                batch_size=f0.batch_size,
                mode=cfg.reduction_mode,
                compute_dtype_name=cfg.compute_dtype,
                sparse_grad=sparse_grad,
                model=cfg.model,
                optimizer="rowwise_adagrad" if accum is not None else "sgd",
                adagrad_eps=cfg.adagrad_eps,
                adagrad_initial=getattr(self.embed, "adagrad_initial", 0.0),
            )
            if accum is not None:
                self.dense_params, new_cache, new_accum, losses = out
                self.embed.set_accum(new_accum)
            else:
                self.dense_params, new_cache, losses = out
            self.embed.set_param(new_cache)
            return losses
        if isinstance(window_input, tuple) and window_input[0] == "packed":
            _, buf_dev, layout = window_input
            L = layout[1]
            sparse_grad = accum is None and (
                cfg.use_sparse_embed_grad or self._device_rows() > 4 * L
            ) and f0.pooling is not None and not self._sr
            out = _train_window_packed(
                self.dense_params, self.embed.cache_weight, buf_dev,
                sparse_lrs, dense_lrs,
                getattr(self.embed, "_seed_u32", jnp.uint32(0)),
                accum,
                jnp.uint32(self._step_idx) if self._sr else None,
                layout=layout, sparse_grad=sparse_grad,
                adagrad_initial=getattr(self.embed, "adagrad_initial", 0.0),
                **common,
            )
        else:
            slot_vals = window_input
            L = int(slot_vals.shape[1])
            dense = np.stack([np.asarray(b.dense_features) for b in batches])
            labels = np.stack([np.asarray(b.labels) for b in batches])
            sparse_grad = accum is None and (
                cfg.use_sparse_embed_grad or self._device_rows() > 4 * L
            ) and f0.pooling is not None and not self._sr
            out = _train_window_step(
                self.dense_params, self.embed.cache_weight, jnp.asarray(dense),
                slot_vals, jnp.asarray(labels), sparse_lrs, dense_lrs, accum,
                jnp.uint32(self._step_idx) if self._sr else None,
                sparse_grad=sparse_grad, **common,
            )
        if accum is not None:
            self.dense_params, new_cache, new_accum, losses = out
            self.embed.set_accum(new_accum)
        else:
            self.dense_params, new_cache, losses = out
        self.embed.set_param(new_cache)
        return losses

    def _dispatch_train(self, b: Batch, sf: RaggedFeatures, progress: float):
        cfg = self.cfg
        slr, dlr = self._lrs(progress)
        sparse_lr = jnp.asarray(slr, jnp.float32)
        dense_lr = jnp.asarray(dlr, jnp.float32)
        # Sparse-grad SGD (scatter-add of per-row grads) when the table is much
        # larger than the id stream — otherwise a dense (C, D) grad is cheaper.
        sparse_grad = (
            cfg.use_sparse_embed_grad
            or self._device_rows() > 4 * int(sf.values.shape[0])
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
            model=cfg.model,
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
        loss_chunks: List[jnp.ndarray] = []  # (P,) device arrays per window
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

        annotate = jax.profiler.TraceAnnotation  # record_function analog
        # Host-directory windows do their planning/staging ON HOST, so they run
        # AFTER window k's async dispatch (host work overlaps device compute).
        # Device-planner windows run their plan as a DEVICE program, so it must
        # be enqueued BEFORE window k's big program — otherwise finish_prepare's
        # scalar readback serializes on the whole window's compute.
        staged = (
            isinstance(self.embed, CachedEmbeddingBag) and self.embed._dir is not None
        )
        t0 = time.perf_counter()
        cur = fetch_window()
        if cur:
            with annotate("cache_prepare"):
                pw_cur, sv_cur = self._begin_window(cur)
                self._finish_window(pw_cur)
        while cur:
            progresses = [
                0.0 if total is None else (done + i) / max(total, 1)
                for i in range(len(cur))
            ]
            nxt = pw_nxt = sv_nxt = None
            if not staged:
                # Enqueue the next window's plan program ahead of this window's
                # train program (the plan only touches directory state, which
                # the train program never writes).
                nxt = fetch_window()
                if nxt:
                    with annotate("cache_prepare"):
                        pw_nxt, sv_nxt = self._begin_window(nxt)
            # Dispatch this window's train steps (async, ONE fused device call
            # for uniform windows) so the next window's transfers ride the link
            # behind this window's execute instead of in front of it.
            with annotate("train_window_dispatch"):
                if isinstance(sv_cur, list):  # ragged fallback: per-step dispatch
                    for b, sf, pg in zip(cur, sv_cur, progresses):
                        loss_chunks.append(self._dispatch_train(b, sf, pg).reshape(1))
                else:
                    loss_chunks.append(self._dispatch_window(cur, sv_cur, progresses))
            examples += sum(b.batch_size for b in cur)
            prev_done = done
            done += len(cur)
            self._step_idx += len(cur)
            if staged:
                # Plan + stage the NEXT window while the device executes this
                # one: the host directory plan, the packed input transfer, and
                # the admit-row staging all overlap this window's compute.
                nxt = fetch_window()
                if nxt:
                    with annotate("cache_prepare"):
                        pw_nxt, sv_nxt = self._begin_window(nxt)
                        self._finish_window(pw_nxt)
            elif nxt:
                with annotate("cache_prepare"):
                    self._finish_window(pw_nxt)
            if log_every and done // log_every != prev_done // log_every:
                # NOTE: read as a (1,) array — 0-d readbacks are pathologically
                # slow on tunneled device links.
                loss_val = np.asarray(loss_chunks[-1][-1:].reshape(1))[0]
                print(
                    f"it {done}: loss={loss_val:.5f} "
                    f"hit_rate={self.embed.stats.hit_rate(window=pn):.4f}"
                )
            if nxt:
                cur, sv_cur = nxt, sv_nxt
            else:
                cur = []
        if loss_chunks:
            # True sync: a scalar READBACK. block_until_ready returns without
            # waiting on tunneled PJRT backends, which would stop the clock
            # with work still queued and overstate throughput.
            np.asarray(loss_chunks[-1][-1:])
        dt = time.perf_counter() - t0
        # single batched readback of all per-step losses (0-d reads are slow)
        loss_list = (
            [float(x) for x in np.asarray(jnp.concatenate(loss_chunks))]
            if loss_chunks
            else []
        )
        return TrainReport(
            losses=loss_list,
            it_per_s=done / dt if dt > 0 else 0.0,
            examples_per_s=examples / dt if dt > 0 else 0.0,
            hit_rate=self.embed.stats.hit_rate(),
        )

    def evaluate(self, data: Iterable[Batch], readback_every: int = 32) -> dict:
        """AUROC/Accuracy eval (/root/reference/recsys/dlrm_main.py:300-333).
        Uniform-pooling batches score through the same fused-window machinery
        as training (one packed transfer + one execute per prefetch_num
        batches, cache maintenance via the staged admits); ragged batches fall
        back to per-batch steps. Scores stay on device and are read back in
        blocks — a device->host round trip costs ~70ms on tunneled links."""
        cfg = self.cfg
        metrics = StreamingMetrics()
        pending: List[jnp.ndarray] = []
        pending_labels: List[np.ndarray] = []

        def drain():
            if pending:
                scores = np.asarray(jnp.concatenate(pending))
                metrics.update(scores, np.concatenate(pending_labels))
                pending.clear()
                pending_labels.clear()

        pn = max(1, cfg.cache.prefetch_num)
        it = iter(data)
        staged_ok = (
            isinstance(self.embed, CachedEmbeddingBag)
            and self.embed._dir is not None
        )
        while staged_ok:
            window: List[Batch] = []
            for _ in range(pn):
                try:
                    window.append(next(it))
                except StopIteration:
                    break
            if not window:
                drain()
                return metrics.compute()
            # forward-only windows never need the backward's grouping plans
            self._plan_suspended = True
            try:
                pw, sv = self._begin_window(window)
            finally:
                self._plan_suspended = False
            if isinstance(sv, tuple) and sv[0] == "ragged":
                self._finish_window(pw)
                _, buf_dev, layout = sv
                accum = getattr(self.embed, "cache_accum", None)
                f0 = window[0].sparse_features
                new_cache, new_accum, probs = _eval_window_ragged(
                    self.dense_params, self.embed.cache_weight, buf_dev,
                    getattr(self.embed, "_seed_u32", jnp.uint32(0)), accum,
                    layout=layout,
                    num_features=f0.num_features,
                    batch_size=f0.batch_size,
                    mode=cfg.reduction_mode,
                    compute_dtype_name=cfg.compute_dtype,
                    model=cfg.model,
                    optimizer="rowwise_adagrad" if accum is not None else "sgd",
                    adagrad_initial=getattr(self.embed, "adagrad_initial", 0.0),
                )
                self.embed.set_param(new_cache)
                if accum is not None:
                    self.embed.set_accum(new_accum)
                pending.append(probs.reshape(-1))
                pending_labels.append(
                    np.concatenate([np.asarray(b.labels) for b in window])
                )
                if len(pending) * pn >= readback_every:
                    drain()
                continue
            if not (isinstance(sv, tuple) and sv[0] in ("packed", "mesh")):
                # ragged window: fall through to the per-batch path below
                # (sv already carries per-batch slot features)
                self._finish_window(pw)
                for b, sf in zip(window, sv):
                    probs = _eval_step(
                        self.dense_params, self.embed.cache_weight,
                        jnp.asarray(b.dense_features), sf,
                        mode=cfg.reduction_mode,
                        compute_dtype_name=cfg.compute_dtype,
                        use_pallas=cfg.cache.use_pallas_lookup,
                        model=cfg.model,
                    )
                    pending.append(probs)
                    pending_labels.append(np.asarray(b.labels))
                continue
            if sv[0] == "mesh":
                self._finish_window(pw)
                _, buf_dev, layout, dense_dev, _labels_dev = sv
                accum = getattr(self.embed, "cache_accum", None)
                key = ("eval", layout)
                if key not in self._mesh_steps:
                    from cachedembedding_tpu.train.mesh_window import (
                        build_mesh_window_eval,
                    )

                    f0 = window[0].sparse_features
                    self._mesh_steps[key] = build_mesh_window_eval(
                        self.mesh,
                        layout=layout,
                        num_features=f0.num_features,
                        batch_size=f0.batch_size,
                        pooling=f0.pooling,
                        mode=cfg.reduction_mode,
                        compute_dtype_name=cfg.compute_dtype,
                        model=cfg.model,
                        fused_op=cfg.fused_op,
                        d_full=cfg.embedding_dim,
                        optimizer="rowwise_adagrad" if accum is not None else "sgd",
                        adagrad_initial=getattr(self.embed, "adagrad_initial", 0.0),
                    )
                new_cache, new_accum, probs = self._mesh_steps[key](
                    self.dense_params, self.embed.cache_weight,
                    accum if accum is not None else jnp.zeros((0,), jnp.float32),
                    buf_dev, dense_dev,
                    getattr(self.embed, "_seed_u32", jnp.uint32(0)),
                )
                self.embed.set_param(new_cache)
                if accum is not None:
                    self.embed.set_accum(new_accum)
                pending.append(probs.reshape(-1))
                pending_labels.append(
                    np.concatenate([np.asarray(b.labels) for b in window])
                )
                if len(pending) * pn >= readback_every:
                    drain()
                continue
            self._finish_window(pw)
            _, buf_dev, layout = sv
            accum = getattr(self.embed, "cache_accum", None)
            new_cache, new_accum, probs = _eval_window_packed(
                self.dense_params, self.embed.cache_weight, buf_dev,
                getattr(self.embed, "_seed_u32", jnp.uint32(0)), accum,
                layout=layout,
                num_features=window[0].sparse_features.num_features,
                batch_size=window[0].sparse_features.batch_size,
                pooling=window[0].sparse_features.pooling,
                mode=cfg.reduction_mode,
                compute_dtype_name=cfg.compute_dtype,
                use_pallas=cfg.cache.use_pallas_lookup,
                model=cfg.model,
                optimizer="rowwise_adagrad" if accum is not None else "sgd",
                adagrad_initial=getattr(self.embed, "adagrad_initial", 0.0),
            )
            self.embed.set_param(new_cache)
            if accum is not None:
                self.embed.set_accum(new_accum)
            pending.append(probs.reshape(-1))
            pending_labels.append(
                np.concatenate([np.asarray(b.labels) for b in window])
            )
            if len(pending) * pn >= readback_every:
                drain()

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
                model=cfg.model,
            )
            pending.append(probs)
            pending_labels.append(np.asarray(b.labels))
            if len(pending) >= readback_every:
                drain()
        drain()
        return metrics.compute()
