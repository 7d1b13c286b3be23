"""Embedding-bag lookup + pooling ops.

The reference leans on ATen's CUDA EmbeddingBag forward/backward
(/root/reference/benchmark/benchmark_cache.py:62 and every model forward). The TPU
equivalents here:

  * ``bag_pool_uniform`` — the hot path. Criteo/Avazu have exactly one id per
    (sample, feature); synth/custom datasets a fixed pooling factor P. Lookup is a
    gather ``(F, B, P) -> (F, B, P, D)`` followed by a sum/mean over P. XLA lowers
    the gather to a DynamicGather and the reduction fuses with it; backward is a
    scatter-add which XLA emits as a sorted segment-sum.
  * ``bag_pool_ragged`` — general ragged bags via ``jax.ops.segment_sum`` over a
    flat value stream (the KJT layout).
  * An optional Pallas kernel path (cachedembedding_tpu.ops.pallas_bag) is wired in
    by ``embedding_bag`` when enabled; it double-buffers row DMAs from HBM and
    accumulates in VMEM.

All ops are differentiable w.r.t. ``weight`` only; ids are int and non-diff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cachedembedding_tpu.jagged import RaggedFeatures


def bag_pool_uniform(
    weight: jnp.ndarray,
    ids_fbp: jnp.ndarray,
    mode: str = "sum",
    per_sample_weights: jnp.ndarray = None,  # (F, B, P) — sum mode only
) -> jnp.ndarray:
    """Pooled lookup for uniform pooling.

    weight: (C, D); ids_fbp: (F, B, P) int32 indices into weight.
    Returns (B, F, D) — the layout DLRM's InteractionArch consumes
    (/root/reference/baselines/models/dlrm.py:99-101).
    """
    # Transpose the IDS (a few MB of s32), not the gathered rows (hundreds of
    # MB at L=426k, D=128): gathering in (B, F, P) index order lands the rows
    # directly in the (B, F, D) layout DLRM consumes, and the backward's grad
    # scatter likewise needs no full-row-array transpose.
    ids_bfp = jnp.transpose(ids_fbp, (1, 0, 2))  # (B, F, P)
    # barrier: keep the transpose OUT of the gather fusion — fused index math
    # knocks XLA's emitter off the vectorized-gather path onto a ~9 ns/row
    # scalar rate (ceiling A/B 15.35 -> 14.31 ms/iter, scripts/ceiling_r5.py)
    ids_bfp = jax.lax.optimization_barrier(ids_bfp)
    # mode="wrap": ids are validated in [0, C) upstream (cache manager
    # _translate_ids / directory plan), so wrap is an identity — but it keeps
    # XLA on the vectorized-gather path (clip/fill emit per-row bounds checks:
    # 4-7 ms vs ~1.2 ms at L=426k, D=128 bf16 on v5e).
    rows = jnp.take(weight, ids_bfp, axis=0, mode="wrap")  # (B, F, P, D)
    if rows.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        # 8-bit floats have no implicit promotion path; upcast right after
        # the gather (the rows were only fp8 for storage/bandwidth)
        rows = rows.astype(jnp.float32)
    if per_sample_weights is not None:
        if mode != "sum":
            raise ValueError("per_sample_weights requires mode='sum'")
        psw_bfp = jnp.transpose(per_sample_weights, (1, 0, 2))
        rows = rows.astype(jnp.float32) * psw_bfp[..., None]
    if mode not in ("sum", "mean"):
        raise ValueError(f"unsupported mode {mode!r}")
    if ids_bfp.shape[-1] == 1:
        # P == 1 (the Criteo/Avazu hot path): pooling over a singleton axis is
        # the identity — emitting it as a reduce makes jnp.sum's f32
        # accumulation upcast hit the GATHER (XLA commutes the convert before
        # the gather, materializing f32 rows: 2x HBM write + 2x downstream
        # bytes for nothing). Squeeze instead; rows keep the storage dtype.
        return rows[:, :, 0]
    # Low-precision weights (bf16 rows gather 4x faster than f32 on TPU — the
    # 256-byte row hits XLA's vectorized gather path) still pool/accumulate in
    # f32; grads convert back to the weight dtype only at the final scatter.
    if rows.dtype != jnp.float32:
        rows = rows.astype(jnp.float32)
    if mode == "sum":
        pooled = jnp.sum(rows, axis=2)
    else:  # "mean" — mode validated above
        pooled = jnp.mean(rows, axis=2)
    return pooled  # (B, F, D)


def bag_pool_ragged(
    weight: jnp.ndarray,
    values: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_bags: int,
    mode: str = "sum",
    per_sample_weights: jnp.ndarray = None,  # (L,) — sum mode only
) -> jnp.ndarray:
    """Pooled lookup for ragged bags.

    values: (L,) ids; segment_ids: (L,) bag index per id (monotonic, feature-major);
    returns (num_bags, D). Empty bags produce zeros (sum) — matching EmbeddingBag's
    include_last_offset semantics.
    """
    # mode="wrap": see bag_pool_uniform — in-range ids, vectorized gather.
    rows = jnp.take(weight, values, axis=0, mode="wrap")  # (L, D)
    if rows.dtype != jnp.float32:
        rows = rows.astype(jnp.float32)  # accumulate ragged bags in f32
    if per_sample_weights is not None:
        if mode != "sum":
            raise ValueError("per_sample_weights requires mode='sum'")
        rows = rows * per_sample_weights[:, None]
    pooled = jax.ops.segment_sum(rows, segment_ids, num_segments=num_bags, indices_are_sorted=True)
    if mode == "mean":
        counts = jax.ops.segment_sum(
            jnp.ones((values.shape[0],), weight.dtype),
            segment_ids,
            num_segments=num_bags,
            indices_are_sorted=True,
        )
        pooled = pooled / jnp.maximum(counts, 1.0)[:, None]
    elif mode != "sum":
        raise ValueError(f"unsupported mode {mode!r}")
    return pooled


def embedding_bag(
    weight: jnp.ndarray,
    features: RaggedFeatures,
    mode: str = "sum",
    use_pallas: bool = False,
    per_sample_weights: jnp.ndarray = None,  # (L,) flat, feature-major
) -> jnp.ndarray:
    """Dispatching lookup: (B, F, D) for uniform pooling, else (F*B, D) reshaped to
    (B, F, D) from the feature-major ragged stream."""
    F, B = features.num_features, features.batch_size
    if features.pooling is not None:
        if use_pallas and features.pooling == 1 and per_sample_weights is None:
            from cachedembedding_tpu.ops.pallas_bag import gather_rows_pallas

            # P == 1: pure gather, no pooling reduction needed.
            flat = gather_rows_pallas(weight, features.values)  # (F*B, D)
            return jnp.transpose(flat.reshape(F, B, -1), (1, 0, 2))
        psw = (
            None
            if per_sample_weights is None
            else per_sample_weights.reshape(F, B, features.pooling)
        )
        return bag_pool_uniform(
            weight, features.to_fbp(), mode=mode, per_sample_weights=psw
        )
    pooled = bag_pool_ragged(
        weight, features.values, features.segment_ids(), num_bags=F * B, mode=mode,
        per_sample_weights=per_sample_weights,
    )  # (F*B, D) feature-major
    return jnp.transpose(pooled.reshape(F, B, -1), (1, 0, 2))
