"""Packed-window training over a device mesh — the multi-chip analog of
``train.trainer._train_window_packed``.

The reference's multi-GPU flagship runs the full prefetch-pipelined
train/val/test (/root/reference/recsys/dlrm_main.py:206-374); round 1 only had
a bare per-batch mesh loop. This module lifts the single-chip packed-window
machinery onto the mesh:

  * ONE replicated packed uint8 buffer per window carries [slot ids | synth
    admits | fetched admits]; dense features / labels ship as separate arrays
    batch-sharded P(None, AXIS) — they are per-rank data, not shared state;
  * the whole window (P steps) is ONE ``shard_map``-ped ``lax.scan`` program:
    column-sharded cache rows P(None, AXIS), replicated ids, pooled embeddings
    resharded (B_global, F, D/w) -> (B_local, F, D) by ``lax.all_to_all`` (the
    --fused_op analog, /root/reference/recsys/dlrm_main.py:35-39), dense grads
    ``psum`` (the DDP all-reduce, /root/reference/recsys/models/dlrm.py:193-200);
  * admits land INSIDE the program before the train steps: synth rows are
    generated per-rank for the rank's own column shard (bit-identical to
    slicing the full row — ops.synth_rows col_start), fetched payload rows are
    column-sliced from the replicated buffer.

Losses are sum-normalized by the global batch, so training is numerically
identical to the single-chip packed window on the same data (tested in
tests/test_mesh_window.py) and the dense LR needs NO world-size scaling.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cachedembedding_tpu.jagged import RaggedFeatures
from cachedembedding_tpu.ops.embedding_bag import embedding_bag
from cachedembedding_tpu.ops.synth_rows import synth_rows
from cachedembedding_tpu.parallel.mesh import AXIS


def _decode_window_ids(packed, layout):
    from cachedembedding_tpu.train.trainer import _decode_window_ids as f

    return f(packed, layout)


def _apply_admits_sharded(
    cache_shard, cache_accum, packed, c, layout, seed, d_full, optimizer,
    adagrad_initial,
):
    """Decode the admit blocks (replicated buffer) and land each rank's COLUMN
    SLICE into its cache shard. Mirrors trainer._apply_packed_admits."""
    P_, L, B, Din, dmode, id_width, sb, fb, fmode = layout[:9]
    dpr = cache_shard.shape[1]
    C_pad = cache_shard.shape[0]
    col0 = (jax.lax.axis_index(AXIS) * dpr).astype(jnp.int32)
    if sb:
        s0, s1, s2 = c, c + 4 * sb, c + 8 * sb
        c = c + 12 * sb
        s_slots = jax.lax.bitcast_convert_type(packed[s0:s1].reshape(sb, 4), jnp.int32)
        s_rows = jax.lax.bitcast_convert_type(packed[s1:s2].reshape(sb, 4), jnp.int32)
        s_bounds = jax.lax.bitcast_convert_type(packed[s2:c].reshape(sb, 4), jnp.float32)
        vals = synth_rows(s_rows, s_bounds, seed, dpr, col_start=col0)
        safe = jnp.where(s_slots >= 0, s_slots, C_pad)
        cache_shard = cache_shard.at[safe].set(
            vals.astype(cache_shard.dtype), mode="drop"
        )
        if optimizer == "rowwise_adagrad":
            cache_accum = cache_accum.at[safe].set(adagrad_initial, mode="drop")
    if fb:
        f0, f1 = c, c + 4 * fb
        fsize = {"float32": 4, "bfloat16": 2, "int8": 1, "int4": 1}[fmode]
        c2 = f1 + (fb * d_full // 2 if fmode == "int4" else fb * d_full * fsize)
        f_slots = jax.lax.bitcast_convert_type(packed[f0:f1].reshape(fb, 4), jnp.int32)
        if fmode == "int4":
            from cachedembedding_tpu.cache.state import dequant_rows_q4

            scales = jax.lax.bitcast_convert_type(
                packed[c2 : c2 + 4 * fb].reshape(fb, 4), jnp.float32
            )
            payload = dequant_rows_q4(
                packed[f1:c2].reshape(fb, d_full // 2), scales, d_full
            )
            c2 = c2 + 4 * fb
        elif fmode == "int8":
            q = jax.lax.bitcast_convert_type(
                packed[f1:c2].reshape(fb, d_full, 1), jnp.int8
            ).reshape(fb, d_full)
            scales = jax.lax.bitcast_convert_type(
                packed[c2 : c2 + 4 * fb].reshape(fb, 4), jnp.float32
            )
            c2 = c2 + 4 * fb
            payload = q.astype(jnp.float32) * scales[:, None]
        else:
            fetch_dt = jnp.bfloat16 if fmode == "bfloat16" else jnp.float32
            payload = jax.lax.bitcast_convert_type(
                packed[f1:c2].reshape(fb, d_full, fsize), fetch_dt
            )
        payload = jax.lax.dynamic_slice_in_dim(payload, col0, dpr, axis=1)
        safe = jnp.where(f_slots >= 0, f_slots, C_pad)
        cache_shard = cache_shard.at[safe].set(
            payload.astype(cache_shard.dtype), mode="drop"
        )
        if optimizer == "rowwise_adagrad":
            f_accum = jax.lax.bitcast_convert_type(
                packed[c2 : c2 + 4 * fb].reshape(fb, 4), jnp.float32
            )
            cache_accum = cache_accum.at[safe].set(f_accum, mode="drop")
    return cache_shard, cache_accum


def _reshard_pooled(pooled, fused_op, b_local):
    """(B_global, F, D/w) -> (B_local, F, D) — the fused collective."""
    if fused_op == "all_to_all":
        return jax.lax.all_to_all(pooled, AXIS, split_axis=0, concat_axis=2, tiled=True)
    if fused_op == "gather_scatter":
        my = jax.lax.axis_index(AXIS)
        gathered = jax.lax.all_gather(pooled, AXIS, axis=2, tiled=True)
        return jax.lax.dynamic_slice_in_dim(gathered, my * b_local, b_local, 0)
    raise ValueError(f"unknown fused_op {fused_op!r}")


def build_mesh_window_train(
    mesh: Mesh,
    *,
    layout: tuple,
    num_features: int,
    batch_size: int,       # GLOBAL batch
    pooling: int,
    mode: str,
    compute_dtype_name: str,
    model: str,
    fused_op: str,
    d_full: int,
    optimizer: str = "sgd",
    adagrad_eps: float = 1e-10,
    adagrad_initial: float = 0.0,
    sparse_grad: bool = False,
    stochastic_rounding: bool = False,
):
    """Returns step(dense_params, cache_weight, cache_accum, packed,
    dense_feats, labels, sparse_lrs, dense_lrs, seed)
    -> (dense_params, cache_weight, cache_accum, (P,) losses).
    int8 dense mode: the (scale, lo) dequant meta rides the TAIL of the
    replicated packed buffer (trainer._quant_dense_window).
    ``stochastic_rounding``: the per-step f32 -> cache-dtype rounding of the
    dense-grad update is unbiased (ops/rounding.py — the fp8 small-LR fix);
    per-step seeds derive from the window seed, as in trainer._scan_window.
    Requires the dense-grad path (sparse_grad=False)."""
    if stochastic_rounding:
        assert not sparse_grad, "stochastic rounding requires the dense-grad path"
    from cachedembedding_tpu.train.trainer import _model_loss

    P_, L, B, Din, dmode, id_width, sb, fb, fmode = layout[:9]
    w = mesh.devices.size
    assert batch_size % w == 0 and d_full % w == 0
    b_local = batch_size // w
    compute_dtype = jnp.dtype(compute_dtype_name)

    def inner(dense_params, cache_shard, cache_accum, packed, dense_feats,
              labels, sparse_lrs, dense_lrs, seed, *sr_args):
        # sr_args: (sr_seed,) when stochastic_rounding — a PER-WINDOW varying
        # uint32 (trainer step index); the admit `seed` is the constant
        # canonical-init seed and must not drive the rounding sequence
        slot_values, a = _decode_window_ids(packed, layout)  # (P, L) replicated
        cache_shard, cache_accum = _apply_admits_sharded(
            cache_shard, cache_accum, packed, a, layout, seed, d_full,
            optimizer, adagrad_initial,
        )
        dense_meta = (
            jax.lax.bitcast_convert_type(packed[-8:].reshape(2, 4), jnp.float32)
            if dmode == "int8"
            else None
        )

        def body(carry, xs):
            if optimizer == "rowwise_adagrad":
                dp, cw, acc = carry
            else:
                dp, cw = carry
                acc = None
            if stochastic_rounding:
                d_local, v, l_local, slr, dlr, step_seed = xs
            else:
                d_local, v, l_local, slr, dlr = xs
            if dmode == "int8":
                # range-scaled uint8 dense wire (same format as single-chip)
                d_local = (
                    d_local.astype(jnp.float32) * dense_meta[0] + dense_meta[1]
                )

            feats = RaggedFeatures(
                values=v, offsets=None, num_features=num_features,
                batch_size=batch_size, pooling=pooling,
            )

            if sparse_grad:
                rows0 = jnp.take(cw, v, axis=0)  # (L, dpr)

                def loss_fn(dp_, rows):
                    F = num_features
                    pooled = rows.reshape(F, batch_size, pooling, -1).astype(jnp.float32)
                    pooled = pooled.sum(axis=2) if mode == "sum" else pooled.mean(axis=2)
                    pooled = jnp.transpose(pooled, (1, 0, 2))  # (B, F, dpr)
                    emb_local = _reshard_pooled(pooled, fused_op, b_local)
                    loss = _model_loss(
                        model, dp_, d_local, emb_local, compute_dtype, l_local
                    )
                    return loss * (b_local / batch_size)

                loss, (g_dense, g_rows) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1)
                )(dp, rows0)
                cw = cw.at[v].add(
                    (-slr * g_rows.astype(jnp.float32)).astype(cw.dtype)
                )
            else:
                # Rows-grad structure mirroring the single-chip trainer
                # (_scan_window's uniform dense branch): differentiate w.r.t.
                # the gathered rows in the storage dtype so the forward
                # gather never reads/writes a full-shard f32 convert of the
                # cache; f32 duplicate-id accumulation is preserved by
                # upcasting inside the scatter-add. Keeping the two programs
                # structurally identical also keeps their XLA reduction
                # orders aligned (tests/test_mesh_window.py parity gates).
                ids_bfp = jnp.transpose(feats.to_fbp(), (1, 0, 2))  # (B,F,P)
                # barrier: keep the transpose out of the gather fusion
                # (vectorized-gather path; trainer.py _ISOLATE_GATHER note)
                ids_bfp = jax.lax.optimization_barrier(ids_bfp)
                rows_bf = jnp.take(cw, ids_bfp, axis=0, mode="wrap")
                upcast = (
                    jnp.dtype(cw.dtype).itemsize == 1 or ids_bfp.shape[2] > 1
                )
                rows_in = (
                    rows_bf.astype(jnp.float32)
                    if (upcast or stochastic_rounding)
                    else rows_bf
                )

                def loss_fn_rows(dp_, rows):
                    if rows.shape[2] == 1:
                        pooled = rows[:, :, 0]  # (B, F, dpr)
                    else:
                        pooled = (
                            rows.astype(jnp.float32).sum(axis=2)
                            if mode == "sum"
                            else rows.astype(jnp.float32).mean(axis=2)
                        )
                    emb_local = _reshard_pooled(pooled, fused_op, b_local)
                    loss = _model_loss(
                        model, dp_, d_local, emb_local, compute_dtype, l_local
                    )
                    # local SUM normalized by the GLOBAL batch: psum'd across
                    # ranks this equals the global-mean loss, so the step is
                    # numerically identical to single-chip and the dense LR
                    # needs no world-size scaling (cf. the reference's
                    # local-mean + scaled-LR, recsys/dlrm_main.py:455-461).
                    return loss * (b_local / batch_size)

                loss, (g_dense, g_rows) = jax.value_and_grad(
                    loss_fn_rows, argnums=(0, 1)
                )(dp, rows_in)
                g32 = jnp.zeros(cw.shape, jnp.float32).at[
                    ids_bfp.reshape(-1)
                ].add(
                    g_rows.reshape(-1, cw.shape[1]).astype(jnp.float32),
                    mode="promise_in_bounds",
                )
                if optimizer == "rowwise_adagrad":
                    # global row-mean of g^2 = psum of per-shard column sums / D
                    acc = acc + jax.lax.psum(jnp.sum(g32 * g32, axis=1), AXIS) / d_full
                    g32 = g32 / (jnp.sqrt(acc) + adagrad_eps)[:, None]
                cw_upd = jax.lax.optimization_barrier(cw)
                new32 = cw_upd.astype(jnp.float32) - slr * g32
                if stochastic_rounding:
                    from cachedembedding_tpu.ops.rounding import (
                        stochastic_astype,
                    )

                    cw = stochastic_astype(new32, cw.dtype, step_seed)
                else:
                    cw = new32.astype(cw.dtype)

            g_dense = jax.lax.psum(g_dense, AXIS)  # DDP all-reduce
            loss = jax.lax.psum(loss, AXIS)
            dp = jax.tree_util.tree_map(lambda p_, g_: p_ - dlr * g_, dp, g_dense)
            if optimizer == "rowwise_adagrad":
                return (dp, cw, acc), loss
            return (dp, cw), loss

        xs = (dense_feats, slot_values, labels, sparse_lrs, dense_lrs)
        if stochastic_rounding:
            P_steps = dense_feats.shape[0]
            step_seeds = (
                jnp.uint32(sr_args[0]) * jnp.uint32(0x9E3779B9)
                + jnp.arange(P_steps, dtype=jnp.uint32)
            )
            xs = xs + (step_seeds,)
        if optimizer == "rowwise_adagrad":
            (dense_params, cache_shard, cache_accum), losses = jax.lax.scan(
                body, (dense_params, cache_shard, cache_accum), xs
            )
        else:
            (dense_params, cache_shard), losses = jax.lax.scan(
                body, (dense_params, cache_shard), xs
            )
        return dense_params, cache_shard, cache_accum, losses

    mapped = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(
            P(),              # dense_params replicated
            P(None, AXIS),    # cache_weight dim-sharded
            P(),              # cache_accum replicated (row-wise state)
            P(),              # packed buffer replicated (+ int8 dense meta tail)
            P(None, AXIS),    # dense (P, B, Din) batch-sharded
            P(None, AXIS),    # labels (P, B) batch-sharded
            P(), P(), P(),
        ) + ((P(),) if stochastic_rounding else ()),  # sr_seed replicated
        out_specs=(P(), P(None, AXIS), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(1, 2))


def build_mesh_window_eval(
    mesh: Mesh,
    *,
    layout: tuple,
    num_features: int,
    batch_size: int,
    pooling: int,
    mode: str,
    compute_dtype_name: str,
    model: str,
    fused_op: str,
    d_full: int,
    optimizer: str = "sgd",
    adagrad_initial: float = 0.0,
):
    """Forward-only fused mesh window. Returns step(dense_params, cache_weight,
    cache_accum, packed, dense_feats, seed) -> (cache_weight, cache_accum,
    (P, B) probabilities). int8 dense meta rides the packed-buffer tail."""
    from cachedembedding_tpu.train.trainer import _model_probs

    P_, L, B, Din, dmode, id_width, sb, fb, fmode = layout[:9]
    w = mesh.devices.size
    b_local = batch_size // w
    compute_dtype = jnp.dtype(compute_dtype_name)

    def inner(dense_params, cache_shard, cache_accum, packed, dense_feats, seed):
        slot_values, a = _decode_window_ids(packed, layout)
        cache_shard, cache_accum = _apply_admits_sharded(
            cache_shard, cache_accum, packed, a, layout, seed, d_full,
            optimizer, adagrad_initial,
        )
        dense_meta = (
            jax.lax.bitcast_convert_type(packed[-8:].reshape(2, 4), jnp.float32)
            if dmode == "int8"
            else None
        )

        def score(d_local, v):
            if dmode == "int8":
                d_local = (
                    d_local.astype(jnp.float32) * dense_meta[0] + dense_meta[1]
                )
            feats = RaggedFeatures(
                values=v, offsets=None, num_features=num_features,
                batch_size=batch_size, pooling=pooling,
            )
            pooled = embedding_bag(cache_shard, feats, mode=mode)
            emb_local = _reshard_pooled(pooled, fused_op, b_local)
            return _model_probs(model, dense_params, d_local, emb_local, compute_dtype)

        probs = jax.vmap(score)(dense_feats, slot_values)  # (P, B_local)
        return cache_shard, cache_accum, probs

    mapped = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(None, AXIS), P(), P(), P(None, AXIS), P()),
        out_specs=(P(None, AXIS), P(), P(None, AXIS)),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(1, 2))
