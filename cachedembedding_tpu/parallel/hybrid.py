"""Hybrid parallel train step: column-sharded cached embedding x data-parallel dense.

The defining topology of the reference (/root/reference/recsys/models/dlrm.py:144-147,
README.md:5): every rank consumes the GLOBAL batch of sparse ids against its own
shard of the embedding, then a fused all-to-all reshards pooled embeddings from
(B_global, F, D/w) to (B_local, F, D), feeding DDP dense towers whose grads are
all-reduced.

TPU re-design: one ``shard_map`` over the 1-D mesh axis ``mp``:
  * ``cache_weight`` partitioned P(None, "mp") — the column shard of
    ParallelCachedEmbeddingBag (split math /root/reference/recsys/utils/misc.py:138-154,
    here an even D/w split enforced at construction);
  * slot ids replicated (the KJT all-gather output — on TPU the all_gather of
    uniform-pooling ids happens in `parallel.all_to_all.gather_global_uniform`);
  * pooled-embedding reshard = one ``lax.all_to_all`` (batch split -> dim concat),
    the analog of --fused_op all_to_all (/root/reference/recsys/dlrm_main.py:35-39);
    its transpose in backward is emitted automatically by JAX AD;
  * dense grads ``lax.pmean`` over ``mp`` — the DDP all-reduce
    (/root/reference/recsys/models/dlrm.py:193-200);
  * sparse grads need NO collective: each rank saw the global batch for its own
    dim shard (the key property of column-wise cached embedding).

The cache metadata state machine runs replicated (same plan on every rank), so
prepare_ids needs no cross-rank coordination in column-wise mode.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cachedembedding_tpu.jagged import RaggedFeatures
from cachedembedding_tpu.models.dlrm import (
    DLRMParams,
    bce_with_logits,
    dlrm_dense_forward,
    init_dlrm_dense,
)
from cachedembedding_tpu.ops.embedding_bag import embedding_bag
from cachedembedding_tpu.parallel.mesh import AXIS, make_mesh


def _local_step(
    dense_params: DLRMParams,
    cache_shard: jnp.ndarray,  # (C, D/w)
    dense_local: jnp.ndarray,  # (B_local, Din)
    slot_values_global: jnp.ndarray,  # (F * B_global * P,) replicated
    labels_local: jnp.ndarray,  # (B_local,)
    sparse_lr: jnp.ndarray,
    dense_lr: jnp.ndarray,
    *,
    num_features: int,
    global_batch: int,
    pooling: int,
    mode: str,
    compute_dtype,
    fused_op: str = "all_to_all",
):
    w = jax.lax.axis_size(AXIS)
    B_local = global_batch // w

    def loss_fn(dp, cw):
        feats = RaggedFeatures(
            values=slot_values_global,
            offsets=None,
            num_features=num_features,
            batch_size=global_batch,
            pooling=pooling,
        )
        pooled = embedding_bag(cw, feats, mode=mode)  # (B_global, F, D/w)
        # Fused reshard (B_global, F, Dw) -> (B_local, F, D). Two strategies, the
        # reference's --fused_op (/root/reference/recsys/dlrm_main.py:35-39):
        if fused_op == "all_to_all":
            # split batch into w chunks, concat dim shards
            emb_local = jax.lax.all_to_all(
                pooled, AXIS, split_axis=0, concat_axis=2, tiled=True
            )
        elif fused_op == "gather_scatter":
            # all-gather every rank's dim shard of the FULL batch, then slice out
            # the local batch block (backward: pad + reduce-scatter). More comm
            # volume than all_to_all but a single latency-bound collective.
            my = jax.lax.axis_index(AXIS)
            gathered = jax.lax.all_gather(pooled, AXIS, axis=2, tiled=True)
            emb_local = jax.lax.dynamic_slice_in_dim(gathered, my * B_local, B_local, 0)
        else:
            raise ValueError(f"unknown fused_op {fused_op!r}")
        logits = dlrm_dense_forward(dp, dense_local, emb_local, compute_dtype)
        # Local SUM normalized by the GLOBAL batch: summed across ranks this is
        # exactly the global-mean BCE, so the step is numerically identical to a
        # single-device step on the global batch. (The reference instead keeps
        # local means and compensates by scaling the dense LR by world_size,
        # /root/reference/recsys/dlrm_main.py:455-461 — same effective update,
        # but this normalization makes grads world-size-invariant.)
        return bce_with_logits(logits, labels_local) * (B_local / global_batch)

    loss, (g_dense, g_cache) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        dense_params, cache_shard
    )
    # DDP all-reduce: dense grads summed = global-mean grad. The sparse grad
    # needs NO collective: the all_to_all transpose in backward already
    # accumulated every rank's contribution for this dim shard.
    g_dense = jax.lax.psum(g_dense, AXIS)
    loss = jax.lax.psum(loss, AXIS)
    new_dense = jax.tree_util.tree_map(lambda p, g: p - dense_lr * g, dense_params, g_dense)
    new_cache = cache_shard - sparse_lr * g_cache
    return new_dense, new_cache, loss


def hybrid_train_step(
    mesh: Mesh,
    *,
    num_features: int,
    global_batch: int,
    pooling: int = 1,
    mode: str = "sum",
    compute_dtype=jnp.float32,
    fused_op: str = "all_to_all",
):
    """Build the jitted hybrid-parallel train step for a given mesh/shapes.

    Returns step(dense_params, cache_weight, dense, slot_values, labels,
                 sparse_lr, dense_lr) -> (dense_params, cache_weight, loss)
    with shardings: cache_weight P(None, mp); dense/labels P(mp) on batch;
    slot_values replicated; dense_params replicated.
    """
    inner = partial(
        _local_step,
        num_features=num_features,
        global_batch=global_batch,
        pooling=pooling,
        mode=mode,
        compute_dtype=compute_dtype,
        fused_op=fused_op,
    )
    mapped = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(
            P(),               # dense_params replicated
            P(None, AXIS),     # cache_weight dim-sharded
            P(AXIS),           # dense features batch-sharded
            P(),               # slot ids replicated (global batch)
            P(AXIS),           # labels batch-sharded
            P(),
            P(),
        ),
        out_specs=(P(), P(None, AXIS), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0, 1))


class HybridState(NamedTuple):
    dense_params: DLRMParams
    cache_weight: jnp.ndarray


def dryrun_hybrid_train_step(n_devices: int) -> None:
    """Compile + execute ONE hybrid-parallel step on tiny shapes over an
    n_devices mesh (driver contract: __graft_entry__.dryrun_multichip)."""
    mesh = make_mesh(n_devices)
    F, D, Din, C = 4, 32 * max(1, n_devices), 8, 64
    assert D % n_devices == 0
    B_global = 8 * n_devices
    key = jax.random.PRNGKey(0)
    dense_params = init_dlrm_dense(key, D, F, Din, (16, D), (16, 8, 1))
    step = hybrid_train_step(
        mesh, num_features=F, global_batch=B_global, pooling=1
    )
    cw_sharding = NamedSharding(mesh, P(None, AXIS))
    cache_weight = jax.device_put(jnp.ones((C, D), jnp.float32), cw_sharding)
    dense = jax.device_put(
        jnp.ones((B_global, Din), jnp.float32), NamedSharding(mesh, P(AXIS))
    )
    labels = jax.device_put(
        jnp.ones((B_global,), jnp.float32), NamedSharding(mesh, P(AXIS))
    )
    slot_values = jnp.zeros((F * B_global,), jnp.int32)
    lr = jnp.asarray(0.1, jnp.float32)
    dense_params, cache_weight, loss = step(
        dense_params, cache_weight, dense, slot_values, labels, lr, lr
    )
    jax.block_until_ready(loss)
    assert np.isfinite(float(loss)), float(loss)
