"""Sparse-id batch exchange — the TPU analog of the reference's KJTAllToAll
(/root/reference/recsys/datasets/utils.py:8-54): every rank contributes its local
batch of per-feature ids and every rank ends up holding the GLOBAL batch, so the
column-sharded embedding can serve all samples.

The reference does a two-phase ragged exchange (lengths all_to_all, then values
all_to_all, then per-key re-interleave). On TPU, static shapes make the uniform-
pooling case (Criteo/Avazu, P ids per bag) a single tiled all_gather; the truly
ragged case pads values to a static per-rank budget and exchanges (lengths,
padded values) — the same two tensors, one collective each, shapes known at
compile time.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from cachedembedding_tpu.parallel.mesh import AXIS


def gather_global_uniform(values_local: jnp.ndarray, num_features: int, pooling: int):
    """Inside shard_map: local (F * B_local * P,) feature-major ids ->
    global (F * B_global * P,) feature-major ids.

    Per-feature interleave must match the single-host layout: for each feature,
    rank 0's bags first, then rank 1's, ... — i.e. gather along the batch axis.
    """
    B_local = values_local.shape[0] // (num_features * pooling)
    fbp = values_local.reshape(num_features, B_local, pooling)
    gathered = jax.lax.all_gather(fbp, AXIS, axis=1, tiled=True)  # (F, B_global, P)
    return gathered.reshape(-1)


def exchange_ragged(
    values_local: jnp.ndarray,
    lengths_local: jnp.ndarray,
    max_values_per_rank: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inside shard_map: two-phase ragged exchange.

    values_local: (V,) ids padded to the static per-rank budget
                  ``max_values_per_rank`` (garbage past the true count).
    lengths_local: (num_bags_local,) true per-bag lengths.

    Returns (values_global (w*V,), lengths_global (w*num_bags,)) — concatenated
    in rank order; callers rebuild offsets from lengths and ignore per-rank pad
    tails via the lengths (mirrors the lengths-then-values two-phase pattern of
    /root/reference/recsys/datasets/utils.py:29-41).
    """
    assert values_local.shape[0] == max_values_per_rank
    lengths_global = jax.lax.all_gather(lengths_local, AXIS, axis=0, tiled=True)
    values_global = jax.lax.all_gather(values_local, AXIS, axis=0, tiled=True)
    return values_global, lengths_global


def exchange_to_owners(
    values_by_dest: jnp.ndarray,
    counts_by_dest: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inside shard_map: OWNER-ROUTED two-phase ragged exchange — each rank
    sends each peer ONLY the ids that peer owns (tablewise routing), via one
    ``lax.all_to_all`` per phase. This is the wire-correct shape for >= 2-host
    (DCN) topologies: per-rank traffic is O(total/world) where the all-gather
    form (``exchange_ragged``) replicates everything to everyone, O(total).
    Mirrors the reference's lengths-then-values owner exchange
    (/root/reference/recsys/datasets/utils.py:29-41).

    values_by_dest: (w, V) — row d holds this rank's ids destined for rank d,
        padded to the static per-pair budget V (garbage past the true count).
    counts_by_dest: (w,) true counts per destination.

    Returns (received (w, V), recv_counts (w,)): row j = the ids rank j sent
    to THIS rank, with their true count.
    """
    w = jax.lax.axis_size(AXIS)
    assert values_by_dest.shape[0] == w
    recv_counts = jax.lax.all_to_all(
        counts_by_dest.reshape(w, 1), AXIS, split_axis=0, concat_axis=0,
        tiled=True,
    ).reshape(w)
    received = jax.lax.all_to_all(
        values_by_dest, AXIS, split_axis=0, concat_axis=0, tiled=True
    )
    return received, recv_counts


def bucket_by_owner(
    values: jnp.ndarray,
    owners: jnp.ndarray,
    num_ranks: int,
    per_pair_budget: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape bucketing for exchange_to_owners: scatter each id into its
    owner's row at its stable rank among same-owner ids. Values past the
    per-pair budget are DROPPED (callers size the budget to the worst case)."""
    oh = (owners[:, None] == jnp.arange(num_ranks)[None, :]).astype(jnp.int32)
    rank_within = (jnp.cumsum(oh, axis=0) - oh)[
        jnp.arange(values.shape[0]), owners
    ]
    counts = oh.sum(axis=0)
    target = owners * per_pair_budget + rank_within
    target = jnp.where(
        rank_within < per_pair_budget, target, num_ranks * per_pair_budget
    )
    out = jnp.zeros((num_ranks * per_pair_budget,), values.dtype).at[target].set(
        values, mode="drop"
    )
    return out.reshape(num_ranks, per_pair_budget), jnp.minimum(
        counts, per_pair_budget
    )


def permute_bags(
    values: jnp.ndarray,
    offsets: jnp.ndarray,
    perm: jnp.ndarray,
    out_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reorder ragged bags: output bag j = input bag perm[j]. Used for the
    per-key re-interleave after a rank-major ragged exchange (the reference does
    this with a python loop over keys, /root/reference/recsys/datasets/utils.py:43-52;
    here it is one vectorized gather)."""
    in_lengths = offsets[1:] - offsets[:-1]
    out_lengths = in_lengths[perm]
    out_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(out_lengths).astype(jnp.int32)]
    )
    pos = jnp.arange(out_size, dtype=jnp.int32)
    b = (jnp.searchsorted(out_offsets, pos, side="right") - 1).astype(jnp.int32)
    b = jnp.clip(b, 0, perm.shape[0] - 1)
    src = offsets[perm[b]] + (pos - out_offsets[b])
    valid = pos < out_offsets[-1]
    vals = jnp.where(valid, values[jnp.clip(src, 0, values.shape[0] - 1)], 0)
    return vals, out_offsets


def rank_major_to_feature_major_perm(num_ranks: int, num_features: int, bags_per_feature: int):
    """Static bag permutation: input order (rank, feature, bag) -> output order
    (feature, rank, bag) — the global feature-major layout."""
    import numpy as np

    idx = np.arange(num_ranks * num_features * bags_per_feature).reshape(
        num_ranks, num_features, bags_per_feature
    )
    return jnp.asarray(idx.transpose(1, 0, 2).reshape(-1), jnp.int32)


def compact_ragged_global(
    values_global: jnp.ndarray,
    lengths_global: jnp.ndarray,
    num_ranks: int,
    max_values_per_rank: int,
    out_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop per-rank pad tails: scatter each rank's first lengths-sum values into
    a contiguous (out_size,) stream and rebuild global offsets. All static."""
    V = max_values_per_rank
    vals = values_global.reshape(num_ranks, V)
    per_rank_counts = lengths_global.reshape(num_ranks, -1).sum(axis=1)  # (w,)
    rank_starts = jnp.concatenate(
        [jnp.zeros((1,), per_rank_counts.dtype), jnp.cumsum(per_rank_counts)[:-1]]
    )
    pos_in_rank = jax.lax.broadcasted_iota(jnp.int32, (num_ranks, V), 1)
    valid = pos_in_rank < per_rank_counts[:, None]
    target = jnp.where(valid, rank_starts[:, None] + pos_in_rank, out_size)
    out = jnp.zeros((out_size,), values_global.dtype).at[target.reshape(-1)].set(
        vals.reshape(-1), mode="drop"
    )
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(lengths_global).astype(jnp.int32)]
    )
    return out, offsets
