"""Fixed-size unique — the jit-compatible deduplication at the heart of prepare_ids.

The reference cache calls ``torch.unique`` on every prepare (dynamic output shape is
fine on CUDA eager). Under XLA everything must be static-shape, so ``unique_fixed``
returns a fixed capacity-``size`` unique set plus the true unique count, letting the
host detect capacity overflow instead of silently truncating (which is what
``jnp.unique(size=...)`` would do).

Implementation: one sort of the id stream (O(L log L), the dominant cost — XLA's
TPU sort is fast and this also produces the sorted order the backward scatter
likes), then first-occurrence flags, cumsum ranks, and two O(L) scatters.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("size",))
def unique_fixed(ids: jnp.ndarray, size: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deduplicate ``ids`` (1-D int32, all >= 0) into at most ``size`` uniques.

    Returns:
      uids:     (size,) int32 — unique ids in ascending order, -1 padded.
      counts:   (size,) int32 — multiplicity of each unique id (0 on padding).
      n_unique: ()     int32 — TRUE number of distinct ids (may exceed ``size``;
                caller must treat that as overflow).
    """
    L = ids.shape[0]
    s = jnp.sort(ids)
    is_first = jnp.concatenate([jnp.ones((1,), jnp.bool_), s[1:] != s[:-1]])
    rank = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # (L,) unique-rank of each element
    n_unique = rank[-1] + 1

    # Scatter first occurrences into the unique table; ranks >= size drop.
    target = jnp.where(rank < size, rank, size)
    uids = jnp.full((size,), -1, jnp.int32).at[target].set(s, mode="drop")
    counts = jnp.zeros((size,), jnp.int32).at[target].add(1, mode="drop")
    return uids, counts, n_unique


@partial(jax.jit, static_argnames=("size", "num_rows"))
def unique_mask(
    ids: jnp.ndarray, size: int, num_rows: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sort-free unique over a bounded id domain [0, num_rows).

    O(N + L): one scatter-add histogram over the domain, one prefix sum, two
    compaction scatters. On TPU this is ~50x faster than the sort-based path at
    L in the millions (the cumsum over even a 177M-row domain is a couple of
    HBM passes). Memory: two transient (num_rows,) int32 temps — proportionate,
    since the cache already keeps an (N,) row_to_slot map.

    Same contract as unique_fixed (ascending uids, -1 pad, true n_unique).
    """
    counts_full = jnp.zeros((num_rows,), jnp.int32).at[ids].add(1)
    mask = counts_full > 0
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1  # inclusive rank - 1
    n_unique = rank[-1] + 1
    rows = jnp.arange(num_rows, dtype=jnp.int32)
    tgt = jnp.minimum(jnp.where(mask, rank, size), size)
    uids = jnp.full((size,), -1, jnp.int32).at[tgt].set(rows, mode="drop")
    counts = jnp.zeros((size,), jnp.int32).at[tgt].set(counts_full, mode="drop")
    return uids, counts, n_unique
