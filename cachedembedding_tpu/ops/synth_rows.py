"""Lazy device-side materialization of never-trained embedding rows.

Embedding init is a PURE FUNCTION of (global row id, column, seed) — per-table
U(-1/sqrt(n), 1/sqrt(n)) from a 32-bit hash. The host master table and the
device therefore agree on the init value of any row that has never been
trained, which means admitting such a row into the HBM cache needs NO
host->device transfer at all: the device synthesizes it locally from the row
id. On long-tail recsys id streams most cache misses ARE never-trained tail
rows, so this removes the bulk of the cache's admit bandwidth (the reference
must copy every admitted row over PCIe: its host weight is an arbitrary
materialized tensor, /root/reference/benchmark/benchmark_fbgemm_uvm.py:104).

Keep this generator in bit-for-bit lockstep with ``gen_row_canonical`` in
_native/hostops.cpp and ``gen_rows_canonical`` in _native/hostops.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _mix32(x: jnp.ndarray) -> jnp.ndarray:
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    return x ^ (x >> jnp.uint32(16))


@partial(jax.jit, static_argnames=("dim",))
def synth_rows(
    rows: jnp.ndarray,    # (n,) int32 global row ids (>= 0)
    bounds: jnp.ndarray,  # (n,) float32 per-row init bound (1/sqrt(table_size))
    seed: jnp.ndarray,    # () uint32
    dim: int,
    col_start: jnp.ndarray = None,  # () int32: first GLOBAL column of the slice
) -> jnp.ndarray:
    """(n, dim) float32 == the canonical host generator's rows.

    ``col_start`` generates columns [col_start, col_start+dim) of the full row
    — bit-identical to slicing the full-width output. Used by dim-sharded
    (column-parallel) caches so each rank synthesizes only its own shard."""
    h0 = _mix32(rows.astype(jnp.uint32) * jnp.uint32(0x9E3779B1) + seed)
    cols = jnp.arange(dim, dtype=jnp.uint32)
    if col_start is not None:
        cols = cols + col_start.astype(jnp.uint32)
    j = cols * jnp.uint32(0x85EBCA77) + jnp.uint32(1)
    h = _mix32(h0[:, None] ^ j[None, :])
    scale = 2.0 * bounds * jnp.float32(1.0 / 16777216.0)
    v = (h >> jnp.uint32(8)).astype(jnp.float32) * scale[:, None]
    return v - bounds[:, None]


@partial(jax.jit, donate_argnames=("cache_weight",))
def scatter_synth_admits(
    cache_weight: jnp.ndarray,
    slots: jnp.ndarray,   # (b,) int32 destination slots, -1 = padding
    rows: jnp.ndarray,    # (b,) int32 global row ids (0 on padding)
    bounds: jnp.ndarray,  # (b,) float32
    seed: jnp.ndarray,    # () uint32
) -> jnp.ndarray:
    """Admit never-trained rows: generate on device, land in cache slots."""
    vals = synth_rows(rows, bounds, seed, cache_weight.shape[1])
    C = cache_weight.shape[0]
    return cache_weight.at[jnp.where(slots >= 0, slots, C)].set(
        vals.astype(cache_weight.dtype), mode="drop"
    )
