"""Pallas TPU binned scatter-add: the embedding-grad backward.

Replaces ATen's CUDA EmbeddingBag backward (the segment-sum scatter-add of
row grads, /root/reference/benchmark/benchmark_cache.py:62) with a design that
puts the accumulation on the MXU instead of the scalar core:

  grad_weight[v[i]] += g[i]     for i in [0, L)

XLA's unsorted scatter-add runs at a per-element scalar rate (~10-13 ns/elem
on v5e — docs/PERF_NOTES.md), i.e. ~5.7 ms at L=426k regardless of row width.
The observation that beats it: **once elements are ordered by destination row,
every 256-row output tile's contributors form one contiguous range of the
element stream**, and "scatter rows into a tile" becomes a one-hot matmul:

    tile(R, D) += one_hot(local_idx)(R, E) @ g_chunk(E, D)

which is MXU work (L*R*D MACs ~ 1.4e10 at L=426k/R=256/D=128 = ~0.07 ms) plus
one streaming pass over g (~110 MB bf16 = ~0.14 ms) — far under the scalar
scatter floor. Duplicates need no special casing: two elements with the same
local idx are two columns of the one-hot hitting the same tile row.

The ordering itself is NOT computed on device (device sort: ~10 ms; every
sort-free device route measured >= the scatter it saves — PERF_NOTES round-2).
Instead the HOST ships the sort permutation with the window (it already touches
every id when bit-packing; a counting sort over slot ids is one extra linear
pass). Applying the permutation to grads is a vectorized XLA row gather
(~1.2 ms at L=426k bf16). Wire cost ~L*20 bits/iter: negligible on a real
TPU-VM host link, toggleable off for tunnel-class links (config
``ship_sort_perm``).

Layout contract (host side, see hostops.sort_plan):
  * ``v_sorted``  (1, Lp) int32 — slot ids in ascending order, padded to Lp
    with ``num_rows_padded`` (a sentinel >= the padded row count, so padding
    lands in no bin).
  * ``bin_starts`` (NB+1,) int32 — ``searchsorted(v_sorted, R*arange(NB+1))``;
    bin b owns output rows [R*b, R*(b+1)) and elements
    [bin_starts[b], bin_starts[b+1]).
  * ``g_sorted``  (Lp, D) — grad rows permuted into the same order.
Output: (NB*R, D) f32; callers slice [:num_rows].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(bs_ref, v_hbm, g_hbm, out_ref, v_scr, g_scr, sems, *, block_rows, chunk):
    b = pl.program_id(0)
    start = bs_ref[b]
    end = bs_ref[b + 1]
    R = block_rows
    E = chunk
    D = out_ref.shape[1]
    acc0 = jnp.zeros((R, D), jnp.float32)
    row0 = b * R

    # Chunks are ABSOLUTE E-aligned ranges (DMA offsets in the lane dimension
    # must be 128-aligned on TPU); a chunk straddling a bin boundary is
    # processed by both bins with complementary masks.
    def do_chunk(k, acc):
        e0 = pl.multiple_of(k * E, E)
        vdma = pltpu.make_async_copy(
            v_hbm.at[:, pl.ds(e0, E)], v_scr, sems.at[0]
        )
        gdma = pltpu.make_async_copy(
            g_hbm.at[pl.ds(e0, E), :], g_scr, sems.at[1]
        )
        vdma.start()
        gdma.start()
        vdma.wait()
        gdma.wait()
        # local row index within this bin's tile; elements outside
        # [start, end) compare equal to no tile row
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, E), 1) + e0
        valid = (idx >= start) & (idx < end)
        local = jnp.where(valid, v_scr[:, :] - row0, -1)  # (1, E)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (R, E), 0) == local
        ).astype(g_scr.dtype)
        return acc + jax.lax.dot_general(
            onehot,
            g_scr[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    k_lo = start // E
    k_hi = pl.cdiv(end, E)
    out_ref[:, :] = jax.lax.fori_loop(k_lo, k_hi, do_chunk, acc0)


@partial(
    jax.jit,
    static_argnames=("num_rows_padded", "block_rows", "chunk", "interpret"),
)
def binned_scatter_add_sorted(
    g_sorted: jnp.ndarray,       # (Lp, D) grads permuted into ascending-id order
    v_sorted: jnp.ndarray,       # (1, Lp) int32 ascending slot ids (pad: >= num_rows_padded)
    bin_starts: jnp.ndarray,     # (NB+1,) int32
    num_rows_padded: int,        # NB * block_rows
    block_rows: int = 256,
    chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Core kernel: returns (num_rows_padded, D) f32 accumulated grads."""
    Lp, D = g_sorted.shape
    NB = num_rows_padded // block_rows
    assert NB * block_rows == num_rows_padded
    assert bin_starts.shape == (NB + 1,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # v_sorted stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # g_sorted stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (block_rows, D), lambda b, *_: (b, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((1, chunk), jnp.int32),
            pltpu.VMEM((chunk, D), g_sorted.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        partial(_kernel, block_rows=block_rows, chunk=chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_rows_padded, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(bin_starts, v_sorted, g_sorted)


def binned_scatter_add(
    g: jnp.ndarray,            # (L, D) grad rows in stream order
    perm: jnp.ndarray,         # (L,) int32: v[perm] ascending
    v_sorted: jnp.ndarray,     # (L,) int32 ascending slot ids
    bin_starts: jnp.ndarray,   # (NB+1,) int32
    num_rows: int,
    block_rows: int = 256,
    chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full backward: reorder grads by the host-shipped permutation (vectorized
    XLA row gather), pad, run the binned kernel, slice. Returns (num_rows, D)
    f32 — equivalent to ``zeros((num_rows, D)).at[v].add(g)``."""
    L, D = g.shape
    NBR = _cdiv(num_rows, block_rows) * block_rows
    Lp = _cdiv(L, chunk) * chunk + chunk  # chunk over-read never leaves the pad
    g_sorted = jnp.take(g, perm, axis=0)
    g_sorted = jnp.pad(g_sorted, ((0, Lp - L), (0, 0)))
    v_pad = jnp.pad(v_sorted, (0, Lp - L), constant_values=NBR)
    out = binned_scatter_add_sorted(
        g_sorted,
        v_pad.reshape(1, Lp),
        bin_starts,
        NBR,
        block_rows=block_rows,
        chunk=chunk,
        interpret=interpret,
    )
    return out[:num_rows]


def sort_plan_np(v: np.ndarray, num_rows: int, block_rows: int = 256):
    """Host-side plan for one iteration's id stream: (perm, ids_grouped,
    bin_starts) — the stream stably grouped by (id // block_rows). Routed to
    the native two-pass counting sort (hostops.sort_plan, ~4.5 ms at L=426k
    vs ~25 ms np.argsort); falls back to argsort when the lib isn't built.
    The kernel needs bin-contiguity only, so either grouping is valid."""
    from cachedembedding_tpu._native import hostops

    return hostops.sort_plan(v, num_rows, block_rows)
