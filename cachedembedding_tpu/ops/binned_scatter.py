"""Pallas TPU binned scatter-add: the embedding-grad backward.

Replaces ATen's CUDA EmbeddingBag backward (the segment-sum scatter-add of
row grads, /root/reference/benchmark/benchmark_cache.py:62) with a design that
puts the accumulation on the MXU instead of the scalar core:

  grad_weight[v[i]] += g[i]     for i in [0, L)

XLA's unsorted scatter-add runs at a per-element scalar rate (~10-13 ns/elem
on v5e — docs/PERF_NOTES.md), i.e. 5.7-10 ms at L=426k regardless of row
width. The observation that beats it: **once elements are grouped by
destination tile, every R-row output tile's contributors form one contiguous
range of the element stream**, and "scatter rows into a tile" becomes a
one-hot matmul

    tile(R, D) += one_hot(local_idx)(R, E) @ g_chunk(E, D)

which is MXU work (L*R*D MACs ~ 1.4e10 at L=426k/R=256/D=128 = ~0.07 ms) plus
one streaming pass over g — far under the scalar scatter floor. Duplicates
need no special casing: equal local idx = repeated one-hot columns.

Kernel structure (v2 — the v1 manual-DMA form measured 13 ms: ~3.5k serial
DMA round-trips): a host/XLA-computed **visit schedule** drives the grid.
Visit t processes element-block ci[t] of the grouped stream into output tile
cb[t]; both arrive via PrefetchScalarGridSpec, so the g/id blocks are ordinary
BlockSpec inputs that Pallas pipelines (double-buffered DMA overlapped with
the matmuls), and the output tile stays resident in VMEM across consecutive
visits of the same bin (index_map unchanged -> accumulate; changed -> write
back). Boundary blocks shared by two bins are visited twice with
complementary masks; empty bins get one all-masked visit so their tile is
written (zeros).

The grouping itself is NOT computed on device (device sort: ~10 ms; every
sort-free device route measured >= the scatter it saves — PERF_NOTES round-2).
The HOST ships the grouping permutation with the window (hostops.sort_plan:
two-pass counting sort, ~4.5 ms at L=426k; it already touches every id when
bit-packing). Applying the permutation to grads is one vectorized XLA row
gather (~1.2 ms at L=426k bf16). Wire cost ~2 x L x 20 bits/iter: negligible
on a real TPU-VM host link, toggleable for tunnel-class links.

Layout contract (host side, hostops.sort_plan):
  * ``perm`` (L,) int32 — stable grouping by (id // block_rows);
  * ``ids_grouped`` (L,) int32 — ids[perm] (bin-contiguous, NOT fully sorted);
  * ``bin_starts`` (NB+1,) int32 — element range of bin b is
    [bin_starts[b], bin_starts[b+1]); bin b owns rows [R*b, R*(b+1)).
Output: (num_rows, D) f32 == zeros(...).at[ids].add(g).
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


def _kernel(cb_ref, ci_ref, first_ref, bs_ref, v_blk, g_blk, out_blk,
            *, block_rows, chunk):
    t = pl.program_id(0)
    b = cb_ref[t]
    start = bs_ref[b]
    end = bs_ref[b + 1]
    e0 = ci_ref[t] * chunk

    @pl.when(first_ref[t] == 1)
    def _():
        out_blk[...] = jnp.zeros_like(out_blk)

    idx = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + e0
    valid = (idx >= start) & (idx < end) & (first_ref[t] != 2)
    local = jnp.where(valid, v_blk[...] - b * block_rows, -1)  # (1, E)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (block_rows, chunk), 0) == local
    ).astype(g_blk.dtype)
    out_blk[...] += jax.lax.dot_general(
        onehot,
        g_blk[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("num_rows_padded", "block_rows", "chunk",
                                   "interpret"))
def binned_scatter_add_grouped(
    g_grouped: jnp.ndarray,      # (Lp, D) grads permuted into bin-grouped order
    v_grouped: jnp.ndarray,      # (1, Lp) int32 bin-grouped ids
    bin_starts: jnp.ndarray,     # (NB+1,) int32
    num_rows_padded: int,        # NB * block_rows
    block_rows: int = 256,
    chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Core kernel: (num_rows_padded, D) f32 accumulated grads."""
    Lp, D = g_grouped.shape
    NB = num_rows_padded // block_rows
    assert NB * block_rows == num_rows_padded
    assert bin_starts.shape == (NB + 1,)
    assert Lp % chunk == 0
    E = chunk
    # visit schedule (shared with binned_sgd_update; `last` unused here)
    cb, ci, first, _last, T = _visit_schedule(bin_starts, Lp, NB, E)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # cb, ci, first, bin_starts
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, E), lambda t, cb, ci, first, bs: (0, ci[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, D), lambda t, cb, ci, first, bs: (ci[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, D), lambda t, cb, ci, first, bs: (cb[t], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        partial(_kernel, block_rows=block_rows, chunk=chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_rows_padded, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(cb, ci, first, bin_starts, v_grouped, g_grouped)


def binned_scatter_add(
    g: jnp.ndarray,            # (L, D) grad rows in stream order
    perm: jnp.ndarray,         # (L,) int32 grouping permutation
    v_grouped: jnp.ndarray,    # (L,) int32 bin-grouped ids
    bin_starts: jnp.ndarray,   # (NB+1,) int32
    num_rows: int,
    block_rows: int = 512,
    chunk: int = 2048,
    interpret: bool = None,
) -> jnp.ndarray:
    """Full backward: reorder grads by the host-shipped grouping permutation
    (one vectorized XLA row gather, padded in the same gather via index clamp),
    run the visit-scheduled kernel, slice. Returns (num_rows, D) f32 —
    equivalent to ``zeros((num_rows, D)).at[ids].add(g)``."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    L, D = g.shape
    NBR = _cdiv(num_rows, block_rows) * block_rows
    Lp = _cdiv(L, chunk) * chunk
    # pad + permute in ONE gather. Pad entries point at row 0 (in range), so
    # the gather takes the PROMISE_IN_BOUNDS path (mode="wrap": one cheap mod
    # over the indices) — clip/fill modes add per-row bounds
    # checks that knock XLA off its vectorized gather path (measured 4.4 ms
    # vs ~1.2 ms at L=426k bf16). Their ids (pad value NBR) mask them out of
    # every bin.
    perm_p = jnp.pad(perm, (0, Lp - L))
    g_grouped = jnp.take(g, perm_p, axis=0, mode="wrap")
    v_pad = jnp.pad(v_grouped, (0, Lp - L), constant_values=NBR)
    out = binned_scatter_add_grouped(
        g_grouped,
        v_pad.reshape(1, Lp),
        bin_starts,
        NBR,
        block_rows=block_rows,
        chunk=chunk,
        interpret=interpret,
    )
    return out[:num_rows]


def _visit_schedule(bin_starts, Lp, NB, E):
    """Vectorized visit schedule from bin element offsets: (cb, ci, first,
    last). flags: first=1 zero-acc, 2 = dead slack visit; last=1 emit tile."""
    s = bin_starts[:-1]
    e = bin_starts[1:]
    k = jnp.maximum((e + E - 1) // E - s // E, 1)
    T = Lp // E + NB + 1
    cum = jnp.cumsum(k)
    starts_t = jnp.concatenate([jnp.zeros((1,), cum.dtype), cum[:-1]])
    tt = jnp.arange(T, dtype=jnp.int32)
    cb = jnp.searchsorted(cum, tt, side="right").astype(jnp.int32)
    pad_visit = cb >= NB
    cb = jnp.minimum(cb, NB - 1)
    ci = ((s[cb] // E) + (tt - starts_t[cb].astype(jnp.int32))).astype(jnp.int32)
    ci = jnp.clip(ci, 0, Lp // E - 1)
    first = jnp.where(tt == starts_t[cb].astype(jnp.int32), 1, 0)
    first = jnp.where(pad_visit, 2, first).astype(jnp.int32)
    last = jnp.where(
        (tt == (cum[cb] - 1).astype(jnp.int32)) & ~pad_visit, 1, 0
    ).astype(jnp.int32)
    return cb, ci, first, last, T


def _kernel_sgd(cb_ref, ci_ref, first_ref, last_ref, bs_ref, v_blk, g_blk,
                cw_blk, slr_ref, out_blk, acc, *, block_rows, chunk):
    t = pl.program_id(0)
    b = cb_ref[t]
    start = bs_ref[b]
    end = bs_ref[b + 1]
    e0 = ci_ref[t] * chunk

    @pl.when(first_ref[t] == 1)
    def _():
        acc[...] = jnp.zeros_like(acc)

    idx = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + e0
    valid = (idx >= start) & (idx < end) & (first_ref[t] != 2)
    local = jnp.where(valid, v_blk[...] - b * block_rows, -1)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (block_rows, chunk), 0) == local
    ).astype(g_blk.dtype)
    acc[...] += jax.lax.dot_general(
        onehot,
        g_blk[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(last_ref[t] == 1)
    def _():
        out_blk[...] = (
            cw_blk[...].astype(jnp.float32) - slr_ref[0] * acc[...]
        ).astype(out_blk.dtype)


@partial(jax.jit, static_argnames=("block_rows", "chunk", "interpret"),
         donate_argnames=("cw",))
def binned_sgd_update(
    cw: jnp.ndarray,           # (C, D) cache rows (any storage dtype)
    g: jnp.ndarray,            # (L, D) row grads in stream order
    perm: jnp.ndarray,         # (L,) int32 grouping permutation
    v_grouped: jnp.ndarray,    # (L,) int32 bin-grouped ids
    bin_starts: jnp.ndarray,   # (NB+1,) int32 over ceil(C/block_rows) bins
    slr: jnp.ndarray,          # () f32 sparse LR
    block_rows: int = 512,
    chunk: int = 2048,
    interpret: bool = None,
) -> jnp.ndarray:
    """FUSED backward + SGD: cw.at[ids].add(-slr * g) in one kernel pass —
    no (C, D) f32 grad is ever materialized and no separate full-array update
    pass runs (together those measure 10-17 ms/iter at C~900k on chip; this
    kernel's traffic is one read + one write of cw plus the g stream). Per
    bin: accumulate the one-hot matmuls into a VMEM f32 scratch tile, then
    emit (cw_tile - slr*acc) once at the bin's last visit."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    C, D = cw.shape
    L = g.shape[0]
    E = chunk
    R = block_rows
    NB = _cdiv(C, R)
    C_pad = NB * R
    Lp = _cdiv(L, E) * E
    perm_p = jnp.pad(perm, (0, Lp - L))
    g_grouped = jnp.take(g, perm_p, axis=0, mode="wrap")
    v_pad = jnp.pad(v_grouped, (0, Lp - L), constant_values=C_pad).reshape(1, Lp)
    cw_pad = jnp.pad(cw, ((0, C_pad - C), (0, 0))) if C_pad != C else cw
    cb, ci, first, last, T = _visit_schedule(bin_starts, Lp, NB, E)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # cb, ci, first, last, bin_starts
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, E), lambda t, cb, ci, fi, la, bs: (0, ci[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, D), lambda t, cb, ci, fi, la, bs: (ci[t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, D), lambda t, cb, ci, fi, la, bs: (cb[t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # slr (1,)
        ],
        out_specs=pl.BlockSpec(
            (R, D), lambda t, cb, ci, fi, la, bs: (cb[t], 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((R, D), jnp.float32)],
    )
    out = pl.pallas_call(
        partial(_kernel_sgd, block_rows=R, chunk=E),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C_pad, D), cw.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(cb, ci, first, last, bin_starts, v_pad, g_grouped, cw_pad,
      slr.reshape(1).astype(jnp.float32))
    return out[:C] if C_pad != C else out


def sort_plan_np(v: np.ndarray, num_rows: int, block_rows: int = 512):
    """Host-side plan for one iteration's id stream: (perm, ids_grouped,
    bin_starts) — the stream stably grouped by (id // block_rows). Routed to
    the native two-pass counting sort (hostops.sort_plan, ~4.5 ms at L=426k
    vs ~25 ms np.argsort); falls back to argsort when the lib isn't built.
    The kernel needs bin-contiguity only, so either grouping is valid."""
    from cachedembedding_tpu._native import hostops

    return hostops.sort_plan(v, num_rows, block_rows)
