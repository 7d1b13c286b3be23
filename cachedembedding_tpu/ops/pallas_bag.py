"""Pallas TPU kernels for the embedding hot path.

``gather_rows_pallas``: rows = weight[ids] for (C, D) weight resident in HBM and
(L,) slot ids. The TPU replacement for ATen's CUDA EmbeddingBag gather
(/root/reference/benchmark/benchmark_cache.py:62). Design:

  * ids arrive via PrefetchScalarGridSpec scalar-prefetch, so the kernel knows
    every row index before the body runs and can program DMAs directly;
  * weight stays in HBM (memory_space=ANY); each grid step copies TILE_L rows
    HBM->VMEM with a rolling window of ``LOOKAHEAD`` in-flight row DMAs
    (double-buffering generalized), hiding HBM latency behind DMA issue;
  * output block (TILE_L, D) lives in VMEM and is written once per grid step.

Backward is a deterministic XLA segment-sum scatter-add (sort-free `.at[].add`),
wired through a custom VJP — Pallas scatter with colliding ids would need
serialization that XLA already does better.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(ids_ref, w_hbm, out_ref, sem):
    TILE_L = out_ref.shape[0]
    LOOKAHEAD = sem.shape[0]

    def dma(i, slot):
        return pltpu.make_async_copy(
            w_hbm.at[ids_ref[i]],
            out_ref.at[i],
            sem.at[slot],
        )

    # Warm-up: start the first LOOKAHEAD row copies.
    for k in range(LOOKAHEAD):

        @pl.when(k < TILE_L)
        def _():
            dma(k, k).start()

    def body(i, _):
        slot = jax.lax.rem(i, LOOKAHEAD)

        @pl.when(i + LOOKAHEAD < TILE_L)
        def _():
            dma(i + LOOKAHEAD, slot).start()

        dma(i, slot).wait()
        return 0

    jax.lax.fori_loop(0, TILE_L, body, 0)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_rows_pallas(
    weight: jnp.ndarray, ids: jnp.ndarray, tile_l: int = 1024, lookahead: int = 16
) -> jnp.ndarray:
    """weight: (C, D) float32 in HBM; ids: (L,) int32 with L % tile_l == 0
    (callers pad). Returns (L, D)."""
    return _gather_fwd_impl(weight, ids, tile_l, lookahead)


def _gather_fwd_impl(weight, ids, tile_l, lookahead):
    L = ids.shape[0]
    C, D = weight.shape
    assert L % tile_l == 0, f"L={L} must be a multiple of tile_l={tile_l}"
    grid = (L // tile_l,)
    # ids are tiled into SMEM per grid step (the full id stream can exceed the
    # ~1 MB SMEM, so no scalar-prefetch of the whole array).
    return pl.pallas_call(
        _gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_l,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((tile_l, D), lambda t: (t, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((lookahead,))],
        out_shape=jax.ShapeDtypeStruct((L, D), weight.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(ids, weight)


def _gather_fwd(weight, ids, tile_l, lookahead):
    return _gather_fwd_impl(weight, ids, tile_l, lookahead), (weight.shape, ids)


def _gather_bwd(tile_l, lookahead, res, g):
    (C, D), ids = res[0], res[1]
    # Deterministic scatter-add; XLA lowers to a sorted segment-sum.
    gw = jnp.zeros((C, D), g.dtype).at[ids].add(g)
    return gw, None


gather_rows_pallas.defvjp(_gather_fwd, _gather_bwd)
