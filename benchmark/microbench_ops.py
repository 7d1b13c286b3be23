#!/usr/bin/env python
"""Primitive-op shootout on the real chip, sizing round-2 optimizations.

Times the candidate formulations for the two open hot spots:

  * backward scatter-add  g_cache[v] += g_rows   (L=426k, D=128, C=337k)
      - unsorted .at[].add (today's path)
      - sorted ids + indices_are_sorted scatter (floor if ids arrived sorted)
      - device binning permutation (chunked one-hot cumsum) + reorder + sorted
      - unique-position .at[].set reorder (collision-free scatter)
  * device-side id remap   slot = mirror[raw_id]  (L scalar gathers from 33.7M)

All timings are best-of-k differential (chained executes, block once), done in
one process so the shared-chip noise cancels within a run. stderr only; this is
a measurement harness, not a CI benchmark.
"""

import argparse
import sys
import time
from functools import partial

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=32):
    """Differential timing with a DATA DEPENDENCY between iterations: each
    call's first array argument is perturbed by a scalar derived from the
    previous output, defeating any backend memoization of identical executes
    and forcing serial execution. Times (iters) minus (1) chained calls."""
    import jax
    import jax.numpy as jnp

    first = args[0]

    @jax.jit
    def chained(x0, rest, eps):
        # eps increments every call, so the input VALUES differ each iteration
        # (the tunnel backend memoizes executes on identical inputs) and the
        # carry chain forces serial execution.
        if jnp.issubdtype(x0.dtype, jnp.integer):
            x = x0 + (eps * 0).astype(x0.dtype)
        else:
            x = x0 * (1 + eps * 1e-30).astype(x0.dtype)
        out = fn(x, *rest)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return out, eps + 1 + leaf.ravel()[0].astype(jnp.float32) * 0

    def run(k):
        eps = jnp.float32(0.0)
        out = None
        for _ in range(k):
            out, eps = chained(first, args[1:], eps)
        # block_until_ready does NOT wait on the tunneled backend; a scalar
        # readback is the only true synchronization point.
        import numpy as _np

        _ = _np.asarray(eps)
        return out

    run(1)
    t_short, t_long = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        run(1)
        t_short.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(1 + iters)
        t_long.append(time.perf_counter() - t0)
    # min each term SEPARATELY: differencing two noisy measurements and then
    # taking the min of the difference biases toward zero on a shared chip.
    return max((min(t_long) - min(t_short)) / iters, 0.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, default=26 * 16384)
    p.add_argument("--C", type=int, default=337_626)
    p.add_argument("--N", type=int, default=33_762_577)
    p.add_argument("--D", type=int, default=128)
    p.add_argument("--skew", type=float, default=0.5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    L, C, D, N = args.L, args.C, args.D, args.N
    rng = np.random.default_rng(0)
    # zipf-ish slot ids (frequency-ranked: hot slots are small numbers)
    u = rng.random(L)
    ids_np = np.minimum((C * u ** (1.0 / (1.0 - args.skew))).astype(np.int64), C - 1)
    ids_np = ids_np.astype(np.int32)
    ids = jnp.asarray(ids_np)
    g = jnp.asarray(rng.standard_normal((L, D)).astype(np.float32))
    g16 = g.astype(jnp.bfloat16)
    w16 = jnp.asarray(rng.standard_normal((C, D)).astype(np.float32)).astype(jnp.bfloat16)

    # ---------------- gather (forward lookup) --------------------------------
    @jax.jit
    def gather_rows(w, v):
        return jnp.take(w, v, axis=0)

    t = timeit(gather_rows, w16, ids)
    log(f"gather bf16 (L={L}, D={D}):            {t*1e3:8.2f} ms")

    # ---------------- scatter-add variants ----------------------------------
    @jax.jit
    def scat_unsorted(v, gr):
        return jnp.zeros((C, D), jnp.float32).at[v].add(gr)

    t_uns = timeit(scat_unsorted, ids, g)
    log(f"scatter-add unsorted f32:               {t_uns*1e3:8.2f} ms")

    t_uns16 = timeit(scat_unsorted, ids, g16)
    log(f"scatter-add unsorted (bf16 grads):      {t_uns16*1e3:8.2f} ms")

    ids_sorted_np = np.sort(ids_np)
    ids_sorted = jnp.asarray(ids_sorted_np)

    @jax.jit
    def scat_sorted(v, gr):
        zero = jnp.zeros((C, D), jnp.float32)
        return zero.at[v].add(gr, indices_are_sorted=True)

    t_s = timeit(scat_sorted, ids_sorted, g)
    log(f"scatter-add pre-sorted hint f32:        {t_s*1e3:8.2f} ms")

    @jax.jit
    def segsum_sorted(v, gr):
        return jax.ops.segment_sum(gr, v, num_segments=C, indices_are_sorted=True)

    t = timeit(segsum_sorted, ids_sorted, g)
    log(f"segment_sum sorted f32:                 {t*1e3:8.2f} ms")

    @jax.jit
    def sort_then_scatter(v, gr):
        vs, order = jax.lax.sort_key_val(v, jnp.arange(L, dtype=jnp.int32))
        gs = jnp.take(gr, order, axis=0)
        return jnp.zeros((C, D), jnp.float32).at[vs].add(gs, indices_are_sorted=True)

    t = timeit(sort_then_scatter, ids, g)
    log(f"device sort+reorder+sorted-scatter:     {t*1e3:8.2f} ms")

    # unique-position reorder: g_binned.at[pos].set(g) with pos a permutation
    pos_np = np.argsort(np.argsort(ids_np, kind="stable"))
    pos = jnp.asarray(pos_np.astype(np.int32))

    @jax.jit
    def reorder_set(ppos, gr):
        return jnp.zeros((L, D), gr.dtype).at[ppos].set(gr, unique_indices=True)

    t = timeit(reorder_set, pos, g)
    log(f"permutation scatter-SET unique f32:     {t*1e3:8.2f} ms")

    @jax.jit
    def reorder_gather(inv, gr):
        return jnp.take(gr, inv, axis=0)

    inv = jnp.asarray(np.argsort(ids_np, kind="stable").astype(np.int32))
    t = timeit(reorder_gather, inv, g)
    log(f"permutation gather f32 (L from L):      {t*1e3:8.2f} ms")

    # ---------------- device binning permutation -----------------------------
    # chunked one-hot cumsum rank: bins = v >> 10; stable position of each
    # element inside its bin without a sort.
    NB = 1 << max(0, (C - 1).bit_length() - 10 + 1)  # bins of 1024 slots
    NB = max(NB, 8)
    SHIFT = 10
    T = 256  # chunk

    Lpad = ((L + T - 1) // T) * T

    @jax.jit
    def binperm(v):
        vpad = jnp.full((Lpad,), C - 1, v.dtype).at[:L].set(v)
        bins = (vpad >> SHIFT).astype(jnp.int32).reshape(Lpad // T, T)

        def chunk(carry, b):
            oh = jax.nn.one_hot(b, NB, dtype=jnp.int32)  # (T, NB)
            ranks = jnp.cumsum(oh, axis=0) - oh  # exclusive
            my_rank = jnp.take_along_axis(ranks, b[:, None], axis=1)[:, 0]
            local = carry[b] + my_rank
            return carry + oh.sum(axis=0), local

        carry0 = jnp.zeros((NB,), jnp.int32)
        hist, local = jax.lax.scan(chunk, carry0, bins)
        starts = jnp.cumsum(hist) - hist
        flat_bins = bins.reshape(-1)
        return (starts[flat_bins] + local.reshape(-1))[:L]

    t_bp = timeit(binperm, ids)
    log(f"binning permutation (scan one-hot):     {t_bp*1e3:8.2f} ms  (NB={NB})")

    # full pipeline: binperm + reorder-set + sorted scatter-add
    @jax.jit
    def binned_scatter(v, gr):
        ppos = binperm(v)
        gs = jnp.zeros((L, D), gr.dtype).at[ppos].set(gr, unique_indices=True)
        vs = jnp.zeros((L,), v.dtype).at[ppos].set(v, unique_indices=True)
        return jnp.zeros((C, D), jnp.float32).at[vs].add(
            gs, indices_are_sorted=False
        )  # bin-sorted, not fully sorted: no hint

    t = timeit(binned_scatter, ids, g)
    log(f"binperm+reorder+binned scatter-add:     {t*1e3:8.2f} ms")

    # ---------------- remap gather (device-side remap cost) ------------------
    mirror = jnp.asarray(rng.integers(0, C, N, dtype=np.int32))
    raw = jnp.asarray(rng.integers(0, N, L, dtype=np.int32))

    @jax.jit
    def remap(m, r):
        return jnp.take(m, r)

    t = timeit(remap, mirror, raw)
    log(f"scalar remap gather (L from {N//10**6}M):       {t*1e3:8.2f} ms")

    # remap + unpack analog: shifts on u8 stream
    blob = jnp.asarray(rng.integers(0, 255, 3 * L, dtype=np.uint8))

    @jax.jit
    def unpack24(b):
        x = b.astype(jnp.int32).reshape(L, 3)
        return x[:, 0] | (x[:, 1] << 8) | (x[:, 2] << 16)

    t = timeit(unpack24, blob)
    log(f"24-bit unpack (L):                      {t*1e3:8.2f} ms")

    log("--- summary ---")
    log(f"today's backward cost   ~ {t_uns16*1e3:.2f} ms/step (unsorted bf16)")
    log(f"pre-sorted floor        ~ {t_s*1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
