#!/usr/bin/env python
"""Round-2 scatter decomposition sizing: cost of (a) scatter-add as a function
of element count, (b) one-hot MXU matmul scatter for small destination ranges,
(c) bf16 accumulator scatter. Informs the mixed resident/cached backward."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")
    from benchmark.microbench_ops import timeit

    D = 128
    B = 16384
    rng = np.random.default_rng(0)

    # (a) scatter-add cost vs element count (fixed C = 337k)
    C = 337_626
    for L in (81_920, 212_992, 425_984):
        ids = jnp.asarray(rng.integers(0, C, L, dtype=np.int32))
        g = jnp.asarray(rng.standard_normal((L, D)).astype(np.float32))

        def scat(v, gr):
            return jnp.zeros((C, D), jnp.float32).at[v].add(gr)

        t = timeit(jax.jit(scat), ids, g, iters=16)
        log(f"scatter-add f32 L={L:>7}: {t*1e3:7.2f} ms  ({t*1e9/L:.1f} ns/elem)")

    # (b) one-hot matmul scatter for small ranges: grad^T @ onehot
    L = B  # one feature's elements
    for cap in (64, 1024, 4096, 16384):
        ids = jnp.asarray(rng.integers(0, cap, L, dtype=np.int32))
        g16 = jnp.asarray(rng.standard_normal((L, D)).astype(np.float32)).astype(jnp.bfloat16)

        def onehot_scat(v, gr, cap=cap):
            oh = jax.nn.one_hot(v, cap, dtype=jnp.bfloat16)  # (L, cap)
            return jnp.dot(oh.T, gr, preferred_element_type=jnp.float32)

        t = timeit(jax.jit(onehot_scat), ids, g16, iters=16)
        flops = 2 * L * cap * D
        tf = flops / t / 1e12 if t > 0 else float("inf")
        log(f"one-hot matmul cap={cap:>6}: {t*1e3:7.2f} ms  ({tf:.1f} TF/s)")

        def small_scat(v, gr, cap=cap):
            return jnp.zeros((cap, D), jnp.float32).at[v].add(gr.astype(jnp.float32))

        t2 = timeit(jax.jit(small_scat), ids, g16, iters=16)
        log(f"scatter-add  cap={cap:>6}: {t2*1e3:7.2f} ms")

    # (c) bf16 accumulator unsorted scatter (precision risk, speed check)
    L = 425_984
    ids = jnp.asarray(rng.integers(0, C, L, dtype=np.int32))
    g16 = jnp.asarray(rng.standard_normal((L, D)).astype(np.float32)).astype(jnp.bfloat16)

    def scat16(v, gr):
        return jnp.zeros((C, D), jnp.bfloat16).at[v].add(gr)

    t = timeit(jax.jit(scat16), ids, g16, iters=16)
    log(f"scatter-add bf16 accum L={L}: {t*1e3:7.2f} ms")

    # (d) segment-sum into the UNIQUE row set only (dedup scatter):
    # sorted unique + inverse indices precomputed host-side (free: the planner
    # already uniques the window); scatter L rows into U slots.
    uids, inv = np.unique(np.asarray(ids), return_inverse=True)
    U = len(uids)
    inv = jnp.asarray(inv.astype(np.int32))
    g = jnp.asarray(rng.standard_normal((L, D)).astype(np.float32))

    def dedup_scat(iv, gr):
        return jnp.zeros((U, D), jnp.float32).at[iv].add(gr)

    t = timeit(jax.jit(dedup_scat), inv, g, iters=16)
    log(f"dedup scatter (U={U}): {t*1e3:7.2f} ms")

    # (e) lax.sort_key_val alone on L keys
    def sortk(v, gr):
        ks, _ = jax.lax.sort_key_val(v, jnp.arange(L, dtype=jnp.int32))
        return ks

    t = timeit(jax.jit(sortk), ids, g, iters=16)
    log(f"sort_key_val L={L}: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
