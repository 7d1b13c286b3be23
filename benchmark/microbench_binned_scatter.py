"""Real-chip microbench: Pallas binned MXU scatter-add vs XLA `.at[].add`.

Headline shape: L=426k (B=16384 x F=26), D=128, C=337k cached slots (+ mixed
resident variants). Methodology per docs/PERF_NOTES.md: vary an input per
iteration (backend memoizes identical executes) and end every timing in a
scalar readback (`block_until_ready` does not block on the tunneled backend).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmark/microbench_binned_scatter.py
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)

    from cachedembedding_tpu.ops.binned_scatter import (
        binned_scatter_add,
        sort_plan_np,
    )

    rng = np.random.default_rng(0)
    B, F, D = 16384, 26, 128
    L = B * F
    for C in (337_000, 1_000_000):
        # Zipf-ish skew like the cache's slot-id stream (hot slots are small)
        raw = rng.zipf(1.5, size=(4, L)).astype(np.int64)
        vs = (raw % C).astype(np.int32)
        gs = [rng.standard_normal((L, D)).astype(np.float32) for _ in range(4)]
        import ml_dtypes

        plans = [sort_plan_np(v, C) for v in vs]

        def timeit(fn, args_list, iters=8, tag=""):
            # warm each distinct signature once
            o = fn(*args_list[0])
            _ = np.asarray(o[:1, :1])
            t0 = time.perf_counter()
            for i in range(iters):
                o = fn(*args_list[i % len(args_list)])
            _ = np.asarray(o[:1, :1])
            dt = (time.perf_counter() - t0) / iters * 1000
            print(f"  {tag}: {dt:.2f} ms", flush=True)
            return dt

        print(f"C={C} L={L} D={D}", flush=True)
        for dt_name, cast in (("f32", np.float32), ("bf16", ml_dtypes.bfloat16)):
            # XLA unsorted scatter-add baseline
            import functools

            @functools.partial(jax.jit, static_argnames=())
            def xla_scatter(g, v):
                return jnp.zeros((C, D), jnp.float32).at[v].add(
                    g.astype(jnp.float32)
                )

            args = [(jnp.asarray(g.astype(cast)), jnp.asarray(v))
                    for g, v in zip(gs, vs)]
            timeit(xla_scatter, args, tag=f"xla scatter-add {dt_name}")

            args2 = [
                (
                    jnp.asarray(g.astype(cast)),
                    jnp.asarray(p[0]),
                    jnp.asarray(p[1]),
                    jnp.asarray(p[2]),
                    C,
                )
                for g, p in zip(gs, plans)
            ]
            timeit(
                lambda g, perm, vsrt, bst, c: binned_scatter_add(
                    g, perm, vsrt, bst, c
                ),
                args2,
                tag=f"pallas binned {dt_name}",
            )
        # host-side sort_plan cost (np.argsort path)
        t0 = time.perf_counter()
        for v in vs:
            sort_plan_np(v, C)
        print(f"  host sort_plan_np: {(time.perf_counter()-t0)/4*1000:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
