"""Real-chip microbench: Pallas binned MXU scatter-add vs XLA `.at[].add`.

Headline shape: L=426k (B=16384 x F=26), D=128, C=337k cached slots. Grads are
generated ON DEVICE (as in the real backward — only ids/perm/bins ride the
link, ~7 MB total), inputs vary per iteration (the backend memoizes identical
executes), and every timing ends in a scalar readback (`block_until_ready`
does not block on the tunneled backend). See docs/PERF_NOTES.md.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmark/microbench_binned_scatter.py
"""

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
    NVAR = 3
    for C in (337_000,):
        raw = rng.zipf(1.5, size=(NVAR, L)).astype(np.int64)
        vs = (raw % C).astype(np.int32)
        t0 = time.perf_counter()
        plans = [sort_plan_np(v, C) for v in vs]
        host_ms = (time.perf_counter() - t0) / NVAR * 1000
        print(f"C={C} L={L} D={D} (host sort_plan_np {host_ms:.1f} ms/iter)",
              flush=True)

        def timeit(fn, args_list, iters=9, tag=""):
            o = fn(*args_list[0])
            _ = np.asarray(o[:1, :1])  # warm: compile + first exec
            t0 = time.perf_counter()
            for i in range(iters):
                o = fn(*args_list[i % len(args_list)])
            _ = np.asarray(o[:1, :1])
            dt = (time.perf_counter() - t0) / iters * 1000
            print(f"  {tag}: {dt:.2f} ms", flush=True)
            return dt

        import jax.numpy as _jnp

        @jax.jit
        def take_only(g, perm):
            return _jnp.take(g, perm, axis=0, mode="wrap")

        args_t = [
            (jax.random.normal(jax.random.PRNGKey(i), (L, D), _jnp.float32
             ).astype(_jnp.bfloat16), _jnp.asarray(p[0]))
            for i, p in enumerate(plans)
        ]
        timeit(take_only, args_t, tag="take(g, perm) alone bf16")

        for dt_name in ("bf16",):
            gdt = jnp.bfloat16 if dt_name == "bf16" else jnp.float32

            @jax.jit
            def make_g(seed):
                return jax.random.normal(
                    jax.random.PRNGKey(seed), (L, D), jnp.float32
                ).astype(gdt)

            @jax.jit
            def xla_scatter(g, v):
                return jnp.zeros((C, D), jnp.float32).at[v].add(
                    g.astype(jnp.float32)
                )

            args = [(make_g(i), jnp.asarray(v)) for i, v in enumerate(vs)]
            _ = np.asarray(args[-1][0][:1, :1])  # land g's before the clock
            timeit(xla_scatter, args, tag=f"xla scatter-add {dt_name}")

            args2 = [
                (make_g(i), jnp.asarray(p[0]), jnp.asarray(p[1]),
                 jnp.asarray(p[2]), C)
                for i, p in enumerate(plans)
            ]
            for (R, E) in ((512, 2048), (512, 4096), (768, 2048)):
                pl2 = [sort_plan_np(v, C, R) for v in vs]
                args3 = [
                    (a[0], jnp.asarray(p[0]), jnp.asarray(p[1]),
                     jnp.asarray(p[2]), C)
                    for a, p in zip(args2, pl2)
                ]
                timeit(
                    (lambda R_, E_: lambda g, perm, vsrt, bst, c:
                        binned_scatter_add(g, perm, vsrt, bst, c,
                                           block_rows=R_, chunk=E_))(R, E),
                    args3,
                    tag=f"pallas binned {dt_name} R={R} E={E}",
                )


if __name__ == "__main__":
    main()
