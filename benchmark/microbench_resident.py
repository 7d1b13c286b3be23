"""Hunt the resident-region device tax (VERDICT r2 / TODO #1).

Window device time grows ~0.8 ms/iter per 100k resident rows and the cause is
unknown (forced sparse-grad does not move it). This measures each suspect
primitive at three device-array sizes N (cache-only 337k vs mixed 637k/937k),
all with the SAME id-stream length L=426k, so whatever scales with N is the
tax. Methodology: vary inputs per iteration, scalar-readback timing.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmark/microbench_resident.py
"""

import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)

    rng = np.random.default_rng(0)
    B, F, D = 16384, 26, 128
    L = B * F

    def timeit(fn, args_list, iters=8, tag=""):
        o = fn(*args_list[0])
        _ = np.asarray(jnp.ravel(o if not isinstance(o, tuple) else o[0])[:1])
        t0 = time.perf_counter()
        for i in range(iters):
            o = fn(*args_list[i % len(args_list)])
        _ = np.asarray(jnp.ravel(o if not isinstance(o, tuple) else o[0])[:1])
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"  {tag}: {dt:.2f} ms", flush=True)
        return dt

    for N in (337_000, 637_000, 937_000):
        print(f"N={N} L={L} D={D}", flush=True)
        vs = [rng.integers(0, N, size=(L,)).astype(np.int32) for _ in range(3)]

        @jax.jit
        def make_g_rows(seed):
            return jax.random.normal(jax.random.PRNGKey(seed), (L, D),
                                     jnp.float32).astype(jnp.bfloat16)

        @jax.jit
        def make_cw(seed):
            return jax.random.normal(jax.random.PRNGKey(seed), (N, D),
                                     jnp.float32).astype(jnp.bfloat16)

        # (a) the f32 update round-trip pass over the full device array
        @jax.jit
        def update_pass(cw, g32):
            return (cw.astype(jnp.float32) - 0.1 * g32).astype(jnp.bfloat16)

        @jax.jit
        def make_g32(seed):
            return jax.random.normal(jax.random.PRNGKey(seed), (N, D),
                                     jnp.float32)

        args = [(make_cw(i), make_g32(i)) for i in range(2)]
        timeit(update_pass, args, tag="update pass (cw - lr*g32) full array")

        # (b) autodiff-shaped dense grad: zeros + scatter-add of L rows
        @jax.jit
        def dense_grad(g_rows, v):
            return jnp.zeros((N, D), jnp.float32).at[v].add(
                g_rows.astype(jnp.float32))

        args = [(make_g_rows(i), jnp.asarray(v)) for i, v in enumerate(vs[:2])]
        timeit(dense_grad, args, tag="zeros+scatter-add (autodiff grad shape)")

        # (c) gather of L rows vs N
        @jax.jit
        def gather(cw, v):
            return jnp.take(cw, v, axis=0)

        args = [(make_cw(i), jnp.asarray(v)) for i, v in enumerate(vs[:2])]
        timeit(gather, args, tag="gather L rows")

        # (d) fused one-step train-shape: gather -> pool -> fake loss ->
        # dense grad via autodiff -> update (the window body minus the model)
        @jax.jit
        def step_shape(cw, v, seed):
            tgt = jax.random.normal(jax.random.PRNGKey(seed), (F * B // F, F, D))

            def loss_fn(cw_):
                rows = jnp.take(cw_, v, axis=0).astype(jnp.float32)
                pooled = rows.reshape(F, B, D).transpose(1, 0, 2)
                return jnp.mean((pooled - tgt) ** 2)

            g = jax.grad(loss_fn)(cw)
            return (cw.astype(jnp.float32) - 0.1 * g).astype(jnp.bfloat16)

        args = [(make_cw(i), jnp.asarray(v), i) for i, v in enumerate(vs[:2])]
        timeit(step_shape, args, tag="full step shape (gather+grad+update)")

        # (e) same but sparse: explicit rows grad + scatter-add update
        @jax.jit
        def step_sparse(cw, v, seed):
            tgt = jax.random.normal(jax.random.PRNGKey(seed), (B, F, D))

            def loss_fn(rows):
                pooled = rows.astype(jnp.float32).reshape(F, B, D).transpose(1, 0, 2)
                return jnp.mean((pooled - tgt) ** 2)

            rows0 = jnp.take(cw, v, axis=0)
            g_rows = jax.grad(loss_fn)(rows0)
            return cw.at[v].add((-0.1 * g_rows.astype(jnp.float32)).astype(cw.dtype))

        args = [(make_cw(i), jnp.asarray(v), i) for i, v in enumerate(vs[:2])]
        timeit(step_sparse, args, tag="full step shape SPARSE (gather+rows-grad+scatter)")

        # (f/g) CONVERT-WRAP HYPOTHESIS (hlo_resident_census.py): XLA wraps a
        # 16-bit scatter in full-array bf16->f32->bf16 converts — 3 full-N
        # passes per step, path-independent, which would BE the tax. If so:
        # scatter into an f32 operand shows ~no N-scaling, bf16 does.
        @jax.jit
        def make_cw32(seed):
            return jax.random.normal(jax.random.PRNGKey(seed), (N, D),
                                     jnp.float32)

        @jax.jit
        def scat_bf16(cw, v, g_rows):
            return cw.at[v].add(g_rows, mode="promise_in_bounds")

        @jax.jit
        def scat_f32(cw32, v, g_rows):
            return cw32.at[v].add(g_rows.astype(jnp.float32),
                                  mode="promise_in_bounds")

        args = [(make_cw(i), jnp.asarray(v), make_g_rows(i))
                for i, v in enumerate(vs[:2])]
        timeit(scat_bf16, args, tag="bare scatter-add, bf16 operand")
        args = [(make_cw32(i), jnp.asarray(v), make_g_rows(i))
                for i, v in enumerate(vs[:2])]
        timeit(scat_f32, args, tag="bare scatter-add, f32 operand")

        # (h) the fix candidate: sparse step with f32 STORAGE (gather wraps,
        # scatter native f32 in-place — nothing traverses N)
        @jax.jit
        def step_sparse32(cw32, v, seed):
            tgt = jax.random.normal(jax.random.PRNGKey(seed), (B, F, D))

            def loss_fn(rows):
                pooled = rows.reshape(F, B, D).transpose(1, 0, 2)
                return jnp.mean((pooled - tgt) ** 2)

            rows0 = jnp.take(cw32, v, axis=0, mode="wrap")
            g_rows = jax.grad(loss_fn)(rows0)
            return cw32.at[v].add(-0.1 * g_rows, mode="promise_in_bounds")

        args = [(make_cw32(i), jnp.asarray(v), i) for i, v in enumerate(vs[:2])]
        timeit(step_sparse32, args, tag="full step SPARSE f32-storage wrap-gather")


if __name__ == "__main__":
    main()
