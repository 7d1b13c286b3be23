"""Device-cost microbench for rank-tier id-wire decode primitives.

The rank-tier wire format (benchmark/wire_entropy.py: escape 9.9 -> ~6-8
bits/id) needs per-feature device work the escape format doesn't have:
  a) 2-bit selector unpack                      (n,)
  b) one-hot cumsum over 4 tiers                (n, 4) i32
  c) stream-compaction merge gather             n elements from ~0.3n table
  d) dictionary gather (cached features only)   n elements from 4k table
This measures each primitive AND the fused per-feature decode at the real
shape (n = P*B = 131072) so the format decision is evidence-based: the wire
saves ~0.15-0.2 MB/iter (5-6 ms/iter of wall at a 30 MB/s tunnel link) but
regresses the quiet-link ceiling by whatever this measures.

Timings end in scalar readbacks (block_until_ready does not block on the
tunneled backend). Inputs vary per call (the backend memoizes executes).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmark/microbench_wire_decode.py
"""

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 131_072       # ids per feature per window (P=8 x B=16384)
TBL = 40_960      # merged tier-stream table size (~0.31 n)
DICT = 4_096
F_TIER = 18       # tier-coded features at kaggle scale
F_DICT = 5        # of which dict-remapped (cached)


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, args_fn, reps=5):
    fn(*args_fn(0))  # compile
    best = float("inf")
    for r in range(reps):
        a = args_fn(r + 1)
        t0 = time.perf_counter()
        out = fn(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


@jax.jit
def decode_feature(selbytes, streams, dict_tbl):
    """Full per-feature rank-tier decode: selector unpack -> one-hot cumsum
    -> merge gather -> dict remap. streams: (TBL,) i32 merged tier table."""
    u = selbytes.astype(jnp.int32)
    sel = jnp.stack(
        [u & 3, (u >> 2) & 3, (u >> 4) & 3, (u >> 6) & 3], axis=-1
    ).reshape(-1)                                         # (N,)
    onehot = (sel[:, None] == jnp.arange(4, dtype=jnp.int32)).astype(jnp.int32)
    pos = jnp.cumsum(onehot, axis=0) - onehot             # exclusive, (N, 4)
    idx = (pos * onehot).sum(axis=1)                      # index within tier
    offs = jnp.array([0, TBL // 2, 3 * TBL // 4, 7 * TBL // 8], jnp.int32)
    merged = jnp.take(streams, idx + offs[sel], mode="wrap")
    return jnp.take(dict_tbl, merged & (DICT - 1), mode="wrap")


@jax.jit
def cumsum_only(onehot):
    return jnp.cumsum(onehot, axis=0).sum()


@jax.jit
def gather_only(tbl, idx):
    return jnp.take(tbl, idx, mode="wrap")


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    def feat_args(r):
        sel = rng.integers(0, 256, N // 4, dtype=np.uint8)
        streams = rng.integers(0, DICT, TBL, dtype=np.int32)
        dict_tbl = rng.integers(0, 337_000, DICT, dtype=np.int32)
        return (jax.device_put(sel), jax.device_put(streams),
                jax.device_put(dict_tbl))

    t = timeit(decode_feature, feat_args)
    log(f"full per-feature decode (n={N}): {t * 1e3:.3f} ms")
    per_window = t * (F_TIER - F_DICT)  # non-dict features skip the dict gather
    log(f"  -> upper-bound window cost {F_TIER} features: "
        f"{t * F_TIER * 1e3:.2f} ms/window = {t * F_TIER / 8 * 1e3:.3f} ms/iter")

    t = timeit(cumsum_only,
               lambda r: (jax.device_put(
                   rng.integers(0, 2, (N, 4), dtype=np.int32)),))
    log(f"cumsum (N,4): {t * 1e3:.3f} ms")

    for tbl_n, name in ((TBL, "tier-table"), (DICT, "dict")):
        t = timeit(
            gather_only,
            lambda r, tn=tbl_n: (
                jax.device_put(rng.integers(0, 337_000, tn, dtype=np.int32)),
                jax.device_put(rng.integers(0, tn, N, dtype=np.int32)),
            ),
        )
        log(f"element gather {N} from {tbl_n}: {t * 1e3:.3f} ms "
            f"({t / N * 1e9:.2f} ns/elem)")
    del per_window


if __name__ == "__main__":
    main()
