"""Device-cost microbench for rank-tier id-wire decode primitives.

The rank-tier wire format (benchmark/wire_entropy.py: escape 9.9 -> ~6-8
bits/id) needs per-feature device work the escape format doesn't have:
  a) 2-bit selector unpack + one-hot cumsum over 4 tiers   (n, 4) i32
  b) stream-compaction merge gather      n elements from a ~0.3n table
  c) dictionary gather (cached features) n elements from a 4k table
This measures the fused per-feature decode at the real shape (n = P*B =
131072) so the format decision is evidence-based: the wire saves ~0.15-0.2
MB/iter (5-6 ms/iter of wall at a 30 MB/s tunnel link) but regresses the
quiet-link ceiling by whatever this measures.

Timing is DIFFERENTIAL over a data-dependent chain of K executes ending in
one scalar readback — a single execute+readback on the tunneled backend
measures the link round-trip (~50 ms under congestion), not device time.

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


@partial(jax.jit, static_argnames=("reps", "with_dict", "with_cumsum",
                                   "with_gather"))
def decode_chain(selbytes, streams, dict_tbl, reps: int,
                 with_dict: bool = True, with_cumsum: bool = True,
                 with_gather: bool = True):
    """reps chained per-feature rank-tier decodes (each consumes the previous
    output so XLA cannot parallelize or elide them)."""

    def one(carry, _):
        sb = selbytes ^ carry.astype(jnp.uint8)  # vary content per step
        u = sb.astype(jnp.int32)
        sel = jnp.stack(
            [u & 3, (u >> 2) & 3, (u >> 4) & 3, (u >> 6) & 3], axis=-1
        ).reshape(-1)                                     # (N,)
        if with_cumsum:
            onehot = (sel[:, None] == jnp.arange(4, dtype=jnp.int32)).astype(
                jnp.int32
            )
            pos = jnp.cumsum(onehot, axis=0) - onehot     # exclusive
            idx = (pos * onehot).sum(axis=1)
        else:
            idx = sel * 17
        if with_gather:
            offs = jnp.array([0, TBL // 2, 3 * TBL // 4, 7 * TBL // 8],
                             jnp.int32)
            merged = jnp.take(streams, idx + offs[sel], mode="wrap")
        else:
            merged = idx
        if with_dict:
            merged = jnp.take(dict_tbl, merged & (DICT - 1), mode="wrap")
        return (merged.sum() & 0xFF).astype(jnp.uint32), None

    out, _ = jax.lax.scan(one, jnp.uint32(0), None, length=reps)
    return out


def measure(name, **kw):
    rng = np.random.default_rng(0)
    sel = jax.device_put(rng.integers(0, 256, N // 4, dtype=np.uint8))
    streams = jax.device_put(rng.integers(0, DICT, TBL, dtype=np.int32))
    dict_tbl = jax.device_put(rng.integers(0, 337_000, DICT, dtype=np.int32))

    def run(reps):
        out = decode_chain(sel, streams, dict_tbl, reps, **kw)
        _ = np.asarray(out).ravel()[:1]

    run(2); run(16)  # compile both signatures
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); run(2); t1 = time.perf_counter()
        run(16); t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / 14)
    log(f"{name}: {best * 1e3:.3f} ms/feature-decode "
        f"-> {best * F_TIER * 1e3:.2f} ms/window = "
        f"{best * F_TIER / 8 * 1e3:.3f} ms/iter over {F_TIER} features")
    return best


def main():
    log(f"devices: {jax.devices()}")
    measure("full decode (cumsum+merge+dict)")
    measure("no dict", with_dict=False)
    measure("no cumsum (static idx)", with_cumsum=False)
    measure("sel+cumsum only", with_gather=False, with_dict=False)


if __name__ == "__main__":
    main()
