"""Host-table row-staging throughput at Criteo-Kaggle scale (VERDICT r2
weak #6): the CPU-DRAM side of the reference's 94 GB story
(/root/reference/README.md:76 — CachedEmbedding keeps the master table in
host memory and stages rows over the link).

Measures `DenseHostTable.gather/scatter` (native multithreaded C++ with
software prefetch, THP-backed allocation) at the real master-table shape —
33.76M x 128 f32 = 17.3 GB — for the row counts the cache actually moves:
per-window admit bursts (1k-131k rows) and flush-scale sweeps (1M). Pure
host benchmark: no TPU, no jax; runnable anywhere the table fits DRAM.

Usage: PYTHONPATH=/root/repo python benchmark/microbench_hosttable.py [--rows N]
"""

import argparse
import time

import numpy as np

from cachedembedding_tpu._native import hostops


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=33_762_577,
                   help="master table rows (default: Criteo-Kaggle fused)")
    p.add_argument("--dim", type=int, default=128)
    args = p.parse_args()

    R, D = args.rows, args.dim
    gb = R * D * 4 / 1e9
    print(f"native={hostops.native_available()}  table {R}x{D} f32 = {gb:.1f} GB",
          flush=True)
    t0 = time.perf_counter()
    table = hostops.alloc_table(R, D)
    # touch + canonical init (chunked: full init also measures fill rate)
    chunk = 4 << 20
    for s in range(0, R, chunk):
        hostops.fill_rows_canonical(table[s : s + chunk], s, 42, 1e-2)
    t_init = time.perf_counter() - t0
    print(f"alloc+canonical init: {t_init:.1f}s = {gb / t_init:.2f} GB/s", flush=True)

    rng = np.random.default_rng(0)
    for n in (1024, 16384, 131072, 1 << 20):
        idx = rng.integers(0, R, size=(n,)).astype(np.int64)
        out = np.empty((n, D), np.float32)
        vals = rng.standard_normal((n, D)).astype(np.float32)
        # warm one round (page-in), then time 5
        hostops.gather_rows(table, idx, out)
        t0 = time.perf_counter()
        for _ in range(5):
            hostops.gather_rows(table, idx, out)
        tg = (time.perf_counter() - t0) / 5
        hostops.scatter_rows(table, idx, vals)
        t0 = time.perf_counter()
        for _ in range(5):
            hostops.scatter_rows(table, idx, vals)
        ts = (time.perf_counter() - t0) / 5
        mb = n * D * 4 / 1e6
        print(
            f"rows={n:>8}: gather {tg * 1e3:7.2f} ms ({mb / tg / 1e3:6.2f} GB/s)  "
            f"scatter {ts * 1e3:7.2f} ms ({mb / ts / 1e3:6.2f} GB/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
