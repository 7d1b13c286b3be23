#!/usr/bin/env python
"""Window device-only ceiling A/B across grad-path / storage-dtype configs.

The resident-region device tax (docs/PERF_NOTES.md: ~0.8 ms/iter per 100k
resident rows, grad-path independent) is hypothesized to be XLA's
convert-wrapped 16-bit scatter — 3 full-(N,D) passes per scan step
(benchmark/hlo_resident_census.py). This measures the window program's
device-only ceiling (staged window re-executed K times, differential timing,
scalar-readback sync) for each config, so the fix candidate
(cache_dtype=float32 + sparse_grad: scatter runs native f32 in-place,
nothing traverses N) is judged by the same number the bench reports.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/ceiling_ab.py \
      [--configs bf16-dense bf16-sparse f32-sparse] [--thresholds 500000 0]
"""

import argparse
import sys
import time

import numpy as np

CONFIGS = {
    "bf16-dense": dict(cache_dtype="bfloat16", sparse_grad=False),
    "bf16-sparse": dict(cache_dtype="bfloat16", sparse_grad=True),
    "f32-dense": dict(cache_dtype="float32", sparse_grad=False),
    "f32-sparse": dict(cache_dtype="float32", sparse_grad=True),
    "bf16-binned": dict(cache_dtype="bfloat16", sparse_grad=False,
                        ship_sort_perm=True),
}


def log(m):
    print(m, file=sys.stderr, flush=True)


def ceiling(trainer, win, batch_size):
    pw, sv = trainer._begin_window(win)
    trainer._finish_window(pw)

    def run(k):
        losses = None
        for _ in range(k):
            losses = trainer._dispatch_window(win, sv, [0.0] * len(win))
        _ = np.asarray(losses[-1:])

    run(1)
    t0 = time.time(); run(1); t1 = time.time(); run(4); t2 = time.time()
    per_iter = ((t2 - t1) - (t1 - t0)) / 3 / len(win)
    return per_iter


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="+", default=["bf16-sparse", "f32-sparse"],
                   choices=sorted(CONFIGS))
    p.add_argument("--thresholds", type=int, nargs="+", default=[500_000])
    p.add_argument("--prefetch", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=16384)
    p.add_argument("--warmup-iters", type=int, default=48,
                   help="enough to stage + compile; ceilings re-execute a "
                        "staged window so the fetch ramp does not matter")
    p.add_argument("--platform", choices=["default", "cpu"], default="default")
    p.add_argument("--init-timeout", type=int, default=300)
    p.add_argument("--small", action="store_true",
                   help="tiny tables/batch — CPU smoke of the full flow")
    args = p.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        import os
        import threading

        done = threading.Event()

        def _watch():
            if not done.wait(args.init_timeout):
                log("FATAL: backend init timeout (tunnel down?)")
                os._exit(17)

        threading.Thread(target=_watch, daemon=True).start()
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")
    if args.platform != "cpu":
        done.set()

    from cachedembedding_tpu.config import (
        CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE,
        CacheConfig,
        DLRMConfig,
    )
    from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset
    from cachedembedding_tpu.train.trainer import CachedDLRMTrainer

    tables = CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE
    if args.small:
        tables = [100_000, 50_000, 20_000, 10_000] * 4
        args.batch_size = min(args.batch_size, 256)
        args.thresholds = [t if t <= 100_000 else 30_000
                           for t in args.thresholds]
    results = []
    for thr in args.thresholds:
        data = SyntheticLongTailDataset(
            tables, args.batch_size, num_batches=args.warmup_iters + args.prefetch,
            dense_in_features=13, skew=0.5, seed=7, learnable_labels=False,
        )
        batches = [data.make_batch(i)
                   for i in range(args.warmup_iters + args.prefetch)]
        for name in args.configs:
            kn = CONFIGS[name]
            cfg = DLRMConfig(
                num_embeddings_per_feature=tables, embedding_dim=128,
                dense_in_features=13, batch_size=args.batch_size,
                learning_rate=1.0, compute_dtype="bfloat16",
                dense_input_dtype="int8",
                use_sparse_embed_grad=kn["sparse_grad"],
                cache=CacheConfig(
                    cache_ratio=0.01, warmup_ratio=0.7,
                    prefetch_num=args.prefetch, buffer_size=0,
                    weight_init="virtual", transfer_dtype="bfloat16",
                    cache_dtype=kn["cache_dtype"],
                    ship_sort_perm=kn.get("ship_sort_perm", False),
                    resident_threshold=thr,
                ),
            )
            t0 = time.time()
            trainer = CachedDLRMTrainer(cfg, id_freq_map=data.id_freq_map())
            trainer.train(batches[: args.warmup_iters],
                          num_iters=args.warmup_iters)
            log(f"[{name} thr={thr}] trainer+warmup {time.time() - t0:.0f}s")
            win = batches[args.warmup_iters : args.warmup_iters + args.prefetch]
            per_iter = ceiling(trainer, win, args.batch_size)
            ex_s = args.batch_size / per_iter if per_iter > 0 else float("nan")
            log(f"[{name} thr={thr}] CEILING {per_iter * 1000:.2f} ms/iter = "
                f"{ex_s:.0f} ex/s ({ex_s / 819200:.2f}x baseline)")
            results.append((name, thr, per_iter * 1000, ex_s))
            del trainer
    log("\nsummary:")
    for name, thr, ms, ex in results:
        log(f"  {name:>12} thr={thr:>7}: {ms:7.2f} ms/iter  {ex:9.0f} ex/s "
            f"({ex / 819200:.2f}x)")


if __name__ == "__main__":
    main()
