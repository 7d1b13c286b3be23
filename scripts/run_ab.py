#!/usr/bin/env python
"""Cached-vs-resident A/B oracle — the reference's scripts/run.sh workflow
(/root/reference/scripts/run.sh:1-14: cached path and torchrec path launched
back-to-back on the same data) as ONE command with a comparison report.

Runs the SAME data stream + seed through:
  A. CachedEmbeddingBag (host table + HBM cache, the product), and
  B. FullyResidentEmbeddingBag (whole table in HBM — the torchrec-"fused"
     analog; there is no UVM on TPU),
then reports train throughput, eval AUROC/accuracy, cache hit rate and memory
footprints side by side. The AUROC delta is the cache-correctness oracle: the
cache only moves rows, so learning quality must match the resident table.

    python scripts/run_ab.py                      # synthetic long-tail, quick
    python scripts/run_ab.py --scale kaggle ...   # Criteo-Kaggle shapes
    python scripts/run_ab.py --dataset_dir DIR    # real data

Exit code 1 if |AUROC_A - AUROC_B| > --auroc_tol (default 0.002).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def build(args, tables, dense_in):
    from cachedembedding_tpu.config import CacheConfig, DLRMConfig

    if args.embedding_dim == 128:
        arch = {}
    else:
        arch = dict(
            dense_arch_layer_sizes=(64, args.embedding_dim),
            over_arch_layer_sizes=(64, 32, 1),
        )
    return DLRMConfig(
        num_embeddings_per_feature=tables,
        embedding_dim=args.embedding_dim,
        dense_in_features=dense_in,
        batch_size=args.batch_size,
        **arch,
        learning_rate=args.learning_rate,
        change_lr=args.lr_after is not None,
        lr_change_point=args.lr_change_point,
        lr_after=args.lr_after if args.lr_after is not None else 0.2,
        compute_dtype=args.compute_dtype,
        # kaggle scale mirrors bench.py exactly so the A/B reuses its
        # compiled window signatures (remote compiles are minutes each)
        dense_input_dtype="int8" if args.scale == "kaggle" else "float32",
        seed=args.seed,
        cache=CacheConfig(
            cache_ratio=args.cache_ratio,
            warmup_ratio=0.7,
            prefetch_num=args.prefetch,
            buffer_size=0,
            use_lfu_eviction=not args.use_freq,
            use_freq=args.use_freq,
            weight_init=args.weight_init,
            transfer_dtype=args.transfer_dtype,
            cache_dtype=args.cache_dtype,
            stochastic_rounding=args.stochastic_rounding,
            resident_threshold=500_000 if args.scale == "kaggle" else 0,
        ),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", choices=["small", "kaggle"], default="small")
    p.add_argument("--dataset_dir", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--train_batches", type=int, default=None)
    p.add_argument("--eval_batches", type=int, default=None)
    p.add_argument("--embedding_dim", type=int, default=None)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--compute_dtype", default="float32")
    p.add_argument("--cache_ratio", type=float, default=None)
    p.add_argument("--prefetch", type=int, default=4)
    p.add_argument("--skew", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=1024)
    p.add_argument("--use_freq", action="store_true", default=True)
    p.add_argument("--auroc_tol", type=float, default=0.002)
    p.add_argument("--cache_dtype", default="bfloat16",
                   choices=["float32", "bfloat16", "float8_e4m3fn"])
    p.add_argument("--transfer_dtype", default="bfloat16",
                   choices=["float32", "bfloat16", "int8", "int4"],
                   help="admit-payload wire format (the AUROC gate for the "
                        "int8/int4 swap-compression levers)")
    p.add_argument("--stochastic_rounding", default="auto",
                   choices=["auto", "on", "off"])
    p.add_argument("--lr_after", type=float, default=None,
                   help="late-stage LR (enables change_lr): the fp8 "
                        "stagnation regime the stochastic-rounding gate "
                        "exercises")
    p.add_argument("--lr_change_point", type=float, default=0.5)
    p.add_argument("--platform", choices=["default", "cpu"], default="default",
                   help="force the jax platform (env vars are too late: the "
                        "TPU sitecustomize imports jax first)")
    args = p.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.scale == "kaggle":
        from cachedembedding_tpu.config import (
            CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE,
        )

        tables = CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE
        dense_in = 13
        defaults = dict(batch_size=16384, embedding_dim=128, learning_rate=1.0,
                        cache_ratio=0.01, train_batches=64, eval_batches=8)
        args.weight_init = "virtual"
        args.compute_dtype = "bfloat16"
        args.prefetch = 8
        args.seed = 7
    else:
        tables = [40_000, 20_000, 10_000, 5_000]
        dense_in = 13
        defaults = dict(batch_size=2048, embedding_dim=32, learning_rate=0.3,
                        cache_ratio=0.05, train_batches=48, eval_batches=8)
        args.weight_init = "uniform"
    for k, v in defaults.items():
        if getattr(args, k) is None:
            setattr(args, k, v)

    from cachedembedding_tpu.baselines.full_resident import FullyResidentEmbeddingBag
    from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset
    from cachedembedding_tpu.train.trainer import CachedDLRMTrainer
    from cachedembedding_tpu.utils.misc import get_mem_info

    if args.dataset_dir:
        from cachedembedding_tpu.data import criteo

        def train_data():
            return criteo.get_dataloader(
                args.dataset_dir, "train", args.batch_size, seed=args.seed,
                hashes=list(tables),
            )

        def eval_data():
            return criteo.get_dataloader(
                args.dataset_dir, "val", args.batch_size, seed=args.seed,
                hashes=list(tables),
            )

        freq = None
    else:
        _train = SyntheticLongTailDataset(
            list(tables), args.batch_size, num_batches=args.train_batches,
            dense_in_features=dense_in, skew=args.skew, seed=args.seed,
        )
        _eval = SyntheticLongTailDataset(
            list(tables), args.batch_size, num_batches=args.eval_batches,
            dense_in_features=dense_in, skew=args.skew, seed=args.seed + 7,
        )
        train_data = lambda: _train  # noqa: E731
        eval_data = lambda: _eval  # noqa: E731
        freq = _train.id_freq_map()

    results = {}
    for name in ("cached", "resident"):
        cfg = build(args, list(tables), dense_in)
        log(f"=== {name} ===")
        t0 = time.time()
        if name == "resident":
            embed = FullyResidentEmbeddingBag(
                cfg.total_num_embeddings, cfg.embedding_dim,
                table_sizes=list(tables), seed=cfg.seed,
                dtype=jnp.bfloat16 if args.scale == "kaggle" else jnp.float32,
            )
            trainer = CachedDLRMTrainer(cfg, embed_override=embed)
        else:
            trainer = CachedDLRMTrainer(cfg, id_freq_map=freq)
        log(f"built in {time.time() - t0:.1f}s; {get_mem_info('')}")
        report = trainer.train(train_data(), num_iters=args.train_batches)
        ev = trainer.evaluate(eval_data())
        stats = trainer.embed.stats
        stride = max(1, len(report.losses) // 16)
        results[name] = dict(
            it_per_s=round(report.it_per_s, 2),
            examples_per_s=round(report.examples_per_s, 1),
            final_loss=round(float(np.mean(report.losses[-8:])), 5),
            loss_curve=[round(float(x), 5) for x in report.losses[::stride]],
            auroc=round(ev["auroc"], 6),
            accuracy=round(ev["accuracy"], 6),
            hit_rate=round(stats.hit_rate(), 4) if name == "cached" else 1.0,
            swap_in_gib=round(stats.swap_in_bytes / 2**30, 3),
            swap_out_gib=round(stats.swap_out_bytes / 2**30, 3),
            embed_hbm_gib=round(
                trainer.embed.cache_weight.size
                * trainer.embed.cache_weight.dtype.itemsize / 2**30, 6,
            ),
        )
        log(f"{name}: {json.dumps(results[name])}")

    delta = abs(results["cached"]["auroc"] - results["resident"]["auroc"])
    verdict = "OK" if delta <= args.auroc_tol else "FAIL"
    summary = {
        "ab": results,
        "auroc_delta": round(delta, 6),
        "auroc_tol": args.auroc_tol,
        "verdict": verdict,
        "hbm_saving": round(
            results["resident"]["embed_hbm_gib"]
            / max(results["cached"]["embed_hbm_gib"], 1e-9), 1,
        ),
    }
    print(json.dumps(summary))
    sys.exit(0 if verdict == "OK" else 1)


if __name__ == "__main__":
    main()
