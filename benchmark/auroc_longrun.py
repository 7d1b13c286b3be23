#!/usr/bin/env python
"""Long-horizon AUROC convergence: cached vs fully-resident on the same
Kaggle-scale synthetic long-tail stream, thousands of iterations, churn on.

The reference's headline quality number is full-epoch AUROC on real Criteo
(0.7768 Kaggle, /root/reference/README.md:76-78). Real Criteo bytes are not in
this environment, so this runs the same CONTRACT on the synthetic stream:
learnable labels with a Bayes-optimal AUROC ceiling placed in the reference's
range (label_scale=1.5 -> ~0.80, data/synthetic.py), a 1% cache with DATASET
eviction under steady churn, and a fully-resident twin trained on the
BIT-IDENTICAL stream. Pass criteria (VERDICT r3 #4): monotone AUROC past
0.74, cached == resident within 0.002 at matched iteration counts.

    python benchmark/auroc_longrun.py --iters 4000 --eval-every 250
    python benchmark/auroc_longrun.py --platform cpu --scale small ...  # smoke

Writes the curve to --out (JSON) and prints a summary table to stderr.
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


def build_trainer(args, tables, dense_in, resident: bool, id_freq_map):
    import jax.numpy as jnp

    from cachedembedding_tpu.config import CacheConfig, DLRMConfig
    from cachedembedding_tpu.train.trainer import CachedDLRMTrainer

    cfg = DLRMConfig(
        num_embeddings_per_feature=tables,
        embedding_dim=128,
        dense_in_features=dense_in,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        compute_dtype="bfloat16",
        dense_input_dtype="int8",
        change_lr=args.change_lr,
        cache=CacheConfig(
            cache_ratio=1.0 if resident else args.cache_ratio,
            warmup_ratio=0.7,
            prefetch_num=args.prefetch,
            buffer_size=0,
            use_lfu_eviction=False,
            weight_init="virtual",
            transfer_dtype="bfloat16",
            cache_dtype="bfloat16",
            resident_threshold=0 if not resident else 0,
        ),
    )
    if resident:
        from cachedembedding_tpu.baselines.full_resident import (
            FullyResidentEmbeddingBag,
        )

        embed = FullyResidentEmbeddingBag(
            cfg.total_num_embeddings, cfg.embedding_dim, table_sizes=tables,
            seed=cfg.seed, dtype=jnp.bfloat16,
        )
        return cfg, CachedDLRMTrainer(cfg, embed_override=embed)
    return cfg, CachedDLRMTrainer(cfg, id_freq_map=id_freq_map)


def run_mode(args, tables, dense_in, mode: str, id_freq_map) -> dict:
    from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset

    resident = mode == "resident"
    cfg, trainer = build_trainer(args, tables, dense_in, resident, id_freq_map)
    train_data = SyntheticLongTailDataset(
        tables, args.batch_size, num_batches=args.iters,
        dense_in_features=dense_in, skew=args.skew, seed=args.seed,
        learnable_labels=True, label_scale=args.label_scale,
    )
    eval_data = SyntheticLongTailDataset(
        tables, args.batch_size, num_batches=args.eval_batches,
        dense_in_features=dense_in, skew=args.skew, seed=args.seed + 99_991,
        learnable_labels=True, label_scale=args.label_scale,
    )
    curve = []
    done = 0
    t_start = time.time()
    while done < args.iters:
        n = min(args.eval_every, args.iters - done)
        batches = [train_data.make_batch(done + i) for i in range(n)]
        rep = trainer.train(batches, num_iters=n)
        done += n
        ev = trainer.evaluate(eval_data)
        swap_out = trainer.embed.stats.swap_out_bytes
        curve.append({
            "iter": done,
            "auroc": float(ev["auroc"]),
            "accuracy": float(ev["accuracy"]),
            "loss": float(np.mean(rep.losses)) if rep.losses else None,
            "hit_rate": float(trainer.embed.stats.hit_rate()),
            "swap_out_gib": swap_out / 2**30,
            "elapsed_s": time.time() - t_start,
        })
        log(f"[{mode}] iter {done}: AUROC={ev['auroc']:.4f} "
            f"acc={ev['accuracy']:.4f} loss={curve[-1]['loss']:.5f} "
            f"hit={curve[-1]['hit_rate']:.4f} "
            f"swap_out={curve[-1]['swap_out_gib']:.3f}GiB "
            f"({curve[-1]['elapsed_s']:.0f}s)")
    return {"mode": mode, "curve": curve}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", choices=["kaggle", "small"], default="kaggle")
    p.add_argument("--iters", type=int, default=4000)
    p.add_argument("--eval-every", type=int, default=250)
    p.add_argument("--eval-batches", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=16384)
    p.add_argument("--prefetch", type=int, default=8)
    p.add_argument("--cache-ratio", type=float, default=0.01)
    p.add_argument("--skew", type=float, default=0.5)
    p.add_argument("--label-scale", type=float, default=1.5)
    p.add_argument("--learning-rate", type=float, default=1.0)
    p.add_argument("--change-lr", action="store_true")
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--modes", default="cached,resident",
                   help="comma list: cached | resident")
    p.add_argument("--platform", choices=["default", "cpu"], default="default")
    p.add_argument("--out", default="logs/auroc_longrun.json")
    args = p.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    log(f"devices: {jax.devices()}")

    from cachedembedding_tpu.config import (
        CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE,
    )
    from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset

    if args.scale == "kaggle":
        tables = CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE
        dense_in = 13
    else:
        tables = [100_000, 50_000, 20_000, 10_000] * 4
        dense_in = 13

    freq_src = SyntheticLongTailDataset(
        tables, args.batch_size, num_batches=args.iters,
        dense_in_features=dense_in, skew=args.skew, seed=args.seed,
    )
    id_freq_map = freq_src.id_freq_map()

    results = []
    for mode in args.modes.split(","):
        # A failing mode must not lose the others' curves: at Kaggle scale
        # the fully-resident twin RESOURCE_EXHAUSTs the 16 GiB chip (the
        # capacity wall the cache exists to cross, docs/AB_REPORT.md) —
        # record the failure and keep the JSON.
        try:
            results.append(run_mode(args, tables, dense_in, mode.strip(), id_freq_map))
        except Exception as e:  # noqa: BLE001
            log(f"[{mode}] FAILED: {type(e).__name__}: {str(e)[:200]}")
            results.append({"mode": mode.strip(), "curve": [],
                            "error": f"{type(e).__name__}: {str(e)[:500]}"})

    out = {
        "config": {k: v for k, v in vars(args).items()},
        "results": results,
    }
    # matched-iteration deltas (the cache-correctness oracle)
    by_mode = {r["mode"]: {c["iter"]: c["auroc"] for c in r["curve"]}
               for r in results}
    if "cached" in by_mode and "resident" in by_mode:
        deltas = {
            it: by_mode["cached"][it] - by_mode["resident"][it]
            for it in sorted(set(by_mode["cached"]) & set(by_mode["resident"]))
        }
        out["auroc_delta_by_iter"] = deltas
        worst = max(deltas.values(), key=abs) if deltas else 0.0
        log(f"max |cached - resident| AUROC delta: {abs(worst):.5f}")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
