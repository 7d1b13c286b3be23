#!/usr/bin/env python
"""Full-epoch AUROC on REFERENCE-FORMAT data through the real offline chain.

The reference's headline quality number is test AUROC 0.7768 after one epoch
on Criteo-Kaggle (/root/reference/README.md:78). Real Criteo bytes are not in
this environment, so the synthetic long-tail stream carried AUROC evidence
through round 4 — but it bypasses the offline layer. This benchmark closes
that gap: it emits a multi-million-row ``train.txt`` in the reference's RAW
Kaggle format (label \\t 13 ints \\t 26 hex cats, with missing fields), runs
the REAL offline chain — scripts/preprocess/split_criteo_kaggle.py ->
npy_preproc_criteo.py (hex parse, log(x-min+2)) -> data/criteo.py loaders
(%hash remap, global-id offsets, final-day val/test halves,
/root/reference/recsys/datasets/criteo.py:118,170-173,386-391) -> frequency
counter -> CachedDLRMTrainer — and records the within-epoch val-AUROC curve
plus final val/test AUROC.

The labels follow a logistic model over (a) dense-feature signal and (b) one
latent effect per RAW categorical value (hash-derived, so %hash collisions
blur some buckets exactly as they do on real data). Coefficients put the
Bayes ceiling near ~0.80; a learner that actually learns embeddings climbs
into the high 0.7s, reproducing the reference's 0.74 -> 0.77 regime shape.

Usage (chip):
  PYTHONPATH=/root/.axon_site:/root/repo python benchmark/auroc_realformat.py \
      --rows 4194304 --out logs/auroc_realformat_r5
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

INT_FEATURES = 13
CAT_FEATURES = 26
# Raw-id universe sizes per categorical feature (pre-%hash). A Kaggle-like
# ladder: a few huge long-tail features, several mid, many tiny.
RAW_UNIVERSE = [
    1460, 583, 10_000_000, 2_000_000, 305, 24, 12_000, 633, 3, 90_000,
    5683, 8_000_000, 3194, 27, 14992, 5_000_000, 10, 5652, 2173, 4,
    7_000_000, 18, 15, 280_000, 105, 140_000,
]
# Dense columns 3 and 7 carry label signal; column 11 is always missing
# (format-coverage: the raw format allows empty fields).
SIGNAL_DENSE = (3, 7)
EMPTY_DENSE = 11
# Categorical features whose latent effects carry most of the signal: one
# huge (must be cached), one mid, one tiny — so learning requires the cache
# path to work across the kernel split.
SIGNAL_CATS = (2, 9, 0, 23, 11)

_HEX = np.frombuffer(b"0123456789abcdef", np.uint8)


def _hex8(x: np.ndarray) -> np.ndarray:
    """uint32 (n,) -> (n, 8) ascii hex bytes (leading zeros; int(s,16) parses)."""
    x = x.astype(np.uint32)
    out = np.empty((x.size, 8), np.uint8)
    for i in range(8):
        out[:, 7 - i] = _HEX[(x >> (4 * i)) & 0xF]
    return out


def _dec7(x: np.ndarray) -> np.ndarray:
    """uint32 (n,) < 10^7 -> (n, 7) ascii zero-padded decimal."""
    x = x.astype(np.uint32)
    out = np.empty((x.size, 7), np.uint8)
    for i in range(7):
        out[:, 6 - i] = 48 + (x % 10).astype(np.uint8)
        x = x // 10
    return out


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix-style uint32 hash (vectorized, deterministic)."""
    x = (x.astype(np.uint64) + np.uint64(salt)) * np.uint64(0x9E3779B97F4A7C15)
    x &= np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(31)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x &= np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(29)
    return (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)


def _zipf_ranks(rng, n_universe: int, size: int, skew: float = 0.5) -> np.ndarray:
    """Inverse-CDF Zipf ranks in [0, n_universe): P(id=k) ~ k^-(1+skew) —
    the reference's synthetic-generator shape
    (/root/reference/baselines/data/custom.py:84-93; u ~ U[(1/E)^s, 1],
    id = u^(-1/s) - 1) at the bench's measured-realistic skew 0.5."""
    lo = (1.0 / n_universe) ** skew
    u = rng.uniform(lo, 1.0, size)
    return (u ** (-1.0 / skew) - 1.0).astype(np.int64).clip(0, n_universe - 1)


def generate_train_txt(path: str, rows: int, seed: int = 0,
                       chunk: int = 262_144) -> None:
    """Vectorized writer: ~10s per million rows."""
    rng = np.random.default_rng(seed)
    t0 = time.time()
    TAB, NL = 9, 10
    with open(path, "wb") as f:
        done = 0
        while done < rows:
            n = min(chunk, rows - done)
            # --- latent logit -------------------------------------------
            logit = np.zeros(n, np.float32)
            # dense: counts-like ints; two carry signal
            dense_cols = []
            for j in range(INT_FEATURES):
                base = np.exp(rng.normal(2.0, 1.5, n)).astype(np.int64).clip(0, 9_999_999)
                dense_cols.append(base)
                if j in SIGNAL_DENSE:
                    logit += 0.5 * (np.log1p(base) - 2.7).astype(np.float32)
            # cats: zipf ranks -> hashed raw 32-bit ids; per-raw-id latent
            # effect in {-1, +1} scaled per signal feature
            cat_raw = []
            for j in range(CAT_FEATURES):
                ranks = _zipf_ranks(rng, RAW_UNIVERSE[j], n)
                raw = _mix(ranks.astype(np.uint32), salt=j * 7919 + 13)
                cat_raw.append(raw)
                if j in SIGNAL_CATS:
                    eff = (_mix(raw, salt=j * 104729 + 1).astype(np.int64) % 2001
                           - 1000).astype(np.float32) / 1000.0
                    logit += 0.9 * eff
            # calibrated (fixed zipf, measured at 300k rows): positive rate
            # ~0.26 (Criteo-like), Bayes AUROC of the true logit ~0.804 — a
            # learner that actually learns the per-bucket embeddings lands in
            # the reference's 0.74-0.77 regime
            p = 1.0 / (1.0 + np.exp(-(logit - 1.4)))
            labels = (rng.random(n) < p).astype(np.uint8)

            # --- assemble ascii matrix ----------------------------------
            # layout: 1 label + 13 * (tab + 7-dec) + 26 * (tab + 8-hex) + \n
            width = 1 + INT_FEATURES * 8 + CAT_FEATURES * 9 + 1
            buf = np.empty((n, width), np.uint8)
            buf[:, 0] = 48 + labels
            pos = 1
            for j in range(INT_FEATURES):
                buf[:, pos] = TAB
                if j == EMPTY_DENSE:
                    # fixed-width writer can't emit zero-width fields; this
                    # column is constant-zero instead (true empty-field
                    # parsing is covered by tests/test_preprocess_e2e.py)
                    buf[:, pos + 1 : pos + 8] = 48
                else:
                    buf[:, pos + 1 : pos + 8] = _dec7(dense_cols[j])
                pos += 8
            for j in range(CAT_FEATURES):
                buf[:, pos] = TAB
                buf[:, pos + 1 : pos + 9] = _hex8(cat_raw[j])
                pos += 9
            buf[:, pos] = NL
            buf.tofile(f)
            done += n
    print(f"generated {rows} rows -> {path} in {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=4_194_304)
    p.add_argument("--batch-size", type=int, default=16384)
    p.add_argument("--embedding-dim", type=int, default=128)
    p.add_argument("--cache-ratio", type=float, default=0.01)
    p.add_argument("--prefetch", type=int, default=8)
    p.add_argument("--eval-every", type=int, default=32,
                   help="train iterations between val-AUROC points")
    p.add_argument("--val-batches", type=int, default=8)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--work", default="/tmp/auroc_realformat")
    p.add_argument("--out", default="logs/auroc_realformat_r5")
    p.add_argument("--platform", choices=["default", "cpu"], default="default")
    p.add_argument("--small", action="store_true",
                   help="tiny CPU smoke (rows=20k, batch 512, dim 16)")
    args = p.parse_args()
    if args.small:
        args.rows, args.batch_size, args.embedding_dim = 20_000, 512, 16
        args.eval_every, args.val_batches = 8, 2
        args.platform = "cpu"

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    work = args.work
    raw = os.path.join(work, "train.txt")
    days_dir = os.path.join(work, "days")
    npy_dir = os.path.join(work, "npy_kaggle")  # "kaggle" in the path selects the 7-day split (data/criteo.py stage_files)
    stamp = os.path.join(work, f"fixture_v2_{args.rows}_{args.seed}.done")
    if not os.path.exists(stamp):
        os.makedirs(npy_dir, exist_ok=True)
        generate_train_txt(raw, args.rows, seed=args.seed)
        t0 = time.time()
        subprocess.run(
            [sys.executable, "scripts/preprocess/split_criteo_kaggle.py",
             "--input_file", raw, "--output_dir", days_dir],
            check=True, cwd=REPO,
        )
        subprocess.run(
            [sys.executable, "scripts/preprocess/npy_preproc_criteo.py",
             "--input_dir", days_dir, "--output_dir", npy_dir, "--days", "7"],
            check=True, cwd=REPO,
        )
        print(f"offline chain (split + npy) in {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        open(stamp, "w").write("ok")

    from cachedembedding_tpu.config import (
        CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE,
        CacheConfig,
        DLRMConfig,
    )
    from cachedembedding_tpu.data import criteo
    from cachedembedding_tpu.train.trainer import CachedDLRMTrainer

    tables = CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE
    if args.small:
        tables = [min(t, 50_000) for t in tables]
    arches = (
        dict(dense_arch_layer_sizes=(32, 16), over_arch_layer_sizes=(32, 16, 1))
        if args.small else {}
    )
    cfg = DLRMConfig(
        num_embeddings_per_feature=tables,
        embedding_dim=args.embedding_dim,
        dense_in_features=INT_FEATURES,
        batch_size=args.batch_size,
        learning_rate=1.0,
        **arches,
        compute_dtype="bfloat16",
        dense_input_dtype="int8",
        cache=CacheConfig(
            cache_ratio=args.cache_ratio, warmup_ratio=0.7,
            prefetch_num=args.prefetch, buffer_size=0,
            transfer_dtype="bfloat16",
            resident_threshold=500_000,
        ),
    )

    t0 = time.time()
    freq = np.asarray(
        criteo.get_id_freq_map(npy_dir, table_sizes=tables)
    )
    print(f"id-freq map in {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    train_data = criteo.get_dataloader(npy_dir, "train", cfg.batch_size,
                                       shuffle_batches=False, seed=args.seed,
                                       hashes=tables)
    val_data = criteo.get_dataloader(npy_dir, "val", cfg.batch_size,
                                     shuffle_batches=False, seed=args.seed,
                                     hashes=tables)
    test_data = criteo.get_dataloader(npy_dir, "test", cfg.batch_size,
                                      shuffle_batches=False, seed=args.seed,
                                      hashes=tables)
    val_batches = list(val_data)[: args.val_batches]

    trainer = CachedDLRMTrainer(cfg, id_freq_map=freq)
    curve = []
    t_start = time.time()
    for epoch in range(args.epochs):
        batches = list(train_data)
        n = len(batches)
        print(f"epoch {epoch}: {n} train iters", file=sys.stderr, flush=True)
        i = 0
        while i < n:
            k = min(args.eval_every, n - i)
            if k > args.prefetch:
                k -= k % args.prefetch  # whole windows per train() call
            rep = trainer.train(batches[i : i + k], num_iters=k)
            i += k
            m = trainer.evaluate(val_batches)
            curve.append({
                "epoch": epoch, "iter": i,
                "loss": float(np.mean(rep.losses)),
                "val_auroc": float(m["auroc"]),
                "val_accuracy": float(m["accuracy"]),
                "elapsed_s": round(time.time() - t_start, 1),
            })
            print(f"  it {i:6d}/{n}: loss={curve[-1]['loss']:.4f} "
                  f"val_auroc={curve[-1]['val_auroc']:.4f} "
                  f"hit={trainer.embed.stats.hit_rate():.3f}",
                  file=sys.stderr, flush=True)
    final_val = trainer.evaluate(list(val_data))
    final_test = trainer.evaluate(list(test_data))
    out = {
        "rows": args.rows, "batch_size": args.batch_size,
        "embedding_dim": args.embedding_dim,
        "cache_ratio": args.cache_ratio, "tables": list(map(int, tables)),
        "curve": curve,
        "final_val_auroc": float(final_val["auroc"]),
        "final_test_auroc": float(final_test["auroc"]),
        "final_test_accuracy": float(final_test["accuracy"]),
        "wall_s": round(time.time() - t_start, 1),
    }
    os.makedirs(os.path.dirname(os.path.join(REPO, args.out)) or ".",
                exist_ok=True)
    with open(os.path.join(REPO, args.out) + ".json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"final_val_auroc": out["final_val_auroc"],
                      "final_test_auroc": out["final_test_auroc"]}))


if __name__ == "__main__":
    main()
