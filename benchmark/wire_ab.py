"""Measured id-wire A/B: escape vs rank-tier at the exact headline config.

Drives the REAL trainer (kaggle tables, mixed-kernel 500k, 1% ratio, skew
0.5, prefetch 8, B=16384 — tower dims shrunk to keep CPU execution cheap;
the id wire depends only on the id stream) and records the encoded id-block
bytes per window after the format freezes, through steady eviction churn.

Usage: python benchmark/wire_ab.py   (CPU, ~3 min)
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from cachedembedding_tpu.config import (  # noqa: E402
    CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE as TABLES,
    CacheConfig,
    DLRMConfig,
)
from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset  # noqa: E402
from cachedembedding_tpu.train.trainer import CachedDLRMTrainer  # noqa: E402

BATCH = 16384
PREFETCH = 8
ITERS = 360  # 45 windows: 12 cold-skip + 12 learn (freeze at 24),
# eviction onset ~17 — capture the last 15 frozen churning windows


def log(m):
    print(m, file=sys.stderr, flush=True)


def run(fmt: str) -> None:
    cfg = DLRMConfig(
        num_embeddings_per_feature=TABLES,
        embedding_dim=8,
        dense_in_features=13,
        dense_arch_layer_sizes=(16, 8),
        over_arch_layer_sizes=(16, 1),
        batch_size=BATCH,
        learning_rate=1.0,
        dense_input_dtype="int8",
        cache=CacheConfig(
            cache_ratio=0.01, warmup_ratio=0.7, prefetch_num=PREFETCH,
            buffer_size=0, weight_init="virtual", transfer_dtype="bfloat16",
            resident_threshold=500_000, id_wire=fmt,
        ),
    )
    data = SyntheticLongTailDataset(
        TABLES, BATCH, num_batches=ITERS, dense_in_features=13,
        skew=0.5, seed=7, learnable_labels=False,
    )
    trainer = CachedDLRMTrainer(cfg, id_freq_map=data.id_freq_map())

    rec = {"bytes": [], "win": 0}
    orig_tier, orig_esc = trainer._tier_encode, trainer._escape_encode

    def wrap(fn):
        def inner(slot3, spec, P, L, Bf):
            out = fn(slot3, spec, P, L, Bf)
            rec["win"] += 1
            if rec["win"] > 30:  # frozen spec + steady churn only
                rec["bytes"].append(out[0].nbytes / P)
            return out
        return inner

    trainer._tier_encode = wrap(orig_tier)
    trainer._escape_encode = wrap(orig_esc)

    t0 = time.time()
    trainer.train(data, num_iters=ITERS)
    per_iter = float(np.mean(rec["bytes"]))
    hit = trainer.embed.stats.hit_rate()
    log(f"{fmt:>8}: id wire {per_iter / 1e6:.3f} MB/iter "
        f"({per_iter * 8 / (BATCH * 26):.2f} bits/id) over "
        f"{len(rec['bytes'])} steady windows, hit={hit:.4f}, "
        f"wall {time.time() - t0:.0f}s")
    if fmt == "ranktier" and trainer._rt_spec not in (None, False):
        kinds = [e[0] for e in trainer._rt_spec]
        log(f"          spec: {kinds.count('t')} tiered / "
            f"{kinds.count('p')} plain; tier entries: "
            + "; ".join(
                f"f{f}:w={e[1][:3]},dict={e[4]}"
                for f, e in enumerate(trainer._rt_spec) if e[0] == "t"
            ))


if __name__ == "__main__":
    for fmt in sys.argv[1:] or ("escape", "ranktier"):
        run(fmt)
