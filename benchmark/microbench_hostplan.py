#!/usr/bin/env python
"""Host-side per-window budget at the exact headline bench config.

The host must, per prefetch window: translate/plan ids (native directory),
escape-encode + bit-pack them, quantize dense features, pack labels, stage
admit payloads, and hand XLA ONE packed buffer. None of that touches the
chip, so it is measurable on the CPU backend today — and it bounds the
achievable it/s: at the 2-3x-baseline target (125-150 it/s = 53-64 ms per
8-batch window) the host budget must stay well under the window's device
time to overlap away.

Run: python benchmark/microbench_hostplan.py [--windows 12]
"""

import argparse
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--windows", type=int, default=12)
    p.add_argument("--prefetch", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=16384)
    p.add_argument("--skew", type=float, default=0.5)
    p.add_argument("--resident-threshold", type=int, default=500_000)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from cachedembedding_tpu.config import (
        CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE,
        CacheConfig,
        DLRMConfig,
    )
    from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset
    from cachedembedding_tpu.train.trainer import CachedDLRMTrainer

    tables = CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE
    cfg = DLRMConfig(
        num_embeddings_per_feature=tables,
        embedding_dim=128,
        dense_in_features=13,
        batch_size=args.batch_size,
        learning_rate=1.0,
        compute_dtype="bfloat16",
        dense_input_dtype="int8",
        cache=CacheConfig(
            cache_ratio=0.01,
            warmup_ratio=0.7,
            prefetch_num=args.prefetch,
            buffer_size=0,
            use_lfu_eviction=False,
            weight_init="virtual",
            transfer_dtype="bfloat16",
            resident_threshold=args.resident_threshold,
        ),
    )
    n_batches = args.windows * args.prefetch + 2 * args.prefetch
    data = SyntheticLongTailDataset(
        tables, cfg.batch_size, num_batches=n_batches,
        dense_in_features=13, skew=args.skew, seed=7, learnable_labels=False,
    )
    t0 = time.time()
    trainer = CachedDLRMTrainer(cfg, id_freq_map=data.id_freq_map())
    print(f"trainer ready in {time.time() - t0:.1f}s", file=sys.stderr)
    batches = [data.make_batch(i) for i in range(n_batches)]

    # burn-in: freeze the escape spec, fill free slots so later windows churn
    pn = args.prefetch
    for w in range(2):
        win = batches[w * pn : (w + 1) * pn]
        pw, sv = trainer._begin_window(win)
        trainer._finish_window(pw)

    begin_ts, plan_hits = [], []
    for w in range(2, 2 + args.windows):
        win = batches[w * pn : (w + 1) * pn]
        t0 = time.perf_counter()
        pw, sv = trainer._begin_window(win)
        dt = time.perf_counter() - t0
        trainer._finish_window(pw)
        begin_ts.append(dt)
        s = trainer.embed.stats
        plan_hits.append(s.num_miss_history[-1] if s.num_miss_history else 0)
    arr = np.array(begin_ts) * 1000
    print(
        f"_begin_window (plan+escape-pack+quant+device_put): "
        f"median {np.median(arr):.1f} ms/window = "
        f"{np.median(arr) / pn:.2f} ms/iter  "
        f"(min {arr.min():.1f}, max {arr.max():.1f}; "
        f"misses/window median {int(np.median(plan_hits))})"
    )

    # A/B the positional-layout translate against the generic searchsorted
    # path on the same fresh window (identical directory state is NOT needed
    # for a timing comparison of the translate itself)
    embed = trainer.embed
    spare = batches[(2 + args.windows) * pn - pn:]
    if len(spare) >= pn and embed.resident_tables:
        win = spare[:pn]
        ids = np.ascontiguousarray(
            np.concatenate(
                [np.asarray(b.sparse_features.values) for b in win]
            ),
            np.int32,
        )
        F = win[0].sparse_features.num_features
        t0 = time.perf_counter()
        out_g, cmask, cids_g = embed._translate_ids(ids)
        t1 = time.perf_counter()
        print(f"generic _translate_ids (searchsorted): {(t1 - t0) * 1000:.1f} ms/window")
        t0 = time.perf_counter()
        v = ids.reshape(pn, F, -1)
        res_t = np.nonzero(embed._is_res_table[:F])[0]
        cac_t = np.nonzero(~embed._is_res_table[:F])[0]
        out_u = np.empty(v.shape, np.int32)
        out_u[:, res_t, :] = v[:, res_t, :] + embed._res_delta[res_t].astype(
            np.int32
        )[None, :, None]
        cids_u = np.ascontiguousarray(v[:, cac_t, :].reshape(-1))
        t1 = time.perf_counter()
        print(f"positional translate (uniform layout): {(t1 - t0) * 1000:.1f} ms/window")
        assert np.array_equal(cids_g, cids_u)

    hr = trainer.embed.stats.hit_rate()
    print(f"steady hit rate {hr:.4f}")


if __name__ == "__main__":
    main()
