"""Id-wire headroom analysis (VERDICT r4 #5): how close is the escape-coded
id format to the entropy floor of what must cross the host->device link?

Replays the host planner to steady state at the EXACT headline bench config
(kaggle tables, mixed-kernel resident split 500k, 1% ratio, skew 0.5, freq
warmup, prefetch 8) and, over the measured windows, collects the per-feature
wire symbols the trainer actually ships: raw local ids for resident features
(plus a static device delta), cache-slot ids for cached features. Reports
bytes/iter under:

  plain    — per-feature fixed width ceil(log2(range)) (pf_pack_spec)
  escape   — per-feature width chosen to minimize n*w + overflows*64
             (exactly the trainer's _escape_encode learning rule)
  entropy  — sum_f n * H(empirical symbol distribution of feature f) / 8:
             the floor for ANY per-symbol code, device-decodable or not

The gap between escape and entropy is the theoretical budget left for a
cleverer format; a per-symbol variable-length code is NOT device-decodable
(unpack must be vectorized shifts/masks inside the window program), so the
practical target is the best fixed-width(+escape) scheme.

Usage: python benchmark/wire_entropy.py   (CPU, ~2 min)
"""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from cachedembedding_tpu.config import (  # noqa: E402
    CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE as TABLES,
)
from cachedembedding_tpu.cache.manager import (  # noqa: E402
    CachedEmbeddingBag,
    EvictionStrategy,
)
from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset  # noqa: E402

THRESHOLD = 500_000
BATCH = 16384
PREFETCH = 8
WARM_ITERS = 152
MEASURE_ITERS = 48
ESC_ENTRY_BITS = 64  # trainer _ESC_BITS: u32 pos + u32 val per escape


def main() -> None:
    resident = [t for t, n in enumerate(TABLES) if n <= THRESHOLD]
    F = len(TABLES)
    data = SyntheticLongTailDataset(
        TABLES, BATCH, num_batches=WARM_ITERS + MEASURE_ITERS,
        dense_in_features=13, skew=0.5, seed=7, learnable_labels=False,
    )
    num_cached = sum(TABLES) - sum(TABLES[t] for t in resident)
    bag = CachedEmbeddingBag(
        sum(TABLES), 8,
        cuda_row_num=int(0.01 * num_cached),
        ids_freq_mapping=data.id_freq_map(),
        warmup_ratio=0.7,
        evict_strategy=EvictionStrategy.DATASET,
        table_sizes=list(TABLES),
        resident_tables=resident,
        weight_init="virtual",
        planner="host",
    )
    spec = bag.pf_pack_spec(BATCH * PREFETCH)
    t0 = time.time()
    total = WARM_ITERS + MEASURE_ITERS
    # per-feature symbol histograms over the measured windows
    counts = [None] * F
    n_meas = 0
    for w0 in range(0, total, PREFETCH):
        P = min(PREFETCH, total - w0)
        ids = np.concatenate([
            np.asarray(data.make_batch(i).sparse_features.values)
            for i in range(w0, w0 + P)
        ])
        pw = bag.begin_prepare(ids, out_shape=(P, F, BATCH), device_put=False)
        bag.finish_prepare(pw)
        if w0 + P <= WARM_ITERS:
            continue
        slot3 = np.asarray(pw.slot_ids)  # (P, F, B) device addresses
        n_meas += P * BATCH
        for f, (w, delta) in enumerate(spec):
            sym = slot3[:, f, :].reshape(-1)
            if delta:
                sym = sym - delta
            c = np.bincount(sym)
            if counts[f] is None or counts[f].size < c.size:
                old, counts[f] = counts[f], c.copy()
                if old is not None:
                    counts[f][: old.size] += old
            else:
                counts[f][: c.size] += c
    log = lambda m: print(m, file=sys.stderr, flush=True)
    log(f"replay done in {time.time() - t0:.0f}s; measured {n_meas} ids/feature")

    plain_bits = escape_bits = entropy_bits = 0.0
    log(f"{'f':>3} {'rows':>9} {'kind':>8} {'plainW':>6} {'escW':>4} "
        f"{'esc%':>6} {'H(bits)':>8}")
    for f, (w, delta) in enumerate(spec):
        c = counts[f].astype(np.float64)
        n = c.sum()
        p = c[c > 0] / n
        H = float(-(p * np.log2(p)).sum())
        # escape-optimal fixed width (the trainer's rule, 5% overflow cap)
        nvals = counts[f].size
        best_w, best_cost = w, n * w
        for wc in range(1, w):
            over = c[1 << wc :].sum() if (1 << wc) < nvals else 0.0
            if over / n > 0.05:
                continue
            cost = n * wc + over * ESC_ENTRY_BITS
            if cost < best_cost:
                best_w, best_cost = wc, cost
        kind = "resident" if f in set(resident) else "cached"
        log(f"{f:>3} {TABLES[f]:>9} {kind:>8} {w:>6} {best_w:>4} "
            f"{(c[1 << best_w:].sum() / n * 100 if (1 << best_w) < nvals else 0):>5.1f}% "
            f"{H:>8.2f}")
        plain_bits += n * w
        escape_bits += best_cost
        entropy_bits += n * H

    # Candidate device-decodable formats, costed from the same histograms:
    #   esc37    — escape entries at 37 bits (17-bit window pos + 20-bit val)
    #              instead of 64, no overflow-rate cap
    #   2tier    — per-id 1-bit selector + two fixed-width packed streams
    #              (device reconstructs with a cumsum + two gathers)
    #   4tier    — 2-bit selector + four width tiers
    esc37_bits = tier2_bits = tier4_bits = 0.0
    for f, (w, delta) in enumerate(spec):
        c = counts[f].astype(np.float64)
        n = c.sum()
        tail = np.cumsum(c[::-1])[::-1]  # tail[k] = #ids with value >= k

        def over(wc):
            return tail[1 << wc] if (1 << wc) < tail.size else 0.0

        esc37_bits += min(n * wc + over(wc) * 37 for wc in range(1, w + 1))
        tier2_bits += min(
            n + n * ws + over(ws) * wl
            for ws in range(1, w + 1)
            for wl in (w,)
        )
        # 4-tier: widths (w1 < w2 < w3 < w); ids in [2^wk-1, 2^wk) pay wk.
        best4 = n * w
        Ws = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 17, 20]
        Ws = [x for x in Ws if x <= w]
        for a in Ws:
            for b in Ws:
                if b <= a:
                    continue
                for cc2 in Ws:
                    if cc2 <= b:
                        continue
                    cost = (
                        (n - over(a)) * a
                        + (over(a) - over(b)) * b
                        + (over(b) - over(cc2)) * cc2
                        + over(cc2) * w
                    )
                    best4 = min(best4, cost)
        tier4_bits += 2 * n + best4

    iters = n_meas / BATCH
    log("")
    for name, bits in (("plain", plain_bits), ("escape", escape_bits),
                       ("esc37", esc37_bits), ("2tier", tier2_bits),
                       ("4tier", tier4_bits), ("entropy", entropy_bits)):
        log(f"{name:>8}: {bits / 8 / iters / 1e6:.3f} MB/iter "
            f"({bits / n_meas / F:.2f} bits/id avg)")
    log(f"escape -> entropy headroom: "
        f"{(escape_bits - entropy_bits) / 8 / iters / 1e6:.3f} MB/iter")


if __name__ == "__main__":
    main()
