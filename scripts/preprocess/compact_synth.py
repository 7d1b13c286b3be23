#!/usr/bin/env python
"""Compact fbgemm embedding-trace ids to dense ranges — analog of
/root/reference/recsys/utils/preprocess_synth.py (torch.unique with
return_inverse per table), emitting .npz trace files the SynthTraceDataset
loads without torch.

Usage:
  python scripts/preprocess/compact_synth.py --input fbgemm_t856_bs65536.pt \
      --output_dir /data/synth_compact
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help=".pt trace (indices, offsets, lengths)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--num_tables", type=int, default=856)
    args = p.parse_args()

    import torch  # CPU deserialization only

    indices, offsets, lengths = torch.load(args.input, map_location="cpu", weights_only=False)
    indices = indices.numpy().astype(np.int64)
    offsets = offsets.numpy().astype(np.int64)
    # the trace interleaves tables: offsets has num_tables * batch + 1 entries
    T = args.num_tables
    bags = offsets.shape[0] - 1
    assert bags % T == 0, f"{bags} bags not divisible by {T} tables"
    stride = bags // T
    os.makedirs(args.output_dir, exist_ok=True)
    for t in range(T):
        lo_bag, hi_bag = t * stride, (t + 1) * stride
        lo, hi = offsets[lo_bag], offsets[hi_bag]
        ids = indices[lo:hi]
        uniq, inv = np.unique(ids, return_inverse=True)
        table_offsets = offsets[lo_bag : hi_bag + 1] - lo
        np.savez(
            os.path.join(args.output_dir, f"table_{t:04d}.npz"),
            indices=inv.astype(np.int64),
            offsets=table_offsets.astype(np.int64),
            num_embeddings=np.int64(uniq.shape[0]),
        )
        if t % 100 == 0:
            print(f"table {t}: {uniq.shape[0]} unique ids, {ids.shape[0]} lookups")
    print(f"wrote {T} compacted tables to {args.output_dir}")


if __name__ == "__main__":
    main()
