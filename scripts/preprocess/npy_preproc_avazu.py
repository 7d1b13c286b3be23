#!/usr/bin/env python
"""Avazu csv -> npy preprocessing (parity with
/root/reference/scripts/preprocess/npy_preproc_avazu.py; row mapping follows the
loader's _default_row_mapper, /root/reference/recsys/datasets/avazu.py:38-49).

Avazu train.csv columns: id, click, hour, C1, banner_pos, site_id, site_domain,
site_category, app_id, app_domain, app_category, device_id, device_ip,
device_model, device_type, device_conn_type, C14..C21.

  * sparse (13): C1, banner_pos (ints), then the 9 hex id/domain/category
    columns parsed base-16 (errors -> 0), then device_type, device_conn_type.
  * dense (8): C14..C21 as float32 (log1p).
  * labels: click.

Usage: python npy_preproc_avazu.py --input_file train.csv --output_dir DIR
"""

import argparse
import csv
import os

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input_file", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--train_fraction", type=float, default=0.9)
    args = p.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)

    sparse_rows, dense_rows, labels = [], [], []
    with open(args.input_file, newline="") as f:
        reader = csv.reader(f)
        next(reader)  # header
        for row in reader:
            labels.append(int(row[1]))
            sp = [int(row[3]), int(row[4])]
            for c in row[5:14]:  # 9 hex columns
                try:
                    sp.append(int(c, 16))
                except ValueError:
                    sp.append(0)
            sp += [int(row[14]), int(row[15])]
            sparse_rows.append(sp)
            dense_rows.append([float(x) for x in row[16:24]])

    sparse = np.asarray(sparse_rows, np.int64).astype(np.int32)
    dense = np.log1p(np.asarray(dense_rows, np.float32))
    lab = np.asarray(labels, np.int32).reshape(-1, 1)

    n_train = int(len(lab) * args.train_fraction)
    for name, lo, hi in [("train", 0, n_train), ("val", n_train, len(lab))]:
        np.save(os.path.join(args.output_dir, f"{name}_dense.npy"), dense[lo:hi])
        np.save(os.path.join(args.output_dir, f"{name}_sparse.npy"), sparse[lo:hi])
        np.save(os.path.join(args.output_dir, f"{name}_labels.npy"), lab[lo:hi])
    print(f"wrote {n_train} train / {len(lab) - n_train} eval rows")


if __name__ == "__main__":
    main()
