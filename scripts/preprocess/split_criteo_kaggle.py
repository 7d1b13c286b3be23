#!/usr/bin/env python
"""Split Criteo-Kaggle's single train.txt into 7 equal pseudo-day files
(parity with /root/reference/scripts/preprocess/split_criteo_kaggle.py).

Usage: python split_criteo_kaggle.py --input_file train.txt --output_dir DIR
"""

import argparse
import os

DAYS = 7


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input_file", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--days", type=int, default=DAYS)
    args = p.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)

    with open(args.input_file, "r") as f:
        total = sum(1 for _ in f)
    per_day = total // args.days
    print(f"{total} rows -> {args.days} days of ~{per_day}")

    with open(args.input_file, "r") as f:
        for day in range(args.days):
            n = per_day if day < args.days - 1 else total - per_day * (args.days - 1)
            with open(os.path.join(args.output_dir, f"day_{day}"), "w") as out:
                for _ in range(n):
                    out.write(f.readline())


if __name__ == "__main__":
    main()
