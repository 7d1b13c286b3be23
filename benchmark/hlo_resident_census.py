#!/usr/bin/env python
"""Resident-region device-tax census (CPU-side, no chip needed).

Lowers + compiles the EXACT fused window program (_train_window_packed) at
two resident-region sizes and diffs (a) XLA's aggregate cost analysis and
(b) the optimized-HLO op census of full-(N, D) tensors, where
N = capacity + resident_total. Whatever scales with N here is the candidate
set for the measured ~0.8 ms/iter per 100k resident rows device tax
(docs/PERF_NOTES.md round-2 ablation; TODO #2) — the chip profiler run then
confirms which survives TPU fusion.

CPU HLO is not TPU HLO, but copy insertion, buffer donation, scatter
in-placing and the dense-grad full-array passes are backend-independent
structure — exactly the things that could scale with N.
"""

import argparse
import re
import sys
from collections import Counter

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--capacity", type=int, default=331_932)
    p.add_argument("--residents", type=int, nargs="+",
                   default=[70_000, 570_000])
    p.add_argument("--prefetch", type=int, default=8)
    p.add_argument("--batch", type=int, default=16384)
    p.add_argument("--features", type=int, default=26)
    p.add_argument("--sparse-grad", action="store_true")
    p.add_argument("--cache-dtype", default="bfloat16",
                   choices=["bfloat16", "float32", "float8_e4m3fn"])
    p.add_argument("--dump-hlo", type=str, default=None)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cachedembedding_tpu.models.dlrm import init_dlrm_dense
    from cachedembedding_tpu.train import trainer as T

    P, B, F = args.prefetch, args.batch, args.features
    pooling = 1
    L = F * B * pooling
    D = 128
    Din = 13
    sb = fb = 512
    layout = (P, L, B, Din, "int8", 32, sb, fb, "bfloat16", 1)

    key = jax.random.PRNGKey(0)
    dp = init_dlrm_dense(
        key, D, F, Din,
        dense_arch_layer_sizes=[512, 256, D],
        over_arch_layer_sizes=[1024, 1024, 512, 256, 1],
    )
    dp_s = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), dp
    )

    # generous packed buffer: ids + dense(+meta) + labels + admits
    packed_bytes = (
        P * L * 4 + P * B * Din + 64 + (P * B) // 8
        + sb * (12 + D * 4) + fb * (4 + D * 2 + 4) + 4096
    )

    reports = {}
    for R in args.residents:
        N = args.capacity + R
        cw_s = jax.ShapeDtypeStruct((N, D), jnp.dtype(args.cache_dtype))
        pk_s = jax.ShapeDtypeStruct((packed_bytes,), jnp.uint8)
        lr_s = jax.ShapeDtypeStruct((P,), jnp.float32)
        seed_s = jax.ShapeDtypeStruct((), jnp.uint32)
        lowered = T._train_window_packed.lower(
            dp_s, cw_s, pk_s, lr_s, lr_s, seed_s,
            layout=layout, num_features=F, batch_size=B, pooling=pooling,
            mode="sum", compute_dtype_name="bfloat16", use_pallas=False,
            sparse_grad=args.sparse_grad, model="dlrm", optimizer="sgd",
        )
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        hlo = compiled.as_text()
        if args.dump_hlo:
            open(f"{args.dump_hlo}.N{N}.hlo", "w").write(hlo)
        # census: optimized-HLO ops whose output carries the full N dim
        pat = re.compile(rf"= *[a-z0-9]+\[{N},?\d*\]\{{?[^ ]* (\w+)")
        ops = Counter()
        for m in re.finditer(rf"\[{N}(?:,\d+)?\]", hlo):
            line_start = hlo.rfind("\n", 0, m.start()) + 1
            line = hlo[line_start : hlo.find("\n", m.start())]
            om = re.search(r"= *\S+ (\w+)\(", line) or re.search(
                r"(\w+)\(", line
            )
            ops[om.group(1) if om else "?"] += 1
        reports[R] = (N, ca, ops)
        print(
            f"R={R:>7} N={N:>8}: flops={ca.get('flops', 0):.3e} "
            f"bytes={ca.get('bytes accessed', 0):.3e}",
            flush=True,
        )
        top = ", ".join(f"{k}:{v}" for k, v in ops.most_common(12))
        print(f"  full-N ops: {top}", flush=True)

    if len(args.residents) >= 2:
        r0, r1 = args.residents[0], args.residents[-1]
        (n0, c0, o0), (n1, c1, o1) = reports[r0], reports[r1]
        drows = n1 - n0
        db = c1.get("bytes accessed", 0) - c0.get("bytes accessed", 0)
        df = c1.get("flops", 0) - c0.get("flops", 0)
        print(f"\ndelta per extra row: bytes={db / max(drows,1):.1f} "
              f"flops={df / max(drows,1):.1f}")
        print(f"  => bytes/iter per 100k rows: {db / max(drows,1) * 1e5 / P / 1e6:.1f} MB")
        grew = {k: (o0.get(k, 0), o1.get(k, 0)) for k in set(o0) | set(o1)}
        print("  full-N op-count diff (N0 -> N1):")
        for k, (a, b) in sorted(grew.items(), key=lambda kv: -kv[1][1]):
            print(f"    {k}: {a} -> {b}")


if __name__ == "__main__":
    main()
