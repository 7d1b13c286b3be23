"""Baseline trainer CLI — the torchrec-DMP comparison harness analog
(/root/reference/baselines/dlrm_main.py): pick an embedding kernel and a
sharding type, let the planner produce+print a placement, train and evaluate
the same DLRM on the same data as the cached flagship path.

Kernels (reference :725-750): ``hbm`` = whole table HBM-resident (torchrec
"fused"); ``cached`` = this framework's host-DRAM + HBM hot-row cache (the
CAI_BATCH analog). The reference's uvm/uvm_lru/uvm_lfu kernels have no TPU
counterpart — there is no unified memory; the cache IS the tiering layer.

Sharding (reference :709-721): auto | table | column | row, resolved by
``parallel.planner.EmbeddingShardingPlanner``.

Usage:
  python -m cachedembedding_tpu.baselines.dlrm_main --kernel hbm --plan_only
  python -m cachedembedding_tpu.baselines.dlrm_main --kernel cached \
      --limit_train_batches 50
"""

from __future__ import annotations

import argparse
import sys



def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="cachedembedding_tpu baseline trainer")
    p.add_argument("--dataset_dir", type=str, default=None)
    p.add_argument("--num_embeddings_per_feature", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=16384)
    p.add_argument("--limit_train_batches", type=int, default=None)
    p.add_argument("--limit_val_batches", type=int, default=None)
    p.add_argument("--embedding_dim", type=int, default=128)
    p.add_argument("--learning_rate", "--lr", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=1024)
    p.add_argument("--kernel", choices=["hbm", "cached", "auto"], default="hbm",
                   help="embedding compute kernel (reference --kernel fused|...|"
                        "colossalai). 'auto' EXECUTES the planner's per-table "
                        "kernel decisions: HBM_FULL tables resident + CACHED "
                        "tables cached in ONE model (the DMP plan execution, "
                        "reference :764-792)")
    p.add_argument("--sharding",
                   choices=["auto", "table", "column", "row", "tablerow",
                            "tablecolumn"],
                   default="auto",
                   help="sharding type fed to the planner (reference "
                        "--sharding_type; tablerow/tablecolumn shard within "
                        "one host group — set --devices_per_host)")
    p.add_argument("--devices_per_host", type=int, default=0,
                   help="devices per host for the hierarchical "
                        "tablerow/tablecolumn placements (0 = single host)")
    p.add_argument("--cache_ratio", type=float, default=0.01)
    p.add_argument("--use_freq", action="store_true")
    p.add_argument("--prefetch_num", type=int, default=4)
    p.add_argument("--num_devices", type=int, default=None,
                   help="topology size for planning (default: visible devices)")
    p.add_argument("--hbm_gb", type=float, default=16.0)
    p.add_argument("--host_gb", type=float, default=256.0)
    p.add_argument("--plan_only", action="store_true",
                   help="print the sharding plan and exit")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    import jax

    from cachedembedding_tpu.config import CacheConfig, DLRMConfig
    from cachedembedding_tpu.parallel.planner import (
        EmbeddingShardingPlanner,
        Kernel,
        ShardingType,
        Topology,
        specs_from_sizes,
    )
    from cachedembedding_tpu.train import dlrm_main as flagship

    # reuse the flagship CLI's dataset plumbing
    base = flagship.parse_args([])
    base.dataset_dir = args.dataset_dir
    base.num_embeddings_per_feature = args.num_embeddings_per_feature
    base.batch_size = args.batch_size
    base.limit_train_batches = args.limit_train_batches
    base.limit_val_batches = args.limit_val_batches
    base.use_freq = args.use_freq
    base.embedding_dim = args.embedding_dim
    if args.embedding_dim != 128:
        # DenseArch must end at embedding_dim for the interaction
        base.dense_arch_layer_sizes = f"{4 * args.embedding_dim},{args.embedding_dim}"
    cfg = flagship.build_config(base)
    cfg.learning_rate = args.learning_rate
    cfg.seed = args.seed
    cfg.cache = CacheConfig(
        cache_ratio=args.cache_ratio, prefetch_num=args.prefetch_num,
        use_freq=args.use_freq, buffer_size=0,
    )

    freq = flagship.get_freq(base, cfg) if args.use_freq else None
    ndev = args.num_devices or len(jax.devices())
    topo = Topology(
        num_devices=ndev,
        hbm_bytes_per_device=int(args.hbm_gb * (1 << 30)),
        host_dram_bytes=int(args.host_gb * (1 << 30)),
        devices_per_host=args.devices_per_host,
    )
    specs = specs_from_sizes(
        cfg.num_embeddings_per_feature, cfg.embedding_dim, id_freq_map=freq
    )
    force_sharding = {
        "auto": None,
        "table": ShardingType.TABLE_WISE,
        "column": ShardingType.COLUMN_WISE,
        "row": ShardingType.ROW_WISE,
        "tablerow": ShardingType.TABLE_ROW_WISE,
        "tablecolumn": ShardingType.TABLE_COLUMN_WISE,
    }[args.sharding]
    plan = EmbeddingShardingPlanner(topo).plan(
        specs,
        batch_size=cfg.batch_size,
        force_kernel=Kernel.CACHED if args.kernel == "cached" else None,
        force_sharding=force_sharding,
        default_cache_ratio=args.cache_ratio,
    )
    print(plan.pretty())
    if args.plan_only:
        return

    from cachedembedding_tpu.baselines.full_resident import FullyResidentEmbeddingBag
    from cachedembedding_tpu.train.trainer import CachedDLRMTrainer

    if args.kernel == "hbm":
        embed = FullyResidentEmbeddingBag(
            cfg.total_num_embeddings, cfg.embedding_dim,
            table_sizes=cfg.num_embeddings_per_feature, seed=cfg.seed,
        )
        trainer = CachedDLRMTrainer(cfg, embed_override=embed)
    elif args.kernel == "auto":
        # execute the plan: per-table kernels in one mixed bag
        from cachedembedding_tpu.cache.manager import CachedEmbeddingBag

        resident = [
            i for i, tp in enumerate(plan.tables) if tp.kernel is Kernel.HBM_FULL
        ]
        embed = CachedEmbeddingBag(
            cfg.total_num_embeddings, cfg.embedding_dim,
            table_sizes=cfg.num_embeddings_per_feature,
            cache_ratio=args.cache_ratio,
            ids_freq_mapping=freq,
            warmup_ratio=cfg.cache.warmup_ratio if freq is not None else 0.0,
            buffer_size=0, seed=cfg.seed,
            resident_tables=resident,
        )
        print(
            f"mixed-kernel: {len(resident)} resident tables "
            f"({embed.resident_total} rows HBM), "
            f"{len(plan.tables) - len(resident)} cached "
            f"(capacity {embed.capacity})", file=sys.stderr,
        )
        trainer = CachedDLRMTrainer(cfg, embed_override=embed)
    else:
        trainer = CachedDLRMTrainer(cfg, id_freq_map=freq)

    train_data = flagship.get_data(base, cfg, "train")
    report = trainer.train(train_data, num_iters=args.limit_train_batches, log_every=100)
    print(
        f"train: {len(report.losses)} iters, {report.it_per_s:.2f} it/s, "
        f"{report.examples_per_s:.0f} ex/s", file=sys.stderr,
    )
    val = flagship.get_data(base, cfg, "val")
    if args.limit_val_batches:
        val = list(val)[: args.limit_val_batches]
    metrics = trainer.evaluate(val)
    print(f"val: auroc={metrics['auroc']:.9f} accuracy={metrics['accuracy']:.9f}")


if __name__ == "__main__":
    main()
