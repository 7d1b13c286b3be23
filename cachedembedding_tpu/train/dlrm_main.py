"""Training CLI — flag-level parity with the reference entry point
(/root/reference/recsys/dlrm_main.py:23-174) on the TPU stack.

Usage:
  python -m cachedembedding_tpu.train.dlrm_main --dataset_dir /data/criteo_kaggle \
      --batch_size 16384 --use_cache --cache_ratio 0.01 --use_freq --use_overlap

With no --dataset_dir, trains on procedural synthetic long-tail batches (the
reference defaults to 10 random batches, dlrm_main.py:186-190).
"""

from __future__ import annotations

import argparse
import sys
import time
from typing import Optional

import numpy as np


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="cachedembedding_tpu DLRM trainer")
    # data
    p.add_argument("--dataset_dir", type=str, default=None)
    p.add_argument("--kaggle", action="store_true", help="treat dataset as criteo kaggle")
    p.add_argument("--num_embeddings_per_feature", type=str, default=None,
                   help="comma-separated table sizes (overrides dataset constants)")
    p.add_argument("--batch_size", type=int, default=16384)
    p.add_argument("--limit_train_batches", type=int, default=None)
    p.add_argument("--limit_val_batches", type=int, default=None)
    p.add_argument("--limit_test_batches", type=int, default=None)
    p.add_argument("--shuffle_batches", action="store_true")
    p.add_argument("--pin_memory", action="store_true", help="accepted for parity (no-op on TPU-VM)")
    # model
    p.add_argument("--model", choices=["dlrm", "deepfm"], default="dlrm")
    p.add_argument("--deep_fm_dimension", type=int, default=16)
    p.add_argument("--embedding_dim", type=int, default=128)
    p.add_argument("--dense_arch_layer_sizes", type=str, default="512,256,128")
    p.add_argument("--over_arch_layer_sizes", type=str, default="1024,1024,512,256,1")
    # training
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--learning_rate", "--lr", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=1024)
    p.add_argument("--change_lr", action="store_true")
    p.add_argument("--lr_change_point", type=float, default=0.8)
    p.add_argument("--lr_after", type=float, default=0.2)
    p.add_argument("--validation_freq_within_epoch", type=int, default=None)
    # cache
    p.add_argument("--use_cache", action="store_true")
    p.add_argument("--cache_ratio", type=float, default=0.01)
    p.add_argument("--cache_sets", type=int, default=None,
                   help="legacy reference flag (pre --cache_ratio); sets capacity rows directly")
    p.add_argument("--warmup_ratio", type=float, default=0.7)
    p.add_argument("--buffer_size", type=int, default=50_000)
    p.add_argument("--use_freq", action="store_true")
    p.add_argument("--use_lfu", action="store_true")
    p.add_argument("--use_overlap", action="store_true")
    p.add_argument("--prefetch_num", type=int, default=8,
                   help="far-sighted prefetch window depth; 8 is the "
                        "measured-best fused-window default (docs/AB_REPORT.md), "
                        "1 reproduces the reference's unpipelined per-batch "
                        "semantics")
    p.add_argument("--transfer_dtype",
                   choices=["float32", "bfloat16", "int8", "int4"],
                   default="float32",
                   help="host<->HBM row payload dtype; int8 = per-row symmetric "
                        "quantization, 129B/row on the wire vs 258 (bf16) / 516 (f32)")
    p.add_argument("--cache_dtype",
                   choices=["float32", "bfloat16", "float8_e4m3fn"],
                   default="bfloat16",
                   help="HBM cache-row storage dtype; fp8 halves cache HBM "
                        "again (arithmetic stays f32; AUROC retention gated "
                        "by tests)")
    p.add_argument("--stochastic_rounding", choices=["auto", "on", "off"],
                   default="auto",
                   help="stochastic rounding of cache-row updates (auto = on "
                        "for fp8 cache dtypes; fixes sub-ulp update "
                        "stagnation at small late-stage LRs)")
    p.add_argument("--planner", choices=["auto", "host", "device"], default="auto",
                   help="cache planner: native host directory vs jitted device state machine")
    # parallelism
    p.add_argument("--use_tablewise", action="store_true")
    p.add_argument("--use_rowwise", action="store_true",
                   help="row-sharded cached embedding: host-DRAM master "
                        "sharded row-wise across hosts, per-host directory + "
                        "HBM cache over locally-owned rows, owner-routed id "
                        "exchange (torchrec ROW_WISE analog, "
                        "baselines/dlrm_main.py:709-721 — the >=2-host shape)")
    p.add_argument("--fused_op", choices=["all_to_all", "gather_scatter"], default="all_to_all")
    p.add_argument("--world_size", type=int, default=None,
                   help="devices to use (default: all visible)")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed for a TPU pod slice "
                        "(launch the same command on every host; scripts/pod.sh)")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="with --multihost: explicit coordinator host:port "
                        "(default: TPU metadata service autodetect). Also used "
                        "by the CPU multi-process dress rehearsal "
                        "(tests/test_multiprocess.py)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="with --multihost + --coordinator_address: process count")
    p.add_argument("--process_id", type=int, default=None,
                   help="with --multihost + --coordinator_address: this process's id")
    # observability / debug
    p.add_argument("--inspect_time", action="store_true",
                   help="run 200 iters printing per-step loss + timing, then exit "
                        "(/root/reference/recsys/dlrm_main.py:464-495)")
    p.add_argument("--profile_dir", type=str, default="")
    p.add_argument("--checkpoint_dir", type=str, default="",
                   help="save a flush-coherent checkpoint here after each epoch "
                        "(and resume from it at startup if present)")
    p.add_argument("--memory_fraction", type=float, default=None)
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu) — applied before "
                        "backend init; JAX_PLATFORMS env is too late when a "
                        "sitecustomize imports jax first")
    p.add_argument("--compute_dtype", choices=["float32", "bfloat16"], default="float32")
    p.add_argument("--embedding_optimizer", choices=["sgd", "rowwise_adagrad"],
                   default="sgd", help="embedding-table optimizer; rowwise_adagrad "
                   "state tiers with the cache (beyond-reference feature)")
    p.add_argument("--adagrad_eps", type=float, default=1e-10)
    p.add_argument("--use_sparse_embed_grad", action="store_true",
                   help="force the scatter-add sparse embedding gradient path "
                   "(reference flag; otherwise chosen automatically by "
                   "capacity/ids-size heuristic)")
    return p.parse_args(argv)


def build_config(args):
    from cachedembedding_tpu.config import (
        AVAZU_NUM_DENSE,
        AVAZU_NUM_EMBEDDINGS_PER_FEATURE,
        CRITEO_1TB_NUM_EMBEDDINGS_PER_FEATURE,
        CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE,
        CRITEO_NUM_DENSE,
        CacheConfig,
        DLRMConfig,
    )

    dense_in = CRITEO_NUM_DENSE
    if args.num_embeddings_per_feature:
        tables = [int(x) for x in args.num_embeddings_per_feature.split(",")]
    elif args.dataset_dir is None:
        tables = [100_000, 20_000, 10_000, 5_000]
        dense_in = 13
    elif "kaggle" in args.dataset_dir or args.kaggle:
        tables = CRITEO_KAGGLE_NUM_EMBEDDINGS_PER_FEATURE
    elif "avazu" in args.dataset_dir:
        tables = AVAZU_NUM_EMBEDDINGS_PER_FEATURE
        dense_in = AVAZU_NUM_DENSE
    else:
        tables = CRITEO_1TB_NUM_EMBEDDINGS_PER_FEATURE

    cache = CacheConfig(
        cache_ratio=args.cache_ratio,
        warmup_ratio=args.warmup_ratio,
        buffer_size=args.buffer_size,
        use_lfu_eviction=args.use_lfu,
        use_freq=args.use_freq,
        prefetch_num=args.prefetch_num,
        use_overlap=args.use_overlap,
        transfer_dtype=args.transfer_dtype,
        cache_dtype=args.cache_dtype,
        stochastic_rounding=args.stochastic_rounding,
        planner=args.planner,
    )
    cfg = DLRMConfig(
        model=args.model,
        deep_fm_dimension=args.deep_fm_dimension,
        num_embeddings_per_feature=tables,
        embedding_dim=args.embedding_dim,
        dense_in_features=dense_in,
        dense_arch_layer_sizes=tuple(int(x) for x in args.dense_arch_layer_sizes.split(",")),
        over_arch_layer_sizes=tuple(int(x) for x in args.over_arch_layer_sizes.split(",")),
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        epochs=args.epochs,
        seed=args.seed,
        change_lr=args.change_lr,
        lr_change_point=args.lr_change_point,
        lr_after=args.lr_after,
        shuffle_batches=args.shuffle_batches,
        validation_freq_within_epoch=args.validation_freq_within_epoch,
        use_tablewise=args.use_tablewise,
        fused_op=args.fused_op,
        compute_dtype=args.compute_dtype,
        embedding_optimizer=args.embedding_optimizer,
        adagrad_eps=args.adagrad_eps,
        use_sparse_embed_grad=args.use_sparse_embed_grad,
        cache=cache,
    )
    return cfg


def get_data(args, cfg, stage: str):
    if args.dataset_dir is None:
        from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset

        n = {"train": args.limit_train_batches or 10,
             "val": args.limit_val_batches or 2,
             "test": args.limit_test_batches or 2}[stage]
        return SyntheticLongTailDataset(
            cfg.num_embeddings_per_feature, cfg.batch_size, n,
            dense_in_features=cfg.dense_in_features,
            seed=cfg.seed + {"train": 0, "val": 1, "test": 2}[stage],
        )
    if "avazu" in args.dataset_dir:
        from cachedembedding_tpu.data import avazu as mod
    else:
        from cachedembedding_tpu.data import criteo as mod
    return mod.get_dataloader(
        args.dataset_dir, stage, cfg.batch_size,
        shuffle_batches=cfg.shuffle_batches, seed=cfg.seed,
        hashes=cfg.num_embeddings_per_feature,
    )


def get_freq(args, cfg) -> Optional[np.ndarray]:
    if not args.use_freq:
        return None
    if args.dataset_dir is None:
        from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset

        return get_data(args, cfg, "train").id_freq_map()
    if "avazu" in args.dataset_dir:
        from cachedembedding_tpu.data.avazu import get_id_freq_map
    else:
        from cachedembedding_tpu.data.criteo import get_id_freq_map
    return np.asarray(
        get_id_freq_map(
            args.dataset_dir, table_sizes=cfg.num_embeddings_per_feature
        )
    )


def run_hybrid(args, cfg, freq) -> None:
    """Tablewise multi-device training with the FULL windowed train/val/test
    (the reference's multi-GPU flagship scope,
    /root/reference/recsys/dlrm_main.py:206-374): prefetch windows planned once
    per window (one directory plan per rank), trained as ONE shard_map scan
    execute per window, eval AUROC/accuracy per epoch. Column-wise multi-device
    runs through the mesh-windowed CachedDLRMTrainer instead (main())."""
    import jax

    from cachedembedding_tpu.models.hybrid import HybridParallelDLRM
    from cachedembedding_tpu.parallel.mesh import make_mesh
    from cachedembedding_tpu.utils.metrics import StreamingMetrics

    n = args.world_size or len(jax.devices())
    mesh = make_mesh(n)
    model = HybridParallelDLRM(cfg, mesh=mesh, id_freq_map=freq)
    print(model.model_stats("HybridParallelDLRM"), file=sys.stderr)
    offsets = np.concatenate(
        [[0], np.cumsum(cfg.num_embeddings_per_feature)]
    ).astype(np.int64)
    pn = max(1, cfg.cache.prefetch_num)

    def ids_bf(b):
        f = b.sparse_features
        vals = np.asarray(f.values)
        return vals.reshape(f.num_features, f.batch_size).T - offsets[:-1][None, :]

    def fetch(it, k):
        out = []
        for _ in range(k):
            try:
                out.append(next(it))
            except StopIteration:
                break
        return out

    def run_windows(data, limit, train: bool, progress_base=0, progress_total=None):
        """Windowed pass; returns (list of per-step losses | metrics, n_iters)."""
        it = iter(data)
        metrics = StreamingMetrics()
        losses = []
        done = 0
        while True:
            want = pn if limit is None else min(pn, limit - done)
            if want <= 0:
                break
            window = fetch(it, want)
            if not window:
                break
            slot_ids, plans = model.embed.begin_prepare_window(
                [ids_bf(b) for b in window]
            )
            model.embed.finish_prepare(plans)
            dense_P = np.stack([np.asarray(b.dense_features) for b in window])
            if train:
                lr = cfg.learning_rate
                if progress_total and cfg.change_lr:
                    prog = (progress_base + done) / max(progress_total, 1)
                    if prog >= cfg.lr_change_point:
                        lr = cfg.lr_after
                lrs = np.full((len(window),), lr, np.float32)
                labels_P = np.stack([np.asarray(b.labels) for b in window])
                loss = model.train_window(dense_P, slot_ids, labels_P, lrs, lrs)
                losses.append(loss)
            else:
                probs = model.eval_window(dense_P, slot_ids)
                metrics.update(
                    np.asarray(probs).reshape(-1),
                    np.concatenate([np.asarray(b.labels) for b in window]),
                )
            done += len(window)
        if train:
            if losses:
                flat = np.asarray(jnp.concatenate(losses))  # single sync readback
                return [float(x) for x in flat], done
            return [], done
        return metrics.compute(), done

    import jax.numpy as jnp

    limit = args.limit_train_batches
    for epoch in range(cfg.epochs):
        t0 = time.perf_counter()
        train_losses, n_it = run_windows(
            get_data(args, cfg, "train"), limit, train=True,
            progress_total=limit,
        )
        dt = time.perf_counter() - t0
        print(
            f"hybrid[{n}dev,tablewise] epoch {epoch}: {n_it} iters in {dt:.0f}s "
            f"({n_it / dt:.2f} it/s, {n_it * cfg.batch_size / dt:.0f} ex/s), "
            f"final loss={train_losses[-1]:.5f}" if train_losses else "no data"
        )
        model.embed.print_comm_stats()
        for stage, lim in [("val", args.limit_val_batches), ("test", args.limit_test_batches)]:
            m, cnt = run_windows(get_data(args, cfg, stage), lim, train=False)
            print(
                f"hybrid[{n}dev,tablewise] epoch {epoch} {stage}: "
                f"auroc={m['auroc']:.9f} accuracy={m['accuracy']:.9f} over {m['count']}"
            )


def run_rowwise(args, cfg, freq) -> None:
    """Row-sharded cached training over the mesh (parallel/row_cached.py):
    WINDOWED — ids routed to owner shards host-side and planned once per
    prefetch window (deduped across its batches), per-shard planners
    admit/evict on their own row ranges, then ONE shard_map scan executes the
    window's steps with the owner-routed all_to_all data plane (cache
    assembly/sync amortized over the window). Eval stays per-batch. The
    >=2-host topology of BASELINE.md, runnable today on the virtual CPU
    mesh."""
    import jax
    import jax.numpy as jnp

    from cachedembedding_tpu.cache.state import EvictionStrategy
    from cachedembedding_tpu.models.dlrm import init_dlrm_dense
    from cachedembedding_tpu.models.deepfm import init_deepfm
    from cachedembedding_tpu.parallel.mesh import make_mesh
    from cachedembedding_tpu.parallel.row_cached import (
        RowShardedCachedEmbeddingBag,
        build_rowwise_cached_step,
        build_rowwise_cached_window,
    )
    from cachedembedding_tpu.utils.metrics import StreamingMetrics

    n = args.world_size or len(jax.devices())
    mesh = make_mesh(n)
    cache_cfg = cfg.cache
    embed = RowShardedCachedEmbeddingBag(
        cfg.total_num_embeddings,
        cfg.embedding_dim,
        mesh=mesh,
        cache_ratio=cache_cfg.cache_ratio,
        ids_freq_mapping=freq if cache_cfg.use_freq else None,
        warmup_ratio=cache_cfg.warmup_ratio,
        buffer_size=cache_cfg.buffer_size,
        # DATASET needs a frequency map; fall back to LFU otherwise (same
        # selection as CachedDLRMTrainer.__init__)
        evict_strategy=(
            EvictionStrategy.DATASET
            if (not cache_cfg.use_lfu_eviction and cache_cfg.use_freq
                and freq is not None)
            else EvictionStrategy.LFU
        ),
        seed=cfg.seed,
        weight_init=cache_cfg.weight_init
        if cache_cfg.weight_init != "virtual" else "uniform",
        transfer_dtype=cache_cfg.transfer_dtype,
    )
    key = jax.random.PRNGKey(cfg.seed)
    if cfg.model == "deepfm":
        dp = init_deepfm(
            key, cfg.embedding_dim, cfg.num_sparse_features,
            cfg.dense_in_features,
            hidden_layer_size=cfg.dense_arch_layer_sizes[0],
            deep_fm_dimension=cfg.deep_fm_dimension,
        )
    else:
        dp = init_dlrm_dense(
            key, cfg.embedding_dim, cfg.num_sparse_features,
            cfg.dense_in_features, cfg.dense_arch_layer_sizes,
            cfg.over_arch_layer_sizes,
        )
    steps = {
        False: build_rowwise_cached_step(
            mesh, num_features=cfg.num_sparse_features,
            global_batch=cfg.batch_size, pooling=1,
            capacity=embed.capacity, model=cfg.model, train=False,
        ),
    }

    def train_step():
        # one windowed program; jit re-specializes on the (rare) shorter
        # final window's P automatically
        if "w" not in steps:
            steps["w"] = build_rowwise_cached_window(
                mesh, num_features=cfg.num_sparse_features,
                global_batch=cfg.batch_size, pooling=1,
                capacity=embed.capacity, model=cfg.model,
            )
        return steps["w"]

    B_local = cfg.batch_size // n
    F = cfg.num_sparse_features
    PN = max(1, cfg.cache.prefetch_num)

    # Explicit global shardings on every device input/readback: required when
    # the mesh spans processes (each controller transfers only its addressable
    # shards; np.asarray of a sharded output raises), a no-op single-process.
    from jax.sharding import NamedSharding, PartitionSpec as PS

    from cachedembedding_tpu.parallel.mesh import AXIS
    from cachedembedding_tpu.parallel.multiproc import (
        put_addressable,
        replicate_fn,
    )

    def put(x, *spec):
        # not device_put: multi-process device_put of host values allgathers
        # the full value as an equality check — a per-window wire tax
        return put_addressable(mesh, np.asarray(x), PS(*spec))

    replicate = replicate_fn(mesh)
    dp = jax.device_put(dp, NamedSharding(mesh, PS()))  # once, at startup

    def per_rank_ids(batch):
        f = batch.sparse_features
        fb = np.asarray(f.values).reshape(F, cfg.batch_size, -1)
        return np.stack(
            [fb[:, r * B_local : (r + 1) * B_local].reshape(-1) for r in range(n)]
        )

    def run(stage, limit, train, progress_total=None):
        metrics = StreamingMetrics()
        losses, done = [], 0
        lrj = put(np.float32(cfg.learning_rate))
        nonlocal dp
        it = iter(get_data(args, cfg, stage))

        def lr_at(i):
            lr = cfg.learning_rate
            if progress_total and cfg.change_lr:
                if i / max(progress_total, 1) >= cfg.lr_change_point:
                    lr = cfg.lr_after
            return lr

        while True:
            if limit is not None and done >= limit:
                break
            if train:
                # WINDOWED: plan the whole prefetch window once (ids deduped
                # across its batches), assemble/sync the sharded cache once,
                # run one shard_map scan over the window's steps.
                want = PN if limit is None else min(PN, limit - done)
                window = []
                for _ in range(want):
                    try:
                        window.append(next(it))
                    except StopIteration:
                        break
                if not window:
                    break
                Pw = len(window)
                ids = np.stack([per_rank_ids(b) for b in window])  # (P, W, L)
                enc = embed.prepare_ids_per_rank(
                    ids.transpose(1, 0, 2).reshape(n, -1)
                )
                enc = enc.reshape(n, Pw, -1).transpose(1, 0, 2)  # (P, W, L)
                cache = embed.global_cache()
                d = np.stack(
                    [
                        np.asarray(b.dense_features, np.float32).reshape(
                            n, B_local, -1
                        )
                        for b in window
                    ]
                )
                l = np.stack(
                    [
                        np.asarray(b.labels, np.float32).reshape(n, B_local)
                        for b in window
                    ]
                )
                lrs = put(np.asarray(
                    [lr_at(done + i) for i in range(Pw)], np.float32
                ))
                dp, cache, loss_w = train_step()(
                    dp, cache, put(enc, None, AXIS, None),
                    put(d, None, AXIS, None, None),
                    put(l, None, AXIS, None), lrs, lrs,
                )
                losses.append(loss_w)  # (P,) device; ONE batched readback below
                embed.sync_shards(cache)
                done += Pw
            else:
                try:
                    batch = next(it)
                except StopIteration:
                    break
                enc = embed.prepare_ids_per_rank(per_rank_ids(batch))
                cache = embed.global_cache()
                d = np.asarray(batch.dense_features, np.float32).reshape(
                    n, B_local, -1
                )
                probs = steps[False](
                    dp, cache, put(enc, AXIS, None),
                    put(d, AXIS, None, None), lrj, lrj
                )
                metrics.update(
                    np.asarray(replicate(probs)).reshape(-1),
                    np.asarray(batch.labels),
                )
                embed.sync_shards(cache)
                done += 1
        if train and losses:
            # per-iteration float() readbacks would serialize the loop on a
            # tunneled link; read the whole loss curve back once
            losses = [float(x) for x in np.asarray(jnp.concatenate(losses))]
        return (losses if train else metrics.compute()), done

    import time

    limit = args.limit_train_batches
    for epoch in range(cfg.epochs):
        t0 = time.perf_counter()
        train_losses, n_it = run("train", limit, True, progress_total=limit)
        dt = time.perf_counter() - t0
        msg = (
            f"rowwise[{n}dev] epoch {epoch}: {n_it} iters in {dt:.0f}s "
            f"({n_it / dt:.2f} it/s, {n_it * cfg.batch_size / dt:.0f} ex/s)"
        )
        if train_losses:
            msg += f", final loss={train_losses[-1]:.5f}"
        print(msg)
        print(embed.aggregate_stats().summary())
        for stage, lim in [("val", args.limit_val_batches),
                           ("test", args.limit_test_batches)]:
            m, cnt = run(stage, lim, False)
            print(
                f"rowwise[{n}dev] epoch {epoch} {stage}: "
                f"auroc={m['auroc']:.9f} accuracy={m['accuracy']:.9f} "
                f"over {m['count']}"
            )


def main(argv=None) -> None:
    args = parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.multihost:
        # one controller per host; topology from the TPU metadata service
        # (the L0 launcher analog of colossalai.launch_from_torch,
        # /root/reference/recsys/dlrm_main.py:378), or explicit coordinator
        # args for generic clusters / the CPU multi-process dress rehearsal
        import jax

        if args.coordinator_address:
            if args.num_processes is None or args.process_id is None:
                sys.exit(
                    "--coordinator_address requires --num_processes and "
                    "--process_id (jax.distributed cannot autodetect them "
                    "off-pod)"
                )
            jax.distributed.initialize(
                coordinator_address=args.coordinator_address,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        else:
            jax.distributed.initialize()
    from cachedembedding_tpu.train.trainer import CachedDLRMTrainer
    from cachedembedding_tpu.utils.misc import get_mem_info

    cfg = build_config(args)
    print(f"config: {cfg}", file=sys.stderr)
    freq = get_freq(args, cfg)

    import jax

    eff_world = args.world_size or len(jax.devices())
    if args.use_tablewise:
        return run_hybrid(args, cfg, freq)
    if args.use_rowwise:
        return run_rowwise(args, cfg, freq)

    mesh = None
    if eff_world > 1:
        # Column-wise hybrid over the mesh, driven by the SAME windowed
        # trainer + full train/val/test as single chip (the reference's
        # multi-GPU flagship runs the complete train_val_test,
        # /root/reference/recsys/dlrm_main.py:336-374).
        from cachedembedding_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(eff_world)
        print(f"mesh: {eff_world} devices, column-wise hybrid", file=sys.stderr)

    if args.use_cache or mesh is not None:
        trainer = CachedDLRMTrainer(cfg, id_freq_map=freq, mesh=mesh)
    else:
        # no cache: whole table HBM-resident (plain EmbeddingBag analog —
        # the reference's default when --use_cache is absent)
        from cachedembedding_tpu.baselines.full_resident import (
            FullyResidentEmbeddingBag,
        )

        embed = FullyResidentEmbeddingBag(
            cfg.total_num_embeddings, cfg.embedding_dim,
            table_sizes=cfg.num_embeddings_per_feature, seed=cfg.seed,
        )
        trainer = CachedDLRMTrainer(cfg, embed_override=embed)
    print(get_mem_info("after model init"), file=sys.stderr)

    if args.checkpoint_dir:
        import os

        from cachedembedding_tpu.utils.checkpoint import load_checkpoint

        if os.path.exists(os.path.join(args.checkpoint_dir, "meta.json")):
            step = load_checkpoint(args.checkpoint_dir, trainer)
            print(f"resumed from {args.checkpoint_dir} at step {step}", file=sys.stderr)

    train_data = get_data(args, cfg, "train")
    limit = args.limit_train_batches

    if args.inspect_time:
        report = trainer.train(train_data, num_iters=min(limit or 200, 200), log_every=1)
        print(f"inspect: {report.it_per_s:.2f} it/s over {len(report.losses)} iters")
        trainer.embed.print_comm_stats()
        return

    if args.profile_dir:
        import jax

        jax.profiler.start_trace(args.profile_dir)

    for epoch in range(cfg.epochs):
        t0 = time.perf_counter()
        vfreq = cfg.validation_freq_within_epoch
        if vfreq:
            # mid-epoch validation every vfreq iterations
            # (/root/reference/recsys/dlrm_main.py:217-224 --validation_freq_within_epoch)
            it = iter(train_data)
            done = 0
            reports = []
            while limit is None or done < limit:
                seg = vfreq if limit is None else min(vfreq, limit - done)
                rep = trainer.train(it, num_iters=seg, log_every=100)
                if not rep.losses:
                    break
                reports.append(rep)
                done += len(rep.losses)
                val = get_data(args, cfg, "val")
                if args.limit_val_batches:
                    val = list(val)[: args.limit_val_batches]
                m = trainer.evaluate(val)
                print(f"epoch {epoch} it {done}: val auroc={m['auroc']:.6f}")
                if len(rep.losses) < seg:
                    break
            losses = [l for r in reports for l in r.losses]
            tot = time.perf_counter() - t0
            report = type(reports[0])(
                losses=losses, it_per_s=len(losses) / tot,
                examples_per_s=len(losses) * cfg.batch_size / tot,
                hit_rate=reports[-1].hit_rate,
            )
        else:
            report = trainer.train(train_data, num_iters=limit, log_every=100)
        print(
            f"epoch {epoch}: {len(report.losses)} iters in {time.perf_counter()-t0:.0f}s "
            f"({report.it_per_s:.2f} it/s, {report.examples_per_s:.0f} ex/s, "
            f"hit_rate={report.hit_rate:.4f})"
        )
        trainer.embed.print_comm_stats()
        if args.checkpoint_dir:
            from cachedembedding_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(args.checkpoint_dir, trainer)
            print(f"checkpoint saved to {args.checkpoint_dir}", file=sys.stderr)
        for stage, lim in [("val", args.limit_val_batches), ("test", args.limit_test_batches)]:
            data = get_data(args, cfg, stage)
            if lim:
                data = list(data)[:lim]
            metrics = trainer.evaluate(data)
            print(f"epoch {epoch} {stage}: auroc={metrics['auroc']:.9f} "
                  f"accuracy={metrics['accuracy']:.9f} over {metrics['count']}")

    if args.profile_dir:
        import jax

        jax.profiler.stop_trace()
    print(get_mem_info("after training"), file=sys.stderr)


if __name__ == "__main__":
    main()
