"""2-process helper: row-sharded cached bag -> train-ish churn -> flush ->
dense_weight(). Prints a digest of the full master; both processes must
print the SAME digest (per-shard owner broadcast), matching single-process.

Invoked by tests/test_multiprocess.py with: <coordinator> <nproc> <pid>
(single-process mode: no args).
"""
import hashlib
import os
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
if len(sys.argv) > 1:
    jax.distributed.initialize(sys.argv[1], num_processes=int(sys.argv[2]),
                               process_id=int(sys.argv[3]))

from jax.sharding import Mesh  # noqa: E402

from cachedembedding_tpu.cache.state import EvictionStrategy  # noqa: E402
from cachedembedding_tpu.parallel.row_cached import (  # noqa: E402
    RowShardedCachedEmbeddingBag,
    build_rowwise_cached_step,
)

mesh = Mesh(np.array(jax.devices()), ("mp",))
W = len(jax.devices())
N, D, B, F = 1024, 16, 32, 4
rng = np.random.default_rng(0)
init = rng.standard_normal((N, D)).astype(np.float32)
bag = RowShardedCachedEmbeddingBag(
    N, D, mesh=mesh, cache_ratio=0.3, evict_strategy=EvictionStrategy.LFU,
    initial_weight=init, seed=3,
)
step = build_rowwise_cached_step(
    mesh, num_features=F, global_batch=B, pooling=1, capacity=bag.capacity,
)
from cachedembedding_tpu.models.dlrm import init_dlrm_dense  # noqa: E402
from cachedembedding_tpu.parallel.multiproc import put_addressable, replicate_fn  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

dp = jax.device_put(
    init_dlrm_dense(jax.random.PRNGKey(0), D, F, 4, (8, D), (8, 1)),
    NamedSharding(mesh, P()),
)
lr = jax.device_put(np.float32(0.5), NamedSharding(mesh, P()))
for it in range(6):  # enough streams to force eviction churn at 0.3 ratio
    ids = rng.integers(0, N, size=(W, F * (B // W))).astype(np.int64)
    enc = bag.prepare_ids_per_rank(ids)
    cache = bag.global_cache()
    dense = rng.standard_normal((W, B // W, 4)).astype(np.float32)
    labels = rng.integers(0, 2, size=(W, B // W)).astype(np.float32)
    dp, cache, loss = step(
        dp, cache,
        put_addressable(mesh, enc, P("mp", None)),
        jax.device_put(dense, NamedSharding(mesh, P("mp", None, None))),
        jax.device_put(labels, NamedSharding(mesh, P("mp", None))),
        lr, lr,
    )
    bag.sync_shards(cache)

full = bag.dense_weight()
digest = hashlib.sha256(np.ascontiguousarray(full, np.float32).tobytes()).hexdigest()
print(f"MASTER_DIGEST {digest}", flush=True)
out = os.environ.get("MASTER_OUT")
if out:
    np.save(out, np.asarray(full, np.float32))
