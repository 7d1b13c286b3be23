"""Row-wise sharded embedding lookup over a device mesh.

The torchrec baseline's ROW_WISE sharding (/root/reference/baselines/
dlrm_main.py:709-721): each device owns a contiguous row range of the fused
table; every device sees the global id stream, looks up only the ids that
fall in its range (others contribute zero), and a ``psum`` over the mesh axis
reassembles the full pooled embeddings. Backward is the transpose: the psum's
cotangent is identity per shard, and grads scatter only into locally-owned
rows, so the optimizer step needs no extra collectives.

This is the multi-host scaling shape for host-resident tables: shard the
host-DRAM master row-wise across TPU-VM hosts, each with its own HBM cache of
locally-hot rows (BASELINE.md >=2-host target).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cachedembedding_tpu.parallel.mesh import AXIS


def row_shard_bounds(num_embeddings: int, world: int) -> np.ndarray:
    """Shard boundaries (world+1,) — EQUAL shards (shard_map requires evenly
    divisible blocks), so the table pads up to ceil(N/world)*world rows; the
    padding rows are never addressed by valid ids."""
    per = -(-num_embeddings // world)
    return np.arange(world + 1, dtype=np.int64) * per


def rowwise_lookup_local(
    weight_local: jnp.ndarray,   # (rows_local, D) this device's row shard
    ids_global: jnp.ndarray,     # (L,) global ids, replicated
    bounds: jnp.ndarray,         # (world+1,) shard boundaries
):
    """Per-device body (call inside shard_map): masked local gather + psum."""
    me = jax.lax.axis_index(AXIS)
    lo = bounds[me]
    hi = bounds[me + 1]
    mine = (ids_global >= lo) & (ids_global < hi)
    local_ids = jnp.where(mine, ids_global - lo, 0)
    rows = jnp.take(weight_local, local_ids, axis=0)
    rows = jnp.where(mine[:, None], rows, 0).astype(jnp.float32)
    return jax.lax.psum(rows, AXIS)  # (L, D) full rows on every device


def make_rowwise_embedding_fn(mesh: Mesh, num_embeddings: int):
    """Returns (lookup_fn, shard_weight) for a row-wise sharded resident table.

    lookup_fn(weight_sharded, ids) -> (L, D) pooled-input rows, differentiable
    w.r.t. weight (grads land only on the owning shard).
    """
    world = mesh.devices.size
    bounds_np = row_shard_bounds(num_embeddings, world)
    bounds = jnp.asarray(bounds_np, jnp.int32)

    def _local(w_local, ids):
        return rowwise_lookup_local(w_local, ids, bounds)

    lookup = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(AXIS, None), P()),
        out_specs=P(),
        check_vma=False,
    )

    def shard_weight(weight_full: np.ndarray) -> jax.Array:
        """Pad to the equal-shard layout and place across the mesh."""
        padded = int(bounds_np[-1])
        if padded != weight_full.shape[0]:
            weight_full = np.concatenate(
                [
                    weight_full,
                    np.zeros(
                        (padded - weight_full.shape[0], weight_full.shape[1]),
                        weight_full.dtype,
                    ),
                ]
            )
        return jax.device_put(weight_full, NamedSharding(mesh, P(AXIS, None)))

    return lookup, shard_weight
