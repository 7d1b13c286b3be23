"""Multi-process (multi-host) primitives shared by every topology.

The single-controller JAX code becomes process-spanning under three rules
(docs/DESIGN.md "Multi-process execution"):

* build sharded global arrays from host data by materializing ONLY this
  controller's addressable shards (``put_addressable`` — ``jax.device_put``
  asserts cross-process value equality, which per-rank-owned lanes fail);
* replicate before any host readback of a sharded value (``replicate_fn`` —
  ``np.asarray`` of a non-addressable array raises);
* agree on padded program shapes across controllers (``global_max`` — every
  controller must dispatch the identical global program or the SPMD stream
  deadlocks).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def put_addressable(mesh: Mesh, arr: np.ndarray, spec: P) -> jax.Array:
    """Host array -> global sharded array; only addressable shards are read
    from ``arr`` (remote lanes may hold anything — their owner fills them)."""
    return jax.make_array_from_callback(
        arr.shape, NamedSharding(mesh, spec), lambda idx: arr[idx]
    )


def replicate_fn(mesh: Mesh):
    """Jitted identity with a replicated out_sharding: an all-gather over the
    mesh, making the value host-readable on every process."""
    return jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))


def global_max(v: int) -> int:
    """Largest value across processes (no-op single-process)."""
    if jax.process_count() == 1:
        return int(v)
    from jax.experimental import multihost_utils

    return int(np.max(multihost_utils.process_allgather(np.int32(v))))
