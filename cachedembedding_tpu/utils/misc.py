"""Memory telemetry + partition arithmetic
(analog of /root/reference/recsys/utils/misc.py:31-155)."""

from __future__ import annotations

from typing import Tuple

import jax


def get_mem_info(prefix: str = "") -> str:
    """Device + host memory stats (torch.cuda.memory_allocated/psutil analog)."""
    parts = []
    try:
        for d in jax.local_devices():
            stats = d.memory_stats()
            if stats:
                used = stats.get("bytes_in_use", 0) / 1024**3
                limit = stats.get("bytes_limit", 0) / 1024**3
                parts.append(f"{d}: {used:.2f}/{limit:.2f} GB")
    except Exception:
        pass
    try:
        import resource

        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024**2
        parts.append(f"host RSS: {rss:.2f} GB")
    except Exception:
        pass
    return f"{prefix} " + ", ".join(parts)


def get_partition(embedding_dim: int, rank: int, world_size: int) -> Tuple[int, int, bool]:
    """Column-wise TP split arithmetic mirroring torch.tensor_split
    (/root/reference/recsys/utils/misc.py:138-154). Returns (start, end, divisible)."""
    if world_size == 1:
        return 0, embedding_dim, True
    assert embedding_dim >= world_size
    chunk = embedding_dim // world_size
    rem = embedding_dim % world_size
    if rem == 0:
        return rank * chunk, (rank + 1) * chunk, True
    sizes = [chunk + 1 if i < rem else chunk for i in range(world_size)]
    off = sum(sizes[:rank])
    return off, off + sizes[rank], False
