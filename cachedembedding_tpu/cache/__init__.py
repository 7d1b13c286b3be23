from cachedembedding_tpu.cache.state import (  # noqa: F401
    CacheState,
    EvictionStrategy,
    Plan,
    init_cache_state,
    plan_ids,
    gather_slots,
    scatter_admits,
    remap_ids,
)
from cachedembedding_tpu.cache.manager import CachedEmbeddingBag, CacheStats  # noqa: F401
