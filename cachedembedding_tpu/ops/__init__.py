from cachedembedding_tpu.ops.embedding_bag import (  # noqa: F401
    bag_pool_uniform,
    bag_pool_ragged,
    embedding_bag,
)
