from cachedembedding_tpu._native import hostops  # noqa: F401
