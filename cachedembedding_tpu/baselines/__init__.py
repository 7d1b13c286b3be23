from cachedembedding_tpu.baselines.full_resident import FullyResidentEmbeddingBag  # noqa: F401
