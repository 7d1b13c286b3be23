from cachedembedding_tpu.data.synthetic import SyntheticLongTailDataset  # noqa: F401
