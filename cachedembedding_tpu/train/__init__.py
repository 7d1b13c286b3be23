from cachedembedding_tpu.train.trainer import CachedDLRMTrainer, TrainReport  # noqa: F401
