from cachedembedding_tpu.utils.metrics import auroc, accuracy, StreamingMetrics  # noqa: F401
from cachedembedding_tpu.utils.timer import Timer, get_time_elapsed  # noqa: F401
from cachedembedding_tpu.utils.misc import get_mem_info, get_partition  # noqa: F401
