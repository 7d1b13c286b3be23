from cachedembedding_tpu.parallel.mesh import make_mesh  # noqa: F401
from cachedembedding_tpu.parallel.hybrid import (  # noqa: F401
    hybrid_train_step,
    dryrun_hybrid_train_step,
)
