from cachedembedding_tpu.models.dlrm import (  # noqa: F401
    DLRMParams,
    init_dlrm_dense,
    dlrm_dense_forward,
    interaction_arch,
)
