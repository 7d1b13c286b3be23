"""Device mesh construction.

The reference's topology is a single flat process group (one proc per GPU,
colossalai GLOBAL group, /root/reference/recsys/dlrm_main.py:378) used
simultaneously for model-parallel embedding and data-parallel dense — the
"hybrid" in HybridParallelDLRM. On TPU that is one 1-D named mesh axis ``mp``
over all chips: the embedding shards over it, the dense towers data-parallel
over it, and XLA emits the all-to-all/psum over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


AXIS = "mp"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))
