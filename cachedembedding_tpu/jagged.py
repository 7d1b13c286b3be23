"""Ragged sparse-feature containers — the TPU analog of torchrec's KeyedJaggedTensor.

The reference passes sparse ids around as a KeyedJaggedTensor: a flat ``values``
tensor plus per-bag ``offsets``, laid out *feature-major* (all of feature 0's bags,
then feature 1's, ...), with ``stride == batch_size``
(/root/reference/baselines/models/dlrm.py:56-66, /root/reference/baselines/data/custom.py:69-75).

On TPU everything under jit must have static shapes, so we keep the same flat
layout but make feature count, batch size and (when uniform) the pooling factor
static Python ints carried in the pytree aux data. Criteo/Avazu have exactly one
id per (sample, feature) — the hot path — so ``RaggedFeatures`` supports a
"uniform pooling" fast path in which values reshape to ``(F, B, P)`` and the
offsets are implicit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RaggedFeatures:
    """Flat feature-major sparse id batch.

    values:  (L,) int32 — ids for every bag, feature-major: bag order is
             (feature 0, sample 0), (feature 0, sample 1), ..., (feature F-1, sample B-1).
    offsets: (F*B + 1,) int32 — bag boundaries into values ("include_last_offset"
             convention, matching the reference's EmbeddingBag usage at
             /root/reference/recsys/models/dlrm.py:74-78).
    num_features / batch_size: static.
    pooling: static Optional[int] — if set, every bag has exactly this many ids and
             offsets may be omitted (implicitly arange * pooling).
    """

    values: jnp.ndarray
    offsets: Optional[jnp.ndarray]
    num_features: int = dataclasses.field(metadata=dict(static=True))
    batch_size: int = dataclasses.field(metadata=dict(static=True))
    pooling: Optional[int] = dataclasses.field(default=None, metadata=dict(static=True))

    @property
    def num_bags(self) -> int:
        return self.num_features * self.batch_size

    @property
    def stride(self) -> int:  # torchrec naming
        return self.batch_size

    def offsets_or_implicit(self) -> jnp.ndarray:
        if self.offsets is not None:
            return self.offsets
        assert self.pooling is not None
        return jnp.arange(self.num_bags + 1, dtype=jnp.int32) * self.pooling

    def lengths(self) -> jnp.ndarray:
        off = self.offsets_or_implicit()
        return off[1:] - off[:-1]

    @staticmethod
    def from_dense_ids(ids_bf: jnp.ndarray) -> "RaggedFeatures":
        """Build from a (B, F) one-id-per-feature matrix (the Criteo/Avazu shape)."""
        B, F = ids_bf.shape
        values = jnp.transpose(ids_bf).reshape(-1).astype(jnp.int32)  # feature-major
        return RaggedFeatures(values=values, offsets=None, num_features=F, batch_size=B, pooling=1)

    @staticmethod
    def from_uniform(values_fbp: jnp.ndarray) -> "RaggedFeatures":
        """Build from a (F, B, P) uniform-pooling id tensor."""
        F, B, P = values_fbp.shape
        return RaggedFeatures(
            values=values_fbp.reshape(-1).astype(jnp.int32),
            offsets=None,
            num_features=F,
            batch_size=B,
            pooling=P,
        )

    def to_fbp(self) -> jnp.ndarray:
        """(F, B, P) view; only valid for uniform pooling."""
        assert self.pooling is not None, "to_fbp requires uniform pooling"
        return self.values.reshape(self.num_features, self.batch_size, self.pooling)

    def segment_ids(self) -> jnp.ndarray:
        """Per-value bag index (L,) — for segment-sum pooling of ragged bags."""
        off = self.offsets_or_implicit()
        L = self.values.shape[0]
        # searchsorted: value position i belongs to the bag whose offset range contains i.
        return (jnp.searchsorted(off, jnp.arange(L, dtype=jnp.int32), side="right") - 1).astype(
            jnp.int32
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Batch:
    """One training batch (analog of torchrec.datasets.utils.Batch,
    /root/reference/recsys/datasets/criteo.py:182-196)."""

    dense_features: jnp.ndarray  # (B, D_in) float32
    sparse_features: RaggedFeatures
    labels: jnp.ndarray  # (B,) int32 / float32

    @property
    def batch_size(self) -> int:
        return self.sparse_features.batch_size


def concat_uniform_values(batches: list) -> np.ndarray:
    """Concatenate the sparse values of several uniform batches into one flat id
    stream — what the trainer feeds to prepare_ids for far-sighted prefetch
    (/root/reference/recsys/dlrm_main.py:248-259)."""
    return np.concatenate([np.asarray(b.sparse_features.values) for b in batches])
