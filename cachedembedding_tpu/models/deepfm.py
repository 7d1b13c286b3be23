"""DeepFM model family — second model family of the reference
(/root/reference/baselines/models/deepfm.py:199-313, following arXiv 1703.04247).

Architecture parity (behavioral):
  * DenseArch: num_dense -> hidden -> D, ReLU after both layers (torchrec deepfm
    DenseArch as instantiated at deepfm.py:279-283).
  * FMInteractionArch (deepfm.py:103-168): given [dense_emb (B,D)] + per-feature
    pooled embeddings (B,D) each:
      - deep interaction: flatten-concat (B, (F+1)*D) -> Linear -> ReLU -> (B, DI)
      - factorization machine: 0.5 * sum_d [(sum_f x_fd)^2 - sum_f x_fd^2] -> (B, 1)
      - output concat [dense_emb, deep, fm] -> (B, D + DI + 1)
  * OverArch: Linear(D+DI+1, 1) + Sigmoid (deepfm.py:171-195) — the model emits
    probabilities, so training uses plain BCE on probabilities.

TPU notes: the FM reduction is a fused elementwise+reduce (VPU); the deep
interaction is one MXU matmul over the flattened embeddings.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp

from cachedembedding_tpu.models.dlrm import _linear, _linear_init, _mlp, _mlp_init


class DeepFMParams(NamedTuple):
    dense_arch: List[dict]
    deep_fm: dict     # single linear (F+1)*D -> DI
    over_arch: dict   # single linear (D+DI+1) -> 1


def init_deepfm(
    key,
    embedding_dim: int,
    num_sparse_features: int,
    num_dense_features: int,
    hidden_layer_size: int,
    deep_fm_dimension: int,
) -> DeepFMParams:
    # host-side numpy init (see dlrm._key_seed_seq): no eager device ops
    from cachedembedding_tpu.models.dlrm import _key_seed_seq, _linear_init_np

    import numpy as np

    ss1, ss2, ss3 = _key_seed_seq(key).spawn(3)
    rng1 = np.random.default_rng(ss1)
    dense_arch = [
        _linear_init_np(rng1, num_dense_features, hidden_layer_size),
        _linear_init_np(rng1, hidden_layer_size, embedding_dim),
    ]
    fm_in = (num_sparse_features + 1) * embedding_dim
    deep_fm = _linear_init_np(np.random.default_rng(ss2), fm_in, deep_fm_dimension)
    over = _linear_init_np(
        np.random.default_rng(ss3), embedding_dim + deep_fm_dimension + 1, 1
    )
    return DeepFMParams(dense_arch=dense_arch, deep_fm=deep_fm, over_arch=over)


def factorization_machine(x_bfd: jnp.ndarray) -> jnp.ndarray:
    """0.5 * sum_d [(sum_f x)^2 - sum_f x^2] — the order-2 FM term, (B, 1)."""
    sum_f = jnp.sum(x_bfd, axis=1)
    sum_sq = jnp.sum(x_bfd ** 2, axis=1)
    return 0.5 * jnp.sum(sum_f ** 2 - sum_sq, axis=1, keepdims=True)


def deepfm_forward(
    params: DeepFMParams,
    dense_features: jnp.ndarray,  # (B, num_dense)
    sparse_bfd: jnp.ndarray,      # (B, F, D) pooled embeddings
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Returns probabilities (B,) — OverArch ends in Sigmoid."""
    dense_emb = _mlp(params.dense_arch, dense_features, compute_dtype, final_relu=True)
    combined = jnp.concatenate([dense_emb[:, None, :], sparse_bfd], axis=1)  # (B, F+1, D)
    B = combined.shape[0]
    deep = jax.nn.relu(_linear(params.deep_fm, combined.reshape(B, -1), compute_dtype))
    fm = factorization_machine(combined.astype(jnp.float32))
    cat = jnp.concatenate([dense_emb, deep, fm], axis=1)
    logits = _linear(params.over_arch, cat, compute_dtype,
                     out_dtype=jnp.float32)[:, 0]
    return jax.nn.sigmoid(logits)


def bce_probs(probs: jnp.ndarray, labels: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """BCE on probabilities (the reference trains DeepFM on Sigmoid outputs)."""
    p = jnp.clip(probs, eps, 1.0 - eps)
    y = labels.astype(p.dtype)
    return -jnp.mean(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p))
