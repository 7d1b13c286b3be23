"""DLRM dense towers + feature interaction, pure functional JAX.

Architecture parity with the reference (behavior, not code):
  * DenseArch — MLP with ReLU on every layer
    (/root/reference/baselines/models/dlrm.py:106-141).
  * InteractionArch — concat [dense_emb, sparse (B,F,D)], pairwise dot products via
    batched matmul, upper-triangle (offset=1) flatten, concat with dense_emb
    (/root/reference/baselines/models/dlrm.py:143-207).
  * OverArch — MLP with ReLU on all but the final linear layer
    (/root/reference/baselines/models/dlrm.py:209-254).
  * FusedDenseModules wiring incl. the dense_in_features<=0 degenerate case
    (/root/reference/recsys/models/dlrm.py:116-141).

TPU notes: the pairwise interaction is a single (B, F+1, D) x (B, D, F+1) batched
matmul — MXU-friendly; the triu gather is a static index take that XLA fuses.
Matmuls run in ``compute_dtype`` (bfloat16 by default on TPU) with float32
accumulation/params. Linear init matches torch.nn.Linear defaults
(kaiming-uniform(a=sqrt(5)) weights, uniform(+-1/sqrt(fan_in)) bias) so training
dynamics track the reference.
"""

from __future__ import annotations

import math
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def choose(n: int, k: int) -> int:
    return math.comb(n, k) if 0 <= k <= n else 0


# ---------------------------------------------------------------------------
# Linear / MLP
# ---------------------------------------------------------------------------

def _key_seed_seq(key) -> np.random.SeedSequence:
    """Deterministic numpy SeedSequence from an int seed or a jax PRNG key
    (legacy uint32 array or typed key). Dense-tower init is host-side numpy
    because each eager jax.random op costs a full dispatch round-trip on
    tunneled backends (~54 s of the round-3 bench's 322.9 s init was 8 eager
    _linear_init calls; cProfile). Prefer passing an INT seed: reading a
    device key's bytes synchronizes on every previously enqueued device
    program (minutes behind a congested-link cache init)."""
    if isinstance(key, (int, np.integer)):
        # same entropy as the key path below would produce for
        # jax.random.PRNGKey(seed) (legacy threefry key data = [hi32, lo32]),
        # so _key_seed_seq(seed) == _key_seed_seq(PRNGKey(seed))
        s = int(key)
        return np.random.SeedSequence([(s >> 32) & 0xFFFFFFFF, s & 0xFFFFFFFF])
    try:
        data = jax.random.key_data(key)
    except TypeError:
        data = key
    arr = np.asarray(data).astype(np.uint64).ravel()
    return np.random.SeedSequence([int(x) for x in arr])


def _linear_init_np(rng: np.random.Generator, in_f: int, out_f: int) -> Dict[str, jnp.ndarray]:
    """torch.nn.Linear default init: W ~ kaiming_uniform(a=sqrt(5)) ==
    U(+-sqrt(6 / ((1+5) * fan_in))) = U(+-1/sqrt(fan_in)); b ~ U(+-1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(in_f)
    return {
        "w": jnp.asarray(
            rng.uniform(-bound, bound, (in_f, out_f)).astype(np.float32)
        ),
        "b": jnp.asarray(rng.uniform(-bound, bound, (out_f,)).astype(np.float32)),
    }


def _linear_init(key, in_f: int, out_f: int) -> Dict[str, jnp.ndarray]:
    return _linear_init_np(np.random.default_rng(_key_seed_seq(key)), in_f, out_f)


def _mlp_init(key, in_f: int, layer_sizes: Sequence[int]) -> List[Dict[str, jnp.ndarray]]:
    rng = np.random.default_rng(_key_seed_seq(key))
    layers = []
    for out_f in layer_sizes:
        layers.append(_linear_init_np(rng, in_f, out_f))
        in_f = out_f
    return layers


def _linear(params: Dict[str, jnp.ndarray], x: jnp.ndarray, dtype,
            out_dtype=None) -> jnp.ndarray:
    """Matmul in ``dtype`` with f32 MXU accumulation; the bias-add epilogue
    rounds back to ``dtype`` (or ``out_dtype``) INSIDE the matmul fusion.
    Without the epilogue cast every activation materializes in f32 — 2x the
    HBM write on each layer plus a separate convert pass at the next layer's
    operand (xplane: f32[16384,512/1024] activation tensors, round-5 trace).
    Value-identical forward at bf16: relu and the next layer's operand cast
    commute with round-to-nearest, so cast(relu(y)) == relu(cast(y)); the
    backward rounds cotangents to ``dtype`` one boundary earlier, same
    deliberate numerics stance as the interaction VJP (see _pairwise_dots)."""
    y = jnp.dot(x.astype(dtype), params["w"].astype(dtype), preferred_element_type=jnp.float32)
    return (y + params["b"]).astype(out_dtype or dtype)


def _mlp(layers: List[Dict[str, jnp.ndarray]], x: jnp.ndarray, dtype, final_relu: bool = True) -> jnp.ndarray:
    for i, p in enumerate(layers):
        x = _linear(p, x, dtype)
        if final_relu or i + 1 < len(layers):
            x = jax.nn.relu(x)
    return x


# ---------------------------------------------------------------------------
# DLRM dense modules
# ---------------------------------------------------------------------------

class DLRMParams(NamedTuple):
    dense_arch: List[Dict[str, jnp.ndarray]]
    over_arch: List[Dict[str, jnp.ndarray]]


def _triu_indices(n: int) -> Tuple[np.ndarray, np.ndarray]:
    r, c = np.triu_indices(n, k=1)
    return r.astype(np.int32), c.astype(np.int32)


@jax.custom_vjp
def _pairwise_dots(combined: jnp.ndarray) -> jnp.ndarray:
    """(B, F, F) pairwise dots of a (B, F, D) input, f32 MXU accumulation.

    Limitation: custom_vjp makes this non-differentiable under FORWARD-mode
    AD — jax.jvp/jacfwd/hessian over the model will raise. Reverse-mode
    (grad/vjp, the only mode training uses) is unaffected; switch to
    jax.custom_jvp if forward-mode is ever needed. The bwd also rounds the
    symmetrized cotangent to the operand dtype before the grad-dot — a
    deliberate numerics choice covered by the measured parity tests.

    Custom VJP so the grad-dot runs with BOTH operands in the compute dtype:
    the default einsum VJP pairs the f32 cotangent with the low-precision
    residual, and jnp promotes the residual to f32 — materializing an f32
    copy of the (B, F, D) activations that XLA then folds all the way into
    the embedding-row gather (2x bytes on the training program's hottest
    op). Rounding the cotangent to the operand dtype instead is the standard
    mixed-precision recipe (operands low-precision, accumulation f32)."""
    return jnp.einsum(
        "bfd,bgd->bfg", combined, combined, preferred_element_type=jnp.float32
    )


def _pairwise_dots_fwd(combined):
    return _pairwise_dots(combined), combined


def _pairwise_dots_bwd(combined, g):
    # d/dc[b,h,d] sum_{f,g,d'} g[b,f,g] c[b,f,d'] c[b,g,d'] = ((g + g^T) @ c)[b,h,d]
    gsym = (g + jnp.swapaxes(g, 1, 2)).astype(combined.dtype)
    d = jnp.einsum(
        "bfg,bgd->bfd", gsym, combined, preferred_element_type=jnp.float32
    )
    return (d.astype(combined.dtype),)


_pairwise_dots.defvjp(_pairwise_dots_fwd, _pairwise_dots_bwd)


# Interaction implementation switch (round-5 layout experiment). "bmm" is the
# batched-matmul form above; "gather" computes only the 351 needed upper-
# triangle pairs as a fused static-gather multiply-reduce — no (B, F, F)
# tensor and none of the three ~0.3-0.4 ms/iter layout copies XLA inserts
# around the bmm (xplane round-5: copy.492/493/494). Backward builds the
# symmetrized cotangent with one small static (pairs, F*F) matmul and reuses
# the bmm grad-dot. Set from DLRMConfig.interaction_impl at trainer init;
# module-level because the model functions are pure and traced inside jit.
INTERACTION_IMPL = "bmm"

_GSYM_CACHE: Dict[Tuple[int, str], jnp.ndarray] = {}


def _gsym_matrix(n: int, dtype) -> jnp.ndarray:
    """(pairs, n*n) 0/1 matrix scattering a triu-pair cotangent to BOTH
    (r, c) and (c, r) — g @ M reshaped is exactly (G + G^T) of the triu-only
    cotangent the bmm path's VJP receives."""
    key = (n, jnp.dtype(dtype).name)
    if key not in _GSYM_CACHE:
        r, c = _triu_indices(n)
        M = np.zeros((r.size, n * n), np.float32)
        M[np.arange(r.size), r * n + c] = 1.0
        M[np.arange(r.size), c * n + r] = 1.0
        _GSYM_CACHE[key] = jnp.asarray(M, dtype)
    return _GSYM_CACHE[key]


@jax.custom_vjp
def _pairwise_triu_gather(combined: jnp.ndarray) -> jnp.ndarray:
    """(B, pairs) upper-triangle pairwise dots of a (B, F, D) input, f32 MXU
    accumulation; same reverse-mode-only limitation as _pairwise_dots."""
    r, c = _triu_indices(combined.shape[1])
    return jnp.einsum(
        "bpd,bpd->bp", combined[:, r, :], combined[:, c, :],
        preferred_element_type=jnp.float32,
    )


def _ptg_fwd(combined):
    return _pairwise_triu_gather(combined), combined


def _ptg_bwd(combined, g):
    B, n, _ = combined.shape
    gsym = jnp.matmul(
        g.astype(combined.dtype), _gsym_matrix(n, combined.dtype),
        preferred_element_type=jnp.float32,
    ).reshape(B, n, n).astype(combined.dtype)
    d = jnp.einsum(
        "bfg,bgd->bfd", gsym, combined, preferred_element_type=jnp.float32
    )
    return (d.astype(combined.dtype),)


_pairwise_triu_gather.defvjp(_ptg_fwd, _ptg_bwd)


def interaction_arch(
    dense_emb: Optional[jnp.ndarray], sparse_bfd: jnp.ndarray, dtype=jnp.float32
) -> jnp.ndarray:
    """Pairwise-dot interaction. dense_emb (B, D) or None; sparse (B, F, D).
    Returns (B, D + F+nd choose 2) with nd = 1 if dense_emb is not None."""
    # Cast to the compute dtype BEFORE concatenating: dense_emb arrives f32
    # (matmuls accumulate f32), and concat(f32, bf16) would promote the much
    # larger sparse activations to f32 — XLA then commutes that convert into
    # the embedding-row GATHER, doubling the bytes of the hottest op in the
    # cached-training program. Values are identical either way (the einsum
    # consumed bf16 casts of both pieces already).
    if dense_emb is not None:
        combined = jnp.concatenate(
            [dense_emb[:, None, :].astype(dtype), sparse_bfd.astype(dtype)],
            axis=1,
        )  # (B, F+1, D)
    else:
        combined = sparse_bfd.astype(dtype)
    if INTERACTION_IMPL == "gather":
        flat = _pairwise_triu_gather(combined)  # (B, n choose 2)
    else:
        inter = _pairwise_dots(combined)
        r, c = _triu_indices(combined.shape[1])
        flat = inter[:, r, c]  # (B, n choose 2)
    if dense_emb is not None:
        return jnp.concatenate([dense_emb, flat], axis=1)
    return flat


def init_dlrm_dense(
    key,
    embedding_dim: int,
    num_sparse_features: int,
    dense_in_features: int,
    dense_arch_layer_sizes: Sequence[int],
    over_arch_layer_sizes: Sequence[int],
) -> DLRMParams:
    """Init the FusedDenseModules analog (/root/reference/recsys/models/dlrm.py:120-134).

    Pure host-side numpy init (see _key_seed_seq): zero compiles and zero
    eager device ops — the weights ship with the first training program."""
    ss1, ss2 = _key_seed_seq(key).spawn(2)
    if dense_in_features <= 0:
        dense_arch: List[Dict[str, jnp.ndarray]] = []
        over_in = choose(num_sparse_features, 2)
    else:
        assert dense_arch_layer_sizes[-1] == embedding_dim, (
            "DenseArch output dim must equal embedding_dim for the interaction"
        )
        rng1 = np.random.default_rng(ss1)
        dense_arch = []
        in_f = dense_in_features
        for out_f in dense_arch_layer_sizes:
            dense_arch.append(_linear_init_np(rng1, in_f, out_f))
            in_f = out_f
        over_in = embedding_dim + choose(num_sparse_features + 1, 2)
    if len(over_arch_layer_sizes) <= 1:
        raise ValueError("OverArch must have multiple layers.")
    rng2 = np.random.default_rng(ss2)
    over_arch = []
    in_f = over_in
    for out_f in over_arch_layer_sizes:
        over_arch.append(_linear_init_np(rng2, in_f, out_f))
        in_f = out_f
    return DLRMParams(dense_arch=dense_arch, over_arch=over_arch)


def dlrm_dense_forward(
    params: DLRMParams,
    dense_features: Optional[jnp.ndarray],
    sparse_bfd: jnp.ndarray,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """(dense (B, Din), sparse (B, F, D)) -> logits (B,)."""
    if params.dense_arch:
        dense_emb = _mlp(params.dense_arch, dense_features, compute_dtype, final_relu=True)
    else:
        dense_emb = None
    x = interaction_arch(dense_emb, sparse_bfd, dtype=compute_dtype)
    # OverArch: ReLU MLP on all but the last layer, plain final linear
    # (/root/reference/baselines/models/dlrm.py:226-234).
    hidden, last = params.over_arch[:-1], params.over_arch[-1]
    x = _mlp(hidden, x, compute_dtype, final_relu=True)
    # logits stay f32: the (B, 1) head is tiny and the BCE mean over 16k
    # examples wants full precision
    logits = _linear(last, x, compute_dtype, out_dtype=jnp.float32)
    return logits[:, 0]


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean BCEWithLogitsLoss (/root/reference/recsys/dlrm_main.py:271-276)."""
    labels = labels.astype(logits.dtype)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
