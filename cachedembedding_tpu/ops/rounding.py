"""Stochastic rounding into low-precision cache rows.

The cache stores rows at ``cache_dtype`` (bf16 / fp8-e4m3) and the optimizer
update rounds f32 arithmetic back to storage once per step. DETERMINISTIC
round-to-nearest silently drops any update smaller than half a ulp — at fp8's
3 mantissa bits, late-stage small-LR gradient accumulation stagnates (the
classic low-precision training failure; the reference never hits it because
its cache is fp32, but fp8 rows are this framework's HBM-halving extension).
Stochastic rounding keeps the EXPECTED value of the stored row equal to the
f32 value, so sub-ulp updates accumulate in expectation.

Two implementations behind ``stochastic_astype``:
  * TPU: a Pallas kernel using the hardware path —
    ``pltpu.prng_random_bits`` + ``pltpu.stochastic_round``;
  * any backend (tests/CPU): an exact floor/ceil emulation — neighbors are
    found by monotonic bit-key arithmetic in the target dtype, and the upper
    neighbor is chosen with probability (x - lo) / (hi - lo). Unbiased by
    construction (property-tested in tests/test_rounding.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_UINT = {
    jnp.dtype(jnp.bfloat16): (jnp.uint16, 1 << 15),
    jnp.dtype(jnp.float8_e4m3fn): (jnp.uint8, 1 << 7),
    jnp.dtype(jnp.float8_e5m2): (jnp.uint8, 1 << 7),
}


def _sr_kernel(seed_ref, x_ref, out_ref, *, dt):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    out_ref[...] = pltpu.stochastic_round(x_ref[...], bits, target_dtype=dt)


@partial(jax.jit, static_argnames=("dt",))
def _stochastic_astype_pallas(x: jnp.ndarray, seed: jnp.ndarray, dt) -> jnp.ndarray:
    """(N, D) f32 -> dt on TPU hardware. Row-blocked to bound VMEM."""
    N, D = x.shape
    BR = 512
    nb = -(-N // BR)
    pad = nb * BR - N
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    out = pl.pallas_call(
        partial(_sr_kernel, dt=dt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[pl.BlockSpec((BR, D), lambda b, *_: (b, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BR, D), lambda b, *_: (b, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((nb * BR, D), dt),
    )(seed.reshape(1).astype(jnp.int32), xp)
    return out[:N] if pad else out


def _key_of(u: jnp.ndarray, sign_bit: int):
    """IEEE bit pattern -> monotonically ordered unsigned key."""
    neg = (u & sign_bit) != 0
    return jnp.where(neg, (sign_bit + (sign_bit - 1)) - u, u | sign_bit)


def _key_inv(k: jnp.ndarray, sign_bit: int):
    pos = (k & sign_bit) != 0
    return jnp.where(pos, k ^ sign_bit, (sign_bit + (sign_bit - 1)) - k)


@partial(jax.jit, static_argnames=("dt",))
def _stochastic_astype_emulated(x: jnp.ndarray, seed: jnp.ndarray, dt) -> jnp.ndarray:
    """Exact-neighbor stochastic rounding in pure XLA (any backend)."""
    ut, sign_bit = _UINT[jnp.dtype(dt)]
    x = x.astype(jnp.float32)
    # clamp to the target's finite range so hi never walks into NaN space
    fmax = float(jnp.finfo(dt).max)
    x = jnp.clip(x, -fmax, fmax)
    a = x.astype(dt)
    af = a.astype(jnp.float32)
    au = jax.lax.bitcast_convert_type(a, ut)
    key = _key_of(au.astype(jnp.uint32), sign_bit)
    # one step toward +inf / -inf in target-dtype space
    up = _key_inv(jnp.minimum(key + 1, 2 * sign_bit - 1), sign_bit).astype(ut)
    dn = _key_inv(jnp.maximum(key - 1, 0), sign_bit).astype(ut)
    upf = jax.lax.bitcast_convert_type(up.astype(ut), dt).astype(jnp.float32)
    dnf = jax.lax.bitcast_convert_type(dn.astype(ut), dt).astype(jnp.float32)
    lo = jnp.where(af <= x, af, dnf)
    hi = jnp.where(af <= x, upf, af)
    hi = jnp.minimum(hi, fmax)
    lo = jnp.maximum(lo, -fmax)
    span = hi - lo
    p = jnp.where(span > 0, (x - lo) / jnp.where(span > 0, span, 1.0), 0.0)
    r = jax.random.uniform(
        jax.random.PRNGKey(seed.astype(jnp.uint32)), x.shape, jnp.float32
    )
    return jnp.where(r < p, hi, lo).astype(dt)


def stochastic_astype(x: jnp.ndarray, dt, seed) -> jnp.ndarray:
    """Round (N, D)-or-any-shape f32 to dt with E[out] == x. ``seed`` is a
    scalar int (vary per step). Dispatches to the Pallas hardware path on TPU
    backends, the exact emulation elsewhere (both unbiased)."""
    dt = jnp.dtype(dt)
    if dt == jnp.dtype(jnp.float32):
        return x
    seed = jnp.asarray(seed)
    plat = jax.devices()[0].platform
    if plat == "cpu" or dt not in _UINT:
        return _stochastic_astype_emulated(x, seed, dt)
    orig = x.shape
    x2 = x.reshape(-1, orig[-1]) if x.ndim != 2 else x
    out = _stochastic_astype_pallas(x2, seed, dt)
    return out.reshape(orig)
