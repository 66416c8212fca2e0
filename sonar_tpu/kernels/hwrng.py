"""Hardware-PRNG gaussian noise (SURVEY §2.9 roofline experiment).

JAX's default threefry PRNG is counter-based *software*; TPUs have a
hardware PRNG reachable only from Pallas (``pltpu.prng_seed`` /
``pltpu.prng_random_bits``). This kernel fuses hardware bit generation
with a Box-Muller transform so N(0,1) samples are produced in one VMEM
pass — eliminating the PRNG ALU cost entirely.

Measured result (profiles/ANALYSIS.md §1, §5): throughput is UNCHANGED vs
``jax.random.normal`` (slope-timed ratios 0.88-1.03 across runs) — XLA
already hides the threefry compute behind the rest of the noise program,
so the PRNG ALU is not where noise time goes. The kernel stays as (a)
experimental proof of that, and (b) the in-VMEM generation substrate of
kernels/fused_pyramid.py, where deleting whole intermediate arrays (not
ALU work) wins 2-300x.

Determinism: the stream is a pure function of (seed, shape) on TPU — each
grid block reseeds with (seed, block_index), so the same call always
produces the same tensor. It is a DIFFERENT stream than threefry, so this
is opt-in (``SONAR_TPU_HW_RNG=1``): bit-reproducibility with the CPU path
is an architecture invariant (core/rng.py) and remains the default.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is optional on CPU
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

_LANE = 128
_BLOCK_ROWS = 512  # 512x128 fp32 = 256KB per buffer in VMEM


def use_hw_rng() -> bool:
    """Opt-in hardware-PRNG noise (TPU only): SONAR_TPU_HW_RNG=1."""
    return (os.environ.get("SONAR_TPU_HW_RNG", "0") != "0"
            and jax.default_backend() == "tpu")


def box_muller_uniforms(shape):
    """Two independent 24-bit uniforms per element from the hardware PRNG:
    u1 in (0, 1] ((bits24 + 1) * 2^-24), u2 in [0, 1). Mosaic can't cast
    uint32→float32 directly; the 24-bit values fit int32 exactly. This is
    the shared in-kernel substrate (fused_pyramid builds its Box-Muller
    pair from the same construction)."""
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    u1 = ((b1 >> 8).astype(jnp.int32).astype(jnp.float32) + 1.0) * (
        1.0 / (1 << 24))
    u2 = (b2 >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return u1, u2


def _gauss_kernel(seed_ref, out_ref):
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    u1, u2 = box_muller_uniforms(out_ref.shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    out_ref[:] = r * jnp.cos((2.0 * math.pi) * u2)


@functools.partial(jax.jit, static_argnums=(1,))
def _hw_randn_2d(seed: jax.Array, rows: int) -> jax.Array:
    grid = -(-rows // _BLOCK_ROWS)
    padded = grid * _BLOCK_ROWS
    out = pl.pallas_call(
        _gauss_kernel,
        out_shape=jax.ShapeDtypeStruct((padded, _LANE), jnp.float32),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, _LANE), lambda i: (i, 0)),
    )(seed)
    return out


def seed_from_key(key: jax.Array) -> jax.Array:
    """Deterministic int32 seed from a typed threefry key (both data words
    folded so distinct fold_in paths give distinct hardware streams)."""
    data = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    mixed = data[0] ^ (data[-1] * jnp.uint32(2654435761))
    return pltpu_safe_int32(mixed)


def pltpu_safe_int32(u: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(u.astype(jnp.uint32), jnp.int32)


def hw_randn(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """N(0,1) tensor from the TPU hardware PRNG (Box-Muller in one fused
    VMEM pass). Falls back to jax.random.normal off-TPU."""
    if pltpu is None or jax.default_backend() != "tpu":
        return jax.random.normal(key, shape, dtype)
    n = math.prod(shape)
    rows = -(-n // _LANE)
    seed = seed_from_key(key).reshape(1)
    flat = _hw_randn_2d(seed, rows).reshape(-1)[:n]
    return flat.reshape(shape).astype(dtype)
