"""Counter-based RNG utilities.

The reference manages randomness by mutating and save/restoring global torch /
python RNG state (py/utils.py:736-792, py/noise.py:1938, py/nodes/misc.py:140-148).
On TPU we use JAX's counter-based threefry keys instead: every noise node in a
composition tree derives its own independent stream with ``fold_in``, and the
per-step stream advance is an explicit ``split`` carried through ``lax.scan``.
This removes the entire mutable-RNG-state class of hazards (SURVEY §5.2) and
makes streams identical across CPU/TPU backends.
"""

from __future__ import annotations

import zlib

import jax


def key_from_seed(seed: int | jax.Array | None) -> jax.Array:
    """Make a PRNG key from an integer seed (None → 0). A typed PRNG key
    passes through unchanged so callers can thread derived keys anywhere a
    seed is accepted."""
    if isinstance(seed, jax.Array) and jax.dtypes.issubdtype(
        seed.dtype, jax.dtypes.prng_key
    ):
        return seed
    seed = 0 if seed is None else int(seed)
    # fold the high 32 bits in rather than discarding them: the node
    # schemas advertise the full 64-bit seed range, and jax.random.key
    # only consumes a 32-bit value when x64 is disabled
    key = jax.random.key(seed & 0xFFFFFFFF)
    hi = (seed >> 32) & 0xFFFFFFFF
    if hi:
        key = jax.random.fold_in(key, hi & 0x7FFFFFFF)
        if hi >> 31:
            key = jax.random.fold_in(key, 1)
    return key


def derive_key(key: jax.Array, *path: int | str) -> jax.Array:
    """Derive a sub-key deterministically from a path of ints/strings.

    Strings are hashed with crc32 so stream identity depends only on the
    spelled path, never on Python object identity or dict ordering.
    """
    for p in path:
        if isinstance(p, str):
            p = zlib.crc32(p.encode("utf-8"))
        key = jax.random.fold_in(key, p & 0x7FFFFFFF)
    return key


def studentt_polar(key: jax.Array, df, shape, dtype) -> jax.Array:
    """Exact Student-t draws via the spherical polar construction —
    zero rejection, so it vectorizes onto the VPU as pure elementwise ops.

    For a 2D spherically-symmetric Student-t with ``df`` degrees of
    freedom the radius has the closed-form tail ``P(R > r) =
    (1 + r²/df)^{-df/2}`` (inverse: ``R = sqrt(df·(U^{-2/df} - 1))``) and
    every 1D marginal of the multivariate t is t_df — so
    ``R·cos(2πV)`` with ``U, V ~ Uniform`` is exactly t_df (the direct
    form of Bailey's 1994 polar method, sans its rejection step).

    ``jax.random.t`` routes through the gamma rejection sampler (a
    ``while_loop`` kernel per element) — measured ~74 Mpix/s for the
    studentt noise type at (1,4,128,128) on v5e (ANALYSIS §16); this
    construction replaces it with log/expm1/sqrt/cos. Arithmetic runs in
    f32 when ``dtype`` is narrower (bf16 ``log(U)`` near 1 would quantize
    the common small-|t| region).
    """
    import jax.numpy as jnp

    cdt = jnp.float32 if jnp.dtype(dtype).itemsize < 4 else jnp.dtype(dtype)
    df = jnp.asarray(df, cdt)
    ku, kv = jax.random.split(key)
    # uniform() is [0,1): map to (0,1] so log(u) is finite
    u = 1.0 - jax.random.uniform(ku, shape, cdt)
    v = jax.random.uniform(kv, shape, cdt)
    r = jnp.sqrt(df * jnp.expm1((-2.0 / df) * jnp.log(u)))
    return (r * jnp.cos((2.0 * jnp.pi) * v)).astype(dtype)


def draw_t(key: jax.Array, df, shape, dtype) -> jax.Array:
    """Student-t draw: the polar construction by default,
    ``SONAR_TPU_POLAR_T=0`` falls back to ``jax.random.t`` (gamma
    rejection) for A/Bs. Read at trace time — warm each variant under
    its own flag (CLAUDE.md timing rules)."""
    import os

    if os.environ.get("SONAR_TPU_POLAR_T", "1") != "0":
        return studentt_polar(key, df, shape, dtype)
    return jax.random.t(key, df, shape, dtype)
