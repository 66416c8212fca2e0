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
