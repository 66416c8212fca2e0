"""Brownian-bridge noise via truncated Lévy–Ciesielski construction.

The reference delegates to torchsde's interval-splitting BrownianTree
(py/noise_generation.py:263-286 → comfy k_diffusion BrownianTreeNoiseSampler):
``ns(sigma, sigma_next) = (W(t1) - W(t0)) / sqrt(|t1 - t0|)`` with
``t = transform(sigma)`` on the interval [sigma_min, sigma_max].

TPU-native replacement: W(t) is evaluated *functionally* from a fixed PRNG
key using the Lévy–Ciesielski (Schauder) expansion truncated at ``levels``
dyadic levels:

    W(u) = u·Z_0 + Σ_{l<L} 2^{-(l+2)/2} · tri(2^l·u - k) · Z_{l,k},
    k = floor(2^l·u),  tri(f) = 1 - |2f - 1|

per element, where each Z is an iid standard-normal tensor addressed by
``fold_in(key, l, k)``. Because W is a pure function of t, interval
consistency (W(a,c) = W(a,b) + W(b,c)) holds *exactly* — stronger than the
tree's cache-based consistency — and increments match Brownian statistics
exactly at dyadic resolution 2^-levels (linear interpolation below that).
Exactness to torchsde's RNG is impossible cross-RNG (SURVEY §7.2); the
distribution and the consistency property are the contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def brownian_w(
    key: jax.Array,
    u: jax.Array,
    shape: tuple[int, ...],
    *,
    levels: int = 16,
    dtype=jnp.float32,
) -> jax.Array:
    """Evaluate W(u) elementwise for u in [0, 1] (traced scalar ok)."""
    u = jnp.clip(u.astype(jnp.float32), 0.0, 1.0)
    z0 = jax.random.normal(jax.random.fold_in(key, 0), shape, dtype)
    acc = u.astype(dtype) * z0
    for lvl in range(levels):
        scale = 2.0 ** (-(lvl + 2) / 2.0)
        pos = u * (2.0**lvl)
        k = jnp.floor(pos).astype(jnp.int32)
        # clamp the u==1 edge into the last cell so tri() sees f in [0,1]
        k = jnp.minimum(k, 2**lvl - 1)
        f = pos - k.astype(jnp.float32)
        tri = 1.0 - jnp.abs(2.0 * f - 1.0)
        lk_key = jax.random.fold_in(jax.random.fold_in(key, lvl + 1), k)
        z = jax.random.normal(lk_key, shape, dtype)
        acc = acc + (scale * tri).astype(dtype) * z
    return acc


def brownian_increment(
    key: jax.Array,
    t0: jax.Array,
    t1: jax.Array,
    shape: tuple[int, ...],
    *,
    t_lo: float,
    t_hi: float,
    levels: int = 16,
    dtype=jnp.float32,
    w0: jax.Array | None = None,
) -> jax.Array:
    """(W(t1) - W(t0)) / sqrt(|t1 - t0|) on the interval [t_lo, t_hi].

    Pass a precomputed ``w0 = W(u0)`` to skip one full evaluation (the
    stateful generator carries the previous endpoint across steps)."""
    span = t_hi - t_lo
    u0 = (t0 - t_lo) / span
    u1 = (t1 - t_lo) / span
    if w0 is None:
        w0 = brownian_w(key, u0, shape, levels=levels, dtype=dtype)
    w1 = brownian_w(key, u1, shape, levels=levels, dtype=dtype)
    # sqrt(span) converts unit-interval W to [t_lo, t_hi] scale.
    denom = jnp.sqrt(jnp.abs(t1 - t0))
    denom = jnp.where(denom == 0, 1.0, denom)
    inc = (w1 - w0) * (
        jnp.sqrt(jnp.asarray(span, jnp.float32)) / denom
    ).astype(dtype)
    return inc, w1


def brownian_w_at(key, t, shape, *, t_lo, t_hi, levels=16, dtype=jnp.float32):
    """W at a sigma point (for seeding the endpoint cache)."""
    span = t_hi - t_lo
    return brownian_w(key, (jnp.asarray(t) - t_lo) / span, shape,
                      levels=levels, dtype=dtype)
