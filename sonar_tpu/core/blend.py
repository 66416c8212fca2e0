"""Blending-mode registry.

Reference: py/utils.py:17-21 defines ``BLENDING_MODES = {lerp, inject,
subtract_b}`` and lets the sibling "bleh" pack replace the table wholesale
(py/utils.py:70-82).  Here the registry is native and extensible via
``register_blend_mode``; a few extra modes commonly supplied by bleh are
provided natively so YAML configs written against the extended table work.

All blend functions have signature ``f(a, b, t) -> array`` with ``t`` scalar
or broadcastable array, and are pure jnp — safe under jit/scan/pallas.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def _lerp(a, b, t):
    # torch.lerp semantics: a + (b - a) * t
    return a + (b - a) * t


def _inject(a, b, t):
    return a + b * t


def _subtract_b(a, b, t):
    return a - b * t


BLENDING_MODES: dict[str, Callable] = {
    # The reference's built-in three (py/utils.py:17-21).
    "lerp": _lerp,
    "inject": _inject,
    "subtract_b": _subtract_b,
    # Native extras (the reference gets these from the optional bleh pack;
    # provided here so extended configs need no external integration).
    "a_only": lambda a, b, t: a * t,
    "b_only": lambda a, b, t: b * t,
    "subtract": lambda a, b, t: (a - b) * t,
    "multiply": lambda a, b, t: _lerp(a, a * b, t),
    "difference": lambda a, b, t: _lerp(a, jnp.abs(a - b), t),
    "maximum": lambda a, b, t: _lerp(a, jnp.maximum(a, b), t),
    "minimum": lambda a, b, t: _lerp(a, jnp.minimum(a, b), t),
    "slerp": None,  # filled in below (needs a real function)
}


def _slerp(a, b, t, *, eps: float = 1e-8):
    """Spherical lerp treating the full tensors as vectors (flattened)."""
    an = jnp.sqrt(jnp.sum(a * a)) + eps
    bn = jnp.sqrt(jnp.sum(b * b)) + eps
    dot = jnp.clip(jnp.sum((a / an) * (b / bn)), -1.0, 1.0)
    omega = jnp.arccos(dot)
    so = jnp.sin(omega)
    safe = jnp.abs(so) > 1e-6
    wa = jnp.where(safe, jnp.sin((1.0 - t) * omega) / jnp.where(safe, so, 1.0), 1.0 - t)
    wb = jnp.where(safe, jnp.sin(t * omega) / jnp.where(safe, so, 1.0), t)
    return wa * a + wb * b


BLENDING_MODES["slerp"] = _slerp


def register_blend_mode(name: str, fn: Callable) -> None:
    BLENDING_MODES[name] = fn


def blend(name: str) -> Callable:
    """Look up a blend function by name with a helpful error."""
    try:
        return BLENDING_MODES[name]
    except KeyError:
        valid = ", ".join(sorted(BLENDING_MODES))
        raise ValueError(f"Unknown blend mode {name!r}; valid: {valid}") from None


def blend_scalar(a: float, b: float, t: float, *, blend_function=None, clamp_function=None) -> float:
    """Scalar blend used by schedule interpolation (py/utils.py:33-56)."""
    if blend_function is None:
        val = a * (1.0 - t) + b * t
    else:
        val = float(blend_function(jnp.asarray(a, jnp.float32),
                                   jnp.asarray(b, jnp.float32),
                                   jnp.asarray(t, jnp.float32)))
    return clamp_function(val) if clamp_function is not None else val
