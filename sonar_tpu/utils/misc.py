"""Misc utility layer (reference: py/utils.py:513-733 and friends)."""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.blend import BLENDING_MODES
from ..core.normalize import normalize_to_scale


def fallback(val, default=None):
    return val if val is not None else default


def maybe_apply(val, cond, fun):
    return fun(val) if cond else val


def clamp_float(val: float, minval: float = 0.0, maxval: float = 1.0) -> float:
    return max(minval, min(val, maxval))


def filter_dict(d: dict, keep, *, recursive: bool = False) -> dict:
    return {
        k: v if not (recursive and isinstance(v, dict)) else filter_dict(v, keep)
        for k, v in d.items()
        if k in keep
    }


def trunc_decimals(x: jax.Array, decimals: int = 3) -> jax.Array:
    """py/utils.py:660-664 — truncate (toward zero) to N decimals."""
    x_i = jnp.trunc(x)
    x_f = x - x_i
    scale = 10.0**decimals
    return x_i + jnp.trunc(x_f * scale) * (1.0 / scale)


def adjust_slice(s: slice, size: int, offset: int) -> slice:
    """py/utils.py:513-523 — shift a slice by a clamped offset."""
    if offset == 0:
        return s
    start = s.start if s.start is not None else 0
    stop = s.stop if s.stop is not None else size
    if offset < 0:
        adj = min(start, abs(offset))
        return slice(start - adj, stop - adj)
    adj = min(size - stop, offset)
    return slice(start + adj, stop + adj)


def crop_samples(
    tensor: jax.Array,
    width: int,
    height: int,
    *,
    mode: str = "center",
    offset_width: int = 0,
    offset_height: int = 0,
) -> jax.Array:
    """9-anchor crop with clamped offsets (py/utils.py:526-568). All static."""
    if tensor.ndim < 3:
        raise ValueError("Can only handle >= 3 dimensional tensors")
    th, tw = tensor.shape[-2:]
    if (tw, th) == (width, height):
        return tensor
    if tw < width or th < height:
        raise ValueError("Can't crop sample smaller than requested width or height")
    if mode == "center":
        hmode = wmode = "center"
    else:
        hmode, wmode, *extra = mode.split("_")
        if extra:
            raise ValueError("Bad composite mode")
    if hmode == "top":
        hslice = slice(0, height)
    elif hmode == "center":
        hoffs = (th - height) // 2
        hslice = slice(hoffs, hoffs + height)
    elif hmode == "bottom":
        hslice = slice(th - height, th)
    else:
        raise ValueError("Bad height mode in composite mode")
    if wmode == "left":
        wslice = slice(0, width)
    elif wmode == "center":
        woffs = (tw - width) // 2
        wslice = slice(woffs, woffs + width)
    elif wmode == "right":
        wslice = slice(tw - width, tw)
    else:
        raise ValueError("Bad width mode in composite mode")
    wslice = adjust_slice(wslice, tw, offset_width)
    hslice = adjust_slice(hslice, th, offset_height)
    return tensor[..., hslice, wslice]


def pattern_break(
    noise: jax.Array,
    *,
    percentage: float = 0.5,
    detail_level: float = 0.0,
    restore_scale: bool = True,
    blend_function: Callable | None = None,
) -> jax.Array:
    """Remainder-hash + erfinv pattern scrambler (py/utils.py:576-596)."""
    blend_function = fallback(blend_function, BLENDING_MODES["lerp"])
    orig_dtype = noise.dtype
    x = noise.astype(jnp.float32)
    if restore_scale:
        orig_min, orig_max = jnp.min(x), jnp.max(x)
    noise_normed = normalize_to_scale(x, -1.0, 1.0, dim=None)
    result = jnp.remainder(jnp.abs(noise_normed) * 1000000, 11) / 11
    result = jnp.clip(
        (1 + detail_level / 10)
        * jax.scipy.special.erfinv(2 * result - 1)
        * (2**0.5)
        * 0.2,
        -1,
        1,
    )
    if restore_scale:
        result = normalize_to_scale(result, orig_min, orig_max, dim=None)
    return blend_function(x, result, percentage).astype(orig_dtype)


def elementwise_shuffle_by_dim(
    t: jax.Array,
    key: jax.Array,
    *,
    dim: int = -1,
    prob: float = 1.0,
    no_identity: bool = False,
) -> jax.Array:
    """Vectorized per-position shuffle along one axis (py/utils.py:599-657).

    ``no_identity`` uses a random per-position cyclic offset (a derangement),
    otherwise a full random permutation via argsort of uniforms.
    """
    dim = dim % t.ndim
    moved = jnp.moveaxis(t, dim, -1)
    lead = moved.shape[:-1]
    n = moved.shape[-1]
    flat = moved.reshape(-1, n)
    p = flat.shape[0]
    kmask, kperm = jax.random.split(key)
    mask = (
        jax.random.uniform(kmask, (p,)) < prob
        if prob < 1.0
        else jnp.ones((p,), dtype=bool)
    )
    base = jnp.broadcast_to(jnp.arange(n), (p, n))
    if no_identity:
        offsets = jax.random.randint(kperm, (p,), 1, n)
        perms = (base + offsets[:, None]) % n
    else:
        perms = jnp.argsort(jax.random.uniform(kperm, (p, n)), axis=1)
    perms = jnp.where(mask[:, None], perms, base)
    shuffled = jnp.take_along_axis(flat, perms, axis=1)
    return jnp.moveaxis(shuffled.reshape(lead + (n,)), -1, dim)


def step_from_sigmas(
    sigma: float,
    sigmas: Sequence[float] | np.ndarray,
    *,
    decimals: int | None = 4,
    output_decimals: int = 2,
) -> float | None:
    """Host-side fractional step index from a sigma (py/utils.py:682-721)."""
    sigma = float(np.max(np.asarray(sigma)))
    sigmas = np.asarray(sigmas, dtype=np.float64)
    if sigmas.ndim == 2:
        sigmas = sigmas.max(axis=0)
    elif sigmas.ndim != 1:
        raise ValueError(f"Unexpected sigmas shape {sigmas.shape}")
    sigmas = sigmas[:-1]
    if not len(sigmas) or np.any(sigmas <= 0):
        return None
    if decimals is not None:
        sigmas = np.round(sigmas, decimals)
        sigma = round(sigma, decimals)
    sigma_min, sigma_max = sigmas.min(), sigmas.max()
    if not sigma_min <= sigma <= sigma_max:
        return None
    max_idx = len(sigmas) - 1
    idx = int(np.argmin(np.abs(sigmas - sigma)))
    idx_sigma = float(sigmas[idx])
    if decimals is not None:
        idx_sigma = round(idx_sigma, decimals)
    if sigma == idx_sigma:
        return float(idx)
    idx_low, idx_high = (idx, idx - 1) if sigma > idx_sigma else (idx + 1, idx)
    if idx_low < 0 or idx_high < 0 or idx_low > max_idx or idx_high > max_idx:
        return None
    sigma_low, sigma_high = float(sigmas[idx_low]), float(sigmas[idx_high])
    step_diff = sigma_high - sigma_low
    if step_diff == 0:
        return float(idx)
    pct = 1.0 - ((sigma - sigma_low) / step_diff)
    return round(idx_high + pct, output_decimals)


def step_from_sigmas_traced(
    sigma: jax.Array,
    sigmas: jax.Array,
    *,
    decimals: int | None = 4,
) -> tuple[jax.Array, jax.Array]:
    """Traceable variant for use inside jit (wavelet CFG's step-pct mode).

    Returns ``(fractional_step, valid)`` — ``valid`` False encodes the
    reference's ``None`` result (out-of-range sigma or non-positive sigmas).
    """
    sigmas = sigmas[:-1]
    if decimals is not None:
        fac = 10.0**decimals
        sigmas = jnp.round(sigmas * fac) / fac
        sigma = jnp.round(sigma * fac) / fac
    valid = jnp.logical_not(jnp.any(sigmas <= 0))
    sigma_min, sigma_max = jnp.min(sigmas), jnp.max(sigmas)
    valid &= (sigma_min <= sigma) & (sigma <= sigma_max)
    max_idx = sigmas.shape[0] - 1
    idx = jnp.argmin(jnp.abs(sigmas - sigma))
    idx_sigma = sigmas[idx]
    exact = sigma == idx_sigma
    above = sigma > idx_sigma
    idx_low = jnp.where(above, idx, idx + 1)
    idx_high = jnp.where(above, idx - 1, idx)
    in_bounds = (idx_low >= 0) & (idx_high >= 0) & (idx_low <= max_idx) & (idx_high <= max_idx)
    idx_low_c = jnp.clip(idx_low, 0, max_idx)
    idx_high_c = jnp.clip(idx_high, 0, max_idx)
    sigma_low, sigma_high = sigmas[idx_low_c], sigmas[idx_high_c]
    step_diff = sigma_high - sigma_low
    pct = 1.0 - (sigma - sigma_low) / jnp.where(step_diff == 0, 1.0, step_diff)
    frac = jnp.where(step_diff == 0, idx.astype(sigma.dtype), idx_high_c + pct)
    result = jnp.where(exact, idx.astype(sigma.dtype), frac)
    valid &= exact | in_bounds
    return result, valid


# math helper mirroring the reference's use of math.prod in shuffle
prod = math.prod
