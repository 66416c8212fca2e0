"""Noise normalization primitives.

TPU-native rebuild of the reference utility layer:

- ``scale_noise``     — py/utils.py:85-106 (the canonical mean-0/std-1
  normalizer with a 2.5/sqrt(N) significance dead-band).
- ``quantile_normalize`` — py/utils.py:124-449 (abs-quantile reduction + 37
  pluggable outlier strategies, incl. the negative-quantile "centered" proxy
  mode at py/utils.py:427-446).
- ``normalize_to_scale`` / ``normalize_to_scale_adv`` — py/utils.py:452-510.

Design notes (TPU):

* torch ``std`` is Bessel-corrected (ddof=1); jnp defaults to ddof=0.  Every
  statistic here uses ``tstd`` to match the reference's numerics.
* The reference's data-dependent branches (``if abs(mean) > threshold``)
  become ``jnp.where`` selects so the whole thing traces into one fused XLA
  elementwise chain — no host sync per call (the reference does ``.item()``
  and forces a device→host round trip per noise draw).
* Strategies that use boolean fancy-indexing with dynamic result shapes in
  torch (``replace*``) are re-expressed with stable argsort + traced modular
  gather, which XLA compiles to static-shape sorts/gathers.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _static_one(factor) -> bool:
    return isinstance(factor, (int, float)) and factor == 1


def tstd(x: jax.Array, axis=None, keepdims: bool = False) -> jax.Array:
    """Bessel-corrected std matching ``torch.Tensor.std`` (ddof=1)."""
    return jnp.std(x, axis=axis, keepdims=keepdims, ddof=1)


def tquantile(x: jax.Array, q, axis=None, keepdims: bool = False) -> jax.Array:
    """Linear-interpolation quantile matching ``torch.quantile``."""
    return jnp.quantile(x, q, axis=axis, keepdims=keepdims, method="linear")


def tmedian(x: jax.Array, axis: int = -1, keepdims: bool = False) -> jax.Array:
    """torch.median semantics: the lower of the two middle elements."""
    n = x.shape[axis]
    s = jnp.sort(x, axis=axis)
    return jnp.take(s, jnp.array([(n - 1) // 2]), axis=axis) if keepdims else jnp.take(
        s, (n - 1) // 2, axis=axis
    )


def _mode_1d(row: jax.Array) -> jax.Array:
    """Most frequent value in a 1-D array (smallest on ties, like a sorted scan)."""
    s = jnp.sort(row)
    lo = jnp.searchsorted(s, s, side="left")
    hi = jnp.searchsorted(s, s, side="right")
    counts = hi - lo
    return s[jnp.argmax(counts)]


def tmode(x: jax.Array, axis: int = -1, keepdims: bool = False) -> jax.Array:
    """Mode along an axis (vectorized sort + searchsorted)."""
    moved = jnp.moveaxis(x, axis, -1)
    lead = moved.shape[:-1]
    flat = moved.reshape(-1, moved.shape[-1])
    modes = jax.vmap(_mode_1d)(flat).reshape(lead)
    if keepdims:
        modes = jnp.expand_dims(modes, axis)
    return modes


def scale_noise(
    noise: jax.Array,
    factor=1.0,
    *,
    normalized: bool = True,
    threshold_std_devs: float = 2.5,
    normalize_dims: tuple | None = None,
) -> jax.Array:
    """THE normalizer (py/utils.py:85-106).

    Global mode: mean/std are computed once; the mean is subtracted only if
    ``|mean| > 2.5/sqrt(N)`` and the array is divided by the *original* std
    only if ``|1-std| > 2.5/sqrt(N)`` — a significance dead-band so noise
    that is already standard normal passes through untouched bit-for-bit.

    Per-dims mode: divide by per-dims std, then subtract the post-division
    per-dims mean (that exact order, matching py/utils.py:96-99).
    """
    numel = noise.size
    if not normalized or numel == 0:
        return noise if _static_one(factor) else noise * factor
    # Zero-std guard: degenerate (constant / all-zero) noise passes through
    # instead of the reference's 0/0 NaN — e.g. ScheduledNoise's zeros
    # fallback (py/noise.py:665-668) normalized at the top level.
    if normalize_dims is not None:
        std = tstd(noise, axis=normalize_dims, keepdims=True)
        noise = noise / jnp.where(std == 0, 1.0, std)
        noise = noise - jnp.mean(noise, axis=normalize_dims, keepdims=True)
        return noise if _static_one(factor) else noise * factor
    mean = jnp.mean(noise)
    std = tstd(noise)
    threshold = threshold_std_devs / math.sqrt(numel)
    noise = jnp.where(jnp.abs(mean) > threshold, noise - mean, noise)
    noise = jnp.where(
        (jnp.abs(1.0 - std) > threshold) & (std != 0),
        noise / jnp.where(std == 0, 1.0, std),
        noise,
    )
    return noise if _static_one(factor) else noise * factor


# ---------------------------------------------------------------------------
# quantile_normalize strategy handlers (py/utils.py:124-363)
# ---------------------------------------------------------------------------


def _qn_scaledown(noise, nq, *, dim, **_kw):
    noiseabs = jnp.abs(noise)
    mv = jnp.clip(jnp.max(noiseabs, axis=dim, keepdims=True), min=1e-06)
    return jnp.where(noiseabs > nq, noise * (nq / mv), noise)


def _qn_wave(noise, nq, *, preserve_sign=False, wave_function=jnp.sin,
             pi_factor=0.5, wrong_mode=False, **_kw):
    if wrong_mode:
        multiplier = 1.0 / ((math.pi * pi_factor) / nq)
    else:
        multiplier = 1.0 / (nq / (math.pi * pi_factor))
    result = wave_function(noise * multiplier) * nq
    return jnp.copysign(jnp.abs(result), noise) if preserve_sign else result


def _qn_mode(noise, nq, *, dim, decimals=1, **_kw):
    scale = 10.0**decimals
    rounded = jnp.round(noise * scale) / scale
    return jnp.where(jnp.abs(noise) > nq, tmode(rounded, axis=dim, keepdims=True), noise)


def _qn_replace(noise, nq, *, keep_sign=False, avoid_sign=False, count=1,
                count_flipping=False, **_kw):
    """py/utils.py:178-212 — replace outliers by cycling through the inliers.

    torch's dynamic-shape ``noise[mask]`` becomes a stable argsort that packs
    inlier elements (original order preserved) to the front, plus a traced
    modular gather.
    """
    mask = jnp.abs(noise) <= nq  # broadcasts nq over the flattened axis
    flat = noise.ravel()
    fmask = jnp.broadcast_to(mask, noise.shape).ravel()
    numel = flat.size
    order = jnp.argsort(jnp.logical_not(fmask), stable=True)
    packed = flat[order]  # inliers first, original order
    n_cand = jnp.maximum(jnp.sum(fmask), 1)
    idxs = jnp.arange(numel) % n_cand
    cresult = packed[idxs]
    if count >= 2:
        multiplier = 1.0 / count
        cresult = cresult * multiplier
        for i in range(1, count):
            shift = i if not count_flipping or (i % 2) == 0 else -i
            cresult = cresult + packed[jnp.roll(idxs, shift)] * multiplier
    candidates = cresult.reshape(noise.shape)
    if keep_sign or avoid_sign:
        sign_src = -noise if avoid_sign else noise
        candidates = jnp.copysign(jnp.abs(candidates), sign_src)
    return jnp.where(mask, noise, candidates)


QUANTILE_HANDLERS: dict[str, Callable] = {
    "clamp": lambda noise, nq, **_kw: jnp.clip(noise, -nq, nq),
    "scale_down": _qn_scaledown,
    "tanh": lambda noise, nq, **_kw: jnp.tanh(noise) * jnp.abs(nq),
    "tanh_outliers": lambda noise, nq, **_kw: jnp.where(
        jnp.abs(noise) > nq, jnp.tanh(noise) * jnp.abs(nq), noise
    ),
    "sigmoid_keepsign": lambda noise, nq, **_kw: jnp.copysign(
        jax.nn.sigmoid(noise) * jnp.abs(nq), noise
    ),
    "sigmoid": lambda noise, nq, **_kw: jax.nn.sigmoid(noise) * (jnp.abs(nq) * 2)
    - jnp.abs(nq),
    "sigmoid_outliers": lambda noise, nq, **_kw: jnp.where(
        jnp.abs(noise) > nq,
        jnp.copysign(jax.nn.sigmoid(noise) * jnp.abs(nq), noise),
        noise,
    ),
    "sin": partial(_qn_wave, wave_function=jnp.sin),
    "sin_wholepi": partial(_qn_wave, wave_function=jnp.sin, pi_factor=1.0),
    "sin_keepsign": partial(_qn_wave, wave_function=jnp.sin, preserve_sign=True),
    "sin_wrong": partial(_qn_wave, wave_function=jnp.sin, wrong_mode=True),
    "sin_wrong_wholepi": partial(
        _qn_wave, wave_function=jnp.sin, pi_factor=1.0, wrong_mode=True
    ),
    "sin_wrong_keepsign": partial(
        _qn_wave, wave_function=jnp.sin, preserve_sign=True, wrong_mode=True
    ),
    "cos": partial(_qn_wave, wave_function=jnp.cos),
    "cos_wholepi": partial(_qn_wave, wave_function=jnp.cos, pi_factor=1.0),
    "cos_keepsign": partial(_qn_wave, wave_function=jnp.cos, preserve_sign=True),
    "cos_wrong": partial(_qn_wave, wave_function=jnp.cos, wrong_mode=True),
    "cos_wrong_wholepi": partial(
        _qn_wave, wave_function=jnp.cos, pi_factor=1.0, wrong_mode=True
    ),
    "cos_wrong_keepsign": partial(
        _qn_wave, wave_function=jnp.cos, preserve_sign=True, wrong_mode=True
    ),
    "atan": lambda noise, nq, **_kw: jnp.arctan(noise) * (jnp.abs(nq) / (math.pi / 2)),
    "tenth": lambda noise, nq, **_kw: jnp.where(jnp.abs(noise) > nq, noise * 0.1, noise),
    "half": lambda noise, nq, **_kw: jnp.where(jnp.abs(noise) > nq, noise * 0.5, noise),
    "zero": lambda noise, nq, **_kw: jnp.where(jnp.abs(noise) > nq, 0.0, noise),
    "reverse_zero": lambda noise, nq, **_kw: jnp.where(jnp.abs(noise) >= nq, noise, 0.0),
    "mean": lambda noise, nq, *, dim, **_kw: jnp.where(
        jnp.abs(noise) > nq, jnp.mean(noise, axis=dim, keepdims=True), noise
    ),
    "median": lambda noise, nq, *, dim, **_kw: jnp.where(
        jnp.abs(noise) > nq, tmedian(noise, axis=dim, keepdims=True), noise
    ),
    "mode_1dec": partial(_qn_mode, decimals=1),
    "mode_2dec": partial(_qn_mode, decimals=2),
    "replace": _qn_replace,
    "replace_keepsign": partial(_qn_replace, keep_sign=True),
    "replace_avoidsign": partial(_qn_replace, avoid_sign=True),
    "replace_2pt": partial(_qn_replace, count=2),
    "replace_3pt": partial(_qn_replace, count=3),
    "replace_2pt_flip": partial(_qn_replace, count=2, count_flipping=True),
    "replace_3pt_flip": partial(_qn_replace, count=3, count_flipping=True),
    "replace_2pt_keepsign": partial(_qn_replace, count=2, keep_sign=True),
    "replace_3pt_keepsign": partial(_qn_replace, count=3, keep_sign=True),
    "replace_2pt_flip_keepsign": partial(
        _qn_replace, count=2, count_flipping=True, keep_sign=True
    ),
    "replace_3pt_flip_keepsign": partial(
        _qn_replace, count=3, count_flipping=True, keep_sign=True
    ),
    "replace_2pt_avoidsign": partial(_qn_replace, count=2, avoid_sign=True),
    "replace_3pt_avoidsign": partial(_qn_replace, count=3, avoid_sign=True),
    "replace_2pt_flip_avoidsign": partial(
        _qn_replace, count=2, count_flipping=True, avoid_sign=True
    ),
    "replace_3pt_flip_avoidsign": partial(
        _qn_replace, count=3, count_flipping=True, avoid_sign=True
    ),
}


def quantile_normalize(
    noise: jax.Array,
    *,
    quantile: float | Sequence[float] = 0.75,
    dim: int | None = 1,
    flatten: bool = True,
    nq_fac: float = 1.0,
    pow_fac: float = 0.5,
    strategy: str = "clamp",
    strategy_handler: Callable | None = None,
    eps: float = 1e-08,
) -> jax.Array:
    """py/utils.py:367-449. quantile may be a list (applied sequentially);
    negative quantile switches to the "centered" proxy mode (near-zero values
    are treated as the outliers)."""
    if noise.size == 0:
        return noise
    if isinstance(quantile, (tuple, list)):
        for q in quantile:
            noise = quantile_normalize(
                noise, quantile=q, dim=dim, flatten=flatten, nq_fac=nq_fac,
                pow_fac=pow_fac, strategy=strategy, strategy_handler=strategy_handler,
            )
        return noise
    if quantile is None or quantile >= 1 or quantile <= -1:
        return noise
    centered = quantile < 0
    absquantile = abs(quantile)
    orig_shape = noise.shape
    if noise.ndim > 1 and flatten and dim is not None:
        start = dim % noise.ndim
        flatnoise = noise.reshape(noise.shape[:start] + (-1,))
    else:
        flatten = False
        flatnoise = noise
    handler = QUANTILE_HANDLERS.get(strategy) if strategy_handler is None else strategy_handler
    if handler is None:
        valid = ", ".join(sorted(QUANTILE_HANDLERS))
        raise ValueError(f"Unknown strategy {strategy!r}; valid: {valid}")
    qaxis = -1 if flatten else dim
    if not centered:
        nq = tquantile(jnp.abs(flatnoise), absquantile, axis=qaxis, keepdims=True)
        nq = nq * nq_fac + eps
        out = handler(flatnoise, nq, orig_noise=noise, dim=qaxis, flatten=flatten)
    else:
        absnoise = jnp.abs(flatnoise)
        maxabs = jnp.max(absnoise, axis=qaxis, keepdims=True)
        proxy = jnp.sign(flatnoise) * (maxabs - absnoise)
        nq_proxy = tquantile(jnp.abs(proxy), absquantile, axis=qaxis, keepdims=True)
        nq_proxy = nq_proxy * nq_fac + eps
        out_proxy = handler(proxy, nq_proxy, orig_noise=noise, dim=qaxis, flatten=flatten)
        out = jnp.sign(out_proxy) * (maxabs - jnp.abs(out_proxy))
    if pow_fac not in {0.0, 1.0}:
        out = jnp.copysign(jnp.abs(out) ** pow_fac, out)
    return out.reshape(orig_shape)


def normalize_to_scale(
    latent: jax.Array,
    target_min: float,
    target_max: float,
    *,
    dim=(-3, -2, -1),
    eps: float = 1e-07,
) -> jax.Array:
    """Range remap (py/utils.py:452-470). ``dim=None`` or ``()`` → global."""
    axis = None if dim in (None, ()) else dim
    min_val = jnp.min(latent, axis=axis, keepdims=axis is not None)
    max_val = jnp.max(latent, axis=axis, keepdims=axis is not None)
    normalized = (latent - min_val) / ((max_val - min_val) + eps)
    return jnp.clip(
        normalized * (target_max - target_min) + target_min, target_min, target_max
    )


def _masked_normalize_to_scale(t, mask, target_min, target_max, *, eps=1e-07):
    """normalize_to_scale over only the masked elements (global stats)."""
    big = jnp.asarray(jnp.finfo(t.dtype).max, t.dtype)
    min_val = jnp.min(jnp.where(mask, t, big))
    max_val = jnp.max(jnp.where(mask, t, -big))
    normalized = (t - min_val) / ((max_val - min_val) + eps)
    remapped = jnp.clip(
        normalized * (target_max - target_min) + target_min, target_min, target_max
    )
    return jnp.where(mask, remapped, t)


def normalize_to_scale_adv(
    t: jax.Array,
    *,
    min_pos: float,
    max_pos: float,
    min_neg: float,
    max_neg: float,
    dim=(-3, -2, -1),
) -> jax.Array:
    """Separate ± range remap with auto-bounds (py/utils.py:473-510).

    The reference flattens the selected sign's values into a 1-D tensor, so
    its statistics are global over that sign class regardless of ``dim``;
    this implementation does the same with masks (static shapes under jit).
    Auto-bounds (``max_neg >= 0`` / ``min_pos < 0``) become traced scalars.
    """
    del dim  # see docstring: reference semantics are effectively global
    skip_pos = max_pos <= 0 or min_pos >= max_pos
    skip_neg = min_neg >= 0 or min_neg >= max_neg
    neg_mask, pos_mask = t < 0.0, t > 0.0
    result = jnp.zeros_like(t)
    if skip_neg:
        result = jnp.where(neg_mask, t, result)
    else:
        mn = max_neg
        if max_neg >= 0:
            big = jnp.asarray(jnp.finfo(t.dtype).max, t.dtype)
            mn = jnp.max(jnp.where(neg_mask, t, -big))
        remapped = _masked_normalize_to_scale(t, neg_mask, min_neg, mn)
        result = jnp.where(neg_mask, remapped, result)
    if skip_pos:
        result = jnp.where(pos_mask, t, result)
    else:
        mp = min_pos
        if min_pos < 0:
            big = jnp.asarray(jnp.finfo(t.dtype).max, t.dtype)
            mp = jnp.min(jnp.where(pos_mask, t, big))
        remapped = _masked_normalize_to_scale(t, pos_mask, mp, max_pos)
        result = jnp.where(pos_mask, remapped, result)
    return result
