"""Spatial resampling (the reference's ``scale_samples``, py/utils.py:58-67,
with comfy.utils.common_upscale method semantics).

TPU-first design: every separable method (bilinear, bicubic, nearest,
nearest-exact, area, adaptive_avg_pool2d) is expressed as two precomputed
interpolation matrices ``out = W_h @ x @ W_w^T`` built host-side with numpy.
That turns irregular gathers into dense matmuls the MXU eats for free, keeps
shapes static under jit, and makes the kernels exactly reproducible.

Kernel parity notes vs torch.nn.functional.interpolate(antialias=False):
- ``bilinear``/``bicubic`` use half-pixel (align_corners=False) source
  coordinates with border-clamped taps; bicubic uses the Keys kernel with
  a = -0.75 (torch's constant).
- ``nearest`` is torch's legacy asymmetric floor mapping; ``nearest-exact``
  uses half-pixel centers.
- ``area`` == ``adaptive_avg_pool2d`` (variable-width averaging bins).
- ``bislerp`` (comfy's spherical bilinear over the channel axis) cannot be a
  matrix; it is a 2-tap gather + channel-vector slerp per axis.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

UPSCALE_METHODS = (
    "bilinear",
    "nearest-exact",
    "nearest",
    "area",
    "bicubic",
    "bislerp",
    "adaptive_avg_pool2d",
)


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    ax = np.abs(x)
    ax2, ax3 = ax * ax, ax * ax * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


@lru_cache(maxsize=256)
def _resize_matrix(in_size: int, out_size: int, mode: str) -> np.ndarray:
    """(out_size, in_size) row-stochastic interpolation matrix."""
    I, O = in_size, out_size
    W = np.zeros((O, I), dtype=np.float64)
    if mode == "nearest":
        src = np.minimum((np.arange(O) * I) // O, I - 1)
        W[np.arange(O), src] = 1.0
    elif mode == "nearest-exact":
        src = np.minimum(((np.arange(O) + 0.5) * I / O).astype(np.int64), I - 1)
        W[np.arange(O), src] = 1.0
    elif mode == "bilinear":
        x = (np.arange(O) + 0.5) * I / O - 0.5
        x0 = np.floor(x).astype(np.int64)
        f = x - x0
        for tap, w in ((x0, 1.0 - f), (x0 + 1, f)):
            np.add.at(W, (np.arange(O), np.clip(tap, 0, I - 1)), w)
    elif mode == "bicubic":
        x = (np.arange(O) + 0.5) * I / O - 0.5
        x0 = np.floor(x).astype(np.int64)
        f = x - x0
        for k in (-1, 0, 1, 2):
            w = _cubic_kernel(f - k)
            np.add.at(W, (np.arange(O), np.clip(x0 + k, 0, I - 1)), w)
    elif mode in ("area", "adaptive_avg_pool2d"):
        for o in range(O):
            lo = (o * I) // O
            hi = -(-((o + 1) * I) // O)  # ceil
            W[o, lo:hi] = 1.0 / (hi - lo)
    else:
        raise ValueError(f"Unknown separable resize mode {mode!r}")
    return W.astype(np.float32)


def _resize_separable(samples: jax.Array, width: int, height: int, mode: str) -> jax.Array:
    h, w = samples.shape[-2], samples.shape[-1]
    out = samples
    # HIGHEST precision: these interpolation matmuls define reproducible
    # resampling numerics; bf16 MXU rounding here would perturb seeds.
    prec = jax.lax.Precision.HIGHEST
    if h != height:
        Wh = jnp.asarray(_resize_matrix(h, height, mode), dtype=samples.dtype)
        out = jnp.einsum("oh,...hw->...ow", Wh, out, precision=prec)
    if w != width:
        Ww = jnp.asarray(_resize_matrix(w, width, mode), dtype=samples.dtype)
        out = jnp.einsum("pw,...hw->...hp", Ww, out, precision=prec)
    return out


def _slerp_vectors(v0: jax.Array, v1: jax.Array, t: jax.Array, *, channel_axis: int,
                   eps: float = 1e-8) -> jax.Array:
    """Per-position slerp of channel vectors (comfy bislerp inner op)."""
    n0 = jnp.sqrt(jnp.sum(v0 * v0, axis=channel_axis, keepdims=True)) + eps
    n1 = jnp.sqrt(jnp.sum(v1 * v1, axis=channel_axis, keepdims=True)) + eps
    u0, u1 = v0 / n0, v1 / n1
    dot = jnp.clip(jnp.sum(u0 * u1, axis=channel_axis, keepdims=True), -1.0, 1.0)
    omega = jnp.arccos(dot)
    so = jnp.sin(omega)
    safe = jnp.abs(so) > 1e-6
    so_safe = jnp.where(safe, so, 1.0)
    w0 = jnp.where(safe, jnp.sin((1.0 - t) * omega) / so_safe, 1.0 - t)
    w1 = jnp.where(safe, jnp.sin(t * omega) / so_safe, t)
    res = u0 * w0 + u1 * w1
    norm = n0 * (1.0 - t) + n1 * t
    return res * norm


def _bislerp_axis(x: jax.Array, out_size: int, axis: int, channel_axis: int) -> jax.Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    coords = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
    i0 = np.clip(np.floor(coords).astype(np.int64), 0, in_size - 1)
    i1 = np.clip(i0 + 1, 0, in_size - 1)
    frac = np.clip(coords - np.floor(coords), 0.0, 1.0).astype(np.float32)
    v0 = jnp.take(x, jnp.asarray(i0), axis=axis)
    v1 = jnp.take(x, jnp.asarray(i1), axis=axis)
    tshape = [1] * x.ndim
    tshape[axis] = out_size
    t = jnp.asarray(frac, dtype=x.dtype).reshape(tshape)
    return _slerp_vectors(v0, v1, t, channel_axis=channel_axis)


def scale_samples(
    samples: jax.Array,
    width: int,
    height: int,
    *,
    mode: str = "bicubic",
) -> jax.Array:
    """Resize (..., H, W) → (..., height, width). NCHW assumed for bislerp
    (channel axis = -3), matching comfy.utils.common_upscale."""
    if samples.shape[-2] == height and samples.shape[-1] == width:
        return samples
    if mode == "bislerp":
        out = _bislerp_axis(samples, width, axis=-1, channel_axis=-3)
        return _bislerp_axis(out, height, axis=-2, channel_axis=-3)
    return _resize_separable(samples, width, height, mode)
