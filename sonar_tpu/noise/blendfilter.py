"""BlendFilterNoise — native reinterpretation of the bleh-integration
combinator (reference: py/noise.py:1701-1774 + py/nodes/integrations.py:20-100).

The reference delegates its frequency filter (``ffilter``) and enhancement
(``enhance_tensor``) to the external ComfyUI-bleh pack. Those are provided
natively here:

- ``ffilter(t, threshold, scale, filt, strength)`` — rFFT-space filtering:
  a per-frequency gain curve built from (filter preset | explicit list),
  applied above/below a radial-frequency ``threshold`` with ``scale`` on
  the stop-band, blended by ``strength``.
- ``enhance_tensor(t, name, scale)`` — a native enhancement table
  (sharpen/blur via gaussian kernels, korniamotionblur-style directional
  blur, contrast, saturate-channels).

Blend/accumulate semantics over the chain's items (factor-weighted,
``simple_add`` or any blend mode) match the reference exactly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core.blend import BLENDING_MODES
from ..core.normalize import scale_noise
from .base import NoiseItem
from .combinators import MultiChildNoise

# named gain curves over normalized radial frequency r ∈ [0, 1]
FILTER_PRESETS: dict[str, tuple[float, ...]] = {
    "none": (1.0,),
    "bandpass": (0.0, 0.5, 1.0, 1.0, 0.5, 0.0),
    "lowpass": (1.0, 1.0, 0.75, 0.4, 0.15, 0.0),
    "highpass": (0.0, 0.15, 0.4, 0.75, 1.0, 1.0),
    "passthrough": (1.0,),
    "gaussianblur": (1.0, 0.8, 0.5, 0.25, 0.1, 0.03),
    "edge": (0.0, 0.2, 0.5, 0.8, 1.0, 1.2),
    "sharpen": (1.0, 1.0, 1.1, 1.25, 1.4, 1.6),
}


def _radial_gain(gains, h: int, w: int) -> np.ndarray:
    """Interpolate a gain list over the rfft2 radial frequency grid."""
    gains = np.asarray(gains, np.float64)
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    r = np.sqrt(fy**2 + fx**2) / math.sqrt(0.5)  # normalize to [0, 1]
    xs = np.linspace(0.0, 1.0, len(gains)) if len(gains) > 1 else np.array([0.0, 1.0])
    ys = gains if len(gains) > 1 else np.repeat(gains, 2)
    return np.interp(np.clip(r, 0, 1), xs, ys)


def ffilter(t: jax.Array, threshold: float, scale: float, filt, strength: float,
            ) -> jax.Array:
    """Frequency filter: gain curve applied to the rfft, stop-band below the
    radial ``threshold`` scaled by ``scale``, result lerped by ``strength``."""
    if isinstance(filt, str):
        gains = FILTER_PRESETS.get(filt)
        if gains is None:
            raise ValueError(
                f"Unknown ffilter {filt!r}; valid: {', '.join(sorted(FILTER_PRESETS))}"
            )
    else:
        gains = tuple(float(v) for v in filt)
    h, w = t.shape[-2], t.shape[-1]
    gain = _radial_gain(gains, h, w)
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    r = np.sqrt(fy**2 + fx**2) / math.sqrt(0.5)
    gain = np.where(r < threshold, gain * scale, gain)
    spec = jnp.fft.rfft2(t.astype(jnp.float32), norm="ortho")
    out = jnp.fft.irfft2(spec * jnp.asarray(gain, jnp.float32), s=(h, w),
                         norm="ortho").astype(t.dtype)
    if strength == 1.0:
        return out
    return t + (out - t) * strength


def _gaussian_kernel(sigma: float, radius: int) -> np.ndarray:
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(xs**2) / (2 * sigma**2))
    return k / k.sum()


def _sep_blur(t: jax.Array, sigma: float = 1.0) -> jax.Array:
    """Separable reflect-padded gaussian blur over the last two axes."""
    radius = max(1, int(3 * sigma))
    k = jnp.asarray(_gaussian_kernel(sigma, radius), t.dtype)

    def conv_axis(x, axis):
        moved = jnp.moveaxis(x, axis, -1)
        padded = jnp.pad(moved, [(0, 0)] * (moved.ndim - 1) + [(radius, radius)],
                         mode="reflect")
        windows = jnp.stack(
            [padded[..., i : i + moved.shape[-1]] for i in range(2 * radius + 1)],
            axis=-1)
        return jnp.moveaxis(windows @ k, -1, axis)

    return conv_axis(conv_axis(t, -2), -1)


def enhance_tensor(t: jax.Array, name: str, scale: float = 1.0, *,
                   sigma=None, **_kw) -> jax.Array:
    """Native enhancement table (replaces bleh's enhance_tensor)."""
    name = name.lower()
    if name in ("none", ""):
        return t
    handler = ENHANCE_HANDLERS.get(name)
    if handler is None:
        valid = ", ".join(sorted(ENHANCE_HANDLERS))
        raise ValueError(f"Unknown enhance mode {name!r}; valid: {valid}")
    return handler(t, scale, sigma=sigma)


def _enh_blur(t, scale, **_kw):
    return t + (_sep_blur(t) - t) * scale


def _enh_sharpen(t, scale, **_kw):
    return t + (t - _sep_blur(t)) * scale


def _enh_contrast(t, scale, **_kw):
    mean = jnp.mean(t, axis=(-2, -1), keepdims=True)
    return mean + (t - mean) * (1.0 + scale)


def _enh_saturate(t, scale, **_kw):
    mean = jnp.mean(t, axis=-3, keepdims=True)
    return mean + (t - mean) * (1.0 + scale)


# extensible enhancement registry (sonar_tpu.api.extensions registers here)
ENHANCE_HANDLERS = {
    "blur": _enh_blur,
    "gaussianblur": _enh_blur,
    "sharpen": _enh_sharpen,
    "unsharp": _enh_sharpen,
    "contrast": _enh_contrast,
    "saturate": _enh_saturate,
}

_ENHANCE_MODES = ("none", *ENHANCE_HANDLERS)


class BlendFilterNoise(MultiChildNoise):
    """py/noise.py:1701-1774 with native ffilter/enhance."""

    def __init__(self, factor=1.0, *, noise, blend_mode="simple_add",
                 ffilter=None, ffilter_scale=1.0, ffilter_strength=0.5,
                 ffilter_threshold=1, enhance_mode="none", enhance_strength=0.25,
                 affect="result", normalize_noise=None, normalize_result=None):
        super().__init__(factor, items=noise, blend_mode=blend_mode,
                         ffilter=ffilter, ffilter_scale=ffilter_scale,
                         ffilter_strength=ffilter_strength,
                         ffilter_threshold=ffilter_threshold,
                         enhance_mode=enhance_mode,
                         enhance_strength=enhance_strength, affect=affect,
                         normalize_noise=normalize_noise,
                         normalize_result=normalize_result)

    def apply_effects(self, noise, sigma):
        if self.ffilter:
            noise = ffilter(noise, self.ffilter_threshold, self.ffilter_scale,
                            self.ffilter, self.ffilter_strength)
        if self.enhance_mode != "none" and self.enhance_strength != 0:
            noise = enhance_tensor(noise, self.enhance_mode,
                                   self.enhance_strength, sigma=sigma)
        return noise

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        n = len(self.items)
        normalize_noise = self.get_normalize("normalize_noise", normalized or n > 1)
        normalize_result = self.get_normalize("normalize_result", normalized)
        noise_effects = self.affect in {"noise", "both"}
        result_effects = self.affect in {"result", "both"}
        total = jnp.zeros(ctx.shape, ctx.dtype)
        new_states = []
        for i, item in enumerate(self.items):
            cur, st = item.sample(ctx, state[i], jax.random.fold_in(key, i),
                                  sigma, sigma_next, normalized=False)
            new_states.append(st)
            cur = scale_noise(cur, normalized=bool(normalize_noise))
            if noise_effects:
                cur = self.apply_effects(cur, sigma)
            if self.blend_mode == "simple_add":
                total = total + cur * item.factor
            else:
                total = BLENDING_MODES[self.blend_mode](total, cur, item.factor)
        total = scale_noise(total, self.factor, normalized=bool(normalize_result))
        if result_effects:
            total = self.apply_effects(total, sigma)
        return total, tuple(new_states)
