"""Scatternet-filtered noise (reference: ScatternetFilteredNoiseGenerator,
py/noise_generation.py:2035-2193 + ScatternetFilteredNoise, py/noise.py:
1596-1662).

The reference uses pytorch_wavelets' ScatLayer/ScatLayerj2: one DTCWT level
whose 6 oriented complex highpasses become smooth magnitudes
(``sqrt(x² + b²) − b``), stacked with the lowpass → channels ×7, spatial ÷2
per order. Both backends are available here:

- ``wavelet_backend="dtcwt"`` (default) — the native dual-tree transform
  (sonar_tpu.wavelets.dtcwt): lowpass + 6 oriented magnitudes, ×7
  channels/order — full ScatLayer semantics (on-chip cost is equal to the
  dwt backend within measurement noise; profiles/ANALYSIS.md methodology);
- ``wavelet_backend="dwt"`` — a cheaper real-DWT scatter layer:
  lowpass + 3 oriented magnitudes, ×4 channels/order.

The orchestration (output_mode channels/flat ×(adjusted/scaled),
``output_offset`` channel windowing, per-channel mode, spatial compensation
2^order) matches the reference exactly; the window arithmetic is generic
over the per-layer channel multiplier.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.normalize import scale_noise
from ..ops.resample import scale_samples
from ..wavelets.dwt import _afb2d
from ..wavelets.coeffs import get_wavelet
from .base import NoiseCtx, NoiseItem, fix_output_frames
from .generators import Generator


def scat_layer_dwt(x: jax.Array, *, wave: str = "db2", mode: str = "symmetric",
                   magbias: float = 1e-2) -> jax.Array:
    """One real-DWT scattering layer: (B, C, H, W) → (B, 4C, H', W').

    Lowpass passes through; the 3 oriented highpass bands become smooth
    magnitudes ``sqrt(h² + b²) − b`` (the ScatLayer biased magnitude)."""
    w = get_wavelet(wave)
    yl, bands = _afb2d(x, w, mode)
    mags = jnp.sqrt(bands**2 + magbias**2) - magbias
    b, c = x.shape[:2]
    stacked = jnp.concatenate([yl[:, :, None], mags], axis=2)  # (B, C, 4, H', W')
    return stacked.reshape(b, c * 4, *stacked.shape[-2:])


def scat_layer_dtcwt(x: jax.Array, *, magbias: float = 1e-2) -> jax.Array:
    """One dual-tree scattering layer: (B, C, H, W) → (B, 7C, H/2, W/2) —
    the pytorch_wavelets ScatLayer semantics: averaged lowpass + the 6
    oriented complex magnitudes ``sqrt(re²+im²+b²) − b``."""
    from ..wavelets.dtcwt import dtcwt2d

    yls, yhs = dtcwt2d(x, level=1)
    yl = sum(yls) / 4.0
    z = yhs[0]  # (B, C, 6, H', W') complex
    mags = jnp.sqrt(jnp.real(z) ** 2 + jnp.imag(z) ** 2 + magbias**2) - magbias
    b, c = x.shape[:2]
    hh, ww = yl.shape[-2], yl.shape[-1]
    mh, mw = mags.shape[-2], mags.shape[-1]
    th, tw = min(hh, mh), min(ww, mw)
    stacked = jnp.concatenate(
        [yl[:, :, None, :th, :tw], mags[..., :th, :tw]], axis=2)
    return stacked.reshape(b, c * 7, th, tw)


class ScatternetFilteredGenerator(Generator):
    name = "scatternetfilter"
    MIN_DIMS = 4
    MAX_DIMS = 4
    CHANNEL_MULT = 4  # per-layer channel multiplier: DWT=4, DTCWT=7

    @classmethod
    def ng_params(cls):
        return super().ng_params() | {
            "mode": "symmetric",
            "magbias": 1e-02,
            "use_symmetric_filter": False,
            "biort": "near_sym_a",
            "qshift": "qshift_a",
            "wave": "db2",
            "wavelet_backend": "dtcwt",
            "output_offset": 0.0,
            "scatternet_order": 1,
            "per_channel_scatternet": False,
            "output_mode": "channels_adjusted",
            "upscale_mode": None,
            "noise_sampler": None,
        }

    def _validate(self):
        if self.output_mode not in {
            "channels", "channels_adjusted", "channels_scaled",
            "flat", "flat_adjusted", "flat_scaled",
        }:
            raise ValueError("Bad output mode")

    def _inner_shape(self, ctx: NoiseCtx):
        """Shape the inner sampler generates at (spatial compensation for
        adjusted modes, py/noise.py:1614-1633)."""
        adjusted = self.output_mode.endswith(("_adjusted", "_scaled"))
        comp = 2 ** abs(self.scatternet_order) if (
            adjusted and self.output_mode.endswith("_adjusted")
            and self.scatternet_order != 0
        ) else 1
        b, c, h, w = ctx.adjusted_shape()
        return (b, c, h * comp, w * comp)

    def init_state(self, ctx, key):
        self._validate()
        if self.noise_sampler is None:
            return ()
        return self.noise_sampler.init_state(
            ctx.with_shape(self._inner_shape(ctx)), key)

    def _scatter(self, x):
        for _ in range(max(1, abs(self.scatternet_order))):
            if self.wavelet_backend == "dtcwt":
                x = scat_layer_dtcwt(x, magbias=self.magbias)
            else:
                x = scat_layer_dwt(x, wave=self.wave, mode=self.mode,
                                   magbias=self.magbias)
        return x

    def generate(self, ctx, state, key, sigma, sigma_next):
        self._validate()
        adjusted_shape = ctx.adjusted_shape()
        b, c, height, width = adjusted_shape
        scaled = self.output_mode.endswith("_scaled")
        adjusted = scaled or self.output_mode.endswith("_adjusted")
        order = abs(self.scatternet_order)
        order_comp = 2**order
        output_mode = self.output_mode.split("_", 1)[0] if adjusted \
            else self.output_mode
        spatial_comp = 1 if adjusted else order_comp
        if self.noise_sampler is None:
            temp_shape = (
                (b, c, height * spatial_comp, width * spatial_comp)
                if spatial_comp != 1 and not scaled
                else ((b, c, height * order_comp, width * order_comp)
                      if self.output_mode.endswith("_adjusted") and order
                      else adjusted_shape)
            )
            noise = jax.random.normal(key, temp_shape, ctx.dtype)
        else:
            noise, state = self.noise_sampler.sample(
                ctx.with_shape(self._inner_shape(ctx)), state, key, sigma,
                sigma_next, normalized=False)
        if scaled:
            upscale_mode = self.upscale_mode or "bilinear"
            noise = scale_samples(noise, width * order_comp, height * order_comp,
                                  mode=upscale_mode)
        if self.scatternet_order == 0:
            return fix_output_frames(ctx, noise), state
        if self.per_channel_scatternet:
            outs = [self._scatter(noise[:, ch : ch + 1]) for ch in range(c)]
            out = jnp.stack(outs, axis=0)  # (C, B, mult, H', W')
        else:
            out = self._scatter(noise)[None]  # (1, B, mult*C, H', W')
        base_channels = 1 if self.per_channel_scatternet else c
        if output_mode == "flat":
            out = out.reshape(out.shape[0], b, -1)
            initial_size = math.prod(
                adjusted_shape[(2 if self.per_channel_scatternet else 1):])
        elif adjusted:
            initial_size = base_channels
        else:
            initial_size = base_channels * (order_comp**2)
        increment = 1 if output_mode == "flat" else base_channels
        out_size = out.shape[2]
        offset_size = (out_size - initial_size) / increment
        output_offset = self.output_offset
        if output_offset == 0 or abs(output_offset) >= 1:
            output_offset = int(output_offset)
            if output_offset < 0:
                output_offset = int(offset_size + 1) + output_offset
        else:
            if output_offset < 0:
                output_offset += 1.0
            output_offset = round(offset_size * output_offset)
        base_idx = int(output_offset * increment)
        base_idx = max(0, min(out_size - initial_size, base_idx))
        out = out[:, :, base_idx : base_idx + initial_size]
        out = jnp.moveaxis(out.squeeze(2), 0, 1) if self.per_channel_scatternet \
            else out[0]
        if output_mode == "channels":
            out = out[..., :height, :width]
        pad_needed = math.prod(adjusted_shape) - out.size
        if pad_needed > 0:
            flat = out.reshape(-1)
            flat = jnp.concatenate([flat, jnp.zeros((pad_needed,), flat.dtype)])
            out = flat
        elif pad_needed < 0:
            out = out.reshape(-1)[: math.prod(adjusted_shape)]
        return out.reshape(adjusted_shape), state


class ScatternetFilteredNoise(NoiseItem):
    """Combinator wrapper (py/noise.py:1596-1662)."""

    MIN_DIMS = 4
    MAX_DIMS = 4

    def __init__(self, factor=1.0, *, noise=None, normalize=None,
                 normalize_noise=False, padding_mode="symmetric", **gen_kwargs):
        super().__init__(factor, normalize=normalize, noise=noise,
                         normalize_noise=normalize_noise,
                         padding_mode=padding_mode, gen_kwargs=dict(gen_kwargs))
        self._gen = ScatternetFilteredGenerator(
            1.0, noise_sampler=noise, mode=padding_mode, **gen_kwargs)

    def clone(self):
        p = self.cloned_params()
        factor = p.pop("factor")
        kw = p.pop("gen_kwargs")
        return self.__class__(factor, **p, **kw)

    def check_dims(self, ctx):
        self._gen.check_dims(ctx)

    def init_state(self, ctx, key):
        return self._gen.init_state(ctx, key)

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        normalize = self.normalize if self.normalize is not None else normalized
        noise, state = self._gen.generate(ctx, state, key, sigma, sigma_next)
        return scale_noise(noise, self.factor, normalized=bool(normalize)), state
