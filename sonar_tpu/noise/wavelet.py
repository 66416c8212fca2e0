"""Wavelet noise generators.

- :class:`WaveletGenerator` — "true" wavelet noise: per octave, draw noise
  and subtract its down-up-resampled self (a band-pass sharpen), accumulate
  with a persistence-decaying amplitude ladder (reference:
  WaveletNoiseGenerator, py/noise_generation.py:2196-2327).
- :class:`WaveletFilteredGenerator` — DWT-decompose noise, optionally blend
  a second "high" noise band-wise, scale yl/yh, inverse (reference:
  WaveletFilteredNoiseGenerator, py/noise_generation.py:1908-2032).
- :class:`WaveletFilteredNoise` — the combinator wrapper exposing the
  generator over arbitrary inner noise items (py/noise.py:1521-1593).

Octave ladders are static (computed from the ctx shape at trace time), so
everything compiles into one XLA program; the DWT levels are grouped convs
(see sonar_tpu.wavelets.dwt).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.blend import BLENDING_MODES
from ..core.normalize import scale_noise
from ..ops.resample import scale_samples
from ..utils.misc import fallback
from ..wavelets import Wavelet, wavelet_blend, wavelet_scaling
from .base import NoiseCtx, NoiseItem, fix_output_frames
from .generators import Generator


class _Octave(NamedTuple):
    octave: int
    height: int
    width: int
    amplitude: float
    total_amplitude: float


def _resolve_blend(fn_or_name):
    if callable(fn_or_name):
        return fn_or_name
    return BLENDING_MODES[fn_or_name]


class WaveletGenerator(Generator):
    """py/noise_generation.py:2196-2327."""

    name = "wavelet"
    MIN_DIMS = 4
    MAX_DIMS = 5

    @classmethod
    def ng_params(cls):
        return super().ng_params() | {
            "octave_scale_mode": "adaptive_avg_pool2d",
            "octave_rescale_mode": "bilinear",
            "post_octave_rescale_mode": "bilinear",
            "initial_amplitude": 1.0,
            "persistence": 0.5,
            "octaves": 4,
            "octave_height_factor": 0.5,
            "octave_width_factor": 0.5,
            "height_factor": 2.0,
            "width_factor": 2.0,
            "min_height": 4,
            "min_width": 4,
            "update_blend": 1.0,
            "update_blend_function": "lerp",
            "noise_sampler": None,
        }

    def octave_data(self, ctx: NoiseCtx) -> tuple[_Octave, ...]:
        height, width = ctx.height, ctx.width
        amplitude = self.initial_amplitude
        total = 0.0
        ch, cw = float(height), float(width)
        out = []
        is_reverse = self.octaves < 0
        octaves = (
            range(self.octaves) if not is_reverse
            else reversed(range(abs(self.octaves)))
        )
        for octave in octaves:
            ch /= self.height_factor**octave
            cw /= self.width_factor**octave
            if (
                amplitude == 0
                or ch < self.min_height
                or cw < self.min_width
                or ch * self.octave_height_factor < 1
                or cw * self.octave_width_factor < 1
            ):
                if is_reverse and not out:
                    ch, cw = float(height), float(width)
                    continue
                break
            total += abs(amplitude)
            out.append(_Octave(octave, int(ch), int(cw), amplitude, total))
            amplitude *= self.persistence
        if not out or not total:
            raise ValueError("Unworkable parameters for wavelet noise")
        return tuple(out)

    def _max_octave_shape(self, ctx: NoiseCtx):
        od = self.octave_data(ctx)
        b, c = ctx.adjusted_shape()[:2]
        return (b, c, max(o.height for o in od), max(o.width for o in od))

    def init_state(self, ctx, key):
        if self.noise_sampler is None:
            return ()
        # inner item is built at the max octave size and sliced per octave
        # (AdvancedWaveletNoise pre-allocation, py/noise.py:392-443)
        inner_ctx = ctx.with_shape(self._max_octave_shape(ctx))
        return self.noise_sampler.init_state(inner_ctx, key)

    def _generate_octave(self, ctx, state, key, sigma, sigma_next, shape):
        h, w = shape[-2:]
        if self.noise_sampler is not None:
            inner_ctx = ctx.with_shape(self._max_octave_shape(ctx))
            full, state = self.noise_sampler.sample(
                inner_ctx, state, key, sigma, sigma_next, normalized=False)
            noise = full[..., :h, :w].reshape(shape)
        else:
            noise = jax.random.normal(key, shape, ctx.dtype)
        sh = int(max(1, h * self.octave_height_factor))
        sw = int(max(1, w * self.octave_width_factor))
        scaled = scale_samples(
            scale_samples(noise, sw, sh, mode=self.octave_scale_mode),
            w, h, mode=self.octave_rescale_mode,
        )
        blend = _resolve_blend(self.update_blend_function)
        return blend(noise, noise - scaled, self.update_blend), state

    def generate(self, ctx, state, key, sigma, sigma_next):
        shape = ctx.adjusted_shape()
        h, w = shape[-2:]
        result = jnp.zeros(shape, ctx.dtype)
        od = self.octave_data(ctx)
        for i, o in enumerate(od):
            oshape = shape[:-2] + (o.height, o.width)
            out, state = self._generate_octave(
                ctx, state, jax.random.fold_in(key, i), sigma, sigma_next, oshape)
            if out.shape != result.shape:
                out = scale_samples(out, w, h, mode=self.post_octave_rescale_mode)
            result = result + out * o.amplitude
        if od[-1].total_amplitude != 0:
            result = result / od[-1].total_amplitude
        return fix_output_frames(ctx, result), state


class WaveletFilteredGenerator(Generator):
    """py/noise_generation.py:1908-2032."""

    name = "waveletfilter"
    MIN_DIMS = 4
    MAX_DIMS = 5

    @classmethod
    def ng_params(cls):
        return super().ng_params() | {
            "mode": "periodization",
            "level": 3,
            "wave": "haar",
            "use_1d_dwt": False,
            "use_dtcwt": False,
            "qshift": "qshift_a",
            "biort": "near_sym_a",
            "inv_mode": None,
            "inv_wave": None,
            "yl_scale": 1.0,
            "yh_scales": 1.0,
            "two_step_inverse": False,
            "preblend_yl_scale_low": None,
            "preblend_yh_scales_low": None,
            "preblend_yl_scale_high": None,
            "preblend_yh_scales_high": None,
            "yl_blend_function": "lerp",
            "yh_blend_function": "lerp",
            "yl_blend_high": 0.0,
            "yh_blend_high": 1.0,
            "noise_sampler": None,
            "noise_sampler_high": None,
        }

    def _wavelet(self):
        return Wavelet(
            wave=self.wave, level=self.level, mode=self.mode,
            use_1d_dwt=self.use_1d_dwt, use_dtcwt=self.use_dtcwt,
            biort=self.biort, qshift=self.qshift,
            inv_wave=self.inv_wave, inv_mode=self.inv_mode,
        )

    def init_state(self, ctx, key):
        cctx = ctx.with_shape(ctx.adjusted_shape())
        st = {}
        for i, (k, item) in enumerate(
            (("low", self.noise_sampler), ("high", self.noise_sampler_high))
        ):
            st[k] = None if item is None else item.init_state(
                cctx, jax.random.fold_in(key, i))
        return st

    def generate(self, ctx, state, key, sigma, sigma_next):
        shape = ctx.adjusted_shape()
        cctx = ctx.with_shape(shape)
        klow, khigh = jax.random.split(key)
        if self.noise_sampler is None:
            noise = jax.random.normal(klow, shape, ctx.dtype)
        else:
            noise, st = self.noise_sampler.sample(
                cctx, state["low"], klow, sigma, sigma_next, normalized=False)
            state = {**state, "low": st}
            noise = noise.reshape(shape)
        noise_high = None
        if self.noise_sampler_high is not None:
            noise_high, st = self.noise_sampler_high.sample(
                cctx, state["high"], khigh, sigma, sigma_next, normalized=False)
            state = {**state, "high": st}
            noise_high = noise_high.reshape(shape)
        orig_shape = noise.shape
        wavelet = self._wavelet()
        need_flat = self.use_1d_dwt and noise.ndim > 3
        if need_flat:
            noise = noise.reshape(noise.shape[0], noise.shape[1], -1)
            if noise_high is not None:
                noise_high = noise_high.reshape(noise.shape)
        yl, yh = wavelet.forward(noise)
        if noise_high is not None:
            yl_h, yh_h = wavelet.forward(noise_high)
            if (self.preblend_yl_scale_high is not None
                    or self.preblend_yh_scales_high is not None):
                yl_h, yh_h = wavelet_scaling(
                    yl_h, yh_h,
                    fallback(self.preblend_yl_scale_high, 1.0),
                    fallback(self.preblend_yh_scales_high, 1.0))
            if (self.preblend_yl_scale_low is not None
                    or self.preblend_yh_scales_low is not None):
                yl, yh = wavelet_scaling(
                    yl, yh,
                    fallback(self.preblend_yl_scale_low, 1.0),
                    fallback(self.preblend_yh_scales_low, 1.0))
            yl, yh = wavelet_blend(
                (yl, yh), (yl_h, yh_h),
                yl_factor=self.yl_blend_high, yh_factor=self.yh_blend_high,
                blend_function=_resolve_blend(self.yl_blend_function),
                yh_blend_function=_resolve_blend(self.yh_blend_function))
        yl, yh = wavelet_scaling(yl, yh, self.yl_scale, self.yh_scales)
        result = wavelet.inverse(yl, yh, two_step_inverse=self.two_step_inverse)
        if need_flat:
            result = result.reshape(orig_shape)
        result = fix_output_frames(ctx, result)
        if result.shape != tuple(ctx.shape):
            result = result[tuple(slice(0, d) for d in ctx.shape)]
        return result, state


class WaveletFilteredNoise(NoiseItem):
    """Combinator wrapper over :class:`WaveletFilteredGenerator` with inner
    noise items (py/noise.py:1521-1593)."""

    MIN_DIMS = 4
    MAX_DIMS = 5

    def __init__(self, factor=1.0, *, noise=None, noise_high=None,
                 normalize_noise=False, normalize=None, **gen_kwargs):
        super().__init__(factor, normalize=normalize, noise=noise,
                         noise_high=noise_high, normalize_noise=normalize_noise,
                         gen_kwargs=dict(gen_kwargs))
        self._gen = WaveletFilteredGenerator(
            1.0, noise_sampler=noise, noise_sampler_high=noise_high, **gen_kwargs)

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
