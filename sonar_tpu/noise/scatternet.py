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

Channel layout is BAND-MAJOR, matching pytorch_wavelets: a layer's output
is ``(B, mult, C, H', W') → (B, mult·C, H', W')``, so ``output_offset``
windows (increment = C) select one scattering band across all input
channels — the semantics the reference's docs describe.

``scatternet_order == 2`` uses the TRUE second-order scattering layer
(pytorch_wavelets ScatLayerj2 semantics, not two stacked first-order
layers): level 1 with the biort bank, level 2 with the q-shift bank,
then the level-1 magnitudes are re-scattered through another level-1
layer. Output per input channel, band-major:
``[lowpass(scale 2), S1_j1 lowpassed (6), S1_j2 (6), S2 (36)]`` → ×49,
spatial ÷4. Other orders (negative / ≥3) stack |order| first-order
layers, as the reference's torch.nn.Sequential branch does
(py/noise_generation.py:2068-2073).

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


def _band_major(yl: jax.Array, mags: jax.Array) -> jax.Array:
    """Stack lowpass (B, C, H, W) + magnitudes (B, C, K, H, W) band-major:
    (B, 1+K, C, H', W') → (B, (1+K)·C, H', W') — pytorch_wavelets' ScatLayer
    layout (``Z = cat((ll[:, None], mags), dim=1)`` then ``view(b, 7c)``),
    cropped to the common spatial size."""
    b, c = yl.shape[:2]
    th = min(yl.shape[-2], mags.shape[-2])
    tw = min(yl.shape[-1], mags.shape[-1])
    mags_bm = jnp.moveaxis(mags[..., :th, :tw], 2, 1)  # (B, K, C, H', W')
    stacked = jnp.concatenate([yl[:, None, :, :th, :tw], mags_bm], axis=1)
    return stacked.reshape(b, -1, th, tw)


def scat_layer_dwt(x: jax.Array, *, wave: str = "db2", mode: str = "symmetric",
                   magbias: float = 1e-2) -> jax.Array:
    """One real-DWT scattering layer: (B, C, H, W) → (B, 4C, H', W').

    Lowpass passes through; the 3 oriented highpass bands become smooth
    magnitudes ``sqrt(h² + b²) − b`` (the ScatLayer biased magnitude).
    Band-major output: [lowpass·C, LH·C, HL·C, HH·C]."""
    w = get_wavelet(wave)
    yl, bands = _afb2d(x, w, mode)
    mags = jnp.sqrt(bands**2 + magbias**2) - magbias
    return _band_major(yl, mags)


def scat_layer_dtcwt(x: jax.Array, *, biort: str = "near_sym_a",
                     qshift: str = "qshift_a",
                     magbias: float = 1e-2) -> jax.Array:
    """One dual-tree scattering layer: (B, C, H, W) → (B, 7C, H/2, W/2) —
    the pytorch_wavelets ScatLayer semantics: averaged lowpass + the 6
    oriented complex magnitudes ``sqrt(re²+im²+b²) − b``, band-major."""
    from ..wavelets.dtcwt import dtcwt2d

    yls, yhs = dtcwt2d(x, level=1, biort=biort, qshift=qshift)
    yl = sum(yls) / 4.0
    z = yhs[0]  # (B, C, 6, H', W') complex
    mags = jnp.sqrt(jnp.real(z) ** 2 + jnp.imag(z) ** 2 + magbias**2) - magbias
    return _band_major(yl, mags)


def _crop_to(a: jax.Array, h: int, w: int) -> jax.Array:
    return a[..., :h, :w]


def scat_layer_j2(x: jax.Array, *, biort: str = "near_sym_a",
                  qshift: str = "qshift_a",
                  magbias: float = 1e-2) -> jax.Array:
    """True second-order dual-tree scattering (pytorch_wavelets ScatLayerj2
    semantics, scatternet/lowlevel.py ScatLayerj2_f): (B, C, H, W) →
    (B, 49C, H/4, W/4).

    Structure (band-major, per input channel):

    1. two DTCWT levels — level 1 biort, level 2 q-shift — give the scale-2
       lowpass ``s0`` (H/4), first-order magnitudes ``S1_j1`` (6, H/2) and
       ``S1_j2`` (6, H/4);
    2. ``S1_j1`` (as a 6C-channel image) is re-scattered through one more
       level-1 layer: its lowpass is the scale-2 version of ``S1_j1``
       (ptwav's ``avg_pool2d``; here the decimated tree-averaged lowpass),
       its 6 oriented magnitudes are the second-order ``S2`` (36, ordered
       [new band, old band, channel] as ptwav's ``view(b, 36, c)``);
    3. output channels: ``[s0, S1_j1@2 (6), S1_j2 (6), S2 (36)]``.
    """
    from ..wavelets.dtcwt import dtcwt2d

    b, c = x.shape[:2]

    def mag(z):
        return jnp.sqrt(
            jnp.real(z) ** 2 + jnp.imag(z) ** 2 + magbias**2) - magbias

    yls, yhs = dtcwt2d(x, level=2, biort=biort, qshift=qshift)
    s0 = sum(yls) / 4.0                       # (B, C, H/4, W/4)
    s1_j1 = mag(yhs[0])                       # (B, C, 6, H/2, W/2)
    s1_j2 = mag(yhs[1])                       # (B, C, 6, H/4, W/4)

    # Second order: re-scatter the level-1 magnitudes, band-major channels
    # [old band, input channel] (ptwav: s1_j1.view(b, 6*c, r//2, c//2)).
    p = jnp.moveaxis(s1_j1, 2, 1).reshape(b, 6 * c, *s1_j1.shape[-2:])
    yls2, yhs2 = dtcwt2d(p, level=1, biort=biort, qshift=qshift)
    s1_j1_lp = sum(yls2) / 4.0                # (B, 6C, H/4, W/4)
    z2 = mag(yhs2[0])                         # (B, 6C, 6new, H/4, W/4)
    s2 = jnp.moveaxis(z2, 2, 1)               # (B, 6new, 6C, H/4, W/4)

    th = min(s0.shape[-2], s1_j2.shape[-2], s1_j1_lp.shape[-2], s2.shape[-2])
    tw = min(s0.shape[-1], s1_j2.shape[-1], s1_j1_lp.shape[-1], s2.shape[-1])
    parts = [
        _crop_to(s0, th, tw).reshape(b, 1, c, th, tw),
        _crop_to(s1_j1_lp, th, tw).reshape(b, 6, c, th, tw),
        jnp.moveaxis(_crop_to(s1_j2, th, tw), 2, 1),
        _crop_to(s2, th, tw).reshape(b, 36, c, th, tw),
    ]
    return jnp.concatenate(parts, axis=1).reshape(b, 49 * c, th, tw)


def scat_layer_j2_dwt(x: jax.Array, *, wave: str = "db2",
                      mode: str = "symmetric",
                      magbias: float = 1e-2) -> jax.Array:
    """Second-order scattering over the real-DWT backend (our extension —
    the reference only has the dual-tree ScatLayerj2): same structure as
    :func:`scat_layer_j2` with 3 oriented bands per level →
    (B, 16C, ~H/4, ~W/4), channels ``[s0, S1_j1@2 (3), S1_j2 (3), S2 (9)]``.
    """
    w = get_wavelet(wave)
    b, c = x.shape[:2]
    yl1, bands1 = _afb2d(x, w, mode)
    s1_j1 = jnp.sqrt(bands1**2 + magbias**2) - magbias   # (B, C, 3, H/2, W/2)
    s0, bands2 = _afb2d(yl1, w, mode)
    s1_j2 = jnp.sqrt(bands2**2 + magbias**2) - magbias   # (B, C, 3, H/4, W/4)

    p = jnp.moveaxis(s1_j1, 2, 1).reshape(b, 3 * c, *s1_j1.shape[-2:])
    s1_j1_lp, bands2b = _afb2d(p, w, mode)               # (B, 3C, H/4, W/4)
    z2 = jnp.sqrt(bands2b**2 + magbias**2) - magbias     # (B, 3C, 3, ...)
    s2 = jnp.moveaxis(z2, 2, 1)                          # (B, 3new, 3C, ...)

    th = min(s0.shape[-2], s1_j2.shape[-2], s1_j1_lp.shape[-2], s2.shape[-2])
    tw = min(s0.shape[-1], s1_j2.shape[-1], s1_j1_lp.shape[-1], s2.shape[-1])
    parts = [
        _crop_to(s0, th, tw).reshape(b, 1, c, th, tw),
        _crop_to(s1_j1_lp, th, tw).reshape(b, 3, c, th, tw),
        jnp.moveaxis(_crop_to(s1_j2, th, tw), 2, 1),
        _crop_to(s2, th, tw).reshape(b, 9, c, th, tw),
    ]
    return jnp.concatenate(parts, axis=1).reshape(b, 16 * c, th, tw)


class ScatternetFilteredGenerator(Generator):
    name = "scatternetfilter"
    MIN_DIMS = 4
    MAX_DIMS = 4

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

    def _banks(self):
        """Bank names, honoring use_symmetric_filter exactly as the
        reference does (py/noise_generation.py:2056-2063: biort →
        near_sym_b_bp always; qshift → qshift_b_bp for the j2 layer)."""
        biort = "near_sym_b_bp" if self.use_symmetric_filter else self.biort
        qshift = "qshift_b_bp" if self.use_symmetric_filter else self.qshift
        return biort, qshift

    def _scatter(self, x):
        biort, qshift = self._banks()
        if self.scatternet_order == 2:
            if self.wavelet_backend == "dtcwt":
                return scat_layer_j2(x, biort=biort, qshift=qshift,
                                     magbias=self.magbias)
            return scat_layer_j2_dwt(x, wave=self.wave, mode=self.mode,
                                     magbias=self.magbias)
        for _ in range(max(1, abs(self.scatternet_order))):
            if self.wavelet_backend == "dtcwt":
                x = scat_layer_dtcwt(x, biort=biort, qshift=qshift,
                                     magbias=self.magbias)
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
        if self.per_channel_scatternet:
            # torch's squeeze(dim=2) is a no-op on a non-unit axis (flat
            # modes keep initial_size there); match that instead of erroring
            if out.ndim > 2 and out.shape[2] == 1:
                out = jnp.squeeze(out, 2)
            out = jnp.moveaxis(out, 0, 1)
        else:
            out = out[0]
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
