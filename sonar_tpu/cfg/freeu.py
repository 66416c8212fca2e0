"""FreeU-Extreme: power-filtered scaling of UNet block activations
(reference: py/nodes/freeu_extreme.py).

TPU redesign: instead of ComfyUI ModelPatcher hooks, configs compile into
``block_patches`` for :func:`sonar_tpu.models.unet.unet_apply` — pure
functions over activations. The rfft filter surface is a static function of
(config, activation shape), built host-side once per compile (the
reference's runtime filter_cache, freeu_extreme.py:12-22, becomes XLA
constant folding); the sampling-percentage window is a traced select.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.blend import BLENDING_MODES
from ..noise.power import PowerFilter


def _ffilter_mode() -> str:
    """SONAR_TPU_FREEU_MATMUL: "1" (DEFAULT since round 4) collapses the
    whole spectral filter into ONE real MXU matmul at HIGHEST precision —
    numerically equal to the FFT composition (tests/test_cfg.py) and
    measured +3.34% config-4-style overhead at SDXL scale vs the FFT
    path's +5.89% (profiles/ANALYSIS.md §13). "0" keeps the explicit
    rfft2·gain·irfft2 composition; "fast" runs the matmul at DEFAULT
    precision (bf16 MXU inputs, +2.64%).

    Why a matmul: the config-4 decomposition (profiles/ANALYSIS.md §9)
    measured the filter floor at +5.1% and attributed it to data movement
    — the FFT ops can't fuse with their elementwise neighbours, so each
    of the ~9 stage-1 activations round-trips HBM several times with
    complex intermediates. But ``irfft2(rfft2(x)·F)`` is one STATIC real
    linear map per (shape, filter): precomputing K = response-to-basis on
    the host turns the filter into ``x_flat @ K`` — read x, read K, write
    y, zero intermediates, and the scale/blend epilogue fuses into the
    matmul. Gated to spatial ≤ 32×32 (K is (hw)² — 4 MB at 32², 64 MB at
    64² would bloat the program)."""
    return os.environ.get("SONAR_TPU_FREEU_MATMUL", "1")


_MATMUL_MAX_HW = 1024  # 32x32; K grows as (h*w)^2


def _ffilter_matrix(filt: np.ndarray, h: int, w: int) -> np.ndarray:
    """Dense (hw, hw) real operator with y_flat = x_flat @ K: row j is the
    filter's response to the j-th spatial basis image (float64 host FFTs,
    cast to f32 once)."""
    eye = np.eye(h * w, dtype=np.float64).reshape(h * w, h, w)
    spec = np.fft.rfft2(eye, norm="ortho") * np.asarray(filt, np.float64)
    return np.fft.irfft2(spec, s=(h, w), norm="ortho").reshape(
        h * w, h * w).astype(np.float32)


def ffilter(x, pfilter: PowerFilter, normalization_factor: float = 1.0):
    """rfft2 · filter · irfft2 in float32 (freeu_extreme.py:10-29), or the
    equivalent one-matmul operator (see :func:`_ffilter_mode`)."""
    filt = PowerFilter.normalize(
        pfilter.build(x.shape), x.shape,
        normalization_factor=normalization_factor,
    )
    h, w = x.shape[-2:]
    mode = _ffilter_mode()
    if mode != "0" and h * w <= _MATMUL_MAX_HW:
        k = jnp.asarray(_ffilter_matrix(filt, h, w))
        x32 = x.astype(jnp.float32).reshape(*x.shape[:-2], h * w)
        out = jnp.matmul(
            x32, k,
            precision=("highest" if mode != "fast" else "default"))
        return out.reshape(x.shape).astype(x.dtype)
    x32 = x.astype(jnp.float32)
    x_rfft = jnp.fft.rfft2(x32, norm="ortho")
    out = jnp.fft.irfft2(x_rfft * jnp.asarray(filt, jnp.float32),
                         s=x.shape[-2:], norm="ortho")
    return out.astype(x.dtype)


@dataclasses.dataclass
class FreeUExtremeConfig:
    """One filter rule (freeu_extreme.py:113-255). ``frux_config`` chains."""

    target: str = "backbone"  # backbone | skip | both
    stage_1: bool = True
    stage_2: bool = False
    stage_3: bool = False
    start: float = 0.0
    end: float = 1.0
    slice: float = 1.0
    slice_offset: float = 0.0
    filter_norm: float = 0.0
    scale: float = 1.0
    blend: float = 1.0
    blend_mode: str = "lerp"
    hidden_mean: bool = True
    final: bool = True
    sonar_power_filter: PowerFilter | None = None
    frux_config: "FreeUExtremeConfig | None" = None

    def get_config_list(self) -> list["FreeUExtremeConfig"]:
        result = [self]
        curr = self
        while (cfg := curr.frux_config) is not None:
            curr = cfg
            if (cfg.start >= 1 or cfg.end <= 0 or cfg.blend == 0
                    or not (cfg.stage_1 or cfg.stage_2 or cfg.stage_3)):
                continue
            result.append(cfg)
        result.reverse()
        return result

    def get_scale(self, h):
        """Scalar scale or FreeU-v2 hidden-mean per-pixel scale
        (freeu_extreme.py:187-197). ``h`` is NCHW."""
        if not self.hidden_mean:
            return self.scale
        hmean = jnp.mean(h, axis=1, keepdims=True)
        flat = hmean.reshape(hmean.shape[0], -1)
        hmax = jnp.max(flat, axis=-1).reshape(-1, 1, 1, 1)
        hmin = jnp.min(flat, axis=-1).reshape(-1, 1, 1, 1)
        hmean = (hmean - hmin) / jnp.where(hmax == hmin, 1.0, hmax - hmin)
        return 1.0 + (self.scale - 1.0) * hmean

    def stage_enabled(self, stage: int) -> bool:
        return bool(getattr(self, f"stage_{stage}"))

    def target_matches(self, is_skip: bool) -> bool:
        want = "skip" if is_skip else "backbone"
        return self.target in {want, "both"}

    def apply(self, x, apply_mask):
        """Filtered + scaled channel slice blended back
        (freeu_extreme.py:205-230); ``apply_mask`` is the traced scalar
        "this config matched" gate (pct window + not shadowed by an
        earlier matching ``final`` config — the handler computes it)."""
        features = x.shape[1]
        slice_size = int(features * self.slice)
        slice_offs = int(features * self.slice_offset)
        scale = self.get_scale(x)
        xs = x[:, slice_offs : slice_offs + slice_size]
        if self.sonar_power_filter is not None:
            filtered = ffilter(xs, self.sonar_power_filter,
                               normalization_factor=self.filter_norm)
        else:
            filtered = xs
        xslice = filtered * scale  # hidden-mean scale broadcasts over slice
        if self.blend != 1.0:
            xslice = BLENDING_MODES[self.blend_mode](xs, xslice, self.blend)
        new_x = x.at[:, slice_offs : slice_offs + slice_size].set(xslice)
        return jnp.where(apply_mask, new_x, x)


def _stage_of(channels: int, model_channels: int) -> int | None:
    return {model_channels * 4: 1, model_channels * 2: 2, model_channels: 3}.get(
        channels
    )


def make_freeu_patches(*, model_sampling, model_channels: int,
                       input_config: FreeUExtremeConfig | None = None,
                       middle_config: FreeUExtremeConfig | None = None,
                       output_config: FreeUExtremeConfig | None = None) -> dict:
    """Build ``block_patches`` for :func:`sonar_tpu.models.unet.unet_apply`
    (replaces FreeUExtremeNode's ModelPatcher installation,
    freeu_extreme.py:258-334). NHWC activations are transposed to NCHW for
    the stage/channel logic and back."""
    icfg = () if input_config is None else tuple(input_config.get_config_list())
    mcfg = () if middle_config is None else tuple(middle_config.get_config_list())
    ocfg = () if output_config is None else tuple(output_config.get_config_list())

    def handler(cfgs, x_nhwc, ctx, is_skip=False, stage_channels=None):
        x = jnp.transpose(x_nhwc, (0, 3, 1, 2))
        # the reference derives the skip tensor's stage from the BACKBONE
        # h's channel count, not hsp's own (freeu_extreme.py:311-313 passes
        # h.shape for both) — at channel-transition output blocks they differ
        stage = _stage_of(
            x.shape[1] if stage_channels is None else int(stage_channels),
            model_channels)
        if stage is None:
            return x_nhwc
        sigma = jnp.max(jnp.asarray(ctx["sigma"]))
        pct = 1.0 - model_sampling.timestep(sigma) / 999.0
        # Traced port of the reference's match loop
        # (freeu_extreme.py:199-203, 306-313): a config applies when its
        # pct window matches AND no earlier matching `final` config
        # shadowed it; an out-of-window `final` config does NOT stop the
        # scan (the reference only breaks after a *matched* final).
        shadowed = jnp.asarray(False)
        applied = False
        for cfg in cfgs:
            if not cfg.stage_enabled(stage) or not cfg.target_matches(is_skip):
                continue
            in_window = (pct >= cfg.start) & (pct <= cfg.end)
            x = cfg.apply(x, in_window & ~shadowed)
            applied = True
            if cfg.final:
                shadowed = shadowed | in_window
        if not applied:
            return x_nhwc
        return jnp.transpose(x, (0, 2, 3, 1))

    patches: dict[str, list[Callable]] = {}
    if icfg:
        patches["input"] = [lambda h, ctx: handler(icfg, h, ctx)]
    if mcfg:
        patches["middle"] = [lambda h, ctx: handler(mcfg, h, ctx)]
    if ocfg:
        patches["output"] = [
            lambda h, hsp, ctx: (
                handler(ocfg, h, ctx),
                handler(ocfg, hsp, ctx, is_skip=True,
                        stage_channels=h.shape[-1]),
            )
        ]
    return patches
