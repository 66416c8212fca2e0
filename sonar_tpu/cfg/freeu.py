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
    matmul. Dense K is gated to spatial ≤ 32×32 ((hw)² — 4 MB at 32²);
    beyond that the FFT path runs BY DEFAULT: the rank-decomposed factor
    pair (:func:`_ffilter_factors`, VERDICT r4 item 6) was measured
    SLOWER than FFT on chip at 64×64 stage-1 activations — fft/sep slope
    ratio 0.346 at HIGHEST, 0.620 at DEFAULT precision
    (tools/bench_ffilter64.py, profiles/ANALYSIS.md §18) — because the
    config-4 masks carry rank 24-28, putting the factored FLOPs at
    20-41× the FFT's. "sep"/"sep_fast" opt in to the factor path up to
    128×128 anyway (exactness tests keep it honest)."""
    return os.environ.get("SONAR_TPU_FREEU_MATMUL", "1")


_MATMUL_MAX_HW = 1024       # 32x32; dense K grows as (h*w)^2
_SEPARABLE_MAX_HW = 16384   # 128x128 cap for the OPT-IN "sep" mode
_SEPARABLE_MAX_RANK = 64    # beyond this the factored FLOPs lose to FFT


def _ffilter_matrix(filt: np.ndarray, h: int, w: int) -> np.ndarray:
    """Dense (hw, hw) real operator with y_flat = x_flat @ K: row j is the
    filter's response to the j-th spatial basis image (float64 host FFTs,
    cast to f32 once)."""
    eye = np.eye(h * w, dtype=np.float64).reshape(h * w, h, w)
    spec = np.fft.rfft2(eye, norm="ortho") * np.asarray(filt, np.float64)
    return np.fft.irfft2(spec, s=(h, w), norm="ortho").reshape(
        h * w, h * w).astype(np.float32)


def _ffilter_factors(filt: np.ndarray, h: int, w: int, tol: float = 1e-7):
    """Rank-decomposed spectral operator for spatial beyond the dense-K
    gate (VERDICT r4 item 6): ``y = sum_r A[r] @ x @ B[r]`` with real
    (h,h)/(w,w) factor pairs, EXACT (to rank truncation at f32 noise) for
    any mask.

    Derivation: a rank-1 mask u v^T separates the 2D spectral filter into
    an h-axis operator ``ifft . diag(u) . fft`` and a w-axis operator
    ``irfft . diag(v) . rfft``. The h-operator is real for h-symmetric u
    and imaginary for antisymmetric u; splitting the mask M = Ms + Ma
    into its symmetric/antisymmetric parts and SVD-ing each yields only
    those two cases, and the real-linear irfft lift gives the matching
    right factors B1 = Cw Pv + Sw Qv (symmetric) / B2 = Cw Qv - Sw Pv
    (antisymmetric). PowerFilter masks measure rank 6-34 at 1e-7 and are
    ~1e-4 asymmetric (the reference's off-center oversampling grid), so
    both branches matter for numerical equality with the FFT path.

    Returns (A, B) stacks of shape (R, h, h)/(R, w, w), or None when the
    total rank exceeds _SEPARABLE_MAX_RANK (FFT wins on FLOPs there)."""
    M = np.asarray(filt, np.float64)
    wr = M.shape[1]
    # spectral-basis responses (norm cancels between forward and inverse,
    # so the composite equals the ortho-normalized FFT path exactly)
    Fh = np.fft.fft(np.eye(h), axis=0)                 # columns: fft(e_j)
    RW = np.fft.rfft(np.eye(w), axis=1)                # rows: rfft(e_n)
    Cw, Sw = RW.real, RW.imag                          # (w, wr)
    P = np.fft.irfft(np.eye(wr), n=w, axis=1)          # (wr, w)
    Q = np.fft.irfft(1j * np.eye(wr), n=w, axis=1)     # (wr, w)
    flip = (-np.arange(h)) % h
    Ms = 0.5 * (M + M[flip])
    Ma = 0.5 * (M - M[flip])
    A_rows, B_rows = [], []
    scale = max(np.abs(M).max(), 1e-30)
    for part, anti in ((Ms, False), (Ma, True)):
        if np.abs(part).max() <= tol * scale:
            continue
        U, S, Vt = np.linalg.svd(part, full_matrices=False)
        keep = S > tol * max(S[0], tol * scale)
        for r in np.nonzero(keep)[0]:
            u, v = U[:, r] * S[r], Vt[r]
            A_c = np.fft.ifft(u[:, None] * Fh, axis=0)  # (h, h) complex
            Pv, Qv = v[:, None] * P, v[:, None] * Q
            if anti:
                # antisymmetric u: the h-operator is purely imaginary
                assert np.abs(A_c.real).max() < 1e-9 * (abs(S[0]) + 1)
                A_rows.append(A_c.imag)
                B_rows.append(Cw @ Qv - Sw @ Pv)
            else:
                assert np.abs(A_c.imag).max() < 1e-9 * (abs(S[0]) + 1)
                A_rows.append(A_c.real)
                B_rows.append(Cw @ Pv + Sw @ Qv)
    if not A_rows or len(A_rows) > _SEPARABLE_MAX_RANK:
        return None
    return (np.stack(A_rows).astype(np.float32),
            np.stack(B_rows).astype(np.float32))


def ffilter(x, pfilter: PowerFilter, normalization_factor: float = 1.0):
    """rfft2 · filter · irfft2 in float32 (freeu_extreme.py:10-29), or the
    equivalent one-matmul operator (see :func:`_ffilter_mode`)."""
    filt = PowerFilter.normalize(
        pfilter.build(x.shape), x.shape,
        normalization_factor=normalization_factor,
    )
    h, w = x.shape[-2:]
    mode = _ffilter_mode()
    fast = mode.endswith("fast")
    if mode != "0" and h * w <= _MATMUL_MAX_HW:
        k = jnp.asarray(_ffilter_matrix(filt, h, w))
        x32 = x.astype(jnp.float32).reshape(*x.shape[:-2], h * w)
        out = jnp.matmul(
            x32, k, precision=("default" if fast else "highest"))
        return out.reshape(x.shape).astype(x.dtype)
    if mode.startswith("sep") and h * w <= _SEPARABLE_MAX_HW:
        # OPT-IN beyond the dense-K gate: the rank-decomposed factor pair
        # keeps a zero-FFT, zero-complex-intermediate matmul chain up to
        # 128x128 — but the config-4 masks are rank 24-28, so it LOSES to
        # FFT on chip (ANALYSIS §18); default falls through to FFT
        factors = _ffilter_factors(filt, h, w)
        if factors is not None:
            A, B = (jnp.asarray(f) for f in factors)
            prec = "default" if fast else "highest"
            x32 = x.astype(jnp.float32)
            t = jnp.einsum("rij,...jk->r...ik", A, x32, precision=prec)
            out = jnp.einsum("r...ik,rkl->...il", t, B, precision=prec)
            return out.astype(x.dtype)
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
