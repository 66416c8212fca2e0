"""Wavelet CFG: per-frequency-band, per-orientation CFG scales with
schedulable interpolation (reference: py/wavelet_cfg.py, 842 LoC).

TPU redesign vs the reference:

- Rule selection (first sigma-window match, py/wavelet_cfg.py:602-610) is a
  traced ``lax.switch`` over static rules + a fallback branch, so a rule set
  compiles into the sampling ``lax.scan`` with zero host syncs (the
  reference does ``sigma.max().item()`` per model call).
- Schedule interpolation (linear/log/exp/half_cosine/sine) and percentage
  machinery run on traced scalars.
- ``high_precision_mode`` maps to float64 only when jax_enable_x64 is on;
  otherwise float32 (documented divergence — TPUs have no f64 ALUs).
- ``sample_sigmas`` (the step table) is static per run; step-percentage
  modes use the traced fractional-step helper.

Config objects keep the reference's YAML key names (SURVEY §5.6) so rule
documents port verbatim.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.blend import BLENDING_MODES
from ..utils.misc import clamp_float, fallback, filter_dict, step_from_sigmas_traced
from ..wavelets import Wavelet, expand_yh_scales

# ---------------------------------------------------------------------------
# Schedules
# ---------------------------------------------------------------------------

_SCHEDULES = ("linear", "logarithmic", "log", "exponential", "exp",
              "half_cosine", "sine", "sin")


def _clamp01(v):
    return jnp.clip(v, 0.0, 1.0)


def schedule_interp(name: str, val):
    """py/wavelet_cfg.py:42-57 on traced scalars."""
    val = _clamp01(val)
    name = name.lower()
    if name == "linear":
        return val
    if name in ("logarithmic", "log"):
        out = jnp.where(val == 0, 0.0, jnp.log(jnp.maximum(val, 1e-30)) + 1.0)
    elif name in ("exponential", "exp"):
        out = jnp.exp(val) - 1.0
    elif name == "half_cosine":
        out = 1.0 - (1.0 + jnp.cos(val * math.pi)) / 2.0
    elif name in ("sine", "sin"):
        out = jnp.sin(val * math.pi)
    else:
        raise ValueError("Bad interpolation schedule!?")
    return _clamp01(out)


_SCHED_MODE_ALIASES = {
    "sampling": "sampling", "model_sampling": "sampling",
    "enabled_sampling": "enabled_sampling",
    "enabled_model_sampling": "enabled_sampling",
    "sigmas": "sigmas", "sigma_range": "sigmas",
    "enabled_sigmas": "enabled_sigmas", "enabled_sigma_range": "enabled_sigmas",
    "step": "steps", "steps": "steps", "enabled_steps": "enabled_steps",
}


# ---------------------------------------------------------------------------
# Percentages (py/wavelet_cfg.py:81-211) — traced scalars
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class WCFGPercentages:
    pct_sampling: Any
    pct_enabled_sampling: Any
    pct_sigmas: Any = None
    pct_enabled_sigmas: Any = None
    pct_steps: Any = None
    pct_enabled_steps: Any = None

    def invert(self) -> "WCFGPercentages":
        inv = lambda v: None if v is None else 1.0 - v  # noqa: E731
        return WCFGPercentages(
            pct_sampling=1.0 - self.pct_sampling,
            pct_enabled_sampling=1.0 - self.pct_enabled_sampling,
            pct_sigmas=inv(self.pct_sigmas),
            pct_enabled_sigmas=inv(self.pct_enabled_sigmas),
            pct_steps=inv(self.pct_steps),
            pct_enabled_steps=inv(self.pct_enabled_steps),
        )

    def pct_from_schedmode(self, mode: str):
        mode = _SCHED_MODE_ALIASES[mode.lower()]
        val = getattr(self, f"pct_{mode}")
        if val is None:
            raise RuntimeError(f"Percentage for schedule mode {mode!r} not available")
        return val

    @classmethod
    def build(cls, *, ms, start_sigma: float, end_sigma: float, sigma,
              sigmas: np.ndarray | None) -> "WCFGPercentages":
        # trace-safety: lax.switch traces EVERY rule branch, so this must
        # not raise for rules that never match. Normalize the negative
        # start_sigma "model max" shorthand (match_index honors it), and
        # swap a genuinely misordered window — such a rule can never match
        # (end <= sigma <= start is unsatisfiable), so its branch values
        # are dead; the reference never even builds them (first-match +
        # lazy percentages, py/wavelet_cfg.py:796-808).
        if start_sigma < 0:
            start_sigma = math.inf
        if start_sigma < end_sigma:
            start_sigma, end_sigma = end_sigma, start_sigma
        sigma_max, sigma_min = float(ms.sigma_max), float(ms.sigma_min)
        start_sigma = min(sigma_max, start_sigma)
        end_sigma = min(max(sigma_min, end_sigma), sigma_max)
        sigma = jnp.clip(jnp.asarray(sigma), sigma_min, sigma_max)
        pct_start = 1.0 - jnp.clip(ms.timestep(jnp.asarray(start_sigma)) / 999, 0, 1)
        pct_end = 1.0 - jnp.clip(ms.timestep(jnp.asarray(end_sigma)) / 999, 0, 1)
        pct_curr = 1.0 - jnp.clip(ms.timestep(sigma) / 999, 0, 1)
        denom = jnp.where(pct_end == pct_start, 1.0, pct_end - pct_start)
        pct_range_curr = (pct_curr - pct_start) / denom
        kw = {}
        if sigmas is not None:
            sigmas = np.asarray(sigmas, np.float64)
            if sigmas.ndim == 2:
                sigmas = sigmas.max(axis=0)
            elif sigmas.ndim != 1:
                raise ValueError("Unexpected number of dimensions for sample_sigmas")
            sigma_first, sigma_last = float(sigmas[0]), float(sigmas[-2])
            if sigma_first <= sigma_last:
                raise ValueError(
                    "Cannot handle non-descending sigmas (possibly Restart or unsampling)"
                )
            kw["pct_sigmas"] = (sigma_first - sigma) / (sigma_first - sigma_last)
            start_sigma = min(start_sigma, sigma_first)
            end_sigma = max(end_sigma, sigma_last)
            sigma_c = jnp.clip(sigma, sigma_last, sigma_first)
            if start_sigma == end_sigma:
                kw["pct_enabled_sigmas"] = jnp.asarray(1.0)
            else:
                kw["pct_enabled_sigmas"] = (start_sigma - sigma_c) / (
                    start_sigma - end_sigma
                )
            steps = len(sigmas) - 1
            if steps > 1 and np.any(np.round(sigmas[:-1], 4) <= 0):
                # non-positive INTERIOR sigma (e.g. a duplicated trailing 0
                # from some ComfyUI graphs): the step is undeterminable for
                # EVERY sigma — host-decidable, so leave pct_steps None and
                # let pct_from_schedmode raise the reference's
                # "not available" RuntimeError (py/utils.py:682-721 returns
                # None → py/wavelet_cfg.py:123 raises) instead of feeding
                # NaN through the scheduled scales. (Raise happens at trace
                # time for ANY steps-mode rule, vs the reference's lazy
                # raise on the matched rule only — stricter, never silent.)
                pass
            elif steps > 1:
                step, valid = step_from_sigmas_traced(
                    sigma_c.astype(jnp.float32),
                    jnp.asarray(sigmas, jnp.float32))
                # residual traced-only invalidity (rounding edge cases):
                # an undetermined step becomes NaN, which surfaces in the
                # scheduled values instead of silently feeding garbage
                step = jnp.where(valid, step.astype(jnp.float32), jnp.nan)
                kw["pct_steps"] = step / (steps - 1)
                enabled = np.arange(len(sigmas))[
                    (sigmas <= start_sigma) & (sigmas >= end_sigma)
                ]
                if len(enabled) > 1:
                    first, last = int(enabled[0]), int(enabled[-1])
                    kw["pct_enabled_steps"] = (step - first) / (last - first)
            else:
                kw["pct_steps"] = jnp.asarray(1.0)
        return cls(pct_sampling=pct_curr, pct_enabled_sampling=pct_range_curr, **kw)


# ---------------------------------------------------------------------------
# Scales + schedules (py/wavelet_cfg.py:215-465)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class WCFGScheduledScale:
    schedule: str = "linear"
    schedule_mode: str = "enabled_sampling"
    schedule_offset: float = 0.0
    schedule_offset_after: float = 0.0
    schedule_multiplier: float = 1.0
    schedule_multiplier_after: float = 1.0
    reverse_schedule: bool = False
    reverse_schedule_after: bool = False
    schedule_min: float = 0.0
    schedule_max: float = 1.0

    @classmethod
    def build(cls, **kwargs) -> "WCFGScheduledScale":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**filter_dict(kwargs, fields))

    def get_b_scale(self, pcts: WCFGPercentages):
        if self.reverse_schedule:
            pcts = pcts.invert()
        pct = pcts.pct_from_schedmode(self.schedule_mode)
        pct = jnp.clip(
            (
                schedule_interp(
                    self.schedule,
                    _clamp01((pct + self.schedule_offset) * self.schedule_multiplier),
                )
                + self.schedule_offset_after
            )
            * self.schedule_multiplier_after,
            clamp_float(self.schedule_min),
            clamp_float(self.schedule_max),
        )
        if self.reverse_schedule_after:
            pct = _clamp01(1.0 - pct)
        return pct


@dataclasses.dataclass(frozen=True)
class WCFGScales:
    yl_scale: Any = 1.0
    yh_scales: Any = 1.0

    def get_scales(self, *_a, **_kw) -> "WCFGScales":
        return self


@dataclasses.dataclass(frozen=True)
class WCFGScalesRange:
    scales_start: WCFGScales = WCFGScales()
    scales_end: WCFGScales | None = None
    scheduler: WCFGScheduledScale | None = None
    blend_mode: str = "lerp"

    @classmethod
    def build(cls, **kwargs):
        scales_start = kwargs.pop("scales_start", None)
        if scales_start is None:
            scales_start = {
                "yl_scale": kwargs.pop("yl_scale", 1.0),
                "yh_scales": kwargs.pop("yh_scales", 1.0),
            }
        scales_end = filter_dict(kwargs.pop("scales_end", {}) or {},
                                 ("yl_scale", "yh_scales"))
        if not scales_end or scales_end == scales_start:
            return WCFGScales(
                yl_scale=scales_start.get("yl_scale", 1.0),
                yh_scales=scales_start.get("yh_scales", 1.0),
            )
        return cls(
            scales_start=WCFGScales(**scales_start),
            scales_end=WCFGScales(**scales_end),
            scheduler=WCFGScheduledScale.build(**kwargs),
            blend_mode=kwargs.pop("blend_mode", "lerp"),
        )

    def get_scales(self, pcts: WCFGPercentages, yh) -> WCFGScales:
        if self.scales_end is None or self.scheduler is None:
            return self.scales_start
        pct = self.scheduler.get_b_scale(pcts)
        start_yh = expand_yh_scales(yh, yh_scales=self.scales_start.yh_scales)
        end_yh = expand_yh_scales(yh, yh_scales=self.scales_end.yh_scales)
        blend = (
            (lambda a, b, t: a * (1.0 - t) + b * t)
            if self.blend_mode == "lerp"
            else BLENDING_MODES[self.blend_mode]
        )
        yl = blend(jnp.asarray(self.scales_start.yl_scale),
                   jnp.asarray(self.scales_end.yl_scale), pct)
        yh_scales = tuple(
            tuple(blend(jnp.asarray(os), jnp.asarray(oe), pct)
                  for os, oe in zip(bs, be))
            for bs, be in zip(start_yh, end_yh)
        )
        return WCFGScales(yl_scale=yl, yh_scales=yh_scales)


def apply_wcfg_scales(scales: WCFGScales, yl, yh):
    """wavelet_scaling with possibly-traced per-band/per-orientation scales."""
    yl_scale = scales.yl_scale
    yl = yl * yl_scale if not (isinstance(yl_scale, (int, float)) and yl_scale == 1.0) else yl
    spec = expand_yh_scales(yh, yh_scales=fallback(scales.yh_scales, 1.0))
    out = []
    for hs, ht in zip(spec, yh):
        if isinstance(hs, (int, float)):
            out.append(ht * hs)
        elif ht.ndim > 3:
            ol = min(ht.shape[2], len(hs))
            vec = jnp.stack(
                [jnp.asarray(v, ht.dtype) for v in hs[:ol]]
                + [jnp.asarray(1.0, ht.dtype)] * (ht.shape[2] - ol)
            )
            out.append(ht * vec.reshape((1, 1, -1) + (1,) * (ht.ndim - 3)))
        else:
            out.append(ht * jnp.asarray(hs[0], ht.dtype))
    out.extend(yh[len(out):])
    return yl, tuple(out)


@dataclasses.dataclass(frozen=True)
class WCFGScheduledFloat:
    value_start: float = 1.0
    value_end: float | None = None
    scheduler: WCFGScheduledScale | None = None

    @classmethod
    def build(cls, val) -> "WCFGScheduledFloat":
        if isinstance(val, (float, int)):
            return cls(value_start=float(val))
        if not isinstance(val, dict):
            raise TypeError("Bad type for scheduled float value")
        val = dict(val)
        value_start = val.pop("value_start", None)
        value_end = val.pop("value_end", None)
        if not isinstance(value_start, (float, int)):
            raise TypeError("Bad type for scheduled float start_value")
        if value_end is None:
            return cls(value_start=float(value_start))
        return cls(value_start=float(value_start), value_end=float(value_end),
                   scheduler=WCFGScheduledScale.build(**val))

    @property
    def is_static(self) -> bool:
        return self.value_end is None or self.scheduler is None

    def get_value(self, pcts: WCFGPercentages):
        if self.is_static:
            return self.value_start
        pct = self.scheduler.get_b_scale(pcts)
        return (1.0 - pct) * self.value_start + pct * self.value_end


# ---------------------------------------------------------------------------
# Rules (py/wavelet_cfg.py:468-618)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class WCFGWaveletSettings:
    wave: str = "db4"
    level: int = 5
    padding_mode: str = "symmetric"
    use_1d_dwt: bool = False
    use_dtcwt: bool = False
    biort: str = "near_sym_a"
    qshift: str = "qshift_a"
    inv_wave: str | None = None
    inv_padding_mode: str | None = None
    inv_biort: str | None = None
    inv_qshift: str | None = None

    @classmethod
    def build(cls, **kwargs):
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**filter_dict(kwargs, fields))

    def make_wavelet(self) -> Wavelet:
        return Wavelet(
            wave=self.wave, level=self.level, mode=self.padding_mode,
            use_1d_dwt=self.use_1d_dwt, use_dtcwt=self.use_dtcwt,
            biort=self.biort, qshift=self.qshift,
            inv_wave=self.inv_wave, inv_mode=self.inv_padding_mode,
            inv_biort=self.inv_biort, inv_qshift=self.inv_qshift,
        )


_TARGETS = ("denoised", "noise", "noise_norm")


@dataclasses.dataclass(frozen=True)
class WCFGRule:
    start_sigma: float = math.inf
    end_sigma: float = 0.0
    verbose: bool = False
    blend_mode: str = "lerp"
    blend_strength: WCFGScheduledFloat = WCFGScheduledFloat(1.0)
    fallback_existing: bool = True
    target_mode: str = "denoised"
    diff: Any = None
    cond: Any = None
    uncond: Any = None
    final: Any = None
    wavelet: WCFGWaveletSettings = WCFGWaveletSettings()
    high_precision_mode: bool = True
    difference_blend_mode: str = "inject"
    difference_blend_strength: WCFGScheduledFloat = WCFGScheduledFloat(1.0)

    @classmethod
    def build(cls, **kwargs) -> "WCFGRule":
        target_mode = str(kwargs.pop("target_mode", "denoised")).lower()
        if target_mode not in _TARGETS:
            raise ValueError("Bad target mode")
        diff = kwargs.pop("diff", None) or kwargs.pop("difference", None)
        parts = {
            name: (None if val is None else WCFGScalesRange.build(**val))
            for name, val in (
                ("diff", diff),
                ("cond", kwargs.pop("cond", None)),
                ("uncond", kwargs.pop("uncond", None)),
                ("final", kwargs.pop("final", None)),
            )
        }
        bs = kwargs.pop("blend_strength", 1.0)
        dbs = kwargs.pop("difference_blend_strength", 1.0)
        fields = {f.name for f in dataclasses.fields(cls)} - {
            "target_mode", "diff", "cond", "uncond", "final", "wavelet",
            "blend_strength", "difference_blend_strength",
        }
        return cls(
            target_mode=target_mode,
            blend_strength=WCFGScheduledFloat.build(bs),
            difference_blend_strength=WCFGScheduledFloat.build(dbs),
            wavelet=WCFGWaveletSettings.build(**kwargs),
            **parts,
            **filter_dict(kwargs, fields),
        )


@dataclasses.dataclass(frozen=True)
class WCFGRules:
    rules: tuple = ()

    def __len__(self):
        return len(self.rules)

    def __getitem__(self, i):
        return self.rules[i]

    def __bool__(self):
        return bool(self.rules)

    @classmethod
    def build(cls, **params) -> "WCFGRules":
        params = dict(params)
        extra = params.pop("rules", ())
        first = WCFGRule.build(**params)
        return cls(rules=(first, *(WCFGRule.build(**p) for p in extra)))

    def match_index(self, sigma):
        """Traced first-match index; len(rules) = no match (fallback)."""
        idx = jnp.asarray(len(self.rules), jnp.int32)
        for i in reversed(range(len(self.rules))):
            r = self.rules[i]
            hi = math.inf if r.start_sigma < 0 else r.start_sigma
            hit = (r.end_sigma <= sigma) & (sigma <= hi)
            idx = jnp.where(hit, jnp.int32(i), idx)
        return idx


# ---------------------------------------------------------------------------
# The CFG function (py/wavelet_cfg.py:631-842)
# ---------------------------------------------------------------------------


def _emit_verbose_dump(rule, pcts, wcfg_blend, dbs, verbose_scales):
    """The reference's per-step rule dump (py/wavelet_cfg.py:225, 364-401):
    resolved schedule percentages, blend strengths, and per-part yl/yh
    scales. Values are traced, so the dump rides ``jax.debug.callback`` and
    lands on :func:`sonar_tpu.utils.profiling.verbose_writer` (pluggable via
    ``set_verbose_sink``) — works under jit and lax.switch."""
    from ..utils.profiling import verbose_writer

    def _host_dump(pct_sampling, pct_enabled, blend, dbs_v, scales):
        verbose_writer(
            "WCFG: rule "
            f"[{rule.start_sigma:g}, {rule.end_sigma:g}] "
            f"pct_sampling={float(np.asarray(pct_sampling)):.4f} "
            f"pct_enabled={float(np.asarray(pct_enabled)):.4f} "
            f"blend={float(np.asarray(blend)):.4f} "
            f"difference_blend={float(np.asarray(dbs_v)):.4f}"
        )
        for name, (yl, yh) in scales.items():
            yh_list = jax.tree.map(lambda a: np.asarray(a).tolist(), yh)
            verbose_writer(
                f"WCFG:   {name}: yl_scale={np.asarray(yl).tolist()} "
                f"yh_scales={yh_list}"
            )

    jax.debug.callback(
        _host_dump,
        jnp.asarray(pcts.pct_sampling, jnp.float32),
        jnp.asarray(pcts.pct_enabled_sampling, jnp.float32),
        jnp.asarray(wcfg_blend, jnp.float32),
        jnp.asarray(dbs, jnp.float32),
        verbose_scales,
    )


def basic_cfg(args: dict):
    """x − (uncond + (cond−uncond)·scale) (py/wavelet_cfg.py:656-660)."""
    x, scale = args["input"], args["cond_scale"]
    uncond, cond = args["uncond_denoised"], args["cond_denoised"]
    return x - (uncond + (cond - uncond) * scale)


def _eff_dtype(high_precision: bool, dtype):
    if high_precision and jax.config.read("jax_enable_x64"):
        return jnp.float64
    return jnp.promote_types(dtype, jnp.float32)


class WaveletCFG:
    """Drop-in CFG function: call with the ComfyUI-style args dict
    (input/sigma/cond/uncond/cond_denoised/uncond_denoised/cond_scale) plus
    ``model_sampling`` and optional static ``sample_sigmas``."""

    def __init__(self, *, rules: WCFGRules, existing_cfg: Callable | None = None,
                 operation_cond=None, operation_uncond=None,
                 operation_fallback_cfg=None, operation_wavelet_cfg=None,
                 operation_result=None):
        self.rules = rules
        self.fallback_cfg_function = (
            existing_cfg
            if existing_cfg is not None and (not rules or rules[0].fallback_existing)
            else basic_cfg
        )
        self.operation_cond = operation_cond
        self.operation_uncond = operation_uncond
        self.operation_fallback_cfg = operation_fallback_cfg
        self.operation_wavelet_cfg = operation_wavelet_cfg
        self.operation_result = operation_result

    @staticmethod
    def _maybe_op(t, mop, **kwargs):
        # plain (non-extended) LATENT_OPERATION callables take latent only,
        # like the reference's maybe_op (py/wavelet_cfg.py:663-675)
        if mop is None:
            return t
        if getattr(mop, "EXTENDED_LATENT_OPERATION", False):
            return mop(latent=t, **kwargs)
        return mop(latent=t)

    def _rule_branch(self, rule: WCFGRule, args: dict, ms, sample_sigmas):
        x = args["input"]
        sigma = jnp.asarray(args["sigma"])
        sigma_f = jnp.max(sigma)
        pcts = WCFGPercentages.build(
            ms=ms, start_sigma=rule.start_sigma, end_sigma=rule.end_sigma,
            sigma=sigma_f, sigmas=sample_sigmas)
        blend_function = BLENDING_MODES[rule.blend_mode]
        wcfg_blend = rule.blend_strength.get_value(pcts)
        static_blend = rule.blend_strength.is_static

        # -- context (py/wavelet_cfg.py:677-727) --------------------------------
        if x.ndim == 3 and not rule.wavelet.use_1d_dwt:
            raise RuntimeError("Enable use_1d_dwt mode for 3D latents.")
        if x.ndim < 3:
            raise RuntimeError(
                "Wavelet CFG can't handle latents with 2 or less dimensions.")
        sigma_b = sigma.reshape((-1,) + (1,) * (x.ndim - 1)) if sigma.ndim < x.ndim \
            else sigma
        if rule.target_mode in ("noise", "noise_norm"):
            cond, uncond = args["cond"], args["uncond"]
            if rule.target_mode == "noise_norm":
                cond, uncond = cond / sigma_b, uncond / sigma_b
        else:
            cond, uncond = args["cond_denoised"], args["uncond_denoised"]
        op_kwargs = {
            "sigma": sigma, "cond": cond, "uncond": uncond,
            "cond_scale": args.get("cond_scale"), "raw_args": args,
        }
        cond = self._maybe_op(cond, self.operation_cond, **op_kwargs)
        uncond = self._maybe_op(uncond, self.operation_uncond, **op_kwargs)
        dt = _eff_dtype(rule.high_precision_mode, x.dtype)
        wavelet = rule.wavelet.make_wavelet()
        if rule.wavelet.use_1d_dwt:
            cond2 = cond.reshape(cond.shape[0], cond.shape[1], -1)
            uncond2 = uncond.reshape(cond2.shape)
        elif x.ndim > 4:
            cond2 = cond.reshape(cond.shape[0], -1, *cond.shape[-2:])
            uncond2 = uncond.reshape(cond2.shape)
        else:
            cond2, uncond2 = cond, uncond

        # -- wavelet cfg core (py/wavelet_cfg.py:749-791) -----------------------
        verbose_scales: dict = {}

        def _resolve(name, scales_range, yh):
            scales = scales_range.get_scales(pcts, yh)
            if rule.verbose:
                verbose_scales[name] = (
                    jnp.asarray(scales.yl_scale, jnp.float32),
                    jax.tree.map(lambda v: jnp.asarray(v, jnp.float32),
                                 scales.yh_scales),
                )
            return scales

        diff_blend = BLENDING_MODES[rule.difference_blend_mode]
        condw = wavelet.forward(cond2.astype(dt))
        uncondw = wavelet.forward(uncond2.astype(dt))
        if rule.cond is not None:
            condw = apply_wcfg_scales(_resolve("cond", rule.cond, condw[1]), *condw)
        if rule.uncond is not None:
            uncondw = apply_wcfg_scales(
                _resolve("uncond", rule.uncond, uncondw[1]), *uncondw)
        diffw = (condw[0] - uncondw[0],
                 tuple(a - b for a, b in zip(condw[1], uncondw[1])))
        if rule.diff is not None:
            diffw = apply_wcfg_scales(_resolve("diff", rule.diff, diffw[1]), *diffw)
        dbs = rule.difference_blend_strength.get_value(pcts)
        resultw = (diff_blend(uncondw[0], diffw[0], dbs),
                   tuple(diff_blend(u, d, dbs) for u, d in zip(uncondw[1], diffw[1])))
        if rule.final is not None:
            resultw = apply_wcfg_scales(_resolve("final", rule.final, resultw[1]),
                                        *resultw)
        if rule.verbose:
            _emit_verbose_dump(rule, pcts, wcfg_blend, dbs, verbose_scales)
        result = wavelet.inverse(*resultw, out_shape=cond2.shape).astype(x.dtype)

        # -- blend with the fallback CFG (py/wavelet_cfg.py:820-836) ------------
        need_fallback = rule.blend_mode != "lerp" or not static_blend or (
            static_blend and rule.blend_strength.value_start != 1.0)
        if need_fallback:
            normal = self._maybe_op(self.fallback_cfg_function(args),
                                    self.operation_fallback_cfg, **op_kwargs)
            if rule.target_mode == "denoised":
                normal = x - normal
            elif rule.target_mode == "noise_norm":
                normal = normal / sigma_b
            normal2 = normal.reshape(cond2.shape) if normal.shape != cond2.shape \
                else normal
            result = blend_function(normal2, result, wcfg_blend)

        # -- process output (py/wavelet_cfg.py:729-747) -------------------------
        if rule.wavelet.use_1d_dwt:
            result = result[..., : cond2.shape[2]].reshape(x.shape)
        elif x.ndim > 4:
            result = result[..., : x.shape[-2], : x.shape[-1]].reshape(x.shape)
        else:
            result = result[tuple(slice(None, s) for s in x.shape)]
        if rule.target_mode == "denoised":
            result = x - result
        elif rule.target_mode == "noise_norm":
            result = result * sigma_b
        result = self._maybe_op(result, self.operation_wavelet_cfg, **op_kwargs)
        return self._maybe_op(result, self.operation_result, **op_kwargs)

    def __call__(self, args: dict):
        ms = args.get("model_sampling")
        sample_sigmas = args.get("sample_sigmas")
        if ms is None:
            from .model_sampling import ContinuousEDM

            ms = ContinuousEDM()
        if not self.rules:
            return self.fallback_cfg_function(args)
        sigma_f = jnp.max(jnp.asarray(args["sigma"]))

        def fallback_branch(_):
            return self._maybe_op(
                self.fallback_cfg_function(args), self.operation_fallback_cfg,
                sigma=args["sigma"], cond=args["cond_denoised"],
                uncond=args["uncond_denoised"], raw_args=args)

        branches = [
            (lambda _op, r=rule: self._rule_branch(r, args, ms, sample_sigmas))
            for rule in self.rules.rules
        ] + [fallback_branch]
        idx = self.rules.match_index(sigma_f)
        return jax.lax.switch(idx, branches, 0)
