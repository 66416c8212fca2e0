"""Power-spectrum noise subsystem (reference: py/nodes/powernoise.py:56-554).

- :class:`PowerFilter` — band-pass · 1/f^alpha gain surface in rfft space,
  built on an oversampled fftshifted grid with rotation / stretch / p-norm
  shaping, gaussian band edges, recursive composition, and RMS/flat-mix
  normalization.
- :class:`ChannelMixer` — channel-correlation mixing via an LDL-factored
  correlation matrix applied as a C×C matmul over flattened pixels.
- :class:`PowerNoiseItem` — samples directly in the rfft domain (complex
  randn) or via Brownian noise in the spatial domain when ``time_brownian``.
- :class:`PowerFilterNoiseItem` — same pipeline over arbitrary inner noise.

TPU design: the filter surface and mixer matrix are pure functions of
static config + shape, so they are computed host-side in float64 NumPy at
trace time and embedded as constants; the per-draw work is one rfft2 ·
filter · irfft2 (XLA TPU FFT with the complex multiply fused) plus one
(C×C)@(C×BHW) matmul on the MXU — SURVEY §2.9 item 5.
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..core.normalize import scale_noise
from .base import NoiseCtx, NoiseItem
from .brownian import brownian_increment, brownian_w


def _bilinear_resize_ac(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """align_corners=True bilinear (host-side, float64)."""
    in_h, in_w = arr.shape
    ys = np.linspace(0, in_h - 1, out_h)
    xs = np.linspace(0, in_w - 1, out_w)
    y0 = np.clip(np.floor(ys).astype(int), 0, in_h - 1)
    y1 = np.clip(y0 + 1, 0, in_h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, in_w - 1)
    x1 = np.clip(x0 + 1, 0, in_w - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    a = arr[np.ix_(y0, x0)]
    b = arr[np.ix_(y0, x1)]
    c = arr[np.ix_(y1, x0)]
    d = arr[np.ix_(y1, x1)]
    return a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx


@dataclasses.dataclass(frozen=True)
class PowerFilter:
    """Band-pass · 1/f^alpha rfft gain surface (powernoise.py:107-294)."""

    min_freq: float = 0.0
    max_freq: float = 0.7071
    stretch: float = 1.0
    rotate: float = 0.0
    pnorm: float = 2.0
    alpha: float = 0.0
    scale: float = 1.0
    rel_bw: float = 0.125
    oversample: int = 4
    compose_with: "PowerFilter | None" = None
    compose_mode: str = "max"

    def __post_init__(self):
        object.__setattr__(self, "max_freq", max(self.max_freq, self.min_freq))

    def clone(self) -> "PowerFilter":
        return self  # frozen — safe to share

    @staticmethod
    def compose(a: np.ndarray, b: np.ndarray, compose_mode: str = "max") -> np.ndarray:
        cf = {
            "max": np.maximum,
            "min": np.minimum,
            "add": np.add,
            "sub": np.subtract,
            "mul": np.multiply,
        }.get(compose_mode, np.maximum)
        return np.clip(cf(a, b), 0.0, None)

    @staticmethod
    def normalize(op: np.ndarray, shape, mix: float = 1.0,
                  normalization_factor: float = 1.0) -> np.ndarray:
        """Lerp toward RMS-1 gain, then toward flat by (1-mix)
        (powernoise.py:174-194)."""
        height, width = shape[-2:]
        hbins = width // 2 + 1
        if mix < 1.0:
            flat = np.ones((height, hbins))
            if mix <= 0.0:
                return flat
        if normalization_factor != 0:
            rms = math.sqrt(float(np.mean(op**2)))
            op = op * (1.0 + (1.0 / rms - 1.0) * normalization_factor)
        if mix < 1.0:
            op = flat + (op - flat) * mix
        return op

    def build(self, shape, override_oversample: int | None = None,
              composed: bool = True) -> np.ndarray:
        """(H, W//2+1) gain surface for a spatial shape (powernoise.py:196-266)."""
        oversample = (
            override_oversample if override_oversample is not None else self.oversample
        )
        height, width = shape[-2:]
        hbins = width // 2 + 1
        # oversampled fftshifted rfft2 frequency grid as complex coords
        re = np.linspace(0, 0.5, oversample * hbins)[None, :]
        im = np.linspace(-(height // 2) / height, ((height - 1) // 2) / height,
                         oversample * height)[:, None]
        fc = re + 1j * im
        if abs(self.rotate) >= 1e-3:
            fc = fc * np.exp(1j * math.radians(self.rotate))
        if self.stretch > 1.0:
            fc = fc.real * self.stretch + 1j * fc.imag
        else:
            fc = fc.real + 1j * (fc.imag / self.stretch)
        if abs(self.pnorm - 2.0) < 1e-3:
            d = np.abs(fc)
        else:
            d = (np.abs(fc.real) ** self.pnorm + np.abs(fc.imag) ** self.pnorm) ** (
                1.0 / self.pnorm
            )
        op = np.empty_like(d)
        m_hp = d >= self.min_freq
        m_lp = d < self.max_freq
        m_band = m_hp & m_lp
        with np.errstate(divide="ignore"):
            op[m_band] = d[m_band] ** (-self.alpha)
        m_above = ~m_lp
        op[m_above] = self.max_freq ** (-self.alpha) * np.exp(
            -((d[m_above] - self.max_freq) ** 2) / (self.rel_bw * self.max_freq) ** 2
        )
        if self.min_freq > 0.0:
            m_below = ~m_hp
            op[m_below] = self.min_freq ** (-self.alpha) * np.exp(
                -((d[m_below] - self.min_freq) ** 2)
                / (self.rel_bw * self.min_freq) ** 2
            )
        op = _bilinear_resize_ac(op, height, hbins)
        op = np.roll(op, -(height // 2), axis=-2)  # ifftshift
        if self.alpha > 0:
            op[0, 0] = 0.0  # gain → inf at DC for alpha > 0
        if self.scale != 1.0:
            op = op * self.scale
        if composed and self.compose_with is not None:
            return self.compose(
                op,
                self.compose_with.build(shape, override_oversample=override_oversample),
                self.compose_mode,
            )
        return op


def build_channel_mixer(channel_count: int, common_mode: float | None,
                        channel_correlation) -> np.ndarray | None:
    """Symmetric correlation matrix from lower-tri entries, LDL-factored and
    row-normalized (powernoise.py:56-87). Host-side numpy/scipy — cached per
    parameter set, and an identity mixer (e.g. the default common_mode=0.0)
    returns None so the per-draw matmul is skipped entirely."""
    if common_mode is None:
        return None
    if isinstance(channel_correlation, str):
        channel_correlation = [
            float(v) for v in (s.strip() for s in channel_correlation.split(","))
            if v
        ]
    return _build_channel_mixer_cached(channel_count, float(common_mode),
                                       tuple(channel_correlation))


@lru_cache(maxsize=64)
def _build_channel_mixer_cached(c: int, common_mode: float,
                                channel_correlation: tuple) -> np.ndarray | None:
    corr = np.asarray(channel_correlation, np.float64)
    n_corr = c * (c - 1) // 2
    corr = corr[:n_corr]
    corr = np.concatenate([
        corr * common_mode,
        np.full((n_corr - corr.size,), common_mode),
    ])
    m = np.eye(c)
    il, jl = np.tril_indices(c, k=-1)
    m[il, jl] = corr
    m = m + np.tril(m, -1).T
    from scipy.linalg import ldl

    lu, dd, _perm = ldl(m, lower=True)
    dc = np.diag(dd).copy()
    mixer = lu.copy()
    np.fill_diagonal(mixer, 1.0)
    mixer = mixer * np.sqrt(np.clip(dc, 0.0, None))[None, :]
    mixer = mixer / np.linalg.norm(mixer, axis=1, keepdims=True)
    if np.allclose(mixer, np.eye(c), atol=1e-12):
        return None  # numerically identity — skip the per-draw matmul
    return mixer


def apply_channel_mixer(noise: jax.Array, mixer) -> jax.Array:
    if mixer is None:
        return noise
    b, c, h, w = noise.shape
    mixed = jnp.asarray(mixer, noise.dtype) @ jnp.swapaxes(noise, 0, 1).reshape(c, -1)
    return jnp.swapaxes(mixed.reshape(c, b, h, w), 1, 0)


class PowerNoiseItem(NoiseItem):
    """Direct rfft-domain power noise (powernoise.py:297-454)."""

    MIN_DIMS = 4
    MAX_DIMS = 4

    def __init__(self, factor=1.0, *, power_filter: PowerFilter | None = None,
                 mix=1.0, common_mode=0.0, channel_correlation="1, 1, 1, 1, 1, 1",
                 time_brownian=False, filter_norm_factor=1.0, normalize=None,
                 **filter_kwargs):
        if power_filter is None:
            fargs = {
                k: filter_kwargs.pop(k)
                for k in ("min_freq", "max_freq", "stretch", "rotate", "pnorm",
                          "alpha", "rel_bw", "oversample", "scale")
                if k in filter_kwargs
            }
            power_filter = PowerFilter(**fargs)
        super().__init__(factor, normalize=normalize, power_filter=power_filter,
                         mix=mix, common_mode=common_mode,
                         channel_correlation=channel_correlation,
                         time_brownian=time_brownian,
                         filter_norm_factor=filter_norm_factor, **filter_kwargs)

    def make_filter(self, shape, oversample=None) -> np.ndarray:
        return PowerFilter.normalize(
            self.power_filter.build(shape, override_oversample=oversample),
            shape, mix=self.mix,
            normalization_factor=self.filter_norm_factor,
        )

    def init_state(self, ctx, key):
        if self.time_brownian:
            if ctx.sigma_min is None or ctx.sigma_max is None:
                raise ValueError(
                    "time correlated brownian mode is valid only for stochastic samplers"
                )
            return {
                "base": key,
                "u_last": jnp.full((), -1e9, jnp.float32),
                "w_last": jnp.zeros(tuple(ctx.shape), ctx.dtype),
            }
        return {}

    def _filtered(self, ctx, noise_or_rfft, filter_rfft, *, is_spatial: bool):
        h, w = ctx.height, ctx.width
        rfft = (
            jnp.fft.rfft2(noise_or_rfft, norm="ortho") if is_spatial else noise_or_rfft
        )
        noise = jnp.fft.irfft2(rfft * filter_rfft, s=(h, w), norm="ortho")
        mixer = build_channel_mixer(ctx.channels, self.common_mode,
                                    self.channel_correlation)
        return apply_channel_mixer(noise.astype(ctx.dtype), mixer)

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        eff = self.normalize if self.normalize is not None else normalized
        filter_rfft = jnp.asarray(self.make_filter(ctx.shape), jnp.float32)
        h, w = ctx.height, ctx.width
        hbins = w // 2 + 1
        if self.time_brownian:
            span = ctx.sigma_max - ctx.sigma_min
            u0 = (jnp.asarray(sigma, jnp.float32) - ctx.sigma_min) / span
            hit = jnp.abs(u0 - state["u_last"]) < 1e-6
            w0 = jax.lax.cond(
                hit,
                lambda: state["w_last"],
                lambda: brownian_w(state["base"], u0, tuple(ctx.shape),
                                   dtype=ctx.dtype),
            )
            noise, w1 = brownian_increment(
                state["base"], sigma, sigma_next, ctx.shape,
                t_lo=ctx.sigma_min, t_hi=ctx.sigma_max, dtype=ctx.dtype, w0=w0)
            u1 = (jnp.asarray(sigma_next, jnp.float32) - ctx.sigma_min) / span
            state = {**state, "u_last": jnp.clip(u1, 0.0, 1.0), "w_last": w1}
            out = self._filtered(ctx, noise, filter_rfft, is_spatial=True)
        else:
            kr, ki = jax.random.split(key)
            shape = tuple(ctx.shape[:-1]) + (hbins,)
            rfft = jax.random.normal(kr, shape) + 1j * jax.random.normal(ki, shape)
            out = self._filtered(ctx, rfft, filter_rfft, is_spatial=False)
        return scale_noise(out, self.factor, normalized=bool(eff)), state


class PowerFilterNoiseItem(PowerNoiseItem):
    """Power filter over arbitrary inner noise (powernoise.py:471-554):
    always rfft2 → filter → irfft2 on the inner sampler's output."""

    def __init__(self, factor=1.0, *, noise, normalize_noise=None,
                 normalize_result=None, **kwargs):
        super().__init__(factor, normalize=normalize_result, noise=noise,
                         normalize_noise=normalize_noise, **kwargs)

    def check_dims(self, ctx):
        super().check_dims(ctx)
        self.noise.check_dims(ctx)

    def init_state(self, ctx, key):
        return {"inner": self.noise.init_state(ctx, jax.random.fold_in(key, 0))}

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        normalize_noise = self.get_normalize("normalize_noise", False)
        normalize_result = self.get_normalize("normalize", normalized)
        filter_rfft = jnp.asarray(self.make_filter(ctx.shape), jnp.float32)
        noise, st = self.noise.sample(ctx, state["inner"], key, sigma, sigma_next,
                                      normalized=bool(normalize_noise))
        out = self._filtered(ctx, noise, filter_rfft, is_spatial=True)
        return (
            scale_noise(out, self.factor, normalized=bool(normalize_result)),
            {**state, "inner": st},
        )


def rfft2_to_fft2(x: jax.Array) -> jax.Array:
    """Hermitian-symmetry reconstruction of the full fft for previews
    (powernoise.py:457-468)."""
    height, width = x.shape[-2:]
    x_r = jnp.roll(x, height // 2, axis=-2)
    x_l = x_r[..., 1 : -1 if width & 1 else None]
    x_l = jnp.flip(jnp.conj(x_l), axis=(-2, -1))
    if height & 1 == 0:
        x_l = jnp.roll(x_l, 1, axis=-2)
    return jnp.concatenate((x_l, x_r), axis=-1)
