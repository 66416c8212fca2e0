"""Noise generation kernels — tier-1 zoo (reference: py/noise_generation.py).

Every generator is a :class:`Generator` spec (immutable config) whose
``generate(ctx, state, key, sigma, sigma_next)`` is a pure jnp function with
static shapes, so any composition compiles into a single XLA program.

Reference-parity notes:

* torch draws that happen per-call with *data-dependent shapes* (the random
  resize ladders of pyramid / highres_pyramid, py/noise_generation.py:544-555
  and 626-630) become build-time schedules derived from ``schedule_seed`` —
  XLA requires static shapes. Statistics match conditional on the schedule;
  seed-stream identity with torch is not a goal (SURVEY §7.2).
* ``internal`` normalization mirrors the generator-level output_hook
  (py/noise_generation.py:157-175); when a generator is used through the
  item layer the hook is disabled and normalization happens once at the item
  level, exactly like ``NoiseSampler`` (py/noise.py:199-257).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.blend import BLENDING_MODES
from ..core.normalize import scale_noise, tquantile, tstd
from ..core.rng import draw_t
from ..ops.resample import scale_samples
from .base import NoiseCtx, NoiseItem, fix_output_frames
from .brownian import brownian_increment, brownian_w


class Generator(NoiseItem):
    """Leaf noise generator spec.

    Config fields: algorithm params (see ``ng_params``) plus
    ``gen_normalized`` (tri-state internal output_hook control),
    ``force_normalize``, ``normalize_dims`` — py/noise_generation.py:110-118.
    """

    name = "unknown"
    DEFAULT_NORMALIZED = True  # class default for the internal output hook
    MIN_DIMS = 1
    MAX_DIMS = 0

    def __init__(self, factor: float = 1.0, *, normalize: bool | None = None, **kwargs):
        merged = dict(self.ng_params())
        extra = {k: v for k, v in kwargs.items() if k not in merged}
        merged.update({k: v for k, v in kwargs.items() if k in merged})
        super().__init__(factor, normalize=normalize, **merged)
        self.options = extra
        self._keys = (*self._keys, "options")

    @classmethod
    def ng_params(cls) -> dict:
        return {
            "gen_normalized": None,
            "force_normalize": None,
            "normalize_dims": None,
        }

    def clone(self):
        p = self.cloned_params()
        factor = p.pop("factor")
        opts = p.pop("options", {})
        return self.__class__(factor, **p, **opts)

    # -- helpers -------------------------------------------------------------
    def randn(self, ctx: NoiseCtx, key, shape=None, dtype=None):
        shape = tuple(shape) if shape is not None else ctx.adjusted_shape()
        dtype = dtype or ctx.dtype
        from ..kernels.hwrng import use_hw_rng

        if use_hw_rng():
            # opt-in TPU hardware-PRNG path (kernels/hwrng.py; measured
            # throughput-neutral vs threefry — the path is HBM-bound, see
            # profiles/ANALYSIS.md) — a different but deterministic stream,
            # so OFF by default (reproducibility with the CPU path is an
            # architecture invariant).
            from ..kernels.hwrng import hw_randn

            return hw_randn(key, shape, dtype)
        return jax.random.normal(key, shape, dtype)

    def rand(self, ctx: NoiseCtx, key, shape=None, dtype=None):
        return jax.random.uniform(
            key, tuple(shape) if shape is not None else ctx.adjusted_shape(),
            dtype or ctx.dtype,
        )

    # -- protocol ------------------------------------------------------------
    def generate(self, ctx: NoiseCtx, state, key, sigma, sigma_next):
        raise NotImplementedError

    def output_hook(self, noise, *, internal_default: bool):
        gen_norm = (
            self.gen_normalized if self.gen_normalized is not None else internal_default
        )
        return scale_noise(
            noise,
            normalized=bool(gen_norm)
            and (self.force_normalize is None or self.force_normalize is True),
            normalize_dims=self.normalize_dims,
        )

    def hooked(self, ctx, state, key, sigma, sigma_next, *, internal_default=None):
        """Nested-generator entry point: class-default internal hook."""
        d = self.DEFAULT_NORMALIZED if internal_default is None else internal_default
        noise, state = self.generate(ctx, state, key, sigma, sigma_next)
        return self.output_hook(noise, internal_default=d), state

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        # Item-layer path: internal hook off (NoiseSampler passes
        # normalized=False into the generator, py/noise.py:220-231), one
        # scale_noise with factor at this level (py/noise.py:249-257).
        noise, state = self.hooked(ctx, state, key, sigma, sigma_next, internal_default=False)
        noise = self.apply_factor_normalize(noise, normalized=normalized)
        return noise.astype(ctx.dtype), state


class GaussianGenerator(Generator):
    """py/noise_generation.py:252-260."""

    name = "gaussian"
    DEFAULT_NORMALIZED = False

    def generate(self, ctx, state, key, sigma, sigma_next):
        return jax.random.normal(key, ctx.shape, ctx.dtype), state


class UniformGenerator(Generator):
    """(rand - sub_fac) * mul_fac + mean_fac (py/noise_generation.py:496-514)."""

    name = "uniform"
    DEFAULT_NORMALIZED = False

    @classmethod
    def ng_params(cls):
        return super().ng_params() | {"sub_fac": 0.5, "mul_fac": 3.46, "mean_fac": 0.0}

    def generate(self, ctx, state, key, sigma, sigma_next):
        n = jax.random.uniform(key, ctx.shape, ctx.dtype)
        return (n - self.sub_fac) * self.mul_fac + self.mean_fac, state


class BrownianGenerator(Generator):
    """Brownian-tree-style sigma-correlated noise (py/noise_generation.py:263-286).

    The only sigma-consuming base generator. State carries the fixed bridge
    key chosen at init so every (sigma, sigma_next) query addresses the same
    underlying Brownian path.
    """

    name = "brownian"
    DEFAULT_NORMALIZED = False

    @classmethod
    def ng_params(cls):
        return super().ng_params() | {"levels": 16}

    def init_state(self, ctx, key):
        if ctx.sigma_min is None or ctx.sigma_max is None:
            raise ValueError("Brownian noise requires sigma_min and sigma_max")
        # endpoint cache: consecutive sampler steps share W(sigma_next_i) ==
        # W(sigma_{i+1}) — carrying it halves the per-step bridge cost
        return {
            "base": key,
            "u_last": jnp.full((), -1e9, jnp.float32),
            "w_last": jnp.zeros(ctx.shape, ctx.dtype),
        }

    def generate(self, ctx, state, key, sigma, sigma_next):
        del key  # path identity comes from the init-time key
        span = ctx.sigma_max - ctx.sigma_min
        u0 = ((jnp.asarray(sigma, jnp.float32) - ctx.sigma_min) / span)
        hit = jnp.abs(u0 - state["u_last"]) < 1e-6
        w0 = jax.lax.cond(
            hit,
            lambda: state["w_last"],
            lambda: brownian_w(state["base"], u0, tuple(ctx.shape),
                               levels=self.levels, dtype=ctx.dtype),
        )
        noise, w1 = brownian_increment(
            state["base"], sigma, sigma_next, ctx.shape,
            t_lo=ctx.sigma_min, t_hi=ctx.sigma_max,
            levels=self.levels, dtype=ctx.dtype, w0=w0,
        )
        u1 = ((jnp.asarray(sigma_next, jnp.float32) - ctx.sigma_min) / span)
        state = {**state, "u_last": jnp.clip(u1, 0.0, 1.0), "w_last": w1}
        return noise, state


def perlin_noise(
    key: jax.Array,
    grid_shape: tuple[int, int],
    out_shape: tuple[int, int],
    batch_size: int = 1,
    blend: Callable | None = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Classic grid-gradient Perlin (py/noise_generation.py:300-476).

    Random angles on the (grid+1)^2 lattice; 4 corner gradients per cell;
    smoothstep bilinear blend of the corner dot products. Vectorized with
    broadcasting instead of torch unfold — same corner ordering
    (TL, TR, BL, BR) and (x, y) component layout.
    """
    blend = blend if blend is not None else BLENDING_MODES["lerp"]
    gh, gw = grid_shape
    oh, ow = out_shape
    bh, bw = oh // gh, ow // gw
    if oh != bh * gh:
        raise ValueError(f"Output height {oh} must be divisible by grid height {gh}")
    if ow != bw * gw:
        raise ValueError(f"Output width {ow} must be divisible by grid width {gw}")
    angle = jax.random.uniform(
        key, (batch_size, gh + 1, gw + 1), dtype, maxval=2.0 * math.pi
    )
    # gradient components, last dim = (x, y)
    grad = jnp.stack((jnp.cos(angle), jnp.sin(angle)), axis=-1)
    v_tl = grad[:, :-1, :-1]
    v_tr = grad[:, :-1, 1:]
    v_bl = grad[:, 1:, :-1]
    v_br = grad[:, 1:, 1:]
    # in-cell positions, last dim = (x, y): (bh, bw, 2)
    px = (jnp.arange(bw, dtype=dtype) + 0.5) / bw
    py = (jnp.arange(bh, dtype=dtype) + 0.5) / bh
    pos = jnp.stack(jnp.meshgrid(px, py, indexing="xy"), axis=-1)
    pos = pos.reshape(1, bh, bw, 1, 1, 2)

    def step(t):
        return t * t * (3.0 - 2.0 * t)

    def corners(v, offset):
        # (B,1,1,gh,gw,2) · (1,bh,bw,1,1,2) → (B,bh,bw,gh,gw)
        p = pos - jnp.asarray(offset, dtype)
        return jnp.sum(v.reshape(batch_size, 1, 1, gh, gw, 2) * p, axis=-1)

    step_x = step(pos[..., 0])
    step_y = step(pos[..., 1])
    row0 = blend(corners(v_tl, (0.0, 0.0)), corners(v_tr, (1.0, 0.0)), step_x)
    row1 = blend(corners(v_bl, (0.0, 1.0)), corners(v_br, (1.0, 1.0)), step_x)
    noise = blend(row0, row1, step_y)
    # (B,bh,bw,gh,gw) → (B, gh*bh, gw*bw) cell-major interleave
    return noise.transpose(0, 3, 1, 4, 2).reshape(batch_size, gh * bh, gw * bw)


class PerlinOldGenerator(Generator):
    """py/noise_generation.py:289-493 incl. the grid_shape=(height, attr-width)
    quirk at line 485 (preserved for parity)."""

    name = "perlin_old"
    MIN_DIMS = 4
    MAX_DIMS = 5

    @classmethod
    def ng_params(cls):
        return super().ng_params() | {
            "div_fac": 2.0,
            "iterations": 2,
            "blend_mode": "lerp",
        }

    def generate(self, ctx, state, key, sigma, sigma_next):
        blend = BLENDING_MODES[self.blend_mode]
        kbase, *kit = jax.random.split(key, self.iterations + 1)
        noise = self.rand(ctx, kbase) / self.div_fac
        channels, height, width = noise.shape[1:]
        for i in range(self.iterations):
            noise = noise + perlin_noise(
                kit[i],
                (height, ctx.width),  # reference quirk: attr width as grid w
                (height, width),
                batch_size=channels,
                blend=blend,
                dtype=noise.dtype,
            )
        return fix_output_frames(ctx, noise), state


def _size_ladder_highres(h: int, w: int, iterations: int, schedule_seed: int):
    """Build-time random resize ladder for highres_pyramid
    (py/noise_generation.py:544-555): r ~ U[2,4) per iter, sizes grow as
    h*(r^i) capped at 15x; stop after the cap is hit."""
    rng = np.random.default_rng(schedule_seed)
    rs = rng.random(iterations) * 2 + 2
    sizes = []
    ch, cw = h, w
    for i in range(iterations):
        r = float(rs[i])
        ch, cw = min(h * 15, int(ch * (r**i))), min(w * 15, int(cw * (r**i)))
        sizes.append((ch, cw))
        if ch >= h * 15 or cw >= w * 15:
            break
    return sizes


def _size_ladder_pyramid(h: int, w: int, iterations: int, schedule_seed: int):
    """Build-time ladder for pyramid (py/noise_generation.py:626-648):
    sizes shrink as max(1, size/(r^i)); stop at 1."""
    rng = np.random.default_rng(schedule_seed)
    sizes = []
    ch, cw = h, w
    for i in range(iterations):
        r = float(rng.random(1)[0] * 2 + 2)
        cw, ch = max(1, int(cw / (r**i))), max(1, int(ch / (r**i)))
        sizes.append((ch, cw))
        if cw == 1 or ch == 1:
            break
    return sizes


class HighresPyramidGenerator(Generator):
    """py/noise_generation.py:517-564."""

    name = "highres_pyramid"
    MIN_DIMS = 4
    MAX_DIMS = 5

    @classmethod
    def ng_params(cls):
        return super().ng_params() | {
            "discount": 0.7,
            "upscale_mode": "bilinear",
            "iterations": 4,
            "noise_generator": None,
            "normalize_noise": False,
            "schedule_seed": 0,
        }

    def _inner(self):
        if self.noise_generator is not None:
            return self.noise_generator
        return UniformGenerator(gen_normalized=self.normalize_noise)

    def init_state(self, ctx, key):
        return self._inner().init_state(ctx, key)

    def generate(self, ctx, state, key, sigma, sigma_next):
        from ..kernels.fused_pyramid import (fused_downscale_pyramid,
                                             fused_downscale_supported,
                                             use_fused_pyramid)

        b, c, h, w = ctx.adjusted_shape()
        inner = self._inner()
        kinner, kdraw = jax.random.split(key)
        base, state = inner.hooked(ctx, state, kinner, sigma, sigma_next)
        noise = base.reshape(b, c, h, w)
        sizes = _size_ladder_highres(h, w, self.iterations, self.schedule_seed)
        if use_fused_pyramid() and fused_downscale_supported(
                sizes, h, w, self.upscale_mode):
            # levels >= 2x the output per axis: never materialize them —
            # generate only the tapped samples in VMEM (tap injectivity)
            coefs = [self.discount**i for i in range(len(sizes))]
            noise = fused_downscale_pyramid(
                kdraw, (b, c, h, w), sizes, coefs, self.upscale_mode,
                base=noise, dtype=ctx.dtype)
            return fix_output_frames(ctx, noise), state
        for i, (sh, sw) in enumerate(sizes):
            big = jax.random.normal(jax.random.fold_in(kdraw, i), (b, c, sh, sw), noise.dtype)
            noise = noise + scale_samples(big, w, h, mode=self.upscale_mode) * (
                self.discount**i
            )
        return fix_output_frames(ctx, noise), state


class PyramidOldGenerator(Generator):
    """Deterministic 2^i upscale ladder, std 0.5^i, nearest-exact downscale
    (py/noise_generation.py:567-606). 'Generates noise ~60x the latent size'."""

    name = "pyramid_old"
    MIN_DIMS = 4
    MAX_DIMS = 5
    DEFAULT_NORMALIZED = False

    @classmethod
    def ng_params(cls):
        return super().ng_params() | {
            "discount": 0.8,
            "iterations": 5,
            "upscale_mode": "nearest-exact",
        }

    def generate(self, ctx, state, key, sigma, sigma_next):
        from ..kernels.fused_pyramid import (fused_downscale_pyramid,
                                             fused_downscale_supported,
                                             use_fused_pyramid)

        b, c, h, w = ctx.adjusted_shape()
        sizes = [(h * 2 ** (i + 1), w * 2 ** (i + 1))
                 for i in range(self.iterations)]
        if use_fused_pyramid() and fused_downscale_supported(
                sizes, h, w, self.upscale_mode):
            # the "~60x the latent size" ladder never materializes: each
            # oversized level contributes exactly one tapped iid sample per
            # output pixel (nearest-exact downscale of iid noise)
            coefs = [(0.5**i) * self.discount**i
                     for i in range(self.iterations)]
            noise = fused_downscale_pyramid(key, (b, c, h, w), sizes, coefs,
                                            self.upscale_mode,
                                            dtype=ctx.dtype)
            return fix_output_frames(ctx, noise), state
        noise = jnp.zeros((b, c, h, w), ctx.dtype)
        r = 1
        for i in range(self.iterations):
            r *= 2
            big = jax.random.normal(jax.random.fold_in(key, i), (b, c, h * r, w * r), ctx.dtype)
            big = big * (0.5**i)
            noise = noise + scale_samples(big, w, h, mode=self.upscale_mode) * (
                self.discount**i
            )
        return fix_output_frames(ctx, noise), state


class PyramidGenerator(Generator):
    """Whitaker multi-resolution noise (py/noise_generation.py:609-649)."""

    name = "pyramid"
    MIN_DIMS = 4
    MAX_DIMS = 5

    @classmethod
    def ng_params(cls):
        return super().ng_params() | {
            "discount": 0.7,
            "upscale_mode": "bilinear",
            "iterations": 10,
            "schedule_seed": 0,
        }

    def generate(self, ctx, state, key, sigma, sigma_next):
        from ..kernels.fused_pyramid import (fused_pyramid,
                                             fused_pyramid_supported,
                                             use_fused_pyramid)

        b, c, h, w = ctx.adjusted_shape()
        sizes = _size_ladder_pyramid(h, w, self.iterations, self.schedule_seed)
        if use_fused_pyramid() and fused_pyramid_supported(
                sizes, h, w, self.upscale_mode):
            noise = fused_pyramid(key, (b, c, h, w), sizes, self.discount,
                                  self.upscale_mode, ctx.dtype)
            return fix_output_frames(ctx, noise), state
        kbase, kdraw = jax.random.split(key)
        noise = jax.random.normal(kbase, (b, c, h, w), ctx.dtype)
        for i, (sh, sw) in enumerate(sizes):
            small = jax.random.normal(jax.random.fold_in(kdraw, i), (b, c, sh, sw), ctx.dtype)
            noise = noise + scale_samples(small, w, h, mode=self.upscale_mode) * (
                self.discount**i
            )
        return fix_output_frames(ctx, noise), state


class StudentTGenerator(Generator):
    """StudentT(loc, scale, df) + per-batch abs-quantile clamp + sqrt-compress
    (py/noise_generation.py:652-677)."""

    name = "studentt"
    DEFAULT_NORMALIZED = False

    @classmethod
    def ng_params(cls):
        return super().ng_params() | {
            "loc": 0.0,
            "scale": 0.2,
            "df": 1.0,
            "quantile_fac": 0.75,
            "pow_fac": 0.5,
            "nq_fac": 1.0,
        }

    def generate(self, ctx, state, key, sigma, sigma_next):
        noise = self.loc + self.scale * draw_t(key, self.df, ctx.shape, ctx.dtype)
        flat = jnp.abs(noise.reshape(ctx.shape[0], -1))
        nq = tquantile(flat, self.quantile_fac, axis=-1) * self.nq_fac
        nq = nq.reshape((ctx.shape[0],) + (1,) * (noise.ndim - 1))
        noise = jnp.clip(noise, -nq, nq)
        return jnp.copysign(jnp.abs(noise) ** self.pow_fac, noise), state


class GreenTestGenerator(Generator):
    """FFT 1/sqrt(power) shaping with sqrt-radial power (py/noise_generation.py:680-704)."""

    name = "green_test"
    MIN_DIMS = 4
    MAX_DIMS = 5

    @classmethod
    def ng_params(cls):
        return super().ng_params() | {
            "scale_fac": 1.0,
            "x_pow": 2,
            "y_pow": 2,
            "power_base": 1.0,
        }

    def generate(self, ctx, state, key, sigma, sigma_next):
        noise = self.randn(ctx, key)
        h, w = ctx.height, ctx.width
        scale = self.scale_fac / (w * h)
        fy = jnp.fft.fftfreq(h)[:, None] ** self.y_pow
        fx = jnp.fft.fftfreq(w) ** self.x_pow
        power = jnp.sqrt(fy + fx)
        power = power.at[0, 0].set(self.power_base)
        spec = jnp.fft.fft2(noise) / jnp.sqrt(power).astype(jnp.complex64)
        out = jnp.fft.ifft2(spec)
        out = out * (scale / tstd(out))
        return fix_output_frames(ctx, jnp.real(out).astype(ctx.dtype)), state


class PinkOldGenerator(Generator):
    """Admittedly-wrong scalar-scaled randn (py/noise_generation.py:707-717)."""

    name = "pink_old"

    @classmethod
    def ng_params(cls):
        return super().ng_params() | {"alpha": 2.0, "k": 1.0, "freq": 1.0}

    def generate(self, ctx, state, key, sigma, sigma_next):
        spectral_density = self.k / self.freq**self.alpha
        return jax.random.normal(key, ctx.shape, ctx.dtype) * spectral_density, state


class PowerOldGenerator(Generator):
    """Admittedly-wrong historical power noise (py/noise_generation.py:
    1259-1287): uniform noise scaled by a per-first-dim spectral density
    k/i^alpha, then standardized per (H, W)."""

    name = "power_old"
    DEFAULT_NORMALIZED = False

    @classmethod
    def ng_params(cls):
        return super().ng_params() | {"alpha": 2.0, "k": 1.0}

    def generate(self, ctx, state, key, sigma, sigma_next):
        b = ctx.shape[0]
        freq = jnp.arange(1, b + 1, dtype=ctx.dtype).reshape(
            (b,) + (1,) * (len(ctx.shape) - 1))
        spectral_density = self.k / freq**self.alpha
        noise = jax.random.uniform(key, ctx.shape, ctx.dtype) * spectral_density
        mean = jnp.mean(noise, axis=(-2, -1), keepdims=True)
        std = tstd(noise, axis=(-2, -1), keepdims=True)
        return (noise - mean) / jnp.where(std == 0, 1.0, std), state


class OneFGenerator(Generator):
    """1/f^alpha spectrum shaping over a full fftn (py/noise_generation.py:720-759)."""

    name = "onef"
    MIN_DIMS = 4
    MAX_DIMS = 5

    @classmethod
    def ng_params(cls):
        return super().ng_params() | {
            "alpha": 2.0,
            "k": 1.0,
            "hfac": 1.0,
            "wfac": 1.0,
            "base_power": 1.0,
            "use_sqrt": True,
        }

    def generate(self, ctx, state, key, sigma, sigma_next):
        noise = self.randn(ctx, key)
        h, w = ctx.height, ctx.width
        freq_x = jnp.fft.fftfreq(h, self.hfac)
        freq_y = jnp.fft.fftfreq(w, self.wfac)
        fx, fy = jnp.meshgrid(freq_x, freq_y, indexing="ij")
        power = (fx**2 + fy**2) ** (-self.alpha / 2.0)
        if self.k != 0:
            power = self.k / power
        power = power.at[0, 0].set(self.base_power)
        power = power[None, None].astype(jnp.complex64)
        spec = jnp.fft.fftn(noise)
        spec = spec / (jnp.sqrt(power) if self.use_sqrt else power)
        out = jnp.real(jnp.fft.ifftn(spec)).astype(ctx.dtype)
        return fix_output_frames(ctx, out), state


class PowerLawGenerator(Generator):
    """noise(or sign)·|noise|^alpha with optional amax division
    (py/noise_generation.py:762-786)."""

    name = "powerlaw"

    @classmethod
    def ng_params(cls):
        return super().ng_params() | {
            "alpha": 2.0,
            "div_max_dims": None,
            "use_sign": False,
            "use_div_max_abs": True,
        }

    def generate(self, ctx, state, key, sigma, sigma_next):
        noise = jax.random.normal(key, ctx.shape, ctx.dtype)
        modulation = jnp.abs(noise) ** self.alpha
        noise = (jnp.sign(noise) if self.use_sign else noise) * modulation
        if self.div_max_dims is not None:
            noise = noise / jnp.max(
                jnp.abs(noise) if self.use_div_max_abs else noise,
                axis=tuple(self.div_max_dims),
                keepdims=True,
            )
        return noise, state


class LaplacianGenerator(Generator):
    """randn/div_fac + Laplace(loc, scale) (py/noise_generation.py:789-802).

    Unlike gaussian/uniform/studentt, the reference's Laplacian does NOT
    override the base normalized=True default — its internal hook
    normalizes (verified against the live reference in
    test_reference_noise_stats_oracle.py)."""

    name = "laplacian"

    @classmethod
    def ng_params(cls):
        return super().ng_params() | {"loc": 0.0, "scale": 1.0, "div_fac": 4.0}

    def generate(self, ctx, state, key, sigma, sigma_next):
        k1, k2 = jax.random.split(key)
        noise = jax.random.normal(k1, ctx.shape, ctx.dtype) / self.div_fac
        lap = self.loc + self.scale * jax.random.laplace(k2, ctx.shape, ctx.dtype)
        return noise + lap, state


class MixedGenerator(Generator):
    """Sum of member generators with optional transforms and an output fn
    (py/noise_generation.py:212-249). Members keep their class-default
    internal normalization."""

    name = "mixed"

    @classmethod
    def ng_params(cls):
        return super().ng_params() | {
            "mix_name": "mixed_noise",
            "noise_mix": (),
            "output_fun": None,
        }

    def _members(self):
        out = []
        for item in self.noise_mix:
            gen, transform = (item, None) if isinstance(item, Generator) else item
            out.append((gen, transform))
        return out

    def check_dims(self, ctx):
        for gen, _t in self._members():
            gen.check_dims(ctx)

    def init_state(self, ctx, key):
        return tuple(
            gen.init_state(ctx, jax.random.fold_in(key, i))
            for i, (gen, _t) in enumerate(self._members())
        )

    def generate(self, ctx, state, key, sigma, sigma_next):
        noise = None
        new_states = []
        for i, (gen, transform) in enumerate(self._members()):
            sub = jax.random.fold_in(key, i)
            n, st = gen.hooked(ctx, state[i], sub, sigma, sigma_next)
            new_states.append(st)
            if transform is not None:
                n = transform(n) if callable(transform) else n * transform
            noise = n if noise is None else noise + n
        if self.output_fun is not None:
            out = self.output_fun
            noise = out(noise) if callable(out) else noise * out
        return noise, tuple(new_states)


GENERATOR_CLASSES: dict[str, type[Generator]] = {
    cls.name: cls
    for cls in (
        GaussianGenerator,
        UniformGenerator,
        BrownianGenerator,
        PerlinOldGenerator,
        HighresPyramidGenerator,
        PyramidOldGenerator,
        PyramidGenerator,
        StudentTGenerator,
        GreenTestGenerator,
        PinkOldGenerator,
        PowerOldGenerator,
        OneFGenerator,
        PowerLawGenerator,
        LaplacianGenerator,
        MixedGenerator,
    )
}
