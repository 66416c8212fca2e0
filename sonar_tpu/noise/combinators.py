"""Noise combinator algebra — the ~20 wrapper specs of the reference
(py/noise.py:470-2241), rebuilt as pure state-pytree compositions.

Every combinator is a :class:`NoiseItem` whose ``sample`` composes child
items; child persistent state lives in this node's state dict, PRNG streams
are derived with ``fold_in``, and every sigma-conditional choice is a traced
``lax.cond``/``where`` — so arbitrary composition trees compile into a
single ``lax.scan`` sampling loop.

Where the reference mutates global torch RNG (RepeatedNoise's private
Generator, ShuffledNoise's fork_rng, CustomNoiseParameters' RNG regimes),
streams here are explicit keys: ``fork_rng``-style isolation is the default
and the corresponding knobs only affect seed derivation.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

from ..core.blend import BLENDING_MODES
from ..core.normalize import (
    normalize_to_scale,
    normalize_to_scale_adv,
    quantile_normalize,
    scale_noise,
    tquantile,
    tstd,
)
from ..ops.resample import scale_samples
from ..samplers.ancestral import get_ancestral_step
from ..samplers.guidance import guidance_linear as _guidance_linear
from ..samplers.guidance import guidance_shift
from ..utils.misc import crop_samples, elementwise_shuffle_by_dim, pattern_break
from .base import NoiseCtx, NoiseItem


def _resolve_blend(fn_or_name) -> Callable:
    if callable(fn_or_name):
        return fn_or_name
    return BLENDING_MODES[fn_or_name]


class WrapperNoise(NoiseItem):
    """Base for single-child wrappers: handles child state plumbing."""

    CHILD_KEYS: tuple[str, ...] = ("noise",)

    def _children(self) -> dict[str, NoiseItem | None]:
        return {k: getattr(self, k, None) for k in self.CHILD_KEYS}

    def check_dims(self, ctx):
        super().check_dims(ctx)
        for child in self._children().values():
            if child is not None:
                child.check_dims(self.child_ctx(ctx))

    def child_ctx(self, ctx: NoiseCtx) -> NoiseCtx:
        return ctx

    def init_state(self, ctx, key):
        cctx = self.child_ctx(ctx)
        return {
            k: (None if c is None else c.init_state(cctx, jax.random.fold_in(key, i)))
            for i, (k, c) in enumerate(self._children().items())
        }

    def child_sample(self, name, ctx, state, key, sigma, sigma_next, *, normalized):
        child = getattr(self, name)
        noise, cstate = child.sample(
            self.child_ctx(ctx), state[name], key, sigma, sigma_next,
            normalized=normalized,
        )
        return noise, {**state, name: cstate}


# ---------------------------------------------------------------------------
# CompositeNoise — mask-lerp of two samplers (py/noise.py:470-533)
# ---------------------------------------------------------------------------


class CompositeNoise(WrapperNoise):
    CHILD_KEYS = ("dst_noise", "src_noise")

    def __init__(self, factor=1.0, *, dst_noise, src_noise, mask,
                 normalize_dst=None, normalize_src=None, normalize_result=None):
        super().__init__(
            factor,
            dst_noise=dst_noise, src_noise=src_noise, mask=jnp.asarray(mask),
            normalize_dst=normalize_dst, normalize_src=normalize_src,
            normalize_result=normalize_result,
        )

    def _prepared_mask(self, ctx):
        mask = self.mask.reshape((-1, 1) + self.mask.shape[-2:]).astype(ctx.dtype)
        mask = scale_samples(mask, ctx.width, ctx.height, mode="bilinear")
        reps = -(-ctx.batch // mask.shape[0])
        return jnp.tile(mask, (reps, 1, 1, 1))[: ctx.batch]

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        nd = self.get_normalize("normalize_dst", normalized)
        ns_ = self.get_normalize("normalize_src", normalized)
        nr = self.get_normalize("normalize_result", normalized)
        kd, ks = jax.random.split(key)
        dst, state = self.child_sample("dst_noise", ctx, state, kd, sigma, sigma_next,
                                       normalized=nd)
        src, state = self.child_sample("src_noise", ctx, state, ks, sigma, sigma_next,
                                       normalized=ns_)
        mask = self._prepared_mask(ctx)
        out = dst * (1.0 - mask) + src * mask
        return scale_noise(out, self.factor, normalized=nr), state


# ---------------------------------------------------------------------------
# GuidedNoise — guidance toward a reference latent (py/noise.py:536-623)
# ---------------------------------------------------------------------------


class GuidedNoise(WrapperNoise):
    CHILD_KEYS = ("noise",)

    def __init__(self, factor=1.0, *, ref_latent, guidance_factor=0.5,
                 method="euler", noise=None,
                 normalize_noise=None, normalize_result=None):
        if method not in ("linear", "euler"):
            raise ValueError("Bad method")
        super().__init__(
            factor,
            ref_latent=jnp.asarray(ref_latent), guidance_factor=guidance_factor,
            method=method, noise=noise,
            normalize_noise=normalize_noise, normalize_result=normalize_result,
        )

    def _ref(self, ctx):
        ref = self.ref_latent.astype(ctx.dtype)
        if ref.shape[-2:] != (ctx.height, ctx.width):
            ref = scale_samples(ref, ctx.width, ctx.height, mode="bicubic")
        return ref

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        nn = self.get_normalize("normalize_noise", normalized)
        nr = self.get_normalize("normalize_result", normalized)
        gf = self.guidance_factor
        have_noise = self.noise is not None
        if have_noise:
            noise, state = self.child_sample("noise", ctx, state, key, sigma,
                                             sigma_next, normalized=nn)
        else:
            noise = jnp.zeros(ctx.shape, ctx.dtype)
        ref = self._ref(ctx)
        blend = BLENDING_MODES["lerp"]
        if self.method == "linear":
            out = _guidance_linear(noise, ref, gf, blend=blend, do_shift=have_noise)
        else:
            # guidance_euler with x = the noise (py/noise.py:600-614); the
            # reference passes the exemplar x as `denoised` for the shift
            # stats (sonar.py:380-398) — carried here as ctx.ref, with the
            # noise itself as the fallback when no exemplar is available.
            shift_src = ctx.ref_like()
            if shift_src is None:
                shift_src = noise
            ref_shift = guidance_shift(shift_src, ref) if have_noise else ref
            sigma_safe = jnp.where(sigma == 0, 1.0, sigma)
            d = (noise - ref_shift) / sigma_safe
            euler = noise + d * (sigma_next - sigma) * gf
            linear = _guidance_linear(noise, ref, gf, blend=blend, do_shift=have_noise)
            out = jnp.where(sigma == sigma_next, linear, euler)
        return scale_noise(out, self.factor, normalized=nr), state


# ---------------------------------------------------------------------------
# ScheduledNoise — sigma-window main/fallback select (py/noise.py:626-678)
# ---------------------------------------------------------------------------


class ScheduledNoise(WrapperNoise):
    CHILD_KEYS = ("noise", "fallback_noise")

    def __init__(self, factor=1.0, *, noise, start_sigma=math.inf, end_sigma=0.0,
                 fallback_noise=None, normalize=None):
        super().__init__(
            factor, normalize=normalize,
            noise=noise, fallback_noise=fallback_noise,
            start_sigma=start_sigma, end_sigma=end_sigma,
        )

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        if sigma is None or sigma_next is None:
            raise ValueError("ScheduledNoise requires sigma, sigma_next to be passed")
        normalize = self.get_normalize("normalize", normalized)
        in_window = (self.end_sigma <= sigma) & (sigma <= self.start_sigma)

        def main_branch(st):
            noise, st = self.child_sample("noise", ctx, st, key, sigma, sigma_next,
                                          normalized=False)
            return noise, st

        def fb_branch(st):
            if self.fallback_noise is None:
                return jnp.zeros(ctx.shape, ctx.dtype), st
            noise, st = self.child_sample("fallback_noise", ctx, st, key, sigma,
                                          sigma_next, normalized=False)
            return noise, st

        noise, state = jax.lax.cond(in_window, main_branch, fb_branch, state)
        return scale_noise(noise, self.factor, normalized=normalize), state


# ---------------------------------------------------------------------------
# RepeatedNoise — cache + recycle with permutation (py/noise.py:681-758)
# ---------------------------------------------------------------------------


def _flip_axis(noise, axis_idx):
    return jax.lax.switch(axis_idx, [partial(jnp.flip, axis=d) for d in range(noise.ndim)],
                          noise)


def _roll_axis(noise, axis_idx, shift):
    return jax.lax.switch(
        axis_idx,
        [lambda n, s, d=d: jnp.roll(n, s, axis=d) for d in range(noise.ndim)],
        noise, shift,
    )


class RepeatedNoise(WrapperNoise):
    CHILD_KEYS = ("noise",)

    def __init__(self, factor=1.0, *, noise, repeat_length=8, max_recycle=1000,
                 permute="enabled", normalize=None):
        if permute not in ("enabled", "disabled", "always"):
            raise ValueError("Bad permute mode")
        super().__init__(factor, normalize=normalize, noise=noise,
                         repeat_length=repeat_length, max_recycle=max_recycle,
                         permute=permute)

    def init_state(self, ctx, key):
        st = super().init_state(ctx, key)
        L = self.repeat_length
        st["cache"] = jnp.zeros((L,) + tuple(ctx.shape), ctx.dtype)
        st["counts"] = jnp.zeros((L,), jnp.int32)
        st["filled"] = jnp.zeros((), jnp.int32)
        st["last_idx"] = jnp.full((), -1, jnp.int32)
        return st

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        normalize = self.get_normalize("normalize", normalized)
        L = self.repeat_length
        kgen, kidx, kmode, k2, k3 = jax.random.split(key, 5)
        filled, counts, last_idx = state["filled"], state["counts"], state["last_idx"]

        filling = filled < L
        ridx = jax.random.randint(kidx, (), 0, L)
        ridx = jnp.where(ridx == last_idx, (ridx + 1) % L, ridx)
        idx = jnp.where(filling, filled, ridx)
        need_fresh = filling | (counts[idx] >= self.max_recycle)

        def fresh_branch(st):
            noise, st = self.child_sample("noise", ctx, st, kgen, sigma, sigma_next,
                                          normalized=False)
            return noise, st

        def reuse_branch(st):
            return st["cache"][idx], st

        noise, state = jax.lax.cond(need_fresh, fresh_branch, reuse_branch, state)
        cache = jnp.where(need_fresh, state["cache"].at[idx].set(noise), state["cache"])
        counts = jnp.where(
            need_fresh, counts.at[idx].set(1), counts.at[idx].add(1)
        )
        state = {**state, "cache": cache, "counts": counts,
                 "filled": jnp.minimum(filled + 1, L), "last_idx": idx}

        if self.permute == "disabled":
            return scale_noise(noise, self.factor, normalized=normalize), state

        # permutation applies to reused tensors ("enabled") or always
        do_permute = (
            jnp.asarray(True) if self.permute == "always" else jnp.logical_not(need_fresh)
        )
        nd = len(ctx.shape)
        rep_mode = jax.random.randint(kmode, (), 0, 2)
        r2 = jax.random.randint(k2, (), 0, jnp.iinfo(jnp.int32).max)
        r3 = jax.random.randint(k3, (), 0, jnp.iinfo(jnp.int32).max)
        # mode 0: 10% chance plain/negated copy, else flip 1-2 random dims
        ident = r2 <= jnp.iinfo(jnp.int32).max // 5
        negate = (r2 & 1) == 1
        d1, d2 = r2 % nd, r3 % nd
        flipped = _flip_axis(noise, d1)
        flipped = jnp.where(d2 == d1, flipped, _flip_axis(flipped, d2))
        mode0 = jnp.where(ident, jnp.where(negate, -noise, noise), flipped)
        # mode 1: roll a random dim by a random amount
        shape_arr = jnp.asarray(ctx.shape, jnp.int32)
        mode1 = _roll_axis(noise, d1, r3 % shape_arr[d1])
        permuted = jnp.where(rep_mode == 0, mode0, mode1)
        noise = jnp.where(do_permute, permuted, noise)
        return scale_noise(noise, self.factor, normalized=normalize), state


# ---------------------------------------------------------------------------
# ModulatedNoise — intensity / frequency / spectral_signum (py/noise.py:763-1019)
# ---------------------------------------------------------------------------


def _intensity_modulate(ref, noise, s_noise, sigma_up, intensity, dims):
    std = tstd(ref - jnp.mean(ref), axis=dims, keepdims=True)
    scaling = 1.0 / (std * abs(intensity) + 1.0)
    additive = noise * s_noise * sigma_up
    scaled = additive * scaling + additive
    norm_ratio = jnp.linalg.norm(additive.reshape(-1)) / jnp.linalg.norm(
        scaled.reshape(-1)
    )
    scaled = scaled * norm_ratio
    return scaled * intensity + additive * (1 - intensity)


def _frequency_modulate(ref, noise, s_noise, sigma_up, intensity, dims):
    additive = noise * s_noise * sigma_up
    std = tstd(ref - jnp.mean(ref), axis=dims, keepdims=True)
    scaling = 1.0 / (std * abs(intensity) + 1.0)
    spec = jnp.fft.fft2(scaling * additive + additive)
    mag = jnp.abs(spec)
    h, w = ref.shape[-2], ref.shape[-1]
    b = abs(intensity)
    hp = 1.0 - jnp.exp(
        -(
            (jnp.arange(h)[:, None] / h) ** 2 + (jnp.arange(w)[None, :] / w) ** 2
        )
        * b**2
    )
    spec_scaled = mag * (1.0 + hp) * jnp.exp(1j * jnp.angle(spec))
    out = jnp.real(jnp.fft.ifft2(spec_scaled))
    norm_ratio = jnp.linalg.norm(additive.reshape(-1)) / jnp.linalg.norm(
        out.reshape(-1)
    )
    out = out * norm_ratio
    return out * intensity + additive * (1 - intensity)


def _spectral_modulate(ref, noise, s_noise, sigma_up, intensity, dims,
                       spectral_mod_percentile=5.0):
    del ref
    additive = noise * s_noise * sigma_up
    spec = jnp.fft.fftn(additive, axes=dims)
    log_amp = jnp.log(jnp.sqrt(spec.real**2 + spec.imag**2))
    flat = jnp.abs(log_amp).reshape(log_amp.shape[0], -1)
    expand = (log_amp.shape[0],) + (1,) * (log_amp.ndim - 1)
    q_lo = tquantile(flat, spectral_mod_percentile * 0.01, axis=1).reshape(expand)
    q_hi = tquantile(flat, 1 - spectral_mod_percentile * 0.01, axis=1).reshape(expand)
    q_max = jnp.max(flat, axis=1).reshape(expand)
    mult_high = jnp.where(
        log_amp > q_hi,
        1.0 - jnp.clip((log_amp - q_hi) / (q_max - q_hi), None, 0.5),
        1.0,
    )
    mult_low = jnp.where(
        log_amp < q_lo,
        1.0 + jnp.clip(1.0 - log_amp / q_lo, None, 0.5),
        1.0,
    )
    filtered = spec * (mult_low * mult_high) ** intensity
    return jnp.real(jnp.fft.ifftn(filtered, axes=dims))


_MODULATION_FUNCTIONS = {
    "intensity": _intensity_modulate,
    "frequency": _frequency_modulate,
    "spectral_signum": _spectral_modulate,
}


class ModulatedNoise(WrapperNoise):
    CHILD_KEYS = ("noise",)
    MODULATION_DIMS = ((-3,), (-2, -1), (-3, -2, -1))

    def __init__(self, factor=1.0, *, noise, modulation_type="none",
                 modulation_strength=2.0, modulation_dims=3, ref_latent_opt=None,
                 normalize_result=None, normalize_noise=None, normalize_ref=True):
        if modulation_type != "none" and modulation_type not in _MODULATION_FUNCTIONS:
            raise ValueError("Bad modulation type")
        super().__init__(
            factor, noise=noise, modulation_type=modulation_type,
            modulation_strength=modulation_strength, modulation_dims=modulation_dims,
            ref_latent_opt=None if ref_latent_opt is None else jnp.asarray(ref_latent_opt),
            normalize_result=normalize_result, normalize_noise=normalize_noise,
            normalize_ref=normalize_ref,
        )

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        nn = self.get_normalize("normalize_noise", normalized)
        nr = self.get_normalize("normalize_result", normalized)
        nref = self.get_normalize("normalize_ref", normalized)
        if self.modulation_type == "none":
            noise, state = self.child_sample("noise", ctx, state, key, sigma,
                                             sigma_next, normalized=nr or nn)
            return scale_noise(noise, self.factor, normalized=False), state
        mod_fn = _MODULATION_FUNCTIONS[self.modulation_type]
        dims = self.MODULATION_DIMS[self.modulation_dims - 1]
        noise, state = self.child_sample("noise", ctx, state, key, sigma, sigma_next,
                                         normalized=nn)
        # ref defaults to x in the reference (py/noise.py:846): the exemplar
        # latent is carried as ctx.ref; explicit ref_latent_opt overrides it,
        # and a zeros ref (→ unit scaling) remains the last-resort fallback.
        if self.ref_latent_opt is not None:
            ref = self.ref_latent_opt.astype(ctx.dtype)
        else:
            ref = ctx.ref_like()
            if ref is None:
                ref = jnp.zeros(ctx.shape, ctx.dtype)
        _, sigma_up = get_ancestral_step(sigma, sigma_next, eta=1.0)
        out = mod_fn(scale_noise(ref, normalized=nref), noise, 1.0, sigma_up,
                     self.modulation_strength, dims)
        return scale_noise(out, self.factor, normalized=nr), state


# ---------------------------------------------------------------------------
# RandomNoise — pick mix_count distinct children per call (py/noise.py:1022-1073)
# ---------------------------------------------------------------------------


class MultiChildNoise(NoiseItem):
    """Base for combinators over a list of children (a chain's items)."""

    def __init__(self, factor=1.0, *, items, **kwargs):
        items = list(items.items) if hasattr(items, "items") and not callable(items.items) else list(items)
        if not items:
            raise ValueError(f"{type(self).__name__} requires at least one noise item")
        super().__init__(factor, items=items, **kwargs)

    def clone(self):
        import inspect

        p = self.cloned_params()
        factor = p.pop("factor")
        p["noise"] = p.pop("items")  # __init__ takes the child list as noise=
        sig = inspect.signature(self.__class__.__init__)
        if not any(m.kind == m.VAR_KEYWORD for m in sig.parameters.values()):
            allowed = set(sig.parameters) - {"self", "factor"}
            p = {k: v for k, v in p.items() if k in allowed}
        return self.__class__(factor, **p)

    def check_dims(self, ctx):
        super().check_dims(ctx)
        for item in self.items:
            item.check_dims(ctx)

    def init_state(self, ctx, key):
        return tuple(
            item.init_state(ctx, jax.random.fold_in(key, i))
            for i, item in enumerate(self.items)
        )


class RandomNoise(MultiChildNoise):
    def __init__(self, factor=1.0, *, noise, mix_count=1, normalize=None):
        super().__init__(factor, items=noise, mix_count=mix_count, normalize=normalize)

    @staticmethod
    def _states_homogeneous(states) -> bool:
        """True when every child state has identical pytree structure and
        leaf shapes/dtypes — the precondition for a lax.switch fast path."""
        defs = [jax.tree.structure(s) for s in states]
        if any(d != defs[0] for d in defs[1:]):
            return False
        leaves = [jax.tree.leaves(s) for s in states]
        first = leaves[0]
        for ls in leaves[1:]:
            for a, b in zip(ls, first):
                if jnp.shape(a) != jnp.shape(b) or jnp.result_type(a) != jnp.result_type(b):
                    return False
        return True

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        n = len(self.items)
        mix = min(self.mix_count, n)
        normalize = self.get_normalize("normalize", normalized or mix > 1)
        kpick, kgen = jax.random.split(key)
        # distinct indices via permutation prefix (rejection loop in torch,
        # py/noise.py:1060-1067 — same distribution)
        chosen = jax.random.permutation(kpick, n)[:mix]
        if mix == 1 and n > 1:
            chosen = jax.random.randint(kpick, (1,), 0, n)
        if mix == 1 and n > 1 and self._states_homogeneous(state):
            # Fast path: only the chosen child is computed (O(1) instead of
            # O(n) per draw — a 10x saving for expensive children like
            # collatz/voronoi in a 10-item chain). Only the chosen child's
            # state/stream advances, which is also the reference's behavior
            # (uncalled samplers never draw, py/noise.py:1060-1073).
            def make_branch(i, item):
                def branch(st, k):
                    ni, si = item.sample(ctx, st[i], jax.random.fold_in(k, i),
                                         sigma, sigma_next, normalized=False)
                    return ni, tuple(si if j == i else st[j] for j in range(n))

                return branch

            branches = [make_branch(i, it) for i, it in enumerate(self.items)]
            noise, new_states = jax.lax.switch(chosen[0], branches, state, kgen)
            return scale_noise(noise, self.factor, normalized=normalize), new_states
        # General path: all children evaluated and masked (heterogeneous
        # child states preclude a structurally-uniform switch). Matching the
        # reference (unchosen samplers are never called): where-select kills
        # an unchosen child's NaN/Inf instead of letting 0*NaN poison the
        # sum, and an unchosen child's state does not advance.
        mask = jnp.zeros((n,), ctx.dtype).at[chosen].set(1.0)
        total = jnp.zeros(ctx.shape, ctx.dtype)
        new_states = []
        for i, item in enumerate(self.items):
            ni, st = item.sample(ctx, state[i], jax.random.fold_in(kgen, i), sigma,
                                 sigma_next, normalized=False)
            keep = mask[i] > 0
            new_states.append(jax.tree.map(
                lambda a, b, k=keep: a if a is b else jnp.where(k, a, b),
                st, state[i]))
            total = total + jnp.where(keep, ni, jnp.zeros((), ctx.dtype))
        return scale_noise(total, self.factor, normalized=normalize), tuple(new_states)


# ---------------------------------------------------------------------------
# ChannelNoise — one child per channel (py/noise.py:1076-1131)
# ---------------------------------------------------------------------------


class ChannelNoise(MultiChildNoise):
    def __init__(self, factor=1.0, *, noise, insufficient_channels_mode="wrap",
                 normalize=None):
        if insufficient_channels_mode not in ("wrap", "repeat", "zero"):
            raise ValueError("Bad insufficient_channels_mode")
        super().__init__(factor, items=noise,
                         insufficient_channels_mode=insufficient_channels_mode,
                         normalize=normalize)

    def _per_channel_items(self, ctx):
        c = ctx.channels
        items = list(self.items[:c])
        n = len(items)
        while len(items) < c:
            if self.insufficient_channels_mode == "wrap":
                items.append(self.items[len(items) % n])
            elif self.insufficient_channels_mode == "repeat":
                items.append(self.items[n - 1])
            else:
                items.append(None)  # zero channel
        return items

    def child_ctx(self, ctx, channel: int | None = None):
        """Per-channel ctx; the exemplar latent is sliced to the channel
        (reference passes x[:, c:c+1] per child, py/noise.py:1116-1123)."""
        import dataclasses as _dc

        cctx = ctx.with_shape((ctx.shape[0], 1) + tuple(ctx.shape[2:]))
        ref = ctx.ref_like()
        if ref is not None and channel is not None:
            ref = ref[:, channel : channel + 1]
        elif channel is None:
            ref = None
        return _dc.replace(cctx, ref=ref)

    def check_dims(self, ctx):
        NoiseItem.check_dims(self, ctx)
        for item in self.items:
            item.check_dims(self.child_ctx(ctx))

    def init_state(self, ctx, key):
        return tuple(
            None if item is None
            else item.init_state(self.child_ctx(ctx, i), jax.random.fold_in(key, i))
            for i, item in enumerate(self._per_channel_items(ctx))
        )

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        normalize = self.get_normalize("normalize", normalized)
        chunks, new_states = [], []
        for i, item in enumerate(self._per_channel_items(ctx)):
            cctx = self.child_ctx(ctx, i)
            if item is None:
                chunks.append(jnp.zeros(cctx.shape, ctx.dtype))
                new_states.append(None)
                continue
            ni, st = item.sample(cctx, state[i], jax.random.fold_in(key, i), sigma,
                                 sigma_next, normalized=False)
            chunks.append(ni)
            new_states.append(st)
        noise = jnp.concatenate(chunks, axis=1)
        return scale_noise(noise, self.factor, normalized=normalize), tuple(new_states)


# ---------------------------------------------------------------------------
# RippleFilteredNoise (py/noise.py:1134-1202)
# ---------------------------------------------------------------------------


class RippleFilteredNoise(WrapperNoise):
    CHILD_KEYS = ("noise",)

    def __init__(self, factor=1.0, *, noise, dim=-1, flatten=False, mode="sin",
                 amplitude_high=0.25, amplitude_low=0.25, offset=0.0, period=1.0,
                 roll=0.0, normalize_noise=False, normalize=None):
        if mode not in ("sin", "cos", "sin_copysign", "cos_copysign"):
            raise ValueError("Bad mode")
        super().__init__(factor, noise=noise, dim=dim, flatten=flatten, mode=mode,
                         amplitude_high=amplitude_high, amplitude_low=amplitude_low,
                         offset=offset, period=period, roll=roll,
                         normalize_noise=normalize_noise, normalize=normalize)

    def init_state(self, ctx, key):
        st = super().init_state(ctx, key)
        st["counter"] = jnp.zeros((), jnp.int32)
        return st

    def _scaler(self, ctx):
        nd = len(ctx.shape)
        dim = self.dim % nd
        if self.flatten:
            dim_els = math.prod(ctx.shape[dim:])
            scaler_shape = (1,) * dim + tuple(ctx.shape[dim:])
        else:
            dim_els = ctx.shape[dim]
            scaler_shape = tuple(
                ctx.shape[d] if d == dim else 1 for d in range(nd)
            )
        fn = jnp.sin if self.mode.startswith("sin") else jnp.cos
        wave = fn(jnp.linspace(self.offset, self.offset + math.pi * self.period,
                               dim_els, dtype=ctx.dtype))
        scaler = 1.0 + jnp.where(wave < 0, wave * self.amplitude_low,
                                 wave * self.amplitude_high)
        return scaler.reshape(scaler_shape), dim

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        normalize = self.get_normalize("normalize", normalized)
        noise, state = self.child_sample("noise", ctx, state, key, sigma, sigma_next,
                                         normalized=self.normalize_noise)
        scaler, dim = self._scaler(ctx)
        shift = (jnp.asarray(self.roll) * state["counter"]).astype(jnp.int32)
        scaler = jnp.roll(scaler, shift, axis=dim)
        state = {**state, "counter": state["counter"] + 1}
        result = scale_noise(noise, self.factor, normalized=normalize) * scaler
        if self.mode.endswith("_copysign"):
            result = jnp.copysign(result, 1.0 - scaler)
        return result, state


# ---------------------------------------------------------------------------
# NormalizeToScaleNoise (py/noise.py:1205-1299)
# ---------------------------------------------------------------------------


class NormalizeToScaleNoise(WrapperNoise):
    CHILD_KEYS = ("noise",)

    def __init__(self, factor=1.0, *, noise, min_negative_value=-1.0,
                 max_negative_value=0.0, min_positive_value=0.0,
                 max_positive_value=1.0, mode="simple", dims=(),
                 std_dims=None, std_multiplier=0.0, mean_dims=None,
                 mean_multiplier=0.0, normalize_noise=False, normalize=None):
        if mode == "simple":
            if min_negative_value >= max_positive_value:
                raise ValueError(
                    "In simple mode, min_negative_value can't be >= max_positive_value"
                )
        elif mode == "advanced":
            if min_negative_value >= max_negative_value:
                raise ValueError(
                    "In advanced mode, min_negative_value can't be >= max_negative_value"
                )
            if min_positive_value >= max_positive_value:
                raise ValueError(
                    "In advanced mode, min_positive_value can't be >= max_positive_value"
                )
        else:
            raise ValueError("Bad mode")
        super().__init__(factor, noise=noise, mode=mode,
                         min_negative_value=min_negative_value,
                         max_negative_value=max_negative_value,
                         min_positive_value=min_positive_value,
                         max_positive_value=max_positive_value,
                         dims=tuple(dims) if dims else (),
                         std_dims=std_dims, std_multiplier=std_multiplier,
                         mean_dims=mean_dims, mean_multiplier=mean_multiplier,
                         normalize_noise=normalize_noise, normalize=normalize)

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        normalize = self.get_normalize("normalize", normalized)
        noise, state = self.child_sample("noise", ctx, state, key, sigma, sigma_next,
                                         normalized=self.normalize_noise)
        if self.mode == "simple":
            if noise.ndim < 2 or not self.dims:
                noise = normalize_to_scale(noise, self.min_negative_value,
                                           self.max_positive_value, dim=self.dims or None)
            else:
                # per-batch application (py/noise.py:1282-1284)
                noise = jax.vmap(
                    lambda n: normalize_to_scale(n, self.min_negative_value,
                                                 self.max_positive_value,
                                                 dim=tuple(d - 1 for d in self.dims if d > 0) or None)
                )(noise)
        else:
            adv = partial(normalize_to_scale_adv, min_pos=self.min_positive_value,
                          max_pos=self.max_positive_value,
                          min_neg=self.min_negative_value,
                          max_neg=self.max_negative_value, dim=())
            noise = jax.vmap(adv)(noise) if noise.ndim >= 2 and self.dims else adv(noise)
        if self.mean_multiplier != 0:
            noise = noise - jnp.mean(noise, axis=self.mean_dims, keepdims=True) * self.mean_multiplier
        if self.std_multiplier != 0:
            nstd = (tstd(noise, axis=self.std_dims, keepdims=True) - 1.0) * self.std_multiplier + 1.0
            noise = noise / jnp.where(nstd == 0, 1e-07, nstd)
        return scale_noise(noise, self.factor, normalized=normalize), state


# ---------------------------------------------------------------------------
# BlendedNoise (py/noise.py:1302-1407)
# ---------------------------------------------------------------------------


class BlendedNoise(WrapperNoise):
    CHILD_KEYS = ("custom_noise_1", "custom_noise_2", "custom_noise_mask")

    def __init__(self, factor=1.0, *, blend_function="lerp", custom_noise_1=None,
                 custom_noise_2=None, custom_noise_mask=None, noise_2_percent=0.5,
                 normalize=None):
        if custom_noise_1 is None and (custom_noise_mask is not None or noise_2_percent != 1):
            raise ValueError(
                "When custom_noise_1 is not attached noise_2_percent must be set to 1"
            )
        if custom_noise_2 is None and (custom_noise_mask is not None or noise_2_percent != 0):
            raise ValueError(
                "When custom_noise_2 is not attached noise_2_percent must be set to 0"
            )
        if custom_noise_mask is None and noise_2_percent == 1 and custom_noise_1 is None:
            custom_noise_1, custom_noise_2 = custom_noise_2, None
            noise_2_percent = 0.0
        super().__init__(factor, normalize=normalize,
                         blend_function=_resolve_blend(blend_function),
                         custom_noise_1=custom_noise_1, custom_noise_2=custom_noise_2,
                         custom_noise_mask=custom_noise_mask,
                         noise_2_percent=noise_2_percent)

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        normalize = self.get_normalize("normalize", normalized)
        k1, k2, km = jax.random.split(key, 3)
        n1, state = self.child_sample("custom_noise_1", ctx, state, k1, sigma,
                                      sigma_next, normalized=False)
        if self.custom_noise_2 is None:
            return scale_noise(n1, self.factor, normalized=normalize), state
        n2, state = self.child_sample("custom_noise_2", ctx, state, k2, sigma,
                                      sigma_next, normalized=False)
        if self.custom_noise_mask is not None:
            m, state = self.child_sample("custom_noise_mask", ctx, state, km, sigma,
                                         sigma_next, normalized=False)
            # reference normalize_to_scale default: per-batch (-3,-2,-1)
            # (py/utils.py:452-457; found by the live-reference oracle)
            t = jnp.clip(normalize_to_scale(m, 0.0, 1.0, dim=(-3, -2, -1))
                         + self.noise_2_percent, 0.0, 1.0)
        else:
            t = jnp.asarray(self.noise_2_percent, ctx.dtype)
        noise = self.blend_function(n1, n2, t)
        return scale_noise(noise, self.factor, normalized=normalize), state


# ---------------------------------------------------------------------------
# ResizedNoise (py/noise.py:1410-1518)
# ---------------------------------------------------------------------------


class ResizedNoise(WrapperNoise):
    CHILD_KEYS = ("custom_noise",)
    MIN_DIMS = 3

    def __init__(self, factor=1.0, *, custom_noise, width=32, height=32,
                 spatial_mode="absolute", spatial_compression=8,
                 upscale_mode="bilinear", downscale_mode="bilinear",
                 crop_mode="center", crop_offset_horizontal=0,
                 crop_offset_vertical=0, downscale_strategy="scale",
                 initial_reference="prefer_crop", normalize=None):
        super().__init__(factor, normalize=normalize, custom_noise=custom_noise,
                         width=width, height=height, spatial_mode=spatial_mode,
                         spatial_compression=spatial_compression,
                         upscale_mode=upscale_mode, downscale_mode=downscale_mode,
                         crop_mode=crop_mode,
                         crop_offset_horizontal=crop_offset_horizontal,
                         crop_offset_vertical=crop_offset_vertical,
                         downscale_strategy=downscale_strategy,
                         initial_reference=initial_reference)

    def _plan(self, ctx):
        """Static resize plan: (generation ctx, output transform)."""
        xh, xw = ctx.height, ctx.width
        height, width = self.height, self.width
        sc = self.spatial_compression
        if self.spatial_mode != "percentage":
            height //= sc
            width //= sc
        if self.spatial_mode == "absolute":
            nh, nw = int(height), int(width)
        elif self.spatial_mode == "relative":
            nh, nw = int(xh + height), int(xw + width)
        elif self.spatial_mode == "percentage":
            nh, nw = max(1, int(xh * height)), max(1, int(xw * width))
        else:
            raise ValueError("Bad spatial_mode")
        offsh = self.crop_offset_vertical // sc
        offsw = self.crop_offset_horizontal // sc
        if (xh, xw) == (nh, nw):
            return ctx, None
        gen_ctx = ctx.with_shape(tuple(ctx.shape[:-2]) + (nh, nw))
        # ``initial_reference`` controls how the exemplar latent is conformed
        # to the generation size before child samplers see it
        # (py/noise.py:1466-1494): when x is larger than the generation
        # size, prefer_crop crops it, prefer_scale downscales it; when x is
        # smaller it is always upscaled.
        ref = ctx.ref_like()
        if ref is not None:
            if xh >= nh and xw >= nw:
                if self.initial_reference == "prefer_crop":
                    ref = crop_samples(ref, nw, nh, mode=self.crop_mode,
                                       offset_width=offsw, offset_height=offsh)
                else:
                    ref = scale_samples(ref, nw, nh, mode=self.downscale_mode)
            else:
                ref = scale_samples(ref, nw, nh, mode=self.upscale_mode)
        import dataclasses as _dc

        gen_ctx = _dc.replace(gen_ctx, ref=ref)
        if xh >= nh and xw >= nw:
            out = partial(scale_samples, width=xw, height=xh, mode=self.upscale_mode)
        elif xh >= nh or xw >= nw:
            out = partial(scale_samples, width=xw, height=xh, mode=self.upscale_mode)
        elif self.downscale_strategy == "scale":
            out = partial(scale_samples, width=xw, height=xh, mode=self.downscale_mode)
        else:
            out = partial(crop_samples, width=xw, height=xh, mode=self.crop_mode,
                          offset_width=offsw, offset_height=offsh)
        return gen_ctx, out

    def child_ctx(self, ctx):
        return self._plan(ctx)[0]

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        normalize = self.get_normalize("normalize", normalized)
        gen_ctx, out = self._plan(ctx)
        if out is None:
            noise, state = self.child_sample("custom_noise", ctx, state, key, sigma,
                                             sigma_next, normalized=normalize)
            return noise * self.factor, state
        noise, state = self.child_sample("custom_noise", ctx, state, key, sigma,
                                         sigma_next, normalized=False)
        noise = out(scale_noise(noise, self.factor, normalized=normalize))
        return noise, state


# ---------------------------------------------------------------------------
# LatentOperationFilteredNoise (py/noise.py:1665-1698)
# ---------------------------------------------------------------------------


class LatentOperationFilteredNoise(WrapperNoise):
    CHILD_KEYS = ("noise",)

    def __init__(self, factor=1.0, *, noise, operations=(), normalize_noise=False,
                 normalize=None):
        super().__init__(factor, normalize=normalize, noise=noise,
                         operations=tuple(operations),
                         normalize_noise=normalize_noise)

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        normalize = self.get_normalize("normalize", normalized)
        noise, state = self.child_sample("noise", ctx, state, key, sigma, sigma_next,
                                         normalized=self.normalize_noise)
        for op in self.operations:
            noise = op(latent=noise, sigma=sigma)
        return scale_noise(noise, self.factor, normalized=normalize), state


# ---------------------------------------------------------------------------
# QuantileFilteredNoise (py/noise.py:1777-1819)
# ---------------------------------------------------------------------------


class QuantileFilteredNoise(WrapperNoise):
    CHILD_KEYS = ("noise",)

    def __init__(self, factor=1.0, *, noise, quantile=0.85, norm_dim=1,
                 norm_flatten=True, norm_fac=1.0, norm_pow=0.5,
                 strategy="clamp", normalize_noise=False, normalize=None):
        super().__init__(factor, normalize=normalize, noise=noise, quantile=quantile,
                         norm_dim=norm_dim, norm_flatten=norm_flatten,
                         norm_fac=norm_fac, norm_pow=norm_pow, strategy=strategy,
                         normalize_noise=normalize_noise)

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        normalize = self.get_normalize("normalize", normalized)
        noise, state = self.child_sample("noise", ctx, state, key, sigma, sigma_next,
                                         normalized=self.normalize_noise)
        noise = quantile_normalize(noise, quantile=self.quantile, dim=self.norm_dim,
                                   flatten=self.norm_flatten, nq_fac=self.norm_fac,
                                   pow_fac=self.norm_pow, strategy=self.strategy)
        return scale_noise(noise, self.factor, normalized=normalize), state


# ---------------------------------------------------------------------------
# PerDimNoise (py/noise.py:1822-1893)
# ---------------------------------------------------------------------------


class PerDimNoise(WrapperNoise):
    CHILD_KEYS = ("noise",)

    def __init__(self, factor=1.0, *, noise, dim=0, offset=0, chunk_size=1,
                 shrink_dim=True, normalize_noise=False, normalize=None):
        super().__init__(factor, normalize=normalize, noise=noise, dim=dim,
                         offset=offset, chunk_size=chunk_size, shrink_dim=shrink_dim,
                         normalize_noise=normalize_noise)

    def _dim(self, ctx):
        nd = len(ctx.shape)
        dim = self.dim if self.dim >= 0 else nd + self.dim
        if dim < 0 or dim >= nd:
            raise ValueError("Dimension out of range")
        return dim

    def child_ctx(self, ctx):
        import dataclasses

        dim = self._dim(ctx)
        if self.shrink_dim:
            if self.offset + self.chunk_size > ctx.shape[dim]:
                raise ValueError("Offset or chunk size incompatible with tensor")
            shape = tuple(
                self.chunk_size if d == dim else s for d, s in enumerate(ctx.shape)
            )
            # the reference builds the child sampler on the exemplar slice
            # x[offset : offset+chunk_size] along dim (py/noise.py:1857-1864)
            # so ref-consuming children see that window, not the full latent
            ref = ctx.ref
            if ref is not None and tuple(jnp.shape(ref)) == tuple(ctx.shape):
                sl = tuple(
                    slice(self.offset, self.offset + self.chunk_size)
                    if d == dim else slice(None)
                    for d in range(len(ctx.shape))
                )
                ref = ref[sl]
            return dataclasses.replace(ctx, shape=shape, ref=ref)
        return ctx

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        normalize = self.get_normalize("normalize", normalized)
        dim = self._dim(ctx)
        dim_size = ctx.shape[dim]
        state = dict(state)  # never mutate the caller's state pytree
        cstate = state["noise"]
        if self.shrink_dim:
            chunks = []
            for i in range(dim_size):
                ni, cstate = getattr(self, "noise").sample(
                    self.child_ctx(ctx), cstate, jax.random.fold_in(key, i),
                    sigma, sigma_next, normalized=self.normalize_noise)
                chunks.append(ni)
            noise = jnp.concatenate(chunks, axis=dim)
            sl = tuple(
                slice(-dim_size, None) if d == dim else slice(None)
                for d in range(len(ctx.shape))
            )
            noise = noise[sl]
        else:
            n_chunks = math.ceil(dim_size / self.chunk_size)
            pieces = []
            for ci in range(n_chunks):
                full, cstate = getattr(self, "noise").sample(
                    ctx, cstate, jax.random.fold_in(key, ci), sigma,
                    sigma_next, normalized=self.normalize_noise)
                start = ci * self.chunk_size
                stop = min(start + self.chunk_size, dim_size)
                sl = tuple(
                    slice(start, stop) if d == dim else slice(None)
                    for d in range(len(ctx.shape))
                )
                pieces.append(full[sl])
            noise = jnp.concatenate(pieces, axis=dim)
        state["noise"] = cstate
        return scale_noise(noise, self.factor, normalized=normalize), state


# ---------------------------------------------------------------------------
# ShuffledNoise (py/noise.py:1896-2013)
# ---------------------------------------------------------------------------


class ShuffledNoise(WrapperNoise):
    CHILD_KEYS = ("noise",)

    def __init__(self, factor=1.0, *, noise, dims=(-1,), percentages=(1.0,),
                 no_identity=False, fork_rng=True, normalize=None):
        if not all(0.0 <= p <= 1.0 for p in percentages):
            raise ValueError("Percentage out of range, must be between 0 and 1")
        super().__init__(factor, normalize=normalize, noise=noise, dims=tuple(dims),
                         percentages=tuple(percentages), no_identity=no_identity,
                         fork_rng=fork_rng)

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        nd = len(ctx.shape)
        dims = tuple(d if d >= 0 else nd + d for d in self.dims)
        if not all(0 <= d < nd for d in dims):
            raise ValueError("Dimension out of range")
        kn, ks = jax.random.split(key)
        noise, state = self.child_sample("noise", ctx, state, kn, sigma, sigma_next,
                                         normalized=normalized)
        if not self.percentages or not dims or all(p == 0 for p in self.percentages):
            return noise, state
        noise = scale_noise(noise, self.factor, normalized=normalized)
        np_ = len(self.percentages)
        for idx, dim in enumerate(dims):
            noise = elementwise_shuffle_by_dim(
                noise, jax.random.fold_in(ks, idx), dim=dim,
                prob=self.percentages[idx % np_], no_identity=self.no_identity,
            )
        return noise, state


# ---------------------------------------------------------------------------
# PatternBreakNoise (py/noise.py:2016-2077)
# ---------------------------------------------------------------------------


class PatternBreakNoise(WrapperNoise):
    CHILD_KEYS = ("noise",)

    def __init__(self, factor=1.0, *, noise, detail_level=0.0, percentage=1.0,
                 restore_scale=True, blend_mode="lerp", blend_function=None):
        super().__init__(factor, noise=noise, detail_level=detail_level,
                         percentage=percentage, restore_scale=restore_scale,
                         blend_function=blend_function or BLENDING_MODES[blend_mode])

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        if self.percentage == 0:
            return self.child_sample("noise", ctx, state, key, sigma, sigma_next,
                                     normalized=normalized)
        noise, state = self.child_sample("noise", ctx, state, key, sigma, sigma_next,
                                         normalized=False)
        noise = pattern_break(noise, percentage=self.percentage,
                              detail_level=self.detail_level,
                              blend_function=self.blend_function,
                              restore_scale=self.restore_scale)
        return scale_noise(noise, self.factor, normalized=normalized), state


# ---------------------------------------------------------------------------
# CustomNoiseParametersNoise (py/noise.py:2080-2187)
# ---------------------------------------------------------------------------


class CustomNoiseParametersNoise(WrapperNoise):
    """Parameter-override wrapper. TPU notes:

    * ``override_device`` / ``cpu`` is accepted but a no-op — XLA owns
      placement and JAX RNG streams are backend-independent, which is the
      property the reference's CPU default existed to approximate.
    * RNG regimes ``separate``/``fork`` (py/noise.py:2139-2170) are the
      default behavior of explicit keys; ``rng_offset_mode`` still changes
      stream identity via key derivation.
    """

    CHILD_KEYS = ("noise",)

    def __init__(self, factor=1.0, *, noise, override_dtype=None,
                 override_device=None, frames_to_channels=False,
                 ensure_square_aspect_ratio=False, fix_invalid=False,
                 rng_mode="default", rng_offset_mode="disabled",
                 rng_state_offset=0, normalize=None):
        super().__init__(factor, normalize=normalize, noise=noise,
                         override_dtype=override_dtype,
                         override_device=override_device,
                         frames_to_channels=frames_to_channels,
                         ensure_square_aspect_ratio=ensure_square_aspect_ratio,
                         fix_invalid=fix_invalid, rng_mode=rng_mode,
                         rng_offset_mode=rng_offset_mode,
                         rng_state_offset=rng_state_offset)

    def child_ctx(self, ctx):
        import dataclasses

        shape = tuple(ctx.shape)
        ref = ctx.ref if ctx.ref is not None else None
        if len(shape) == 5 and self.frames_to_channels:
            shape = (shape[0], shape[1] * shape[2]) + shape[3:]
            if ref is not None and tuple(jnp.shape(ref)) == tuple(ctx.shape):
                ref = jnp.reshape(ref, shape)
        self._spatdims = 1 if len(shape) == 3 else 2
        self._hw = shape[-self._spatdims:]
        if self.ensure_square_aspect_ratio:
            height = 1 if len(shape) == 3 else shape[-2]
            width = shape[-1]
            hw = (height * width) ** 0.5
            if not float(hw).is_integer():
                hw = math.ceil(hw)
                shape = shape[: -self._spatdims] + (hw, hw)
        dtype = self.override_dtype or ctx.dtype
        return dataclasses.replace(ctx, shape=shape, dtype=dtype, ref=ref)

    def init_state(self, ctx, key):
        if self.rng_offset_mode == "override":
            key = jax.random.key(self.rng_state_offset)
        elif self.rng_offset_mode == "add":
            key = jax.random.fold_in(key, self.rng_state_offset)
        st = super().init_state(ctx, key)
        if self.rng_offset_mode == "override":
            # the reference seeds a SEPARATE RNG from rng_state_offset and
            # advances it per call (py/noise.py:2139-2170) — carry a draw
            # counter so the override stream advances and stays independent
            # of the base seed
            st = {**st, "_rng_i": jnp.zeros((), jnp.int32)}
        return st

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        normalize = self.get_normalize("normalize", normalized)
        if self.rng_offset_mode == "override":
            key = jax.random.fold_in(jax.random.key(self.rng_state_offset),
                                     state["_rng_i"])
            state = {**state, "_rng_i": state["_rng_i"] + 1}
        elif self.rng_offset_mode == "add":
            key = jax.random.fold_in(key, self.rng_state_offset)
        cctx = self.child_ctx(ctx)
        noise, state = self.child_sample("noise", ctx, state, key, sigma, sigma_next,
                                         normalized=False)
        if self.fix_invalid:
            finite = jnp.nan_to_num(noise, nan=0.0, posinf=0.0, neginf=0.0)
            noise = jnp.nan_to_num(noise, nan=0.0, posinf=float("inf"),
                                   neginf=float("-inf"))
            noise = jnp.where(jnp.isposinf(noise), jnp.max(finite), noise)
            noise = jnp.where(jnp.isneginf(noise), jnp.min(finite), noise)
        if self.ensure_square_aspect_ratio and cctx.shape != tuple(ctx.shape):
            spat = self._spatdims
            hw = self._hw
            flat = noise.reshape(noise.shape[:-spat] + (-1,))
            flat = flat[..., : math.prod(hw)]
            noise = flat.reshape(flat.shape[:-1] + tuple(hw))
        if noise.shape != tuple(ctx.shape):
            noise = noise.reshape(tuple(ctx.shape))
        noise = noise.astype(ctx.dtype)
        return scale_noise(noise, self.factor, normalized=normalize), state


__all__ = [
    "BlendedNoise",
    "ChannelNoise",
    "CompositeNoise",
    "CustomNoiseParametersNoise",
    "GuidedNoise",
    "LatentOperationFilteredNoise",
    "ModulatedNoise",
    "NormalizeToScaleNoise",
    "PatternBreakNoise",
    "PerDimNoise",
    "QuantileFilteredNoise",
    "RandomNoise",
    "RepeatedNoise",
    "ResizedNoise",
    "RippleFilteredNoise",
    "ScheduledNoise",
    "ShuffledNoise",
]
