"""Sigma-windowed latent operations (reference: py/latent_ops.py, 209 LoC).

TPU redesign: ``sigma`` is traced inside the sampling loop, so the
enable-window is a traced ``jnp.where`` select (the reference does a host
``.item()`` per call). Operations are pure callables
``op(latent=..., sigma=..., **extra) -> latent``; ops that need randomness
derive a key deterministically from (seed, sigma bits) instead of mutating
global RNG (replaces SonarLatentOperationSetSeed's save/restore dance,
py/latent_ops.py:189-209).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

from ..core.blend import BLENDING_MODES
from ..core.normalize import quantile_normalize
from ..noise.base import NoiseItem, make_noise_sampler


def _sigma_scalar(sigma):
    return None if sigma is None else jnp.max(jnp.asarray(sigma))


class SonarLatentOperation:
    """Sigma-window gate around an op (py/latent_ops.py:15-58)."""

    EXTENDED_LATENT_OPERATION = True

    def __init__(self, *, start_sigma: float = math.inf, end_sigma: float = 0.0,
                 op: Callable | None = None):
        self.start_sigma = start_sigma if start_sigma >= 0 else math.inf
        self.end_sigma = end_sigma
        self.op = op

    def enabled(self, sigma=None):
        if sigma is None:
            return True
        s = _sigma_scalar(sigma)
        return (self.end_sigma <= s) & (s <= self.start_sigma)

    def call_op(self, t, *, op=None, **kwargs):
        op = op if op is not None else self.op
        if op is None:
            return t
        if not getattr(op, "EXTENDED_LATENT_OPERATION", False):
            return op(latent=t)
        return op(latent=t, **kwargs)

    def __call__(self, latent, *, sigma=None, **kwargs):
        out = self.call_op(latent, sigma=sigma, **kwargs)
        en = self.enabled(sigma)
        if en is True:
            return out
        return jnp.where(en, out, latent)


class SonarLatentOperationAdvanced(SonarLatentOperation):
    """Input/output/difference multipliers around a chained op list
    (py/latent_ops.py:61-106). The reference's inverted ``== 1.0``
    output_multiplier comparison (py/latent_ops.py:102) is preserved for
    parity — set ``strict_reference_compat=False`` for the obvious fix."""

    def __init__(self, *, blend_mode: str = "inject", blend_strength: float = 1.0,
                 input_multiplier: float = 1.0, output_multiplier: float = 1.0,
                 difference_multiplier: float = 1.0, ops: Sequence = (),
                 op_alt=None, strict_reference_compat: bool = True, **kwargs):
        super().__init__(**kwargs)
        self.blend_function = BLENDING_MODES[blend_mode]
        self.blend_strength = blend_strength
        self.input_multiplier = input_multiplier
        self.output_multiplier = output_multiplier
        self.difference_multiplier = difference_multiplier
        self.ops = tuple(ops)
        self.op_alt = op_alt
        self.strict_reference_compat = strict_reference_compat

    def __call__(self, latent, *, sigma=None, **kwargs):
        t = latent
        output = t * self.input_multiplier if self.input_multiplier != 1.0 else t
        for op in self.ops:
            output = self.call_op(output, sigma=sigma, op=op, **kwargs)
        apply_mult = (
            self.output_multiplier == 1.0
            if self.strict_reference_compat
            else self.output_multiplier != 1.0
        )
        diff = (output * self.output_multiplier if apply_mult else output) - t
        if self.difference_multiplier != 1.0:
            diff = diff * self.difference_multiplier
        result = self.blend_function(t, diff, self.blend_strength)
        en = self.enabled(sigma)
        alt = (
            t if self.op_alt is None
            else self.call_op(t, sigma=sigma, op=self.op_alt, **kwargs)
        )
        if en is True:
            return result
        return jnp.where(en, result, alt)


class SonarLatentOperationNoise(SonarLatentOperation):
    """Adds custom noise to the latent (py/latent_ops.py:109-187).

    Key derivation replaces the reference's per-call ``torch.randint`` seed:
    a fixed base key folded with the sigma bit pattern — reproducible and
    jit-safe; pass ``key=...`` at call time to control the stream."""

    def __init__(self, *, custom_noise: NoiseItem, scale_to_sigma: bool = False,
                 normalize: bool = True, seed: int = 0, sample_sigmas=None,
                 **kwargs):
        super().__init__(**kwargs)
        self.custom_noise = custom_noise
        self.scale_to_sigma = scale_to_sigma
        self.normalize = normalize
        self.seed = seed
        self.sample_sigmas = sample_sigmas

    def __call__(self, latent, *, sigma=None, key=None, **kwargs):
        t = latent
        s = _sigma_scalar(sigma)
        sigma_next = s
        sigma_min = sigma_max = None
        if self.sample_sigmas is not None and s is not None:
            import numpy as np

            tbl = np.asarray(self.sample_sigmas)
            pos = tbl[tbl > 0]
            sigma_min = float(pos.min()) if pos.size else 0.0
            sigma_max = float(tbl.max())
            # derive sigma_next from the step table like the reference
            # (py/latent_ops.py:148-155): only when sigma matches a table
            # entry exactly and a next entry exists — otherwise keep
            # sigma_next = sigma. Traced equivalent of the host lookup.
            tbl_j = jnp.asarray(tbl, jnp.float32)
            gstep = jnp.argmin(jnp.abs(tbl_j - s))
            use = (tbl_j[gstep] == s) & (gstep + 1 < tbl_j.shape[0])
            nxt = tbl_j[jnp.minimum(gstep + 1, tbl_j.shape[0] - 1)]
            sigma_next = jnp.where(use, nxt, s)
        if key is None:
            key = jax.random.key(self.seed)
            if s is not None:
                bits = jax.lax.bitcast_convert_type(
                    jnp.asarray(s, jnp.float32), jnp.int32)
                key = jax.random.fold_in(key, bits & 0x7FFFFFFF)
        fn, state = make_noise_sampler(
            self.custom_noise, t.shape, dtype=t.dtype, seed=key,
            sigma_min=sigma_min, sigma_max=sigma_max, normalized=self.normalize,
            ref_latent=t)
        noise, _state = fn(state, s, sigma_next)
        if self.scale_to_sigma and s is not None:
            noise = noise * s
        out = t + noise
        en = self.enabled(sigma)
        if en is True:
            return out
        return jnp.where(en, out, t)


class SonarLatentOperationQuantileFilter(SonarLatentOperation):
    """quantile_normalize as a latent operation
    (py/nodes/latent_operations.py:317-352)."""

    def __init__(self, *, quantile=0.85, dim=1, flatten=True, nq_fac=1.0,
                 pow_fac=0.5, strategy="clamp", **kwargs):
        super().__init__(**kwargs)
        self.qn_kwargs = dict(quantile=quantile, dim=dim, flatten=flatten,
                              nq_fac=nq_fac, pow_fac=pow_fac, strategy=strategy)

    def __call__(self, latent, *, sigma=None, **kwargs):
        out = quantile_normalize(latent, **self.qn_kwargs)
        en = self.enabled(sigma)
        if en is True:
            return out
        return jnp.where(en, out, latent)


def apply_operations(latent, operations: Sequence, *, sigma=None, **kwargs):
    for op in operations:
        latent = op(latent=latent, sigma=sigma, **kwargs) if getattr(
            op, "EXTENDED_LATENT_OPERATION", False) else op(latent=latent)
    return latent
