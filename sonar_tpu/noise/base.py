"""The noise protocol — TPU-native redesign of the reference's closure tree.

Reference model (py/noise.py:30-257): ``CustomNoiseItemBase`` objects build
stateful Python closures ``(sigma, sigma_next) -> Tensor`` that mutate global
torch RNG state. That cannot compile into a ``lax.scan``.

TPU model: a noise *spec* is a static, immutable Python config object (part
of the trace, never a traced value). A spec knows how to

- ``init_state(ctx, key) -> pytree``   — explicit persistent state (Brownian
  bridge keys, repeated-noise caches, Voronoi z-walk, ...), and
- ``sample(ctx, state, key, sigma, sigma_next, normalized) -> (noise, state)``
  — a pure function of state + PRNG key + traced sigmas.

``make_noise_sampler`` assembles the whole tree into one pure step function
plus an initial state pytree, so an entire 30-step sampling loop containing
arbitrary noise compositions compiles into a single ``lax.scan``.

Normalization contract (matching py/noise.py:164-196 + 249-257): parents
request normalization of their children via the ``normalized`` argument;
chains build children with ``normalized=False`` and normalize the sum once;
an item's own tri-state ``normalize`` field overrides the parent's request.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..core.normalize import scale_noise
from ..core.rng import derive_key, key_from_seed


@dataclasses.dataclass(frozen=True)
class NoiseCtx:
    """Static sampling context captured from the exemplar latent.

    Mirrors what ``NoiseGenerator.update_x`` caches (py/noise_generation.py:
    120-131) minus device bookkeeping (XLA owns placement).
    """

    shape: tuple[int, ...]
    dtype: Any = jnp.float32
    sigma_min: float | None = None
    sigma_max: float | None = None
    # The exemplar latent ``x`` the sampler was built from (py/noise.py passes
    # x into every make_noise_sampler; e.g. ModulatedNoise modulates against
    # it by default, py/noise.py:846). May be a traced value; excluded from
    # equality so NoiseCtx stays usable as a plain config record.
    ref: Any = dataclasses.field(default=None, compare=False, repr=False)

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def batch(self) -> int:
        return self.shape[0]

    @property
    def channels(self) -> int:
        return self.shape[1]

    @property
    def frames(self) -> int | None:
        return self.shape[-3] if self.ndim == 5 else None

    @property
    def height(self) -> int:
        return self.shape[-2]

    @property
    def width(self) -> int:
        return self.shape[-1]

    def with_shape(self, shape: tuple[int, ...]) -> "NoiseCtx":
        return dataclasses.replace(self, shape=tuple(shape))

    def ref_like(self):
        """The exemplar latent conformed to this ctx's shape, or None.

        Spatial-only mismatches are bicubic-resized (the reference's
        interpolate fallback, py/noise.py:582-589); any other mismatch
        returns None so callers fall back to their no-reference path.
        """
        if self.ref is None:
            return None
        ref = jnp.asarray(self.ref).astype(self.dtype)
        if tuple(ref.shape) == tuple(self.shape):
            return ref
        if (
            ref.ndim == self.ndim
            and ref.ndim >= 3
            and tuple(ref.shape[:-2]) == tuple(self.shape[:-2])
        ):
            from ..ops.resample import scale_samples

            return scale_samples(ref, self.width, self.height, mode="bicubic")
        return None

    def adjusted_shape(self) -> tuple[int, ...]:
        """5D (B,C,F,H,W) folded to (B,C*F,H,W) for 2D-spatial algorithms
        (py/noise_generation.py:182-209)."""
        if self.ndim == 5:
            return (self.batch, self.channels * self.frames, self.height, self.width)
        return self.shape


def fix_output_frames(ctx: NoiseCtx, noise: jax.Array) -> jax.Array:
    if ctx.ndim == 5 and noise.shape != ctx.shape:
        return noise.reshape(ctx.shape)
    return noise


class NoiseItem:
    """Base spec for every node in a noise-composition tree.

    Equivalent of ``CustomNoiseItemBase`` (py/noise.py:30-80), but immutable
    config: ``clone`` is trivially a field-copy, and there is no hidden RNG.
    Subclasses declare their config as keyword fields captured by __init__.
    """

    MIN_DIMS = 1
    MAX_DIMS = 0

    def __init__(self, factor: float = 1.0, *, normalize: bool | None = None, **kwargs):
        self.factor = factor
        self.normalize = normalize
        self._keys = ("factor", "normalize", *kwargs.keys())
        for k, v in kwargs.items():
            setattr(self, k, v)

    # -- config plumbing ----------------------------------------------------
    def params(self) -> dict:
        return {k: getattr(self, k) for k in self._keys}

    @staticmethod
    def _clone_value(v):
        """Deep-clone child items inside param values (the reference's
        per-class ``clone_key`` overrides, py/noise.py:62-67, generalized)."""
        if isinstance(v, NoiseItem):
            return v.clone()
        if isinstance(v, list):
            return [NoiseItem._clone_value(i) for i in v]
        if isinstance(v, tuple):
            return tuple(NoiseItem._clone_value(i) for i in v)
        return v

    def cloned_params(self) -> dict:
        return {k: self._clone_value(v) for k, v in self.params().items()}

    def clone(self) -> "NoiseItem":
        p = self.cloned_params()
        factor = p.pop("factor")
        # The base __init__ records ``normalize`` for every item, but some
        # subclasses expose only normalize_result/_noise/... — drop params
        # their __init__ doesn't accept (only reachable at the default).
        import inspect

        sig = inspect.signature(self.__class__.__init__)
        if not any(
            prm.kind == prm.VAR_KEYWORD for prm in sig.parameters.values()
        ):
            allowed = set(sig.parameters) - {"self", "factor"}
            p = {k: v for k, v in p.items() if k in allowed}
        return self.__class__(factor, **p)

    def set_factor(self, factor: float) -> "NoiseItem":
        self.factor = factor
        return self

    def get_normalize(self, k: str, default=None):
        val = getattr(self, k, None)
        return default if val is None else val

    def __repr__(self) -> str:
        body = ", ".join(f"{k}={v!r}" for k, v in self.params().items())
        return f"{self.__class__.__name__}({body})"

    # -- the protocol --------------------------------------------------------
    def check_dims(self, ctx: NoiseCtx) -> None:
        if ctx.ndim < self.MIN_DIMS:
            raise ValueError(
                f"{self.__class__.__name__} requires at least {self.MIN_DIMS} "
                f"dimension(s) but got shape {ctx.shape}"
            )
        if self.MAX_DIMS > 0 and ctx.ndim > self.MAX_DIMS:
            raise ValueError(
                f"{self.__class__.__name__} requires at most {self.MAX_DIMS} "
                f"dimension(s) but got shape {ctx.shape}"
            )

    def init_state(self, ctx: NoiseCtx, key: jax.Array):
        """Build this node's persistent state pytree (default: empty)."""
        del ctx, key
        return ()

    def sample(
        self,
        ctx: NoiseCtx,
        state,
        key: jax.Array,
        sigma,
        sigma_next,
        *,
        normalized: bool = True,
    ):
        raise NotImplementedError

    # -- effective-factor helper ----------------------------------------------
    def apply_factor_normalize(self, noise: jax.Array, *, normalized: bool) -> jax.Array:
        """The leaf-wrapper semantics of ``NoiseSampler.__call__``
        (py/noise.py:249-257): one scale_noise with this item's factor."""
        eff = self.normalize if self.normalize is not None else normalized
        return scale_noise(noise, self.factor, normalized=bool(eff))


SampleFn = Callable  # (state, sigma, sigma_next) -> (noise, state)


def make_noise_sampler(
    item: NoiseItem,
    shape: tuple[int, ...],
    *,
    dtype=jnp.float32,
    sigma_min=None,
    sigma_max=None,
    seed: int | jax.Array | None = None,
    normalized: bool = True,
    ref_latent=None,
) -> tuple[SampleFn, Any]:
    """Build ``(sample_fn, init_state)`` for a noise spec tree.

    ``sample_fn(state, sigma, sigma_next) -> (noise, new_state)`` is pure and
    jit/scan-safe; the per-call PRNG stream advance is a ``split`` carried in
    the state, so repeated calls yield independent draws and the whole thing
    is reproducible from ``seed`` on any backend.

    ``ref_latent`` is the exemplar latent ``x`` (the reference passes x into
    every sampler build, py/noise.py:249); items like ModulatedNoise and
    GuidedNoise consult it via ``ctx.ref``. It may be a traced value when
    called inside jit.
    """
    ctx = NoiseCtx(
        shape=tuple(shape), dtype=dtype, sigma_min=sigma_min, sigma_max=sigma_max,
        ref=ref_latent,
    )
    item.check_dims(ctx)
    key = seed if isinstance(seed, jax.Array) else key_from_seed(seed)
    state0 = {"key": key, "node": item.init_state(ctx, derive_key(key, "init"))}

    def sample_fn(state, sigma, sigma_next):
        key, sub = jax.random.split(state["key"])
        sigma = None if sigma is None else jnp.asarray(sigma)
        sigma_next = None if sigma_next is None else jnp.asarray(sigma_next)
        noise, node_state = item.sample(
            ctx, state["node"], sub, sigma, sigma_next, normalized=normalized
        )
        return noise.astype(dtype), {"key": key, "node": node_state}

    return sample_fn, state0


class NoiseSamplerHandle:
    """Stateful convenience wrapper with the reference's calling convention
    ``ns(sigma, sigma_next) -> noise`` for eager / host-loop use.

    Inside jit/scan use :func:`make_noise_sampler` directly and carry the
    state yourself.
    """

    def __init__(self, item: NoiseItem, shape, **kwargs):
        self.sample_fn, self.state = make_noise_sampler(item, shape, **kwargs)

    def __call__(self, sigma=None, sigma_next=None):
        noise, self.state = self.sample_fn(self.state, sigma, sigma_next)
        return noise
