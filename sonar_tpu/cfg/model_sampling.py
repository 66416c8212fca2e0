"""Model-sampling protocol: the minimal surface WCFG/FreeU need from the
host (ComfyUI's ``model.model_sampling``): ``sigma_min``, ``sigma_max`` and
``timestep(sigma) -> [0, 999]``.

Two implementations:
- :class:`DiscreteSampling` — a 1000-entry sigma table (SD1.5/SDXL style);
  ``timestep`` is a traced interpolated table lookup.
- :class:`ContinuousEDM` — log-sigma linear mapping (EDM-style models).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


def make_beta_sigmas(n: int = 1000, beta_start: float = 0.00085,
                     beta_end: float = 0.012) -> np.ndarray:
    """Standard scaled-linear DDPM sigma table (SD1.x/SDXL)."""
    betas = np.linspace(beta_start**0.5, beta_end**0.5, n) ** 2
    alphas_cumprod = np.cumprod(1.0 - betas)
    return np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)


@dataclasses.dataclass(frozen=True)
class DiscreteSampling:
    sigmas: np.ndarray = dataclasses.field(default_factory=make_beta_sigmas)

    @property
    def sigma_min(self) -> float:
        return float(self.sigmas[0])

    @property
    def sigma_max(self) -> float:
        return float(self.sigmas[-1])

    def timestep(self, sigma):
        """Traced: fractional index of sigma in the (ascending) table —
        piecewise-linear in log-sigma, any input shape."""
        log_sigmas = jnp.log(jnp.asarray(self.sigmas, jnp.float32))
        log_sigma = jnp.log(jnp.maximum(jnp.asarray(sigma, jnp.float32), 1e-10))
        return jnp.interp(
            log_sigma, log_sigmas,
            jnp.arange(len(self.sigmas), dtype=jnp.float32),
        )

    def percent_to_sigma(self, percent: float) -> float:
        """ComfyUI's percent→sigma (1.0 = sigma_min end, 0.0 = sigma_max)."""
        if percent <= 0.0:
            return 999999999.9
        if percent >= 1.0:
            return 0.0
        last = len(self.sigmas) - 1
        ts = round((1.0 - percent) * last)
        return float(self.sigmas[max(0, min(last, ts))])


@dataclasses.dataclass(frozen=True)
class ContinuousEDM:
    sigma_min_val: float = 0.002
    sigma_max_val: float = 120.0

    @property
    def sigma_min(self) -> float:
        return self.sigma_min_val

    @property
    def sigma_max(self) -> float:
        return self.sigma_max_val

    def timestep(self, sigma):
        lo, hi = np.log(self.sigma_min_val), np.log(self.sigma_max_val)
        pct = (jnp.log(jnp.maximum(jnp.asarray(sigma), 1e-10)) - lo) / (hi - lo)
        return jnp.clip(pct, 0.0, 1.0) * 999.0

    def percent_to_sigma(self, percent: float) -> float:
        if percent <= 0.0:
            return 999999999.9
        if percent >= 1.0:
            return 0.0
        lo, hi = np.log(self.sigma_min_val), np.log(self.sigma_max_val)
        return float(np.exp(hi + (lo - hi) * percent))


def max_denoise(model_sampling, sigma0) -> bool:
    """ComfyUI's max-denoise rule (reference misc.py:99-106): the entry
    sigma counts as "full denoise" when it reaches the model's sigma_max
    within 1e-5 relative tolerance, or exceeds it. Shared by
    api.functions.noisy_latent_like and SonarPipeline.prepare_latent so
    the tolerance can never silently diverge between the two."""
    import math

    m = float(model_sampling.sigma_max)
    s0 = float(sigma0)
    return math.isclose(m, s0, rel_tol=1e-05) or s0 > m


def time_snr_shift(alpha: float, t):
    """Resolution-shifted flow time: ``alpha*t / (1 + (alpha-1)*t)``.

    The standard SD3/Flux timestep shift — ``alpha > 1`` spends more of the
    schedule at high noise (needed at high resolution). Works on scalars
    and arrays (numpy or traced)."""
    if alpha == 1.0:
        return t
    return alpha * t / (1 + (alpha - 1) * t)


@dataclasses.dataclass(frozen=True)
class Flow:
    """Rectified-flow model sampling (SD3/Flux family).

    Sigma doubles as flow time: ``x_t = (1 - sigma)*x0 + sigma*noise`` with
    ``sigma in (0, 1]``, so ``sigma_max = 1.0`` and the conditioning
    timestep is simply ``sigma * multiplier``. ``shift`` applies the
    resolution shift to the per-timestep table (and to percent windows),
    matching the host-side ModelSamplingDiscreteFlow protocol the reference's
    patches consume (WCFG/FreeU sigma windows, schedules)."""

    shift: float = 1.0
    multiplier: float = 1000.0
    timesteps: int = 1000

    @property
    def sigmas(self) -> np.ndarray:
        t = np.arange(1, self.timesteps + 1, dtype=np.float64) / self.timesteps
        return np.asarray(time_snr_shift(self.shift, t), np.float32)

    @property
    def sigma_min(self) -> float:
        return float(self.sigmas[0])

    @property
    def sigma_max(self) -> float:
        return float(self.sigmas[-1])

    def timestep(self, sigma):
        return jnp.asarray(sigma) * self.multiplier

    def sigma(self, timestep):
        return time_snr_shift(self.shift,
                              jnp.asarray(timestep) / self.multiplier)

    def percent_to_sigma(self, percent: float) -> float:
        if percent <= 0.0:
            return 1.0
        if percent >= 1.0:
            return 0.0
        return float(time_snr_shift(self.shift, 1.0 - percent))
