"""k-diffusion step primitives (semantics of comfy.k_diffusion.sampling)."""

from __future__ import annotations

import jax.numpy as jnp


def to_d(x, sigma, denoised):
    """Convert a denoised prediction to the ODE derivative d = (x - D)/sigma."""
    return (x - denoised) / sigma


def get_ancestral_step(sigma, sigma_next, eta: float = 1.0):
    """Ancestral split of a step into (sigma_down, sigma_up).

    sigma_up = min(sigma_next, eta * sqrt(sigma_next^2 (sigma^2 - sigma_next^2) / sigma^2))
    sigma_down = sqrt(sigma_next^2 - sigma_up^2)
    """
    if not eta:
        return sigma_next, jnp.zeros_like(sigma_next)
    sigma_up = jnp.minimum(
        sigma_next,
        eta * jnp.sqrt(sigma_next**2 * (sigma**2 - sigma_next**2) / sigma**2),
    )
    sigma_down = jnp.sqrt(sigma_next**2 - sigma_up**2)
    return sigma_down, sigma_up


def get_ancestral_step_rf(sigma, sigma_next, eta: float = 1.0):
    """Rectified-flow ancestral split → (sigma_down, sigma_up, alpha_ratio).

    For flow models sigma is the interpolation time of
    ``x = (1-sigma)*x0 + sigma*noise``, so the VP-style split above is
    wrong — the noise a step removes lives in BOTH coefficients. The RF
    split steps to ``sigma_down = sigma_next * (1 + (sigma_next/sigma - 1)
    * eta)``, rescales the latent by ``alpha_ratio = (1-sigma_next)/
    (1-sigma_down)`` and re-injects ``sigma_up = sqrt(sigma_next^2 -
    sigma_down^2 * alpha_ratio^2)`` of fresh noise — chosen so the
    marginal at sigma_next is exact when the model is. eta=0 reduces to
    (sigma_next, 0, 1): the deterministic flow ODE step."""
    if not eta:
        one = jnp.ones_like(sigma_next)
        return sigma_next, jnp.zeros_like(sigma_next), one
    ratio = 1.0 + (sigma_next / sigma - 1.0) * eta
    # descending schedules give ratio <= 1 so sigma_down <= sigma_next < 1;
    # an ASCENDING pair (restart-style jumps, user schedules) gives
    # ratio > 1 and can push sigma_down past 1, where the alpha_down
    # division explodes (~1e9 x latent). The split is undefined there —
    # clamp to the deterministic step (sigma_down = sigma_next, no noise),
    # matching the eta=0 behavior for that pair.
    # (lower clamp: eta > 1 can drive ratio negative — floor at 0)
    sigma_down = jnp.clip(sigma_next * ratio, 0.0, sigma_next)
    # alpha_down = 0 only if sigma_down = 1, i.e. sigma = sigma_next = 1:
    # then alpha_ratio = 0 and sigma_up = sigma_next — the step discards
    # the latent and re-draws pure noise, which IS the exact marginal at
    # flow time 1. Guard only the division.
    alpha_down = jnp.maximum(1.0 - sigma_down, 1e-10)
    alpha_ratio = (1.0 - sigma_next) / alpha_down
    sigma_up = jnp.sqrt(
        jnp.maximum(sigma_next**2 - sigma_down**2 * alpha_ratio**2, 0.0))
    return sigma_down, sigma_up, alpha_ratio
