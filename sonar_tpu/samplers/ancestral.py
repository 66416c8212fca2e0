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
