"""Reference-latent guidance (py/sonar.py:323-411)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core.normalize import tstd
from .ancestral import to_d
from .momentum import GuidanceConfig, GuidanceType, SonarConfig


def prepare_ref_latent(latent, *, strict_reference_compat: bool = False):
    """Per-(H,W) standardize (py/sonar.py:335-341). Zero-std guard: a
    constant guide latent (e.g. zeros) divides by 0 in the reference and
    NaNs the whole trajectory; by default it degrades to the
    mean-subtracted latent (same convention as core.normalize.scale_noise).
    ``strict_reference_compat=True`` reproduces the reference's raw
    division (NaN trajectory for constant guides)."""
    if latent is None:
        return None
    avg = jnp.mean(latent, axis=(-2, -1), keepdims=True)
    std = tstd(latent, axis=(-2, -1), keepdims=True)
    if strict_reference_compat:
        return (latent - avg) / std
    return (latent - avg) / jnp.where(std == 0, 1.0, std)


def guidance_shift(t, ref_latent, *, dim=None):
    """ref·std(t) + mean(t) over all-but-batch dims (py/sonar.py:371-377)."""
    if dim is None:
        dim = tuple(range(-(t.ndim - 1), 0))
    avg_t = jnp.mean(t, axis=dim, keepdims=True)
    std_t = tstd(t, axis=dim, keepdims=True)
    return ref_latent * std_t + avg_t


def guidance_linear(x, ref_latent, factor=0.2, *, blend, do_shift: bool = True):
    ref_shift = guidance_shift(x, ref_latent) if do_shift else ref_latent
    return blend(x, ref_shift, factor)


def guidance_euler(sigma, sigma_next, x, denoised, ref_latent, factor=0.2, *,
                   blend, do_shift: bool = True):
    """Euler step toward the shifted reference (py/sonar.py:379-398);
    degenerate sigma==sigma_next falls back to linear (traced select)."""
    ref_shift = guidance_shift(denoised, ref_latent) if do_shift else ref_latent
    sigma_safe = jnp.where(sigma == 0, 1.0, sigma)
    d = to_d(x, sigma_safe, ref_shift)
    dt = (sigma_next - sigma) * factor
    euler = d * dt + x
    del blend  # the reference's EULER path never forwards the configured
    # blend: its degenerate fallback calls guidance_linear with the default
    # torch.lerp (py/sonar.py:380-398) — preserved
    linear = guidance_linear(x, ref_latent, factor=factor,
                             blend=lambda a, b, t: a + (b - a) * t,
                             do_shift=do_shift)
    return jnp.where(sigma == sigma_next, linear, euler)


def guidance_step(cfg: SonarConfig, step, x, denoised, sigma, sigma_next,
                  ref_latent):
    """Step-window-gated guidance application (py/sonar.py:343-369).

    ``ref_latent`` must already be prepared via :func:`prepare_ref_latent`.
    """
    g: GuidanceConfig | None = cfg.guidance
    if g is None or g.factor == 0.0 or ref_latent is None:
        return x
    blend = cfg.guidance_blend
    if g.guidance_type == GuidanceType.LINEAR:
        guided = guidance_linear(x, ref_latent, g.factor, blend=blend)
    elif g.guidance_type == GuidanceType.EULER:
        guided = guidance_euler(
            sigma, sigma_next, x, denoised, ref_latent, g.factor, blend=blend
        )
    else:
        raise ValueError("Sonar: Guidance: Unknown guidance type")
    in_window = (g.start_step <= step) & (step <= g.end_step)
    return jnp.where(in_window, guided, x)
