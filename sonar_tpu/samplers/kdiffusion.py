"""Plain k-diffusion samplers as single-compile ``lax.scan`` loops.

The reference wraps *host* samplers with custom noise via
SamplerConfigOverride (py/nodes/misc.py:461-625) and its own example
corpus samples with ``dpmpp_2s_ancestral`` (docs/base_noise_types.md:3-9)
— so executing reference workflows end-to-end needs the plain k-diffusion
set natively, not just the sonar momentum family. Formula source:
``comfy.k_diffusion.sampling`` (crowsonkb's k-diffusion), re-derived as
traced scan bodies:

- every data-dependent branch (``sigma_next == 0`` tails,
  ``sigma_down == 0`` ancestral floors, churn windows) is computed on
  both sides with safe-guarded logs/divisions and selected elementwise —
  no Python control flow on traced values;
- second-order samplers always evaluate their second model call (one
  algebraically-discarded call on the tail step) instead of a
  ``lax.cond`` that would clone the UNet into the program twice;
- custom noise arrives exactly like the sonar samplers: ``noise_item``
  (a spec compiled into the loop) or ``noise_sampler`` (a recorded
  stream), so ``sampler_config_override`` composes unchanged.

Checkpoint/resume, ``callback``, and ``method="python"`` come from the
shared ``_run_loop`` (sonar.py:110-147): the carry is
``(x, aux_state, noise_state)``.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..noise.base import NoiseItem
from .ancestral import get_ancestral_step, to_d
from .momentum import SonarConfig
from .sonar import _run_loop, _setup

__all__ = [
    "sample_euler",
    "sample_euler_ancestral",
    "sample_heun",
    "sample_heunpp2",
    "sample_dpm_2",
    "sample_dpm_2_ancestral",
    "sample_dpmpp_2m",
    "sample_dpmpp_2s_ancestral",
    "sample_dpmpp_sde",
    "sample_dpmpp_2m_sde",
    "sample_dpmpp_3m_sde",
    "sample_ddim",
    "sample_ddpm",
    "sample_lcm",
    "sample_res_multistep",
    "sample_res_multistep_ancestral",
    "KDIFFUSION_SAMPLERS",
]

_EPS = 1e-10


def _kd_setup(model, x, sigmas, *, default_noise_type, noise_item,
              noise_sampler, seed, extra_args, need_noise):
    """Model/noise plumbing shared with the sonar family (_setup with a
    default SonarConfig: no momentum state, no guidance, no rand init)."""
    model_fn, noise_fn, noise_state, _ri, _ref = _setup(
        model, x, jnp.asarray(sigmas), cfg=SonarConfig(),
        default_noise_type=default_noise_type, noise_item=noise_item,
        noise_sampler=noise_sampler, seed=seed, extra_args=extra_args,
        need_noise=need_noise)
    return model_fn, noise_fn, noise_state


def _churn(sigmas, i, s_churn, s_tmin, s_tmax, n_steps):
    """Karras churn amount for step i (traced window test)."""
    sigma = sigmas[i]
    gamma = min(s_churn / max(n_steps, 1), math.sqrt(2.0) - 1.0)
    in_window = (sigma >= s_tmin) & (sigma <= s_tmax)
    return jnp.where(in_window, gamma, 0.0)


def _churn_window(sigmas, s_churn, s_tmin, s_tmax):
    """Static churn-window analysis (ADVICE r4). Returns ``(need_noise,
    gate_draw)``: need_noise is False when churn is statically inert (no
    step sigma lands in ``[s_tmin, s_tmax]``, so the program carries no
    RNG); gate_draw asks the step body to put the draw behind
    ``lax.cond`` so out-of-window steps neither draw nor advance the
    noise stream — the reference only calls noise_sampler when
    ``gamma > 0`` (k-diffusion sample_euler), so stateful streams
    (brownian, recorded) must see identical draw sequences."""
    if not s_churn > 0:
        return False, False
    if s_tmin <= 0.0 and s_tmax == float("inf"):
        return True, False  # every step in-window: plain unconditional draw
    if isinstance(sigmas, jax.core.Tracer):
        return True, True  # traced table: gate each step at runtime
    vals = np.asarray(sigmas)[:-1]
    mask = (vals >= s_tmin) & (vals <= s_tmax)
    if not mask.any():
        return False, False
    return True, not bool(mask.all())


def _gated_draw(noise_fn, nstate, i, sigma, sigma_next, s_tmin, s_tmax,
                like):
    """Draw noise only inside the churn window (stream-parity with the
    reference's ``if gamma > 0`` guard); the skip branch leaves the
    stream state untouched."""
    in_window = (sigma >= s_tmin) & (sigma <= s_tmax)
    return jax.lax.cond(
        in_window,
        lambda ns: noise_fn(ns, i, sigma, sigma_next),
        lambda ns: (jnp.zeros_like(like), ns),
        nstate)


def sample_euler(
    model: Callable,
    x: jax.Array,
    sigmas: jax.Array,
    *,
    s_churn: float = 0.0,
    s_tmin: float = 0.0,
    s_tmax: float = float("inf"),
    s_noise: float = 1.0,
    noise_item: NoiseItem | None = None,
    noise_sampler: Callable | None = None,
    seed: int | None = None,
    extra_args: dict | None = None,
    callback=None,
    method: str = "scan",
    resume_from=None,
    start_step: int = 0,
    stop_step: int | None = None,
    return_state: bool = False,
) -> jax.Array:
    """k-diffusion ``sample_euler``: deterministic Euler with optional
    Karras churn. Noise is drawn only when ``s_churn > 0`` AND the step's
    sigma lies in the ``[s_tmin, s_tmax]`` window (stream-parity with the
    reference's ``if gamma > 0`` guard; a statically-inert window compiles
    a program with no RNG at all)."""
    sigmas = jnp.asarray(sigmas)
    n_steps = sigmas.shape[0] - 1
    need_noise, gate_draw = _churn_window(sigmas, s_churn, s_tmin, s_tmax)
    model_fn, noise_fn, noise_state = _kd_setup(
        model, x, sigmas, default_noise_type="gaussian",
        noise_item=noise_item, noise_sampler=noise_sampler, seed=seed,
        extra_args=extra_args, need_noise=need_noise)

    def step_fn(carry, i):
        xc, aux, nstate = carry
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        if need_noise:
            gamma = _churn(sigmas, i, s_churn, s_tmin, s_tmax, n_steps)
            sigma_hat = sigma * (gamma + 1.0)
            if gate_draw:
                noise, nstate = _gated_draw(noise_fn, nstate, i, sigma,
                                            sigma_next, s_tmin, s_tmax, xc)
            else:
                noise, nstate = noise_fn(nstate, i, sigma, sigma_next)
            bump = jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))
            xc = xc + noise * (s_noise * bump)
        else:
            sigma_hat = sigma
        denoised = model_fn(xc, sigma_hat)
        d = to_d(xc, sigma_hat, denoised)
        out = xc + d * (sigma_next - sigma_hat)
        return (out, aux, nstate), {"x": out, "sigma": sigma,
                                    "sigma_hat": sigma_hat,
                                    "denoised": denoised}

    return _run_loop(step_fn, x, n_steps, (), noise_state, callback=callback, method=method,
                     resume_from=resume_from, start_step=start_step,
                     stop_step=stop_step, return_state=return_state)


def sample_euler_ancestral(
    model: Callable,
    x: jax.Array,
    sigmas: jax.Array,
    *,
    eta: float = 1.0,
    s_noise: float = 1.0,
    noise_item: NoiseItem | None = None,
    noise_sampler: Callable | None = None,
    seed: int | None = None,
    extra_args: dict | None = None,
    callback=None,
    method: str = "scan",
    resume_from=None,
    start_step: int = 0,
    stop_step: int | None = None,
    return_state: bool = False,
) -> jax.Array:
    """k-diffusion ``sample_euler_ancestral`` (the momentum-free core of
    sample_sonar_euler_ancestral — kept as its own loop so the plain
    program carries no momentum state)."""
    sigmas = jnp.asarray(sigmas)
    model_fn, noise_fn, noise_state = _kd_setup(
        model, x, sigmas, default_noise_type="gaussian",
        noise_item=noise_item, noise_sampler=noise_sampler, seed=seed,
        extra_args=extra_args, need_noise=True)

    def step_fn(carry, i):
        xc, aux, nstate = carry
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        sigma_down, sigma_up = get_ancestral_step(sigma, sigma_next, eta=eta)
        denoised = model_fn(xc, sigma)
        d = to_d(xc, sigma, denoised)
        out = xc + d * (sigma_down - sigma)
        noise, nstate = noise_fn(nstate, i, sigma, sigma_next)
        out = jnp.where(sigma_next > 0, out + noise * (s_noise * sigma_up),
                        out)
        return (out, aux, nstate), {"x": out, "sigma": sigma,
                                    "sigma_hat": sigma, "denoised": denoised}

    return _run_loop(step_fn, x, sigmas.shape[0] - 1, (), noise_state, callback=callback, method=method,
                     resume_from=resume_from, start_step=start_step,
                     stop_step=stop_step, return_state=return_state)


def sample_heun(
    model: Callable,
    x: jax.Array,
    sigmas: jax.Array,
    *,
    s_churn: float = 0.0,
    s_tmin: float = 0.0,
    s_tmax: float = float("inf"),
    s_noise: float = 1.0,
    noise_item: NoiseItem | None = None,
    noise_sampler: Callable | None = None,
    seed: int | None = None,
    extra_args: dict | None = None,
    callback=None,
    method: str = "scan",
    resume_from=None,
    start_step: int = 0,
    stop_step: int | None = None,
    return_state: bool = False,
) -> jax.Array:
    """k-diffusion ``sample_heun``: trapezoidal 2nd-order correction.
    The correction's model call always executes (at ``sigma_next == 0``
    its result is select-discarded in favor of the Euler step — one
    redundant call per trajectory instead of a second UNet clone under
    ``lax.cond``)."""
    sigmas = jnp.asarray(sigmas)
    n_steps = sigmas.shape[0] - 1
    need_noise, gate_draw = _churn_window(sigmas, s_churn, s_tmin, s_tmax)
    model_fn, noise_fn, noise_state = _kd_setup(
        model, x, sigmas, default_noise_type="gaussian",
        noise_item=noise_item, noise_sampler=noise_sampler, seed=seed,
        extra_args=extra_args, need_noise=need_noise)

    def step_fn(carry, i):
        xc, aux, nstate = carry
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        if need_noise:
            gamma = _churn(sigmas, i, s_churn, s_tmin, s_tmax, n_steps)
            sigma_hat = sigma * (gamma + 1.0)
            if gate_draw:
                noise, nstate = _gated_draw(noise_fn, nstate, i, sigma,
                                            sigma_next, s_tmin, s_tmax, xc)
            else:
                noise, nstate = noise_fn(nstate, i, sigma, sigma_next)
            bump = jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))
            xc = xc + noise * (s_noise * bump)
        else:
            sigma_hat = sigma
        denoised = model_fn(xc, sigma_hat)
        d = to_d(xc, sigma_hat, denoised)
        dt = sigma_next - sigma_hat
        euler_x = xc + d * dt
        # correction stage at sigma_next (safe-floored for the tail call)
        sn_safe = jnp.maximum(sigma_next, _EPS)
        denoised_2 = model_fn(euler_x, sn_safe)
        d_2 = to_d(euler_x, sn_safe, denoised_2)
        heun_x = xc + (d + d_2) * (0.5 * dt)
        out = jnp.where(sigma_next > 0, heun_x, euler_x)
        return (out, aux, nstate), {"x": out, "sigma": sigma,
                                    "sigma_hat": sigma_hat,
                                    "denoised": denoised}

    return _run_loop(step_fn, x, n_steps, (), noise_state, callback=callback, method=method,
                     resume_from=resume_from, start_step=start_step,
                     stop_step=stop_step, return_state=return_state)


def sample_dpmpp_2m(
    model: Callable,
    x: jax.Array,
    sigmas: jax.Array,
    *,
    extra_args: dict | None = None,
    seed: int | None = None,
    callback=None,
    method: str = "scan",
    resume_from=None,
    start_step: int = 0,
    stop_step: int | None = None,
    return_state: bool = False,
) -> jax.Array:
    """k-diffusion ``sample_dpmpp_2m``: deterministic 2nd-order multistep
    (one model call per step; the previous denoised rides the carry)."""
    sigmas = jnp.asarray(sigmas)
    model_fn, _nf, _ns = _kd_setup(
        model, x, sigmas, default_noise_type="gaussian", noise_item=None,
        noise_sampler=None, seed=seed, extra_args=extra_args,
        need_noise=False)

    def t_fn(s):
        return -jnp.log(jnp.maximum(s, _EPS))

    def step_fn(carry, i):
        xc, aux, nstate = carry
        old_denoised, has_old = aux
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        denoised = model_fn(xc, sigma)
        t, t_next = t_fn(sigma), t_fn(sigma_next)
        h = t_next - t
        ratio = sigma_next / sigma
        # 2nd-order correction only with history and a non-tail step
        # (k-diffusion: `old_denoised is None or sigmas[i+1] == 0`)
        h_last = t - t_fn(sigmas[jnp.maximum(i - 1, 0)])
        r = h_last / jnp.where(h == 0, _EPS, h)
        coef = 1.0 / jnp.maximum(2.0 * r, _EPS)
        denoised_d = (1.0 + coef) * denoised - coef * old_denoised
        use_2nd = has_old & (sigma_next > 0) & (i > 0)
        eff = jnp.where(use_2nd, denoised_d, denoised)
        out = ratio * xc - jnp.expm1(-h) * eff
        return (out, (denoised, jnp.ones((), bool)), nstate), {
            "x": out, "sigma": sigma, "sigma_hat": sigma,
            "denoised": denoised}

    aux0 = (jnp.zeros_like(x), jnp.zeros((), bool))
    return _run_loop(step_fn, x, sigmas.shape[0] - 1, aux0, (), callback=callback, method=method,
                     resume_from=resume_from, start_step=start_step,
                     stop_step=stop_step, return_state=return_state)


def sample_dpmpp_2s_ancestral(
    model: Callable,
    x: jax.Array,
    sigmas: jax.Array,
    *,
    eta: float = 1.0,
    s_noise: float = 1.0,
    noise_item: NoiseItem | None = None,
    noise_sampler: Callable | None = None,
    seed: int | None = None,
    extra_args: dict | None = None,
    callback=None,
    method: str = "scan",
    resume_from=None,
    start_step: int = 0,
    stop_step: int | None = None,
    return_state: bool = False,
) -> jax.Array:
    """k-diffusion ``sample_dpmpp_2s_ancestral``: single-step 2nd-order
    DPM-Solver++ with ancestral noise — the sampler the reference's own
    example workflow corpus uses (docs/base_noise_types.md:3-9). The
    midpoint model call always executes; when ``sigma_down == 0`` the
    Euler fallback is select-chosen, matching the reference's branch."""
    sigmas = jnp.asarray(sigmas)
    model_fn, noise_fn, noise_state = _kd_setup(
        model, x, sigmas, default_noise_type="gaussian",
        noise_item=noise_item, noise_sampler=noise_sampler, seed=seed,
        extra_args=extra_args, need_noise=True)

    def step_fn(carry, i):
        xc, aux, nstate = carry
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        sigma_down, sigma_up = get_ancestral_step(sigma, sigma_next, eta=eta)
        denoised = model_fn(xc, sigma)
        # Euler branch (sigma_down == 0)
        d = to_d(xc, sigma, denoised)
        euler_x = xc + d * (sigma_down - sigma)
        # DPM-Solver++(2S) branch
        sd_safe = jnp.maximum(sigma_down, _EPS)
        t, t_next = -jnp.log(sigma), -jnp.log(sd_safe)
        r = 0.5
        h = t_next - t
        s = t + r * h
        sigma_s = jnp.exp(-s)
        x_2 = (sigma_s / sigma) * xc - jnp.expm1(-h * r) * denoised
        denoised_2 = model_fn(x_2, sigma_s)
        solver_x = (sd_safe / sigma) * xc - jnp.expm1(-h) * denoised_2
        out = jnp.where(sigma_down > 0, solver_x, euler_x)
        noise, nstate = noise_fn(nstate, i, sigma, sigma_next)
        out = jnp.where(sigma_next > 0, out + noise * (s_noise * sigma_up),
                        out)
        return (out, aux, nstate), {"x": out, "sigma": sigma,
                                    "sigma_hat": sigma, "denoised": denoised}

    return _run_loop(step_fn, x, sigmas.shape[0] - 1, (), noise_state, callback=callback, method=method,
                     resume_from=resume_from, start_step=start_step,
                     stop_step=stop_step, return_state=return_state)


def sample_ddim(
    model: Callable,
    x: jax.Array,
    sigmas: jax.Array,
    *,
    eta: float = 0.0,
    s_noise: float = 1.0,
    noise_item: NoiseItem | None = None,
    noise_sampler: Callable | None = None,
    seed: int | None = None,
    extra_args: dict | None = None,
    callback=None,
    method: str = "scan",
    resume_from=None,
    start_step: int = 0,
    stop_step: int | None = None,
    return_state: bool = False,
) -> jax.Array:
    """DDIM in the sigma parameterization: ``x <- denoised +
    (sigma_next/sigma) * (x - denoised)``. With ``eta = 0`` this is
    algebraically identical to the Euler ODE step (the linear exponential
    integrator); ``eta > 0`` applies the ancestral split first and
    re-injects ``sigma_up`` of noise (stochastic DDIM)."""
    sigmas = jnp.asarray(sigmas)
    need_noise = eta > 0
    model_fn, noise_fn, noise_state = _kd_setup(
        model, x, sigmas, default_noise_type="gaussian",
        noise_item=noise_item, noise_sampler=noise_sampler, seed=seed,
        extra_args=extra_args, need_noise=need_noise)

    def step_fn(carry, i):
        xc, aux, nstate = carry
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        if need_noise:
            sigma_down, sigma_up = get_ancestral_step(sigma, sigma_next,
                                                      eta=eta)
        else:
            sigma_down = sigma_next
        denoised = model_fn(xc, sigma)
        out = denoised + (sigma_down / sigma) * (xc - denoised)
        if need_noise:
            noise, nstate = noise_fn(nstate, i, sigma, sigma_next)
            out = jnp.where(sigma_next > 0,
                            out + noise * (s_noise * sigma_up), out)
        return (out, aux, nstate), {"x": out, "sigma": sigma,
                                    "sigma_hat": sigma, "denoised": denoised}

    return _run_loop(step_fn, x, sigmas.shape[0] - 1, (), noise_state, callback=callback, method=method,
                     resume_from=resume_from, start_step=start_step,
                     stop_step=stop_step, return_state=return_state)


def sample_lcm(
    model: Callable,
    x: jax.Array,
    sigmas: jax.Array,
    *,
    s_noise: float = 1.0,
    noise_item: NoiseItem | None = None,
    noise_sampler: Callable | None = None,
    seed: int | None = None,
    extra_args: dict | None = None,
    ancestral_mode: str = "vp",
    callback=None,
    method: str = "scan",
    resume_from=None,
    start_step: int = 0,
    stop_step: int | None = None,
    return_state: bool = False,
) -> jax.Array:
    """LCM sampler (comfy ``sample_lcm``): take the consistency-model
    prediction, then re-noise to the next sigma via the model-sampling's
    noise scaling — VP (``denoised + sigma_next * noise``, EPS-family) or
    rectified-flow (``(1 - sigma_next) * denoised + sigma_next * noise``,
    CONST-family), selected like the sonar samplers' ``ancestral_mode``."""
    if ancestral_mode not in ("vp", "rf"):
        raise ValueError(f"ancestral_mode must be 'vp' or 'rf', "
                         f"got {ancestral_mode!r}")
    sigmas = jnp.asarray(sigmas)
    model_fn, noise_fn, noise_state = _kd_setup(
        model, x, sigmas, default_noise_type="gaussian",
        noise_item=noise_item, noise_sampler=noise_sampler, seed=seed,
        extra_args=extra_args, need_noise=True)
    rf = ancestral_mode == "rf"

    def step_fn(carry, i):
        xc, aux, nstate = carry
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        denoised = model_fn(xc, sigma)
        noise, nstate = noise_fn(nstate, i, sigma, sigma_next)
        base = (1.0 - sigma_next) * denoised if rf else denoised
        noisy = base + noise * (s_noise * sigma_next)
        out = jnp.where(sigma_next > 0, noisy, denoised)
        return (out, aux, nstate), {"x": out, "sigma": sigma,
                                    "sigma_hat": sigma, "denoised": denoised}

    return _run_loop(step_fn, x, sigmas.shape[0] - 1, (), noise_state, callback=callback, method=method,
                     resume_from=resume_from, start_step=start_step,
                     stop_step=stop_step, return_state=return_state)



def sample_dpmpp_2m_sde(
    model: Callable,
    x: jax.Array,
    sigmas: jax.Array,
    *,
    eta: float = 1.0,
    s_noise: float = 1.0,
    solver_type: str = "midpoint",
    noise_item: NoiseItem | None = None,
    noise_sampler: Callable | None = None,
    seed: int | None = None,
    extra_args: dict | None = None,
    callback=None,
    method: str = "scan",
    resume_from=None,
    start_step: int = 0,
    stop_step: int | None = None,
    return_state: bool = False,
) -> jax.Array:
    """k-diffusion ``sample_dpmpp_2m_sde``: multistep SDE DPM-Solver++
    (the most common ComfyUI production sampler alongside dpmpp_2m).
    Default noise is brownian, like the reference's SDE family
    (py/sonar.py:627). ``solver_type``: "midpoint" (default) or "heun"."""
    if solver_type not in ("midpoint", "heun"):
        raise ValueError(f"solver_type must be 'midpoint' or 'heun', "
                         f"got {solver_type!r}")
    sigmas = jnp.asarray(sigmas)
    model_fn, noise_fn, noise_state = _kd_setup(
        model, x, sigmas, default_noise_type="brownian",
        noise_item=noise_item, noise_sampler=noise_sampler, seed=seed,
        extra_args=extra_args, need_noise=True)

    def step_fn(carry, i):
        xc, aux, nstate = carry
        old_denoised, h_last, has = aux
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        denoised = model_fn(xc, sigma)
        sn_safe = jnp.maximum(sigma_next, _EPS)
        h = jnp.log(sigma) - jnp.log(sn_safe)  # h = t_next - t, t = -log
        eta_h = eta * h
        out = (sn_safe / sigma) * jnp.exp(-eta_h) * xc \
            - jnp.expm1(-h - eta_h) * denoised
        r = h_last / jnp.where(h == 0, _EPS, h)
        inv_r = 1.0 / jnp.maximum(r, _EPS)
        if solver_type == "heun":
            corr = (jnp.expm1(-h - eta_h) / jnp.where(
                h + eta_h == 0, _EPS, h + eta_h) + 1.0) * inv_r
        else:
            corr = -0.5 * jnp.expm1(-h - eta_h) * inv_r
        out = jnp.where(has & (i > 0),
                        out + corr * (denoised - old_denoised), out)
        if eta:
            noise, nstate = noise_fn(nstate, i, sigma, sigma_next)
            bump = jnp.sqrt(jnp.maximum(-jnp.expm1(-2.0 * eta_h), 0.0))
            out = out + noise * (s_noise * sn_safe * bump)
        out = jnp.where(sigma_next > 0, out, denoised)
        aux = (denoised, h, jnp.ones((), bool))
        return (out, aux, nstate), {"x": out, "sigma": sigma,
                                    "sigma_hat": sigma, "denoised": denoised}

    aux0 = (jnp.zeros_like(x), jnp.zeros((), jnp.float32),
            jnp.zeros((), bool))
    return _run_loop(step_fn, x, sigmas.shape[0] - 1, aux0, noise_state,
                     callback=callback, method=method,
                     resume_from=resume_from, start_step=start_step,
                     stop_step=stop_step, return_state=return_state)


def sample_dpmpp_3m_sde(
    model: Callable,
    x: jax.Array,
    sigmas: jax.Array,
    *,
    eta: float = 1.0,
    s_noise: float = 1.0,
    noise_item: NoiseItem | None = None,
    noise_sampler: Callable | None = None,
    seed: int | None = None,
    extra_args: dict | None = None,
    callback=None,
    method: str = "scan",
    resume_from=None,
    start_step: int = 0,
    stop_step: int | None = None,
    return_state: bool = False,
) -> jax.Array:
    """k-diffusion ``sample_dpmpp_3m_sde``: third-order multistep SDE
    solver (two denoised histories ride the carry; the order-2 and
    order-3 corrections activate as history accumulates, exactly the
    reference's ``h_1/h_2 is None`` ladder as traced selects)."""
    sigmas = jnp.asarray(sigmas)
    model_fn, noise_fn, noise_state = _kd_setup(
        model, x, sigmas, default_noise_type="brownian",
        noise_item=noise_item, noise_sampler=noise_sampler, seed=seed,
        extra_args=extra_args, need_noise=True)

    def step_fn(carry, i):
        xc, aux, nstate = carry
        den_1, den_2, h_1, h_2, n_hist = aux
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        denoised = model_fn(xc, sigma)
        sn_safe = jnp.maximum(sigma_next, _EPS)
        h = jnp.log(sigma) - jnp.log(sn_safe)
        h_eta = h * (eta + 1.0)
        out = jnp.exp(-h_eta) * xc - jnp.expm1(-h_eta) * denoised
        hs = jnp.where(h == 0, _EPS, h)
        phi_2 = jnp.expm1(-h_eta) / jnp.where(h_eta == 0, _EPS, h_eta) + 1.0
        phi_3 = phi_2 / jnp.where(h_eta == 0, _EPS, h_eta) - 0.5
        # order-2 correction (one history entry)
        r0 = h_1 / hs
        d1_o2 = (denoised - den_1) / jnp.maximum(r0, _EPS)
        out_o2 = out + phi_2 * d1_o2
        # order-3 correction (two history entries)
        r1 = h_2 / hs
        d1_0 = d1_o2
        d1_1 = (den_1 - den_2) / jnp.maximum(r1, _EPS)
        rsum = jnp.maximum(r0 + r1, _EPS)
        d1 = d1_0 + (d1_0 - d1_1) * (r0 / rsum)
        d2 = (d1_0 - d1_1) / rsum
        out_o3 = out + phi_2 * d1 - phi_3 * d2
        out = jnp.where(n_hist >= 2, out_o3,
                        jnp.where(n_hist == 1, out_o2, out))
        if eta:
            noise, nstate = noise_fn(nstate, i, sigma, sigma_next)
            bump = jnp.sqrt(jnp.maximum(-jnp.expm1(-2.0 * h * eta), 0.0))
            out = out + noise * (s_noise * sn_safe * bump)
        out = jnp.where(sigma_next > 0, out, denoised)
        aux = (denoised, den_1, h, h_1,
               jnp.minimum(n_hist + 1, jnp.asarray(2, jnp.int32)))
        return (out, aux, nstate), {"x": out, "sigma": sigma,
                                    "sigma_hat": sigma, "denoised": denoised}

    aux0 = (jnp.zeros_like(x), jnp.zeros_like(x),
            jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.int32))
    return _run_loop(step_fn, x, sigmas.shape[0] - 1, aux0, noise_state,
                     callback=callback, method=method,
                     resume_from=resume_from, start_step=start_step,
                     stop_step=stop_step, return_state=return_state)



def sample_dpmpp_sde(
    model: Callable,
    x: jax.Array,
    sigmas: jax.Array,
    *,
    eta: float = 1.0,
    s_noise: float = 1.0,
    r: float = 0.5,
    noise_item: NoiseItem | None = None,
    noise_sampler: Callable | None = None,
    seed: int | None = None,
    extra_args: dict | None = None,
    callback=None,
    method: str = "scan",
    resume_from=None,
    start_step: int = 0,
    stop_step: int | None = None,
    return_state: bool = False,
) -> jax.Array:
    """k-diffusion ``sample_dpmpp_sde``: the plain two-stage SDE solver.

    With ``momentum == 1`` the sonar momentum machinery reduces exactly to
    the k-diffusion step (``get_momentum_d`` early-outs, momentum_mix is
    identity — verified by the numpy oracle in test_kdiffusion.py), so
    this is the momentum loop pinned at 1 — one implementation, two
    surfaces, including the midpoint ratio ``r`` the reference's
    SamplerConfigOverride forwards to host SDE samplers
    (py/nodes/misc.py:567-625)."""
    from .sonar import sample_sonar_dpmpp_sde

    return sample_sonar_dpmpp_sde(
        model, x, sigmas, sonar_config=SonarConfig(momentum=1.0),
        eta=eta, s_noise=s_noise, r=r, noise_item=noise_item,
        noise_sampler=noise_sampler, seed=seed, extra_args=extra_args,
        callback=callback, method=method, resume_from=resume_from,
        start_step=start_step, stop_step=stop_step,
        return_state=return_state)


def sample_dpm_2(
    model: Callable,
    x: jax.Array,
    sigmas: jax.Array,
    *,
    s_churn: float = 0.0,
    s_tmin: float = 0.0,
    s_tmax: float = float("inf"),
    s_noise: float = 1.0,
    noise_item: NoiseItem | None = None,
    noise_sampler: Callable | None = None,
    seed: int | None = None,
    extra_args: dict | None = None,
    callback=None,
    method: str = "scan",
    resume_from=None,
    start_step: int = 0,
    stop_step: int | None = None,
    return_state: bool = False,
) -> jax.Array:
    """k-diffusion ``sample_dpm_2`` (Karras DPM2): explicit midpoint in
    log-sigma space with optional churn. The midpoint model call always
    executes; at ``sigma_next == 0`` the Euler step is select-chosen
    (one redundant tail call instead of a second UNet clone)."""
    sigmas = jnp.asarray(sigmas)
    n_steps = sigmas.shape[0] - 1
    need_noise, gate_draw = _churn_window(sigmas, s_churn, s_tmin, s_tmax)
    model_fn, noise_fn, noise_state = _kd_setup(
        model, x, sigmas, default_noise_type="gaussian",
        noise_item=noise_item, noise_sampler=noise_sampler, seed=seed,
        extra_args=extra_args, need_noise=need_noise)

    def step_fn(carry, i):
        xc, aux, nstate = carry
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        if need_noise:
            gamma = _churn(sigmas, i, s_churn, s_tmin, s_tmax, n_steps)
            sigma_hat = sigma * (gamma + 1.0)
            if gate_draw:
                noise, nstate = _gated_draw(noise_fn, nstate, i, sigma,
                                            sigma_next, s_tmin, s_tmax, xc)
            else:
                noise, nstate = noise_fn(nstate, i, sigma, sigma_next)
            bump = jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))
            xc = xc + noise * (s_noise * bump)
        else:
            sigma_hat = sigma
        denoised = model_fn(xc, sigma_hat)
        d = to_d(xc, sigma_hat, denoised)
        euler_x = xc + d * (sigma_next - sigma_hat)
        # geometric midpoint: sigma_hat.log().lerp(sigma_next.log(), 0.5)
        sn_safe = jnp.maximum(sigma_next, _EPS)
        sigma_mid = jnp.exp(0.5 * (jnp.log(sigma_hat) + jnp.log(sn_safe)))
        x_2 = xc + d * (sigma_mid - sigma_hat)
        denoised_2 = model_fn(x_2, sigma_mid)
        d_2 = to_d(x_2, sigma_mid, denoised_2)
        dpm_x = xc + d_2 * (sigma_next - sigma_hat)
        out = jnp.where(sigma_next > 0, dpm_x, euler_x)
        return (out, aux, nstate), {"x": out, "sigma": sigma,
                                    "sigma_hat": sigma_hat,
                                    "denoised": denoised}

    return _run_loop(step_fn, x, n_steps, (), noise_state,
                     callback=callback, method=method,
                     resume_from=resume_from, start_step=start_step,
                     stop_step=stop_step, return_state=return_state)


def sample_dpm_2_ancestral(
    model: Callable,
    x: jax.Array,
    sigmas: jax.Array,
    *,
    eta: float = 1.0,
    s_noise: float = 1.0,
    noise_item: NoiseItem | None = None,
    noise_sampler: Callable | None = None,
    seed: int | None = None,
    extra_args: dict | None = None,
    callback=None,
    method: str = "scan",
    resume_from=None,
    start_step: int = 0,
    stop_step: int | None = None,
    return_state: bool = False,
) -> jax.Array:
    """k-diffusion ``sample_dpm_2_ancestral``: DPM2 midpoint toward the
    ancestral ``sigma_down``, then ``sigma_up`` of noise. The reference
    draws noise only inside the solver branch (``sigma_down != 0``) —
    with ``eta > 1`` that can skip draws mid-trajectory, so the draw is
    ``lax.cond``-gated on ``sigma_down > 0`` for stream parity."""
    sigmas = jnp.asarray(sigmas)
    model_fn, noise_fn, noise_state = _kd_setup(
        model, x, sigmas, default_noise_type="gaussian",
        noise_item=noise_item, noise_sampler=noise_sampler, seed=seed,
        extra_args=extra_args, need_noise=True)

    def step_fn(carry, i):
        xc, aux, nstate = carry
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        sigma_down, sigma_up = get_ancestral_step(sigma, sigma_next, eta=eta)
        denoised = model_fn(xc, sigma)
        d = to_d(xc, sigma, denoised)
        euler_x = xc + d * (sigma_down - sigma)
        sd_safe = jnp.maximum(sigma_down, _EPS)
        sigma_mid = jnp.exp(0.5 * (jnp.log(sigma) + jnp.log(sd_safe)))
        x_2 = xc + d * (sigma_mid - sigma)
        denoised_2 = model_fn(x_2, sigma_mid)
        d_2 = to_d(x_2, sigma_mid, denoised_2)
        dpm_x = xc + d_2 * (sigma_down - sigma)
        noise, nstate = jax.lax.cond(
            sigma_down > 0,
            lambda ns: noise_fn(ns, i, sigma, sigma_next),
            lambda ns: (jnp.zeros_like(xc), ns),
            nstate)
        out = jnp.where(sigma_down > 0,
                        dpm_x + noise * (s_noise * sigma_up), euler_x)
        return (out, aux, nstate), {"x": out, "sigma": sigma,
                                    "sigma_hat": sigma, "denoised": denoised}

    return _run_loop(step_fn, x, sigmas.shape[0] - 1, (), noise_state,
                     callback=callback, method=method,
                     resume_from=resume_from, start_step=start_step,
                     stop_step=stop_step, return_state=return_state)


def sample_heunpp2(
    model: Callable,
    x: jax.Array,
    sigmas: jax.Array,
    *,
    s_churn: float = 0.0,
    s_tmin: float = 0.0,
    s_tmax: float = float("inf"),
    s_noise: float = 1.0,
    noise_item: NoiseItem | None = None,
    noise_sampler: Callable | None = None,
    seed: int | None = None,
    extra_args: dict | None = None,
    callback=None,
    method: str = "scan",
    resume_from=None,
    start_step: int = 0,
    stop_step: int | None = None,
    return_state: bool = False,
) -> jax.Array:
    """ComfyUI ``sample_heunpp2`` (Heun++, from the MIT-licensed
    sd-webui-samplers-scheduler): three-stage weighted correction with
    per-stage weights ``sigma / (k * sigmas[0])``. The second/third model
    calls always execute (select-discarded on the trailing branches)."""
    sigmas = jnp.asarray(sigmas)
    n_steps = sigmas.shape[0] - 1
    need_noise, gate_draw = _churn_window(sigmas, s_churn, s_tmin, s_tmax)
    model_fn, noise_fn, noise_state = _kd_setup(
        model, x, sigmas, default_noise_type="gaussian",
        noise_item=noise_item, noise_sampler=noise_sampler, seed=seed,
        extra_args=extra_args, need_noise=need_noise)
    s_end = sigmas[-1]

    def step_fn(carry, i):
        xc, aux, nstate = carry
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        sigma_nn = sigmas[jnp.minimum(i + 2, n_steps)]
        if need_noise:
            gamma = _churn(sigmas, i, s_churn, s_tmin, s_tmax, n_steps)
            sigma_hat = sigma * (gamma + 1.0)
            if gate_draw:
                noise, nstate = _gated_draw(noise_fn, nstate, i, sigma,
                                            sigma_next, s_tmin, s_tmax, xc)
            else:
                noise, nstate = noise_fn(nstate, i, sigma, sigma_next)
            bump = jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))
            xc = xc + noise * (s_noise * bump)
        else:
            sigma_hat = sigma
        denoised = model_fn(xc, sigma_hat)
        d = to_d(xc, sigma_hat, denoised)
        dt = sigma_next - sigma_hat
        # stage 2 at sigma_next (safe-floored for the tail call)
        sn_safe = jnp.maximum(sigma_next, _EPS)
        x_2 = xc + d * dt
        denoised_2 = model_fn(x_2, sn_safe)
        d_2 = to_d(x_2, sn_safe, denoised_2)
        # stage 3 at sigma_nn
        snn_safe = jnp.maximum(sigma_nn, _EPS)
        x_3 = x_2 + d_2 * (sigma_nn - sigma_next)
        denoised_3 = model_fn(x_3, snn_safe)
        d_3 = to_d(x_3, snn_safe, denoised_3)
        # Euler branch (sigma_next == s_end)
        euler_x = xc + d * dt
        # Heun branch (sigma_nn == s_end): weights (1 - w2, w2)
        w2_h = sigma_next / (2.0 * sigmas[0])
        heun_x = xc + (d * (1.0 - w2_h) + d_2 * w2_h) * dt
        # Heun++ branch: weights (1 - w2 - w3, w2, w3)
        w2 = sigma_next / (3.0 * sigmas[0])
        w3 = sigma_nn / (3.0 * sigmas[0])
        hpp_x = xc + (d * (1.0 - w2 - w3) + d_2 * w2 + d_3 * w3) * dt
        out = jnp.where(sigma_next == s_end, euler_x,
                        jnp.where(sigma_nn == s_end, heun_x, hpp_x))
        return (out, aux, nstate), {"x": out, "sigma": sigma,
                                    "sigma_hat": sigma_hat,
                                    "denoised": denoised}

    return _run_loop(step_fn, x, n_steps, (), noise_state,
                     callback=callback, method=method,
                     resume_from=resume_from, start_step=start_step,
                     stop_step=stop_step, return_state=return_state)


def _res_multistep(
    model: Callable,
    x: jax.Array,
    sigmas: jax.Array,
    *,
    eta: float = 1.0,
    s_noise: float = 1.0,
    noise_item: NoiseItem | None = None,
    noise_sampler: Callable | None = None,
    seed: int | None = None,
    extra_args: dict | None = None,
    callback=None,
    method: str = "scan",
    resume_from=None,
    start_step: int = 0,
    stop_step: int | None = None,
    return_state: bool = False,
) -> jax.Array:
    """ComfyUI ``res_multistep`` (second-order exponential multistep from
    arXiv:2308.02157, RES): ``x <- exp(-h) x + h (b1 denoised + b2
    old_denoised)`` with ``b1 = phi1 - phi2/c2``, ``b2 = phi2/c2``,
    ``c2 = (t_old - t)/h``; Euler on the first step and when
    ``sigma_down == 0``. ``eta=0`` is the deterministic ``res_multistep``;
    ``eta>0`` the ancestral variant."""
    sigmas = jnp.asarray(sigmas)
    need_noise = eta > 0
    model_fn, noise_fn, noise_state = _kd_setup(
        model, x, sigmas, default_noise_type="gaussian",
        noise_item=noise_item, noise_sampler=noise_sampler, seed=seed,
        extra_args=extra_args, need_noise=need_noise)

    def step_fn(carry, i):
        xc, aux, nstate = carry
        old_denoised, has_old = aux
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        if need_noise:
            sigma_down, sigma_up = get_ancestral_step(sigma, sigma_next,
                                                      eta=eta)
        else:
            sigma_down = sigma_next
        denoised = model_fn(xc, sigma)
        # Euler branch
        d = to_d(xc, sigma, denoised)
        euler_x = xc + d * (sigma_down - sigma)
        # RES second-order multistep branch
        sd_safe = jnp.maximum(sigma_down, _EPS)
        t = -jnp.log(sigma)
        t_old = -jnp.log(sigmas[jnp.maximum(i - 1, 0)])
        t_next = -jnp.log(sd_safe)
        h = t_next - t
        hs = jnp.where(h == 0, _EPS, h)
        c2 = (t_old - t) / hs
        c2s = jnp.where(c2 == 0, _EPS, c2)
        phi1 = jnp.expm1(-h) / jnp.where(h == 0, _EPS, -h)
        phi2 = (phi1 - 1.0) / jnp.where(h == 0, _EPS, -h)
        b1 = phi1 - phi2 / c2s
        b2 = phi2 / c2s
        res_x = jnp.exp(-h) * xc + h * (b1 * denoised + b2 * old_denoised)
        use_ms = has_old & (sigma_down > 0) & (i > 0)
        out = jnp.where(use_ms, res_x, euler_x)
        if need_noise:
            # reference draws only when sigmas[i+1] > 0 — cond-gate so
            # the final step neither draws nor advances the stream
            # (stateful items: brownian would hit -log(0) in its carry)
            noise, nstate = jax.lax.cond(
                sigma_next > 0,
                lambda ns: noise_fn(ns, i, sigma, sigma_next),
                lambda ns: (jnp.zeros_like(out), ns), nstate)
            out = jnp.where(sigma_next > 0,
                            out + noise * (s_noise * sigma_up), out)
        return (out, (denoised, jnp.ones((), bool)), nstate), {
            "x": out, "sigma": sigma, "sigma_hat": sigma,
            "denoised": denoised}

    aux0 = (jnp.zeros_like(x), jnp.zeros((), bool))
    return _run_loop(step_fn, x, sigmas.shape[0] - 1, aux0, noise_state,
                     callback=callback, method=method,
                     resume_from=resume_from, start_step=start_step,
                     stop_step=stop_step, return_state=return_state)


def sample_res_multistep(model, x, sigmas, *, eta=0.0, **kw):
    """ComfyUI ``sample_res_multistep`` (deterministic: eta=0)."""
    return _res_multistep(model, x, sigmas, eta=eta, **kw)


def sample_res_multistep_ancestral(model, x, sigmas, *, eta=1.0, **kw):
    """ComfyUI ``sample_res_multistep_ancestral`` (eta=1 default)."""
    return _res_multistep(model, x, sigmas, eta=eta, **kw)


# SonarPipeline forwards its noise/eta/s_noise defaults only to samplers
# whose signatures declare them (pipeline._sampler_params); a bare **kw
# wrapper reads as "accepts everything" and a pipeline-configured noise
# item then TypeErrors deep inside the sampler. Expose the wrapped
# signature (inspect.signature follows __wrapped__).
sample_res_multistep.__wrapped__ = _res_multistep
sample_res_multistep_ancestral.__wrapped__ = _res_multistep


def sample_ddpm(
    model: Callable,
    x: jax.Array,
    sigmas: jax.Array,
    *,
    s_noise: float = 1.0,
    noise_item: NoiseItem | None = None,
    noise_sampler: Callable | None = None,
    seed: int | None = None,
    extra_args: dict | None = None,
    callback=None,
    method: str = "scan",
    resume_from=None,
    start_step: int = 0,
    stop_step: int | None = None,
    return_state: bool = False,
) -> jax.Array:
    """ComfyUI ``sample_ddpm`` (generic_step_sampler + DDPMSampler_step):
    the classic ancestral DDPM posterior step in VP space, driven from
    the EDM sigma schedule via ``alpha_cumprod = 1/(sigma^2 + 1)``."""
    sigmas = jnp.asarray(sigmas)
    model_fn, noise_fn, noise_state = _kd_setup(
        model, x, sigmas, default_noise_type="gaussian",
        noise_item=noise_item, noise_sampler=noise_sampler, seed=seed,
        extra_args=extra_args, need_noise=True)

    def step_fn(carry, i):
        xc, aux, nstate = carry
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        denoised = model_fn(xc, sigma)
        eps = (xc - denoised) / sigma
        x_vp = xc / jnp.sqrt(1.0 + sigma**2)
        ac = 1.0 / (sigma**2 + 1.0)
        ac_prev = 1.0 / (sigma_next**2 + 1.0)
        alpha = ac / ac_prev
        mu = jnp.sqrt(1.0 / alpha) * (
            x_vp - (1.0 - alpha) * eps / jnp.sqrt(1.0 - ac))
        # reference draws only when sigmas[i+1] > 0 — cond-gate for
        # stream parity and stateful-item carry safety on the last step
        noise, nstate = jax.lax.cond(
            sigma_next > 0,
            lambda ns: noise_fn(ns, i, sigma, sigma_next),
            lambda ns: (jnp.zeros_like(xc), ns), nstate)
        post_std = jnp.sqrt(jnp.maximum(
            (1.0 - alpha) * (1.0 - ac_prev) / (1.0 - ac), 0.0))
        mu = jnp.where(sigma_next > 0,
                       mu + post_std * (s_noise * noise), mu)
        out = jnp.where(sigma_next > 0,
                        mu * jnp.sqrt(1.0 + sigma_next**2), mu)
        return (out, aux, nstate), {"x": out, "sigma": sigma,
                                    "sigma_hat": sigma, "denoised": denoised}

    return _run_loop(step_fn, x, sigmas.shape[0] - 1, (), noise_state,
                     callback=callback, method=method,
                     resume_from=resume_from, start_step=start_step,
                     stop_step=stop_step, return_state=return_state)


KDIFFUSION_SAMPLERS = {
    "euler": sample_euler,
    "euler_ancestral": sample_euler_ancestral,
    "heun": sample_heun,
    "heunpp2": sample_heunpp2,
    "dpm_2": sample_dpm_2,
    "dpm_2_ancestral": sample_dpm_2_ancestral,
    "dpmpp_2m": sample_dpmpp_2m,
    "dpmpp_2s_ancestral": sample_dpmpp_2s_ancestral,
    "dpmpp_sde": sample_dpmpp_sde,
    "dpmpp_sde_gpu": sample_dpmpp_sde,     # ComfyUI _gpu = same math,
    "dpmpp_2m_sde": sample_dpmpp_2m_sde,   # torch noise-device detail
    "dpmpp_2m_sde_gpu": sample_dpmpp_2m_sde,
    "dpmpp_3m_sde": sample_dpmpp_3m_sde,
    "dpmpp_3m_sde_gpu": sample_dpmpp_3m_sde,
    "ddim": sample_ddim,
    "ddpm": sample_ddpm,
    "lcm": sample_lcm,
    "res_multistep": sample_res_multistep,
    "res_multistep_ancestral": sample_res_multistep_ancestral,
}

# the coefficient-table multistep family (deis/lms/ipndm/ipndm_v/uni_pc)
# and the DPM-Solver fast/adaptive pair live in their own modules; they
# register here so KSamplerSelect resolves every common ComfyUI name
from .multistep import MULTISTEP_SAMPLERS  # noqa: E402
from .dpm_solver import DPM_SOLVER_SAMPLERS  # noqa: E402

KDIFFUSION_SAMPLERS.update(MULTISTEP_SAMPLERS)
KDIFFUSION_SAMPLERS.update(DPM_SOLVER_SAMPLERS)
