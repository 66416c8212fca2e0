"""Sonar momentum samplers as single-compile ``lax.scan`` loops.

Reference: SonarEuler / SonarEulerAncestral / SonarDPMPPSDE step loops
(py/sonar.py:452-820). The reference runs a Python ``trange`` loop with one
CUDA sync per step; here the whole trajectory is one XLA program: the carry
is ``(x, momentum_state, noise_state)`` and every per-step branch
(momentum window, guidance window, sigma_next==0 tail) is a traced select.

Model protocol: ``model(x, sigma_batch, **extra_args) -> denoised`` where
``sigma_batch`` has shape (B,) — the reference's ``model(x, sigma * s_in)``
(py/sonar.py:436-449).

Noise injection: pass ``noise_item`` (a NoiseItem spec — compiled into the
loop), or ``noise_sampler`` as a plain callable ``fn(step, sigma,
sigma_next) -> noise`` (e.g. a recorded stream for trajectory-equivalence
tests; indexed by step because closures can't mutate under scan).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..core.rng import derive_key, key_from_seed
from ..noise.base import NoiseItem, make_noise_sampler
from ..noise.presets import get_noise_item
from .ancestral import get_ancestral_step, get_ancestral_step_rf, to_d
from .guidance import guidance_step, prepare_ref_latent
from .momentum import (
    SonarConfig,
    get_momentum_d,
    get_momentum_denoised,
    init_momentum_state,
    momentum_step,
)


def _sigma_bounds(sigmas):
    pos = jnp.where(sigmas > 0, sigmas, jnp.inf)
    return jnp.min(pos), jnp.max(sigmas)


def _setup(
    model,
    x,
    sigmas,
    *,
    cfg: SonarConfig,
    default_noise_type: str,
    noise_item,
    noise_sampler,
    seed,
    extra_args,
    need_noise: bool,
):
    extra_args = dict(extra_args or {})
    seed = extra_args.pop("seed", seed)
    key = key_from_seed(seed)
    sigma_min, sigma_max = _sigma_bounds(sigmas)

    def model_fn(xi, sigma, **kw):
        s_in = jnp.ones((xi.shape[0],), xi.dtype)
        return model(xi, sigma * s_in, **extra_args, **kw)

    # Noise precedence: custom_noise > explicit sampler > typed default
    # (py/sonar.py:133-167).
    noise_fn = noise_state = None
    if need_noise:
        item = cfg.custom_noise if cfg.custom_noise is not None else noise_item
        if item is None and noise_sampler is None:
            item = get_noise_item(cfg.noise_type or default_noise_type)
        if item is not None:
            fn, noise_state = make_noise_sampler(
                item,
                x.shape,
                dtype=x.dtype,
                sigma_min=sigma_min,
                sigma_max=sigma_max,
                seed=derive_key(key, "noise"),
                normalized=True,
                ref_latent=x,
            )

            def noise_fn(nstate, step, sigma, sigma_next):
                return fn(nstate, sigma, sigma_next)

        else:

            def noise_fn(nstate, step, sigma, sigma_next):
                return noise_sampler(step, sigma, sigma_next), nstate

            noise_state = ()

    rand_init = None
    if cfg.init.value == "rand":
        ri_item = get_noise_item(cfg.rand_init_noise_type)
        ri_fn, ri_state = make_noise_sampler(
            ri_item, x.shape, dtype=x.dtype, seed=derive_key(key, "rand_init"),
            normalized=True, ref_latent=x,
        )
        rand_init, _ = ri_fn(ri_state, None, None)

    ref_latent = prepare_ref_latent(cfg.guidance.latent) if cfg.guidance else None
    return model_fn, noise_fn, noise_state, rand_init, ref_latent


def _run_loop(step_fn, x, n_steps: int, mom_state, noise_state, *, callback=None,
              method: str = "scan", resume_from=None, start_step: int = 0,
              stop_step: int | None = None, return_state: bool = False):
    """Run steps [start_step, stop_step). Checkpoint/resume (SURVEY
    §5.3-5.4): the entire sampler state is the scan carry ``(x,
    momentum_state, noise_state)`` — run with ``stop_step=k,
    return_state=True`` to checkpoint, then ``resume_from=carry,
    start_step=k`` to continue; trajectories are bitwise identical to an
    uninterrupted run."""
    stop = n_steps if stop_step is None else min(stop_step, n_steps)
    carry = resume_from if resume_from is not None else (x, mom_state, noise_state)

    def _restabilize(new, old):
        # sampler math runs in f32; cast each leaf back to its carry dtype
        # so scan's carry-type invariant holds for bf16/f16 latents
        return jax.tree.map(
            lambda a, b: a.astype(b.dtype)
            if hasattr(b, "dtype") and hasattr(a, "dtype") and a.dtype != b.dtype
            else a,
            new, old)

    if callback is not None or method == "python":
        for i in range(start_step, stop):
            new_carry, info = step_fn(carry, jnp.asarray(i))
            carry = _restabilize(new_carry, carry)
            if callback is not None:
                callback({"i": i, **info})
        return (carry[0], carry) if return_state else carry[0]
    if method != "scan":
        raise ValueError("method must be 'scan' or 'python'")

    def body(c, i):
        c2, _info = step_fn(c, i)
        return _restabilize(c2, c), None

    carry, _ = jax.lax.scan(body, carry, jnp.arange(start_step, stop))
    return (carry[0], carry) if return_state else carry[0]


def sample_sonar_euler(
    model: Callable,
    x: jax.Array,
    sigmas: jax.Array,
    *,
    sonar_config: SonarConfig | None = None,
    sonar_params: dict | None = None,
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
    """Deterministic momentum Euler (py/sonar.py:452-526)."""
    cfg = (sonar_config or SonarConfig()).updated(sonar_params)
    sigmas = jnp.asarray(sigmas)
    model_fn, _nf, _ns, rand_init, ref_latent = _setup(
        model, x, sigmas, cfg=cfg, default_noise_type="gaussian",
        noise_item=None, noise_sampler=noise_sampler, seed=seed,
        extra_args=extra_args, need_noise=False,
    )

    def step_fn(carry, i):
        xc, mom, nstate = carry
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        denoised = model_fn(xc, sigma)
        out, mom = momentum_step(
            cfg, mom, xc, denoised, sigma, sigma_next, step=i, rand_init=rand_init
        )
        guided = guidance_step(cfg, i, out, denoised, sigma, sigma_next, ref_latent)
        out = jnp.where(sigma_next > 0, guided, out)
        return (out, mom, nstate), {"x": out, "sigma": sigma, "sigma_hat": sigma,
                                    "denoised": denoised}

    return _run_loop(step_fn, x, sigmas.shape[0] - 1, init_momentum_state(x), (),
                     callback=callback, method=method, resume_from=resume_from,
                     start_step=start_step, stop_step=stop_step,
                     return_state=return_state)


def _fused_eligible(cfg: SonarConfig) -> bool:
    """The Pallas fast path covers the default config family: NEW mode,
    lerp blends, ZERO init, no guidance, static momentum != 1."""
    from .momentum import HistoryType, MomentumMode

    return (
        cfg.momentum_mode == MomentumMode.NEW
        and cfg.init == HistoryType.ZERO
        and cfg.guidance is None
        and (cfg.momentum_blend_mode or cfg.blend_mode) == "lerp"
        and (cfg.history_blend_mode or cfg.blend_mode) == "lerp"
        and isinstance(cfg.momentum, (int, float))
        and cfg.momentum != 1
        and cfg.momentum_hist != 1
    )


def sample_sonar_euler_ancestral(
    model: Callable,
    x: jax.Array,
    sigmas: jax.Array,
    *,
    sonar_config: SonarConfig | None = None,
    sonar_params: dict | None = None,
    eta: float = 1.0,
    s_noise: float = 1.0,
    noise_item: NoiseItem | None = None,
    noise_sampler: Callable | None = None,
    seed: int | None = None,
    extra_args: dict | None = None,
    callback=None,
    method: str = "scan",
    use_fused: bool | None = None,
    ancestral_mode: str = "vp",
    resume_from=None,
    start_step: int = 0,
    stop_step: int | None = None,
    return_state: bool = False,
) -> jax.Array:
    """Ancestral momentum Euler (py/sonar.py:529-623).

    ``use_fused`` routes the momentum chain + noise injection through the
    single-pass Pallas kernel (SURVEY §2.9 items 1-2) when the config
    qualifies; ``None`` auto-enables on TPU.

    ``ancestral_mode="rf"`` switches the noise split to the rectified-flow
    formula (samplers/ancestral.py:get_ancestral_step_rf) for CONST/flow
    models, where sigma is interpolation time — the VP split (the
    reference's only mode) over-noises flow latents. The momentum machinery
    composes unchanged (the Euler-to-sigma_down part is identical); only
    the re-noising differs. Extension beyond the reference.
    """
    if ancestral_mode not in ("vp", "rf"):
        raise ValueError(f"ancestral_mode must be 'vp' or 'rf', "
                         f"got {ancestral_mode!r}")
    rf = ancestral_mode == "rf"
    cfg = (sonar_config or SonarConfig()).updated(sonar_params)
    sigmas = jnp.asarray(sigmas)
    model_fn, noise_fn, noise_state, rand_init, ref_latent = _setup(
        model, x, sigmas, cfg=cfg, default_noise_type="gaussian",
        noise_item=noise_item, noise_sampler=noise_sampler, seed=seed,
        extra_args=extra_args, need_noise=True,
    )
    from ..kernels.fused import (
        fused_momentum_step,
        pack_momentum_scalars,
        use_pallas,
    )
    from .momentum import check_step

    if use_fused and rf:
        raise ValueError(
            "use_fused=True is not supported with ancestral_mode='rf' "
            "(the fused momentum kernel bakes the VP noise injection); "
            "leave use_fused=None to auto-select the unfused path")
    fused = ((use_pallas() if use_fused is None else use_fused)
             and _fused_eligible(cfg) and not rf)

    def step_fn(carry, i):
        xc, mom, nstate = carry
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        if rf:
            sigma_down, sigma_up, alpha_ratio = get_ancestral_step_rf(
                sigma, sigma_next, eta)
        else:
            sigma_down, sigma_up = get_ancestral_step(sigma, sigma_next, eta=eta)
            alpha_ratio = None
        denoised = model_fn(xc, sigma)
        noise, nstate = noise_fn(nstate, i, sigma, sigma_next)
        if fused:
            hd_ratio, hd_scale, md_scale = cfg.history_ratios
            scal = pack_momentum_scalars(
                sigma=sigma, dt=sigma_down - sigma, momentum=cfg.momentum,
                hd_ratio=hd_ratio, hd_scale=hd_scale, md_scale=md_scale,
                has=mom["has"].astype(jnp.float32),
                noise_scale=jnp.where(sigma_next > 0, s_noise * sigma_up, 0.0),
                in_window=check_step(cfg, i).astype(jnp.float32),
                hist_window=check_step(cfg, i, is_history=True).astype(jnp.float32),
            )
            out, new_hd = fused_momentum_step(xc, denoised, mom["hd"], noise, scal)
            mom = {"hd": new_hd, "has": mom["has"] | check_step(cfg, i, is_history=True)}
            return (out, mom, nstate), {"x": out, "sigma": sigma,
                                        "sigma_hat": sigma, "denoised": denoised}
        out, mom = momentum_step(
            cfg, mom, xc, denoised, sigma, sigma_down, step=i, rand_init=rand_init
        )
        guided = guidance_step(cfg, i, out, denoised, sigma, sigma_next, ref_latent)
        if alpha_ratio is not None:
            guided = guided * alpha_ratio
        noisy = guided + noise * (s_noise * sigma_up)
        out = jnp.where(sigma_next > 0, noisy, out)
        return (out, mom, nstate), {"x": out, "sigma": sigma, "sigma_hat": sigma,
                                    "denoised": denoised}

    return _run_loop(step_fn, x, sigmas.shape[0] - 1, init_momentum_state(x),
                     noise_state, callback=callback, method=method,
                     resume_from=resume_from, start_step=start_step,
                     stop_step=stop_step, return_state=return_state)


def sample_sonar_dpmpp_sde(
    model: Callable,
    x: jax.Array,
    sigmas: jax.Array,
    *,
    sonar_config: SonarConfig | None = None,
    sonar_params: dict | None = None,
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
    """Two-stage DPM++ SDE with momentum injected twice per step
    (py/sonar.py:626-820). Default noise: brownian (py/sonar.py:627).

    The sigma_next==0 tail runs the plain momentum step; under scan both
    branches are computed with safe-guarded logs and selected elementwise.
    """
    cfg = (sonar_config or SonarConfig()).updated(sonar_params)
    sigmas = jnp.asarray(sigmas)
    model_fn, noise_fn, noise_state, rand_init, ref_latent = _setup(
        model, x, sigmas, cfg=cfg, default_noise_type="brownian",
        noise_item=noise_item, noise_sampler=noise_sampler, seed=seed,
        extra_args=extra_args, need_noise=True,
    )

    sigma_fn = lambda t: jnp.exp(-t)  # noqa: E731 — py/sonar.py:640-646
    t_fn = lambda s: -jnp.log(s)  # noqa: E731

    def step_fn(carry, i):
        xc, mom, nstate = carry
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        is_tail = sigma_next == 0
        sigma_down_tail, _ = get_ancestral_step(sigma, sigma_next, eta=eta)
        denoised = model_fn(xc, sigma)

        # --- tail branch: plain momentum step (py/sonar.py:658-659) ---------
        tail_x, tail_mom = momentum_step(
            cfg, mom, xc, denoised, sigma, sigma_down_tail, step=i, rand_init=rand_init
        )

        # --- main two-stage branch (py/sonar.py:661-735) --------------------
        m = cfg.momentum
        if m == 1:
            adjusted = 1.0
        else:
            adjusted = jnp.where(mom["has"], m + (1 - m) / 2, m)
        sn_safe = jnp.maximum(sigma_next, 1e-10)
        t, t_next = t_fn(sigma), t_fn(sn_safe)
        h = t_next - t
        s = t + h * r
        fac = 1 / (2 * r)

        s_t, s_s = sigma_fn(t), sigma_fn(s)
        sd, su = get_ancestral_step(s_t, s_s, eta)
        s_ = t_fn(jnp.maximum(sd, 1e-10))
        momentum_denoised, mmom = get_momentum_denoised(
            cfg, mom, xc, denoised, sigma, step=i, rand_init=rand_init
        )
        diff_2 = jnp.expm1(t - s_) * momentum_denoised
        momentum_d, mmom = get_momentum_d(
            cfg, mmom, xc, momentum_denoised, sigma, step=i, momentum=adjusted,
            d=diff_2, rand_init=rand_init,
        )
        x_2 = (sigma_fn(s_) / s_t) * xc - momentum_d
        noise1, nstate = noise_fn(nstate, 2 * i, s_t, s_s)
        x_2 = x_2 + noise1 * (s_noise * su)
        denoised_2 = model_fn(x_2, s_s)
        momentum_denoised_2, mmom = get_momentum_denoised(
            cfg, mmom, xc, denoised_2, s_s, step=i, rand_init=rand_init
        )

        sd, su = get_ancestral_step(s_t, sigma_next, eta)
        t_down = t_fn(jnp.maximum(sd, 1e-10))
        denoised_d = (1 - fac) * momentum_denoised + fac * momentum_denoised_2
        diff_1 = jnp.expm1(t - t_down) * denoised_d
        momentum_d, mmom = get_momentum_d(
            cfg, mmom, xc, momentum_denoised_2, s_s, step=i, momentum=adjusted,
            d=diff_1, rand_init=rand_init,
        )
        main_x = (sigma_fn(t_down) / s_t) * xc - momentum_d
        main_x = guidance_step(cfg, i, main_x, denoised_d, sigma, sigma_next, ref_latent)
        noise2, nstate = noise_fn(nstate, 2 * i + 1, s_t, sigma_next)
        main_x = main_x + noise2 * (s_noise * su)

        out = jnp.where(is_tail, tail_x, main_x)
        mom = jax.tree.map(lambda a, b: jnp.where(is_tail, a, b), tail_mom, mmom)
        return (out, mom, nstate), {"x": out, "sigma": sigma, "sigma_hat": sigma,
                                    "denoised": denoised}

    return _run_loop(step_fn, x, sigmas.shape[0] - 1, init_momentum_state(x),
                     noise_state, callback=callback, method=method,
                     resume_from=resume_from, start_step=start_step,
                     stop_step=stop_step, return_state=return_state)
