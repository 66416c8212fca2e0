"""DPM-Solver fast / adaptive (arXiv:2206.00927) under their ComfyUI
registry names.

The reference's SamplerConfigOverride wraps any host sampler
(/root/reference/py/nodes/misc.py:461-625); ``dpm_fast`` and
``dpm_adaptive`` are the two k-diffusion samplers that do NOT consume the
sigma table step-by-step — fast re-grids [t_start, t_end] uniformly in
t = -log(sigma) and runs singlestep order-3/2/1 segments, adaptive picks
its own steps with a PID controller. Both are re-architected for XLA:

- ``dpm_fast``: every solver coefficient is a function of the STATIC
  segment grid, so the order-3 prefix compiles to one ``lax.scan`` whose
  body is three model calls plus static linear combinations (coefficient
  rows ride the scan's xs), and the 1-2 trailing lower-order segments
  are unrolled — at most 6 model-call instances in the program
  regardless of step count.
- ``dpm_adaptive``: a ``lax.while_loop`` whose carry is the full solver
  state (x, x_prev, s, PID h + inverse-error history, step budget);
  accept/reject is a traced select, and the ancestral noise draw is
  ``lax.cond``-gated on acceptance so stateful noise streams see exactly
  the accepted-step draw sequence (k-diffusion draws only on accept).

Both mirror ComfyUI's wrappers: sigma_max = sigmas[0], sigma_min = the
last nonzero sigma, nfe = len(sigmas) - 1; like the host versions they
land at sigma_min (not 0).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .ancestral import get_ancestral_step
from .momentum import SonarConfig
from .sonar import _setup

__all__ = ["sample_dpm_fast", "sample_dpm_adaptive", "DPM_SOLVER_SAMPLERS"]


def _sigma_grid(sigmas, name):
    if isinstance(sigmas, jax.core.Tracer):
        raise TypeError(
            f"{name} re-grids the schedule on the host — pass a concrete "
            "sigma table (static per compile in SonarPipeline)")
    sig = np.asarray(sigmas, np.float64)
    if sig.shape[0] < 2:
        raise ValueError(f"{name} needs at least 2 sigmas")
    sigma_max = float(sig[0])
    sigma_min = float(sig[-1]) if sig[-1] > 0 else float(sig[-2])
    if sigma_min <= 0 or sigma_max <= 0:
        raise ValueError("sigma_min and sigma_max must not be 0")
    n = sig.shape[0] - 1
    return sigma_max, sigma_min, n


def _fast_segments(sigma_max, sigma_min, nfe, eta):
    """Static segment plan: (orders, per-segment dict of float coeffs)."""
    t_start, t_end = -math.log(sigma_max), -math.log(sigma_min)
    m = nfe // 3 + 1
    ts = np.linspace(t_start, t_end, m + 1)
    if nfe % 3 == 0:
        orders = [3] * (m - 2) + [2, 1]
    else:
        orders = [3] * (m - 1) + [nfe % 3]
    sigma = lambda t: math.exp(-t)  # noqa: E731
    segs = []
    for i, order in enumerate(orders):
        t, t_next = float(ts[i]), float(ts[i + 1])
        if eta:
            sg, sn = sigma(t), sigma(t_next)
            su0 = min(sn, eta * math.sqrt(sn**2 * (sg**2 - sn**2) / sg**2))
            sd = math.sqrt(max(sn**2 - su0**2, 0.0))
            t_next_ = min(t_end, -math.log(max(sd, 1e-12)))
            su = math.sqrt(max(sn**2 - sigma(t_next_) ** 2, 0.0))
        else:
            t_next_, su = t_next, 0.0
        h = t_next_ - t
        seg = {"sigma_t": sigma(t), "su": su,
               "sigma_from": sigma(t), "sigma_to": sigma(t_next),
               "k_eps": sigma(t_next_) * math.expm1(h)}
        if order >= 2:
            r1 = 0.5 if order == 2 else 1.0 / 3.0
            s1 = t + r1 * h
            seg["sigma_s1"] = sigma(s1)
            seg["k_u1"] = sigma(s1) * math.expm1(r1 * h)
            if order == 2:
                seg["k_d1"] = sigma(t_next_) / (2.0 * r1) * math.expm1(h)
        if order == 3:
            r1, r2 = 1.0 / 3.0, 2.0 / 3.0
            s2 = t + r2 * h
            seg["sigma_s2"] = sigma(s2)
            seg["k_u2"] = sigma(s2) * math.expm1(r2 * h)
            seg["k_u2d"] = (sigma(s2) * (r2 / r1)
                            * (math.expm1(r2 * h) / (r2 * h) - 1.0))
            seg["k_d2"] = (sigma(t_next_) / r2
                           * (math.expm1(h) / h - 1.0))
        segs.append((order, seg))
    return segs


def _seg_step(model_fn, x, order, seg, noise, s_noise):
    """One singlestep DPM-Solver segment (order 1/2/3) with static
    coefficients; ``noise`` is None or the pre-drawn ancestral noise."""
    eps = (x - model_fn(x, seg["sigma_t"])) / seg["sigma_t"]
    if order == 1:
        out = x - seg["k_eps"] * eps
    elif order == 2:
        u1 = x - seg["k_u1"] * eps
        eps_r1 = (u1 - model_fn(u1, seg["sigma_s1"])) / seg["sigma_s1"]
        out = x - seg["k_eps"] * eps - seg["k_d1"] * (eps_r1 - eps)
    else:
        u1 = x - seg["k_u1"] * eps
        eps_r1 = (u1 - model_fn(u1, seg["sigma_s1"])) / seg["sigma_s1"]
        u2 = (x - seg["k_u2"] * eps - seg["k_u2d"] * (eps_r1 - eps))
        eps_r2 = (u2 - model_fn(u2, seg["sigma_s2"])) / seg["sigma_s2"]
        out = x - seg["k_eps"] * eps - seg["k_d2"] * (eps_r2 - eps)
    if noise is not None:
        out = out + noise * (s_noise * seg["su"])
    return out


def sample_dpm_fast(
    model,
    x: jax.Array,
    sigmas: jax.Array,
    *,
    eta: float = 0.0,
    s_noise: float = 1.0,
    noise_item=None,
    noise_sampler=None,
    seed: int | None = None,
    extra_args: dict | None = None,
    callback=None,
) -> jax.Array:
    """k-diffusion ``sample_dpm_fast`` via ComfyUI's wrapper (nfe =
    len(sigmas) - 1 over [sigmas[0], last nonzero sigma])."""
    if callback is not None:
        raise NotImplementedError(
            "dpm_fast runs order-grouped segments, not per-sigma steps — "
            "callback is not supported")
    sigma_max, sigma_min, nfe = _sigma_grid(sigmas, "dpm_fast")
    model_fn, noise_fn, noise_state, _ri, _ref = _setup(
        model, x, jnp.asarray(np.asarray(sigmas, np.float32)),
        cfg=SonarConfig(), default_noise_type="gaussian",
        noise_item=noise_item, noise_sampler=noise_sampler, seed=seed,
        extra_args=extra_args, need_noise=eta > 0)
    segs = _fast_segments(sigma_max, sigma_min, nfe, eta)

    # scan the uniform order-3 prefix (identical bodies, static coeffs
    # as xs); unroll the 1-2 trailing lower-order segments
    prefix = [s for o, s in segs if o == 3]
    tail = [(o, s) for o, s in segs if o != 3]
    if prefix:
        keys = sorted(prefix[0])
        rows = jnp.asarray([[seg[k] for k in keys] for seg in prefix],
                           jnp.float32)

        def body(carry, xs):
            row, idx = xs
            xc, nstate = carry
            seg = {k: row[j] for j, k in enumerate(keys)}
            if eta:
                noise, nstate = noise_fn(nstate, idx, seg["sigma_from"],
                                         seg["sigma_to"])
            else:
                noise = None
            out = _seg_step(model_fn, xc, 3, seg, noise, s_noise)
            return (out, nstate), None

        (x, noise_state), _ = jax.lax.scan(
            body, (x, noise_state), (rows, jnp.arange(len(prefix))))
    for idx, (order, seg) in enumerate(tail):
        if eta:
            noise, noise_state = noise_fn(
                noise_state, len(prefix) + idx,
                jnp.asarray(seg["sigma_from"], jnp.float32),
                jnp.asarray(seg["sigma_to"], jnp.float32))
        else:
            noise = None
        x = _seg_step(model_fn, x, order, seg, noise, s_noise)
    return x


def sample_dpm_adaptive(
    model,
    x: jax.Array,
    sigmas: jax.Array,
    *,
    order: int = 3,
    rtol: float = 0.05,
    atol: float = 0.0078,
    h_init: float = 0.05,
    pcoeff: float = 0.0,
    icoeff: float = 1.0,
    dcoeff: float = 0.0,
    accept_safety: float = 0.81,
    eta: float = 0.0,
    s_noise: float = 1.0,
    noise_item=None,
    noise_sampler=None,
    seed: int | None = None,
    extra_args: dict | None = None,
    callback=None,
    max_steps: int = 1000,
) -> jax.Array:
    """k-diffusion ``sample_dpm_adaptive``: PID-controlled adaptive
    DPM-Solver over [sigmas[0], last nonzero sigma], as one traced
    ``lax.while_loop`` (``max_steps`` bounds the trip count — the
    reference loop is unbounded, which a NaN error estimate would wedge
    forever)."""
    if callback is not None:
        raise NotImplementedError(
            "dpm_adaptive picks its own steps — callback is not supported")
    if order not in (2, 3):
        raise ValueError("order should be 2 or 3")
    sigma_max, sigma_min, _n = _sigma_grid(sigmas, "dpm_adaptive")
    t_start, t_end = -math.log(sigma_max), -math.log(sigma_min)
    model_fn, noise_fn, noise_state, _ri, _ref = _setup(
        model, x, jnp.asarray(np.asarray(sigmas, np.float32)),
        cfg=SonarConfig(), default_noise_type="gaussian",
        noise_item=noise_item, noise_sampler=noise_sampler, seed=seed,
        extra_args=extra_args, need_noise=eta > 0)
    pid_order = 1.5 if eta else order
    b1 = (pcoeff + icoeff + dcoeff) / pid_order
    b2 = -(pcoeff + 2.0 * dcoeff) / pid_order
    b3 = dcoeff / pid_order
    numel = float(np.prod(x.shape))

    def sigma_of(t):
        return jnp.exp(-t)

    def solver_step(xc, s, t_, r1, with_third):
        """Shared-eps 2-step (x_low path) and optional 3-step (x_high)."""
        h = t_ - s
        hs = jnp.where(h == 0, 1e-12, h)
        sig_s = sigma_of(s)
        eps = (xc - model_fn(xc, sig_s)) / sig_s
        s1 = s + r1 * h
        sig_s1 = sigma_of(s1)
        u1 = xc - sig_s1 * jnp.expm1(r1 * h) * eps
        eps_r1 = (u1 - model_fn(u1, sig_s1)) / sig_s1
        x2 = (xc - sigma_of(t_) * jnp.expm1(h) * eps
              - sigma_of(t_) / (2.0 * r1) * jnp.expm1(h) * (eps_r1 - eps))
        if not with_third:
            x1 = xc - sigma_of(t_) * jnp.expm1(h) * eps
            return x1, x2
        r2 = 2.0 / 3.0
        s2 = s + r2 * h
        sig_s2 = sigma_of(s2)
        u2 = (xc - sig_s2 * jnp.expm1(r2 * h) * eps
              - sig_s2 * (r2 / r1)
              * (jnp.expm1(r2 * h) / (r2 * hs) - 1.0) * (eps_r1 - eps))
        eps_r2 = (u2 - model_fn(u2, sig_s2)) / sig_s2
        x3 = (xc - sigma_of(t_) * jnp.expm1(h) * eps
              - sigma_of(t_) / r2 * (jnp.expm1(h) / hs - 1.0)
              * (eps_r2 - eps))
        return x2, x3

    def cond_fn(carry):
        _x, _xp, s, _h, _errs, _ns, it = carry
        return (s < t_end - 1e-5) & (it < max_steps)

    def body_fn(carry):
        xc, x_prev, s, h_pid, errs, nstate, it = carry
        t = jnp.minimum(t_end, s + h_pid)
        if eta:
            sd, _su = get_ancestral_step(sigma_of(s), sigma_of(t), eta=eta)
            t_ = jnp.minimum(t_end, -jnp.log(jnp.maximum(sd, 1e-12)))
            su = jnp.sqrt(jnp.maximum(
                sigma_of(t) ** 2 - sigma_of(t_) ** 2, 0.0))
        else:
            t_, su = t, jnp.asarray(0.0, jnp.float32)
        if order == 2:
            x_low, x_high = solver_step(xc, s, t_, 0.5, with_third=False)
        else:
            x_low, x_high = solver_step(xc, s, t_, 1.0 / 3.0,
                                        with_third=True)
        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_low),
                                                     jnp.abs(x_prev)))
        error = (jnp.linalg.norm(((x_low - x_high) / delta).ravel())
                 / math.sqrt(numel))
        inv_err = 1.0 / (error + 1e-8)
        errs = jnp.where(it == 0, jnp.full((3,), inv_err, errs.dtype), errs)
        errs = errs.at[0].set(inv_err)
        factor = 1.0 + jnp.arctan(
            errs[0] ** b1 * errs[1] ** b2 * errs[2] ** b3 - 1.0)
        accept = factor >= accept_safety
        if eta:
            def draw(ns):
                return noise_fn(ns, it, sigma_of(s), sigma_of(t))

            noise, nstate = jax.lax.cond(
                accept, draw, lambda ns: (jnp.zeros_like(xc), ns), nstate)
        else:
            noise = jnp.zeros_like(xc)
        x_acc = x_high + noise * (s_noise * su)
        xc = jnp.where(accept, x_acc, xc)
        x_prev = jnp.where(accept, x_low, x_prev)
        s = jnp.where(accept, t, s)
        errs = jnp.where(accept, errs.at[2].set(errs[1]).at[1].set(errs[0]),
                         errs)
        h_pid = h_pid * factor
        return (xc, x_prev, s, h_pid, errs, nstate, it + 1)

    carry0 = (x, x, jnp.asarray(t_start, jnp.float32),
              jnp.asarray(abs(h_init), jnp.float32),
              jnp.zeros((3,), jnp.float32), noise_state,
              jnp.asarray(0, jnp.int32))
    out = jax.lax.while_loop(cond_fn, body_fn, carry0)
    return out[0]


DPM_SOLVER_SAMPLERS = {
    "dpm_fast": sample_dpm_fast,
    "dpm_adaptive": sample_dpm_adaptive,
}

# both re-grid the schedule on the host — under pipe.jit() the pipeline
# hands them the concrete table instead of the traced jnp view
for _fn in DPM_SOLVER_SAMPLERS.values():
    _fn._needs_host_sigmas = True
