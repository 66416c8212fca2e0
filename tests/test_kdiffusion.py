"""Trajectory oracles for the plain k-diffusion sampler set.

Each sampler is checked against a float64 numpy transcription of the
``comfy.k_diffusion.sampling`` formulas (eager python loop, recorded
noise stream, shared analytic model) — the same technique as
test_momentum_oracle. Plus the algebraic identities that pin the family
together: ddim(eta=0) == euler(no churn), sonar_euler_ancestral with
momentum=1 == euler_ancestral, and checkpoint/resume bit-equality.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.samplers import (
    SAMPLERS,
    sample_ddim,
    sample_dpmpp_2m,
    sample_dpmpp_2s_ancestral,
    sample_euler,
    sample_euler_ancestral,
    sample_heun,
    sample_lcm,
    sample_sonar_euler_ancestral,
    SonarConfig,
)

SHAPE = (2, 3, 8, 8)
N_STEPS = 8


def karras(n=N_STEPS, smin=0.03, smax=14.6, rho=7.0):
    ramp = np.linspace(0, 1, n)
    s = (smax ** (1 / rho) + ramp * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho
    return np.concatenate([s, [0.0]]).astype(np.float32)


def np_model(x, sigma):
    return x / (1.0 + sigma) + 0.05 * np.sin(x)


def jx_model(x, sigma_b, **kw):
    s = sigma_b.reshape(-1, 1, 1, 1)
    return x / (1.0 + s) + 0.05 * jnp.sin(x)


def make_stream(n, seed=11):
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n,) + SHAPE).astype(np.float32)


def jx_noise_sampler(stream):
    stack = jnp.asarray(stream)
    return lambda step, s, sn: stack[step]


def np_ancestral(sigma, sigma_next, eta):
    if not eta or sigma_next == 0:
        return float(sigma_next), 0.0
    su = min(sigma_next,
             eta * math.sqrt(sigma_next**2 * (sigma**2 - sigma_next**2)
                             / sigma**2))
    return math.sqrt(sigma_next**2 - su**2), su


def np_euler(x, sigmas, noise, s_churn=0.0, s_tmin=0.0,
             s_tmax=float("inf"), s_noise=1.0):
    x = x.astype(np.float64)
    n = len(sigmas) - 1
    for i in range(n):
        sigma = float(sigmas[i])
        gamma = (min(s_churn / n, 2**0.5 - 1)
                 if s_tmin <= sigma <= s_tmax else 0.0)
        sigma_hat = sigma * (1 + gamma)
        if gamma > 0:
            x = x + noise[i] * s_noise * math.sqrt(sigma_hat**2 - sigma**2)
        denoised = np_model(x, sigma_hat)
        d = (x - denoised) / sigma_hat
        x = x + d * (float(sigmas[i + 1]) - sigma_hat)
    return x


def np_euler_ancestral(x, sigmas, noise, eta=1.0, s_noise=1.0):
    x = x.astype(np.float64)
    for i in range(len(sigmas) - 1):
        sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
        sd, su = np_ancestral(sigma, sigma_next, eta)
        denoised = np_model(x, sigma)
        d = (x - denoised) / sigma
        x = x + d * (sd - sigma)
        if sigma_next > 0:
            x = x + noise[i] * s_noise * su
    return x


def np_heun(x, sigmas, noise, s_churn=0.0, s_tmin=0.0,
            s_tmax=float("inf"), s_noise=1.0):
    x = x.astype(np.float64)
    n = len(sigmas) - 1
    for i in range(n):
        sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
        gamma = (min(s_churn / n, 2**0.5 - 1)
                 if s_tmin <= sigma <= s_tmax else 0.0)
        sigma_hat = sigma * (1 + gamma)
        if gamma > 0:
            x = x + noise[i] * s_noise * math.sqrt(sigma_hat**2 - sigma**2)
        denoised = np_model(x, sigma_hat)
        d = (x - denoised) / sigma_hat
        dt = sigma_next - sigma_hat
        if sigma_next == 0:
            x = x + d * dt
        else:
            x_2 = x + d * dt
            denoised_2 = np_model(x_2, sigma_next)
            d_2 = (x_2 - denoised_2) / sigma_next
            x = x + (d + d_2) / 2 * dt
    return x


def np_dpmpp_2m(x, sigmas):
    x = x.astype(np.float64)
    old = None
    with np.errstate(divide="ignore"):
        for i in range(len(sigmas) - 1):
            sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
            denoised = np_model(x, sigma)
            t = -np.log(sigma)
            t_next = -np.log(sigma_next) if sigma_next > 0 else np.inf
            h = t_next - t
            if old is None or sigma_next == 0:
                x = (sigma_next / sigma) * x - np.expm1(-h) * denoised
            else:
                h_last = t - (-np.log(float(sigmas[i - 1])))
                r = h_last / h
                dd = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old
                x = (sigma_next / sigma) * x - np.expm1(-h) * dd
            old = denoised
    return x


def np_dpmpp_2s_ancestral(x, sigmas, noise, eta=1.0, s_noise=1.0):
    x = x.astype(np.float64)
    for i in range(len(sigmas) - 1):
        sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
        sd, su = np_ancestral(sigma, sigma_next, eta)
        denoised = np_model(x, sigma)
        if sd == 0:
            d = (x - denoised) / sigma
            x = x + d * (sd - sigma)
        else:
            t, t_next = -math.log(sigma), -math.log(sd)
            r = 0.5
            h = t_next - t
            s = t + r * h
            x_2 = (math.exp(-s) / sigma) * x - np.expm1(-h * r) * denoised
            denoised_2 = np_model(x_2, math.exp(-s))
            x = (sd / sigma) * x - np.expm1(-h) * denoised_2
        if sigma_next > 0:
            x = x + noise[i] * s_noise * su
    return x


def np_ddim(x, sigmas, noise, eta=0.0, s_noise=1.0):
    x = x.astype(np.float64)
    for i in range(len(sigmas) - 1):
        sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
        sd, su = np_ancestral(sigma, sigma_next, eta) if eta else (sigma_next, 0.0)
        denoised = np_model(x, sigma)
        x = denoised + (sd / sigma) * (x - denoised)
        if eta and sigma_next > 0:
            x = x + noise[i] * s_noise * su
    return x


def np_lcm(x, sigmas, noise, s_noise=1.0):
    x = x.astype(np.float64)
    for i in range(len(sigmas) - 1):
        sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
        denoised = np_model(x, sigma)
        x = denoised
        if sigma_next > 0:
            x = x + noise[i] * s_noise * sigma_next
    return x


@pytest.fixture(scope="module")
def x0():
    rng = np.random.RandomState(3)
    return (rng.standard_normal(SHAPE) * 14.6).astype(np.float32)


def _run(fn, x0, sigmas, stream=None, **kw):
    if stream is not None:
        kw["noise_sampler"] = jx_noise_sampler(stream)
    out = jax.jit(lambda x: fn(jx_model, x, jnp.asarray(sigmas), **kw))(
        jnp.asarray(x0))
    return np.asarray(out)


def _close(a, b, tol=2e-4):
    scale = max(1.0, float(np.abs(b).max()))
    assert np.abs(a - b).max() / scale < tol, np.abs(a - b).max()


def test_euler_oracle(x0):
    sigmas = karras()
    _close(_run(sample_euler, x0, sigmas), np_euler(x0, sigmas, None))


def test_euler_churn_oracle(x0):
    sigmas = karras()
    stream = make_stream(N_STEPS)
    got = _run(sample_euler, x0, sigmas, stream, s_churn=0.7, s_tmin=0.05,
               s_tmax=10.0, s_noise=0.9)
    want = np_euler(x0, sigmas, stream, s_churn=0.7, s_tmin=0.05,
                    s_tmax=10.0, s_noise=0.9)
    _close(got, want)


@pytest.mark.parametrize("eta", [1.0, 0.62, 0.0])
def test_euler_ancestral_oracle(x0, eta):
    sigmas = karras()
    stream = make_stream(N_STEPS)
    _close(_run(sample_euler_ancestral, x0, sigmas, stream, eta=eta),
           np_euler_ancestral(x0, sigmas, stream, eta=eta))


def test_heun_oracle(x0):
    sigmas = karras()
    _close(_run(sample_heun, x0, sigmas), np_heun(x0, sigmas, None))


def test_heun_churn_oracle(x0):
    sigmas = karras()
    stream = make_stream(N_STEPS)
    _close(_run(sample_heun, x0, sigmas, stream, s_churn=0.5),
           np_heun(x0, sigmas, stream, s_churn=0.5))


def test_dpmpp_2m_oracle(x0):
    sigmas = karras()
    _close(_run(sample_dpmpp_2m, x0, sigmas), np_dpmpp_2m(x0, sigmas))


@pytest.mark.parametrize("eta", [1.0, 0.5, 0.0])
def test_dpmpp_2s_ancestral_oracle(x0, eta):
    sigmas = karras()
    stream = make_stream(N_STEPS)
    _close(_run(sample_dpmpp_2s_ancestral, x0, sigmas, stream, eta=eta),
           np_dpmpp_2s_ancestral(x0, sigmas, stream, eta=eta))


@pytest.mark.parametrize("eta", [0.0, 0.8])
def test_ddim_oracle(x0, eta):
    sigmas = karras()
    stream = make_stream(N_STEPS)
    _close(_run(sample_ddim, x0, sigmas, stream, eta=eta),
           np_ddim(x0, sigmas, stream, eta=eta))


def test_lcm_oracle(x0):
    sigmas = karras()
    stream = make_stream(N_STEPS)
    _close(_run(sample_lcm, x0, sigmas, stream),
           np_lcm(x0, sigmas, stream))


def test_ddim_eta0_equals_euler(x0):
    sigmas = karras()
    a = _run(sample_ddim, x0, sigmas)
    b = _run(sample_euler, x0, sigmas)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_sonar_momentum1_equals_euler_ancestral(x0):
    """momentum=1 disables the momentum blend — the sonar ancestral
    sampler must reproduce the plain k-diffusion trajectory."""
    sigmas = karras()
    stream = make_stream(N_STEPS)
    plain = _run(sample_euler_ancestral, x0, sigmas, stream)
    sonar = _run(sample_sonar_euler_ancestral, x0, sigmas, stream,
                 sonar_config=SonarConfig(momentum=1.0), use_fused=False)
    np.testing.assert_allclose(sonar, plain, rtol=2e-6, atol=2e-6)


def test_dpmpp_2m_resume_bitwise(x0):
    sigmas = karras()
    full = _run(sample_dpmpp_2m, x0, sigmas)
    xj = jnp.asarray(x0)
    sj = jnp.asarray(sigmas)
    _x, carry = sample_dpmpp_2m(jx_model, xj, sj, stop_step=4,
                                return_state=True)
    resumed = sample_dpmpp_2m(jx_model, xj, sj, resume_from=carry,
                              start_step=4)
    assert (np.asarray(resumed) == full).all()


def test_registry_names():
    for name in ("euler", "euler_ancestral", "heun", "dpmpp_2m",
                 "dpmpp_2s_ancestral", "ddim", "lcm"):
        assert name in SAMPLERS
    from sonar_tpu.api.functions import get_sampler

    assert get_sampler("dpmpp_2s_ancestral") is sample_dpmpp_2s_ancestral


def test_override_with_custom_noise(x0):
    """SamplerConfigOverride wraps a k-diffusion sampler with a custom
    noise item (the reference's headline use, py/nodes/misc.py:461-625)."""
    from sonar_tpu.api.functions import sampler_config_override
    from sonar_tpu.noise.presets import get_noise_item

    sigmas = karras()
    wrapped = sampler_config_override(
        "dpmpp_2s_ancestral", noise_item=get_noise_item("pyramid"),
        eta=0.8, seed=5)
    out = np.asarray(jax.jit(
        lambda x: wrapped(jx_model, x, jnp.asarray(sigmas)))(
            jnp.asarray(x0)))
    assert np.isfinite(out).all()
    # different from the gaussian-noise trajectory: the noise item reached
    # the loop
    base = _run(sample_dpmpp_2s_ancestral, x0, sigmas, eta=0.8, seed=5)
    assert np.abs(out - base).max() > 1e-3


def test_ksampler_select_node():
    from sonar_tpu.api.nodes import build

    fn = build("KSamplerSelect", sampler_name="dpmpp_2s_ancestral")
    assert fn is sample_dpmpp_2s_ancestral
    with pytest.raises(ValueError):
        build("KSamplerSelect", sampler_name="not_a_sampler")


def test_lcm_rf_mode(x0):
    sigmas = np.linspace(1.0, 0.0, 9).astype(np.float32)
    stream = make_stream(8)
    got = _run(sample_lcm, x0, sigmas, stream, ancestral_mode="rf")
    x = x0.astype(np.float64)
    for i in range(8):
        sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
        denoised = np_model(x, sigma)
        x = denoised if sigma_next == 0 else (
            (1 - sigma_next) * denoised + stream[i] * sigma_next)
    _close(got, x)


def np_dpmpp_2m_sde(x, sigmas, noise, eta=1.0, s_noise=1.0,
                    solver_type="midpoint"):
    x = x.astype(np.float64)
    old, h_last = None, None
    for i in range(len(sigmas) - 1):
        sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
        denoised = np_model(x, sigma)
        if sigma_next == 0:
            x = denoised
        else:
            t, s = -math.log(sigma), -math.log(sigma_next)
            h = s - t
            eta_h = eta * h
            x = (sigma_next / sigma) * math.exp(-eta_h) * x \
                - np.expm1(-h - eta_h) * denoised
            if old is not None:
                r = h_last / h
                if solver_type == "heun":
                    x = x + (np.expm1(-h - eta_h) / (h + eta_h) + 1) \
                        * (1 / r) * (denoised - old)
                else:
                    x = x + 0.5 * -np.expm1(-h - eta_h) * (1 / r) \
                        * (denoised - old)
            if eta:
                x = x + noise[i] * sigma_next \
                    * math.sqrt(-np.expm1(-2 * eta_h)) * s_noise
        old, h_last = denoised, (h if sigma_next else h_last)
    return x


def np_dpmpp_3m_sde(x, sigmas, noise, eta=1.0, s_noise=1.0):
    x = x.astype(np.float64)
    den_1 = den_2 = None
    h_1 = h_2 = None
    for i in range(len(sigmas) - 1):
        sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
        denoised = np_model(x, sigma)
        if sigma_next == 0:
            x = denoised
        else:
            t, s = -math.log(sigma), -math.log(sigma_next)
            h = s - t
            h_eta = h * (eta + 1)
            x = math.exp(-h_eta) * x - np.expm1(-h_eta) * denoised
            phi_2 = np.expm1(-h_eta) / h_eta + 1
            phi_3 = phi_2 / h_eta - 0.5
            if h_2 is not None:
                r0, r1 = h_1 / h, h_2 / h
                d1_0 = (denoised - den_1) / r0
                d1_1 = (den_1 - den_2) / r1
                d1 = d1_0 + (d1_0 - d1_1) * r0 / (r0 + r1)
                d2 = (d1_0 - d1_1) / (r0 + r1)
                x = x + phi_2 * d1 - phi_3 * d2
            elif h_1 is not None:
                r = h_1 / h
                x = x + phi_2 * ((denoised - den_1) / r)
            if eta:
                x = x + noise[i] * sigma_next \
                    * math.sqrt(-np.expm1(-2 * h * eta)) * s_noise
            den_1, den_2 = denoised, den_1
            h_1, h_2 = h, h_1
    return x


@pytest.mark.parametrize("solver", ["midpoint", "heun"])
@pytest.mark.parametrize("eta", [1.0, 0.0])
def test_dpmpp_2m_sde_oracle(x0, solver, eta):
    from sonar_tpu.samplers import sample_dpmpp_2m_sde

    sigmas = karras()
    stream = make_stream(N_STEPS)
    _close(_run(sample_dpmpp_2m_sde, x0, sigmas, stream, eta=eta,
                solver_type=solver),
           np_dpmpp_2m_sde(x0, sigmas, stream, eta=eta, solver_type=solver))


@pytest.mark.parametrize("eta", [1.0, 0.4, 0.0])
def test_dpmpp_3m_sde_oracle(x0, eta):
    from sonar_tpu.samplers import sample_dpmpp_3m_sde

    sigmas = karras()
    stream = make_stream(N_STEPS)
    _close(_run(sample_dpmpp_3m_sde, x0, sigmas, stream, eta=eta),
           np_dpmpp_3m_sde(x0, sigmas, stream, eta=eta))


def test_sde_samplers_registered_with_brownian_default():
    from sonar_tpu.samplers import SAMPLERS, sample_dpmpp_2m_sde

    assert SAMPLERS["dpmpp_2m_sde"] is sample_dpmpp_2m_sde
    assert "dpmpp_3m_sde" in SAMPLERS
    # default (no injected stream) draws brownian noise and stays finite
    sigmas = karras()
    out = np.asarray(jax.jit(
        lambda x: SAMPLERS["dpmpp_3m_sde"](jx_model, x,
                                           jnp.asarray(sigmas), seed=5))(
            jnp.asarray(np.ones(SHAPE, np.float32) * 14.6)))
    assert np.isfinite(out).all()


def np_dpmpp_sde(x, sigmas, noise2, eta=1.0, s_noise=1.0, r=0.5):
    """k-diffusion sample_dpmpp_sde; noise2 indexed (2i, 2i+1)."""
    x = x.astype(np.float64)
    for i in range(len(sigmas) - 1):
        sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
        denoised = np_model(x, sigma)
        if sigma_next == 0:
            d = (x - denoised) / sigma
            x = x + d * (sigma_next - sigma)
        else:
            t, t_next = -math.log(sigma), -math.log(sigma_next)
            h = t_next - t
            s = t + h * r
            fac = 1 / (2 * r)
            sd, su = np_ancestral(math.exp(-t), math.exp(-s), eta)
            s_ = -math.log(sd)
            x_2 = (math.exp(-s_) / math.exp(-t)) * x \
                - np.expm1(t - s_) * denoised
            x_2 = x_2 + noise2[2 * i] * s_noise * su
            denoised_2 = np_model(x_2, math.exp(-s))
            sd, su = np_ancestral(math.exp(-t), math.exp(-t_next), eta)
            t_next_ = -math.log(sd)
            denoised_d = (1 - fac) * denoised + fac * denoised_2
            x = (math.exp(-t_next_) / math.exp(-t)) * x \
                - np.expm1(t - t_next_) * denoised_d
            x = x + noise2[2 * i + 1] * s_noise * su
    return x


@pytest.mark.parametrize("eta,r", [(1.0, 0.5), (0.7, 0.5), (1.0, 0.31),
                                   (0.0, 0.5)])
def test_dpmpp_sde_oracle(x0, eta, r):
    """The plain dpmpp_sde alias (sonar loop pinned at momentum=1) must
    reproduce the k-diffusion formula exactly, including the midpoint
    ratio r the reference's SamplerConfigOverride forwards."""
    from sonar_tpu.samplers import sample_dpmpp_sde

    sigmas = karras()
    stream = make_stream(2 * N_STEPS, seed=23)
    _close(_run(sample_dpmpp_sde, x0, sigmas, stream, eta=eta, r=r),
           np_dpmpp_sde(x0, sigmas, stream, eta=eta, r=r))


def test_gpu_alias_names_registered():
    from sonar_tpu.samplers import KDIFFUSION_SAMPLERS as K

    assert K["dpmpp_sde_gpu"] is K["dpmpp_sde"]
    assert K["dpmpp_2m_sde_gpu"] is K["dpmpp_2m_sde"]
    assert K["dpmpp_3m_sde_gpu"] is K["dpmpp_3m_sde"]


def test_restart_wraps_kdiffusion_inner_samplers(x0):
    """KRestartSamplerCustomNoise can wrap ANY registered sampler in the
    reference; the native restart must compose with the k-diffusion set."""
    from sonar_tpu.samplers import sample_restart

    sigmas = np.concatenate(
        [np.geomspace(14.6, 0.03, 10), [0.0]]).astype(np.float32)
    for inner in (sample_dpmpp_2m, sample_dpmpp_2s_ancestral):
        out = np.asarray(sample_restart(jx_model, jnp.asarray(x0),
                                        sigmas, inner_sampler=inner, seed=5))
        assert out.shape == x0.shape and np.isfinite(out).all()


def test_euler_windowed_churn_stateful_stream_parity(x0):
    """ADVICE r4: with a windowed churn and a STATEFUL noise item,
    out-of-window steps must neither draw nor advance the stream — the
    reference only calls noise_sampler when gamma > 0. Reproduce the
    item's sequential draws (one per in-window step) and check the
    trajectory against the numpy oracle."""
    from sonar_tpu.core.rng import derive_key, key_from_seed
    from sonar_tpu.noise.base import make_noise_sampler
    from sonar_tpu.noise.presets import get_noise_item

    sigmas = karras()
    s_tmin, s_tmax = 0.5, 5.0
    in_win = [(s_tmin <= float(s) <= s_tmax) for s in sigmas[:-1]]
    assert any(in_win) and not all(in_win)  # genuinely mixed window
    seed = 1234
    got = _run(sample_euler, x0, sigmas, s_churn=0.7, s_tmin=s_tmin,
               s_tmax=s_tmax, seed=seed)
    # replicate _setup's seed derivation and draw ONLY on in-window steps
    key = key_from_seed(seed)
    pos = sigmas[sigmas > 0]
    fn, st = make_noise_sampler(
        get_noise_item("gaussian"), x0.shape, dtype=jnp.float32,
        sigma_min=float(pos.min()), sigma_max=float(sigmas.max()),
        seed=derive_key(key, "noise"), normalized=True,
        ref_latent=jnp.asarray(x0))
    noise = np.zeros((len(sigmas) - 1,) + x0.shape, np.float32)
    for i, w in enumerate(in_win):
        if w:
            n, st = fn(st, jnp.asarray(float(sigmas[i])),
                       jnp.asarray(float(sigmas[i + 1])))
            noise[i] = np.asarray(n)
    want = np_euler(x0, sigmas, noise, s_churn=0.7, s_tmin=s_tmin,
                    s_tmax=s_tmax)
    _close(got, want)


def test_euler_inert_churn_window_matches_no_churn(x0):
    """A churn window no step's sigma can reach must compile to the
    no-RNG program (statically inert — ADVICE r4)."""
    sigmas = karras()
    plain = _run(sample_euler, x0, sigmas)
    inert = _run(sample_euler, x0, sigmas, s_churn=0.7, s_tmin=100.0,
                 s_tmax=200.0, seed=7)
    np.testing.assert_array_equal(plain, inert)


def test_heun_windowed_churn_oracle_matches(x0):
    """heun with a mixed window + indexed stream still matches the numpy
    oracle after the gated-draw change."""
    sigmas = karras()
    stream = make_stream(N_STEPS, seed=31)
    _close(_run(sample_heun, x0, sigmas, stream, s_churn=0.5, s_tmin=0.5,
                s_tmax=5.0),
           np_heun(x0, sigmas, stream, s_churn=0.5, s_tmin=0.5, s_tmax=5.0))
