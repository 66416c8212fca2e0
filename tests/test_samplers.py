"""Trajectory-equivalence tests for the sonar samplers (SURVEY §4a/§4c).

Oracles are independent numpy transcriptions of the *plain* k-diffusion
algorithms (euler / euler_ancestral / dpmpp_sde): with momentum=1 the sonar
samplers must reduce to them exactly given the same injected noise stream
(reference README.md:50; noise injection per py/sonar.py:491,588).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.samplers import (
    SonarConfig,
    GuidanceConfig,
    sample_sonar_dpmpp_sde,
    sample_sonar_euler,
    sample_sonar_euler_ancestral,
)

SHAPE = (1, 4, 16, 16)


def make_model(w=0.95):
    """Stub denoiser: a contraction toward a fixed pattern."""
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32))

    def model(x, sigma_batch, **_kw):
        s = sigma_batch.reshape((-1,) + (1,) * (x.ndim - 1))
        return (x * w + target) / (1.0 + s * 0.1)

    return model, target


def np_model(x, sigma, target, w=0.95):
    return (x * w + target) / (1.0 + sigma * 0.1)


def karras_sigmas(n, smin=0.03, smax=14.6):
    ramp = np.linspace(0, 1, n)
    rho = 7.0
    s = (smax ** (1 / rho) + ramp * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho
    return np.concatenate([s, [0.0]]).astype(np.float32)


def ancestral_np(sigma, sigma_next, eta=1.0):
    if sigma_next == 0 or eta == 0:
        return sigma_next, 0.0
    su = min(
        sigma_next,
        eta * np.sqrt(sigma_next**2 * (sigma**2 - sigma_next**2) / sigma**2),
    )
    sd = np.sqrt(sigma_next**2 - su**2)
    return sd, su


@pytest.fixture()
def x0(rng):
    return jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32) * 14.6)


def test_momentum1_equals_plain_euler(x0):
    model, target = make_model()
    sigmas = karras_sigmas(10)
    got = sample_sonar_euler(
        model, x0, sigmas, sonar_config=SonarConfig(momentum=1.0)
    )
    # numpy plain Euler
    x = np.asarray(x0, dtype=np.float64)
    tgt = np.asarray(target, dtype=np.float64)
    for i in range(len(sigmas) - 1):
        s, sn = float(sigmas[i]), float(sigmas[i + 1])
        den = np_model(x, s, tgt)
        d = (x - den) / s
        x = x + d * (sn - s)
    np.testing.assert_allclose(np.asarray(got), x, rtol=2e-4, atol=2e-4)


def test_momentum1_equals_plain_euler_ancestral(x0):
    model, target = make_model()
    sigmas = karras_sigmas(10)
    n_steps = len(sigmas) - 1
    rng = np.random.default_rng(77)
    stream = rng.standard_normal((n_steps,) + SHAPE).astype(np.float32)
    stream_j = jnp.asarray(stream)

    got = sample_sonar_euler_ancestral(
        model, x0, sigmas,
        sonar_config=SonarConfig(momentum=1.0),
        noise_sampler=lambda step, s, sn: stream_j[step],
        eta=1.0, s_noise=1.0,
    )
    x = np.asarray(x0, dtype=np.float64)
    tgt = np.asarray(target, dtype=np.float64)
    for i in range(n_steps):
        s, sn = float(sigmas[i]), float(sigmas[i + 1])
        sd, su = ancestral_np(s, sn)
        den = np_model(x, s, tgt)
        d = (x - den) / s
        x = x + d * (sd - s)
        if sn > 0:
            x = x + stream[i] * su
    np.testing.assert_allclose(np.asarray(got), x, rtol=2e-4, atol=2e-4)


def test_momentum1_equals_plain_dpmpp_sde(x0):
    model, target = make_model()
    sigmas = karras_sigmas(8)
    n_steps = len(sigmas) - 1
    rng = np.random.default_rng(99)
    stream = rng.standard_normal((2 * n_steps,) + SHAPE).astype(np.float32)
    stream_j = jnp.asarray(stream)

    got = sample_sonar_dpmpp_sde(
        model, x0, sigmas,
        sonar_config=SonarConfig(momentum=1.0),
        noise_sampler=lambda step, s, sn: stream_j[step],
        eta=1.0, s_noise=1.0,
    )
    # numpy plain dpmpp_sde (r=1/2)
    x = np.asarray(x0, dtype=np.float64)
    tgt = np.asarray(target, dtype=np.float64)
    for i in range(n_steps):
        s, sn = float(sigmas[i]), float(sigmas[i + 1])
        den = np_model(x, s, tgt)
        if sn == 0:
            d = (x - den) / s
            x = x + d * (0.0 - s)
            continue
        t, t_next = -np.log(s), -np.log(sn)
        h = t_next - t
        ss = np.exp(-(t + h / 2))
        sd, su = ancestral_np(s, ss)
        s_ = -np.log(sd)
        x_2 = (np.exp(-s_) / s) * x - np.expm1(t - s_) * den
        x_2 = x_2 + stream[2 * i] * su
        den2 = np_model(x_2, ss, tgt)
        sd, su = ancestral_np(s, sn)
        t_down = -np.log(sd)
        x = (np.exp(-t_down) / s) * x - np.expm1(t - t_down) * den2
        x = x + stream[2 * i + 1] * su
    np.testing.assert_allclose(np.asarray(got), x, rtol=5e-4, atol=5e-4)


def test_momentum_changes_trajectory(x0):
    model, _ = make_model()
    sigmas = karras_sigmas(10)
    a = sample_sonar_euler(model, x0, sigmas, sonar_config=SonarConfig(momentum=1.0))
    b = sample_sonar_euler(model, x0, sigmas, sonar_config=SonarConfig(momentum=0.8))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_momentum_window_gating(x0):
    """Outside the momentum step window the sampler is plain Euler."""
    model, _ = make_model()
    sigmas = karras_sigmas(10)
    plain = sample_sonar_euler(model, x0, sigmas, sonar_config=SonarConfig(momentum=1.0))
    gated = sample_sonar_euler(
        model, x0, sigmas,
        sonar_config=SonarConfig(
            momentum=0.5, momentum_start_step=100, momentum_end_step=200,
            always_update_history=True,
        ),
    )
    np.testing.assert_allclose(np.asarray(plain), np.asarray(gated), rtol=1e-5)


def test_scan_vs_python_loop(x0):
    model, _ = make_model()
    sigmas = karras_sigmas(8)
    cfg = SonarConfig(momentum=0.85, momentum_hist=0.6, direction=-1.0)
    a = sample_sonar_euler(model, x0, sigmas, sonar_config=cfg, method="scan")
    b = sample_sonar_euler(model, x0, sigmas, sonar_config=cfg, method="python")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_sampler_jits(x0):
    model, _ = make_model()
    sigmas = jnp.asarray(karras_sigmas(8))
    f = jax.jit(
        lambda x, sig: sample_sonar_euler_ancestral(
            model, x, sig, sonar_config=SonarConfig(), seed=3
        )
    )
    out = f(x0, sigmas)
    assert np.isfinite(np.asarray(out)).all()


def test_guidance_linear_pulls_toward_ref(x0):
    model, _ = make_model()
    sigmas = karras_sigmas(10)
    rng = np.random.default_rng(5)
    ref = jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32))
    cfg = SonarConfig(
        momentum=1.0,
        guidance=GuidanceConfig(guidance_type="linear", factor=0.5, start_step=0),
    )
    guided = sample_sonar_euler(model, x0, sigmas, sonar_config=cfg.updated(
        {"guidance": GuidanceConfig(guidance_type="linear", factor=0.5,
                                    start_step=0, latent=ref)}))
    plain = sample_sonar_euler(model, x0, sigmas, sonar_config=SonarConfig(momentum=1.0))
    g, p, r = (np.asarray(v).ravel() for v in (guided, plain, ref))

    def corr(a, b):
        return np.corrcoef(a, b)[0, 1]

    assert corr(g, r) > corr(p, r)


def test_yaml_param_override(x0):
    model, _ = make_model()
    sigmas = karras_sigmas(8)
    a = sample_sonar_euler(model, x0, sigmas,
                           sonar_config=SonarConfig(momentum=0.7))
    b = sample_sonar_euler(model, x0, sigmas,
                           sonar_params={"momentum": 0.7})
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_history_init_modes(x0):
    model, _ = make_model()
    sigmas = karras_sigmas(8)
    outs = {}
    for init in ("zero", "sample", "sample_norm", "rand"):
        cfg = SonarConfig(momentum=0.8, init=init, rand_init_noise_type="gaussian")
        outs[init] = np.asarray(
            sample_sonar_euler(model, x0, sigmas, sonar_config=cfg, seed=4)
        )
        assert np.isfinite(outs[init]).all()
    assert not np.allclose(outs["zero"], outs["sample"])
    assert not np.allclose(outs["sample"], outs["sample_norm"])


def test_guidance_euler_degenerate_fallback_uses_lerp():
    """The reference's EULER guidance never forwards the configured blend:
    its sigma==sigma_next fallback calls guidance_linear with the default
    torch.lerp (py/sonar.py:380-398)."""
    from sonar_tpu.samplers.guidance import guidance_euler, guidance_linear

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8)).astype(np.float32))
    ref = jnp.asarray(rng.standard_normal((1, 4, 8, 8)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((1, 4, 8, 8)).astype(np.float32))
    exotic = lambda a, b, t: b  # a blend that would betray forwarding
    got = guidance_euler(jnp.asarray(2.0), jnp.asarray(2.0), x, d, ref,
                         0.3, blend=exotic)
    want = guidance_linear(x, ref, factor=0.3,
                           blend=lambda a, b, t: a + (b - a) * t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_sonar_config_updated_traceable():
    """updated() must not deep-copy its fields: a traced guidance latent
    has to survive (the old dataclasses.asdict path deep-copied every
    array and raised on tracers)."""
    import jax

    from sonar_tpu.samplers.momentum import GuidanceConfig, SonarConfig

    def f(latent):
        cfg = SonarConfig(guidance=GuidanceConfig(latent=latent))
        cfg2 = cfg.updated({"momentum": 0.5})
        return cfg2.guidance.latent * cfg2.momentum

    out = jax.jit(f)(jnp.ones((1, 4, 4, 4)))
    np.testing.assert_allclose(np.asarray(out), 0.5)


def test_constant_guide_latent_does_not_nan():
    """prepare_ref_latent's zero-std guard: a constant (zeros) guide
    latent NaNs the reference's whole trajectory; here it degrades
    gracefully (SURVEY 5.3 NaN-safety convention)."""
    from sonar_tpu.samplers.sonar import sample_sonar_euler

    def model(x, s, **kw):
        return x / (1.0 + s.reshape((-1, 1, 1, 1)) ** 2)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8)).astype(np.float32)) * 14.6
    sig = jnp.asarray(
        np.concatenate([np.geomspace(14.6, 0.03, 8), [0.0]]).astype(np.float32))
    for gt in ("euler", "linear"):
        g = dict(guidance_type=gt, factor=0.05, start_step=0, end_step=99,
                 latent=jnp.zeros_like(x))
        out = sample_sonar_euler(model, x, sig,
                                 sonar_params={"guidance": g}, seed=1)
        assert bool(jnp.isfinite(out).all()), gt
