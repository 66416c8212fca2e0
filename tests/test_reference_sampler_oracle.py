"""Full-trajectory oracle: the LIVE reference samplers (py/sonar.py
SonarEuler / SonarEulerAncestral / SonarDPMPPSDE, loaded via
tests/_reference_loader.py with real k-diffusion math stubs) run on torch
against this framework's lax.scan samplers with an identical injected noise
stream — the BASELINE fidelity criterion ("identical trajectories given the
same injected noise stream", py/sonar.py:491,588)."""

import numpy as np
import pytest

from tests._reference_loader import load_reference

ref_pkg = load_reference()
pytestmark = pytest.mark.skipif(
    ref_pkg is None, reason="reference tree not available")

if ref_pkg is not None:
    import sys

    import torch

    ref_sonar = sys.modules["sonar_reference.py.sonar"]

import jax
import jax.numpy as jnp

from sonar_tpu.samplers.sonar import (
    sample_sonar_dpmpp_sde,
    sample_sonar_euler,
    sample_sonar_euler_ancestral,
)

STEPS = 8
SHAPE = (1, 4, 8, 8)


def _sigmas():
    ramp = np.linspace(0, 1, STEPS)
    s = (14.6 ** (1 / 7.0) + ramp * (0.03 ** (1 / 7.0)
                                     - 14.6 ** (1 / 7.0))) ** 7.0
    return np.concatenate([s, [0.0]]).astype(np.float32)


def _model_torch(x, sigma_b, **kw):
    s = sigma_b.view(-1, *([1] * (x.ndim - 1)))
    return x / (1.0 + s**2) + 0.05 * torch.tanh(x)


def _model_jax(x, sigma_b, **kw):
    s = sigma_b.reshape((-1,) + (1,) * (x.ndim - 1))
    return x / (1.0 + s**2) + 0.05 * jnp.tanh(x)


def _stream(n, seed=42):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n,) + SHAPE).astype(np.float32)


def _torch_stream_sampler(stream):
    counter = {"i": 0}

    def ns(_s, _sn):
        v = torch.tensor(stream[counter["i"]])
        counter["i"] += 1
        return v

    return ns


CONFIGS = [
    {"momentum": 0.85, "momentum_hist": 0.75},
    {"momentum": 0.95, "momentum_hist": 0.5, "direction": 1.0},
]


@pytest.mark.parametrize("params", CONFIGS)
def test_euler_trajectory_matches_reference(params):
    x0 = np.random.default_rng(0).standard_normal(SHAPE).astype(np.float32) * 14.6
    sigmas = _sigmas()
    want = ref_sonar.SonarEuler.sampler(
        _model_torch, torch.tensor(x0.copy()), torch.tensor(sigmas),
        extra_args={"seed": 0}, disable=True, sonar_params=dict(params)).numpy()
    got = np.asarray(sample_sonar_euler(
        _model_jax, jnp.asarray(x0), jnp.asarray(sigmas),
        sonar_params=dict(params), seed=0))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("params", CONFIGS)
def test_euler_ancestral_trajectory_matches_reference(params):
    x0 = np.random.default_rng(1).standard_normal(SHAPE).astype(np.float32) * 14.6
    sigmas = _sigmas()
    stream = _stream(STEPS + 2)
    want = ref_sonar.SonarEulerAncestral.sampler(
        _model_torch, torch.tensor(x0.copy()), torch.tensor(sigmas),
        extra_args={"seed": 0}, disable=True, sonar_params=dict(params),
        eta=1.0, s_noise=0.9,
        noise_sampler=_torch_stream_sampler(stream)).numpy()
    got = np.asarray(sample_sonar_euler_ancestral(
        _model_jax, jnp.asarray(x0), jnp.asarray(sigmas),
        sonar_params=dict(params), eta=1.0, s_noise=0.9, seed=0,
        noise_sampler=lambda step, s, sn: jnp.asarray(stream)[step]))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("params", CONFIGS)
def test_dpmpp_sde_trajectory_matches_reference(params):
    x0 = np.random.default_rng(2).standard_normal(SHAPE).astype(np.float32) * 14.6
    sigmas = _sigmas()
    stream = _stream(2 * STEPS + 2, seed=5)
    want = ref_sonar.SonarDPMPPSDE.sampler(
        _model_torch, torch.tensor(x0.copy()), torch.tensor(sigmas),
        extra_args={"seed": 0}, disable=True, sonar_params=dict(params),
        eta=1.0, s_noise=1.0,
        noise_sampler=_torch_stream_sampler(stream)).numpy()
    got = np.asarray(sample_sonar_dpmpp_sde(
        _model_jax, jnp.asarray(x0), jnp.asarray(sigmas),
        sonar_params=dict(params), eta=1.0, s_noise=1.0, seed=0,
        noise_sampler=lambda step, s, sn: jnp.asarray(stream)[step]))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("seed", range(8))
def test_randomized_sonar_config_fuzz(seed):
    """Seeded random sweep over the SonarConfig surface (momentum/history/
    direction ranges from the node widgets, momentum modes, history init
    SAMPLE/SAMPLE_NORM, step windows, always_update_history, linear/euler
    guidance with a reference latent) on the ancestral sampler with an
    injected noise stream."""
    rng = np.random.default_rng(7700 + seed)
    mode = ["CLASSIC", "NEW", "DENOISED"][rng.integers(3)]
    init = ["ZERO", "SAMPLE", "SAMPLE_NORM"][rng.integers(3)]
    base = dict(
        momentum=float(rng.uniform(-0.5, 2.5)),
        momentum_hist=float(rng.uniform(-1.5, 1.5)),
        direction=float(rng.choice([1.0, -1.0, 0.5, 2.0, -9.0])),
        momentum_start_step=int(rng.integers(0, 3)),
        momentum_end_step=int(rng.choice([3, 9999])),
        always_update_history=bool(rng.integers(2)),
    )
    guide = None
    if rng.random() < 0.6:
        g_latent = (np.random.default_rng(seed)
                    .standard_normal(SHAPE).astype(np.float32))
        guide = dict(
            guidance_type=["LINEAR", "EULER"][rng.integers(2)],
            factor=float(rng.uniform(-0.15, 0.15)),
            start_step=int(rng.integers(0, 3)),
            end_step=int(rng.choice([4, 9999])),
        )
    eta = float(rng.choice([0.4, 1.0]))
    s_noise = float(rng.uniform(0.8, 1.1))

    ref_params = dict(base, momentum_mode=ref_sonar.MomentumMode[mode],
                      init=ref_sonar.HistoryType[init])
    our_params = dict(base, momentum_mode=mode.lower(), init=init.lower())
    if guide is not None:
        ref_params["guidance"] = ref_sonar.GuidanceConfig(
            guidance_type=ref_sonar.GuidanceType[guide["guidance_type"]],
            factor=guide["factor"], start_step=guide["start_step"],
            end_step=guide["end_step"], latent=torch.tensor(g_latent.copy()))
        our_params["guidance"] = dict(
            guidance_type=guide["guidance_type"].lower(),
            factor=guide["factor"], start_step=guide["start_step"],
            end_step=guide["end_step"], latent=jnp.asarray(g_latent))

    x0 = (np.random.default_rng(100 + seed)
          .standard_normal(SHAPE).astype(np.float32) * 14.6)
    sigmas = _sigmas()
    stream = _stream(STEPS + 2, seed=200 + seed)
    want = ref_sonar.SonarEulerAncestral.sampler(
        _model_torch, torch.tensor(x0.copy()), torch.tensor(sigmas),
        extra_args={"seed": 0}, disable=True, sonar_params=ref_params,
        eta=eta, s_noise=s_noise,
        noise_sampler=_torch_stream_sampler(stream)).numpy()
    got = np.asarray(sample_sonar_euler_ancestral(
        _model_jax, jnp.asarray(x0), jnp.asarray(sigmas),
        sonar_params=our_params, eta=eta, s_noise=s_noise, seed=0,
        noise_sampler=lambda step, s, sn: jnp.asarray(stream)[step]))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4 * scale,
                               err_msg=f"sonar fuzz seed {seed}")
