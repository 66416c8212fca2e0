"""Pallas kernel tier tests: interpret-mode kernels vs jnp references, and
the fused sampler path vs the composed momentum state machine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import sonar_tpu.kernels.fused as F
from sonar_tpu.core.normalize import scale_noise
from sonar_tpu.samplers.momentum import SonarConfig, init_momentum_state, momentum_step
from sonar_tpu.samplers.ancestral import get_ancestral_step
from sonar_tpu.samplers.sonar import _fused_eligible, sample_sonar_euler_ancestral


@pytest.fixture()
def tensors():
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal((1, 4, 16, 16)), jnp.float32)  # noqa: E731
    return mk(), mk(), mk(), mk()


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )


def _scal(has=1.0, in_window=1.0, hist_window=1.0):
    return F.pack_momentum_scalars(
        sigma=5.0, dt=-2.0, momentum=0.95, hd_ratio=0.75, hd_scale=1.05,
        md_scale=1.0, has=has, noise_scale=0.5, in_window=in_window,
        hist_window=hist_window)


def test_momentum_kernel_matches_reference(tensors, interpret_pallas):
    x, den, hd, noise = tensors
    for has, inw, hw in ((1.0, 1.0, 1.0), (0.0, 1.0, 1.0), (1.0, 0.0, 1.0),
                         (1.0, 1.0, 0.0)):
        scal = _scal(has, inw, hw)
        ref = F.fused_momentum_step_reference(x, den, hd, noise, scal)
        out = F.fused_momentum_step(x, den, hd, noise, scal, force_pallas=True)
        assert float(jnp.abs(out[0] - ref[0]).max()) < 1e-5
        assert float(jnp.abs(out[1] - ref[1]).max()) < 1e-5


def test_fused_reference_matches_composed_state_machine(tensors):
    """The fused math must equal momentum_step + noise add exactly for the
    default config family (py/sonar.py:309-320 + 561-566)."""
    x, den, _hd, noise = tensors
    cfg = SonarConfig(momentum=0.95, momentum_hist=0.75, direction=1.0)
    sigma = jnp.asarray(5.0)
    sigma_next = jnp.asarray(3.0)
    sigma_down, sigma_up = get_ancestral_step(sigma, sigma_next, eta=1.0)
    s_noise = 1.0
    mom = init_momentum_state(x)
    # two steps to cover has=False → True transition
    for step in range(2):
        out_ref, mom_ref = momentum_step(cfg, mom, x, den, sigma, sigma_down,
                                         step=step)
        out_ref = out_ref + noise * (s_noise * sigma_up)
        hd_ratio, hd_scale, md_scale = cfg.history_ratios
        scal = F.pack_momentum_scalars(
            sigma=sigma, dt=sigma_down - sigma, momentum=cfg.momentum,
            hd_ratio=hd_ratio, hd_scale=hd_scale, md_scale=md_scale,
            has=mom["has"].astype(jnp.float32), noise_scale=s_noise * sigma_up)
        out_f, hd_f = F.fused_momentum_step_reference(x, den, mom["hd"], noise, scal)
        assert float(jnp.abs(out_f - out_ref).max()) < 1e-5, step
        assert float(jnp.abs(hd_f - mom_ref["hd"]).max()) < 1e-5, step
        mom = mom_ref
        x = out_ref


def test_scale_noise_kernel_matches(tensors, interpret_pallas):
    x = tensors[0] * 3.0 + 1.0
    out = F.fused_scale_noise(x, 2.0, force_pallas=True)
    ref = scale_noise(x, 2.0, normalized=True)
    assert float(jnp.abs(out - ref).max()) < 1e-5


def test_fused_sampler_path_matches_unfused(tensors):
    """Full trajectories: fused=True (jnp reference path off-TPU semantics
    via force of the reference impl) vs the composed state machine."""
    x = tensors[0] * 14.6

    def model(xi, sigma, **kw):
        return xi * 0.9  # cheap stub denoiser

    sigmas = jnp.asarray([14.6, 7.0, 2.0, 0.5, 0.0], jnp.float32)
    a = sample_sonar_euler_ancestral(model, x, sigmas, seed=3, use_fused=False)
    b = sample_sonar_euler_ancestral(model, x, sigmas, seed=3, use_fused=True)
    assert float(jnp.abs(a - b).max()) < 1e-4


def test_fused_eligibility_guard():
    assert _fused_eligible(SonarConfig())
    assert not _fused_eligible(SonarConfig(momentum=1.0))
    assert not _fused_eligible(SonarConfig(momentum_mode="classic"))
    assert not _fused_eligible(SonarConfig(blend_mode="inject"))
    assert not _fused_eligible(SonarConfig(init="rand"))
