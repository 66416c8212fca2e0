"""Momentum-state-machine oracle: an independent numpy transcription of the
reference formulas (py/sonar.py:169-320) run step-by-step against the JAX
samplers with momentum != 1 — full-trajectory golden parity for all three
momentum modes (SURVEY §4c)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.samplers import SonarConfig, sample_sonar_euler

SHAPE = (1, 4, 8, 8)


def karras(n, smin=0.3, smax=10.0):
    ramp = np.linspace(0, 1, n)
    rho = 7.0
    s = (smax ** (1 / rho) + ramp * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho
    return np.concatenate([s, [0.0]]).astype(np.float32)


def np_model_factory():
    rng = np.random.default_rng(7)
    target = rng.standard_normal(SHAPE).astype(np.float32)

    def np_model(x, sigma):
        return (x * 0.95 + target) / (1.0 + sigma * 0.1)

    def jx_model(x, sigma_batch, **_kw):
        s = jnp.reshape(sigma_batch, (-1,) + (1,) * (x.ndim - 1))
        return (x * 0.95 + jnp.asarray(target)) / (1.0 + s * 0.1)

    return np_model, jx_model


class NpSonar:
    """Direct numpy transcription of SonarBase (py/sonar.py:70-320)."""

    def __init__(self, momentum=0.8, momentum_hist=0.6, direction=1.0,
                 mode="new", start_step=0, end_step=9999,
                 always_update_history=True):
        self.m = momentum
        self.mh = momentum_hist
        self.direction = direction
        self.mode = mode
        self.start, self.end = start_step, end_step
        self.always = always_update_history
        self.hd = None

    # py/sonar.py:208-219
    def ratios(self):
        d = self.direction
        hd_scale = 1.0 + abs(d) * (1 - self.mh) if d < 0 else 2.0 - d
        return self.mh, hd_scale, d

    def check(self, step, is_history=False):
        if is_history and self.always:
            return True
        return self.start <= step <= self.end

    # py/sonar.py:227-236
    def update_hist(self, momentum_d, step):
        if self.mh == 1 or not self.check(step, True):
            return
        if self.hd is None:
            self.hd = momentum_d.copy()
            return
        r, hs, ms = self.ratios()
        a = momentum_d * ms
        b = self.hd * hs
        self.hd = a + (b - a) * r  # lerp

    # py/sonar.py:238-260
    def mix(self, item, sigma, is_denoised):
        if (self.m == 1 or self.hd is None
                or (self.mode == "denoised") != is_denoised):
            return item
        hist = self.hd * sigma if is_denoised else self.hd
        return hist + (item - hist) * self.m

    # py/sonar.py:262-283
    def momentum_denoised(self, x, denoised, sigma, step):
        md = self.mix(denoised, sigma, True)
        self.update_hist(denoised / sigma, step)
        return md if self.check(step) else denoised

    # py/sonar.py:285-307
    def momentum_d(self, x, denoised, sigma, step):
        d = (x - denoised) / sigma
        if self.m == 1 or self.mode == "denoised":
            return d
        md = self.mix(d, sigma, False)
        self.update_hist(d if self.mode == "new" else md, step)
        return md if self.check(step) else d

    # py/sonar.py:309-320
    def step(self, i, x, denoised, sigma, sigma_down):
        dt = sigma_down - sigma
        dn = self.momentum_denoised(x, denoised, sigma, i)
        md = self.momentum_d(x, dn, sigma, i)
        return md * dt + x


@pytest.mark.parametrize("mode", ["new", "classic", "denoised"])
@pytest.mark.parametrize("direction", [1.0, -2.0])
def test_momentum_trajectory_matches_numpy_oracle(mode, direction):
    np_model, jx_model = np_model_factory()
    sigmas = karras(8)
    rng = np.random.default_rng(0)
    x0 = (rng.standard_normal(SHAPE) * sigmas[0]).astype(np.float32)

    oracle = NpSonar(momentum=0.8, momentum_hist=0.6, direction=direction,
                     mode=mode)
    x = x0.copy()
    for i in range(len(sigmas) - 1):
        denoised = np_model(x, sigmas[i])
        x = oracle.step(i, x, denoised, sigmas[i], sigmas[i + 1])

    cfg = SonarConfig(momentum=0.8, momentum_hist=0.6, direction=direction,
                      momentum_mode=mode)
    out = sample_sonar_euler(jx_model, jnp.asarray(x0), jnp.asarray(sigmas),
                             sonar_config=cfg)
    assert float(jnp.abs(out - jnp.asarray(x)).max()) < 2e-4, mode


def test_momentum_step_window_oracle():
    np_model, jx_model = np_model_factory()
    sigmas = karras(8)
    rng = np.random.default_rng(1)
    x0 = (rng.standard_normal(SHAPE) * sigmas[0]).astype(np.float32)
    oracle = NpSonar(momentum=0.7, momentum_hist=0.75, start_step=2, end_step=5,
                     always_update_history=False)
    x = x0.copy()
    for i in range(len(sigmas) - 1):
        x = oracle.step(i, x, np_model(x, sigmas[i]), sigmas[i], sigmas[i + 1])
    cfg = SonarConfig(momentum=0.7, momentum_hist=0.75, momentum_start_step=2,
                      momentum_end_step=5, always_update_history=False)
    out = sample_sonar_euler(jx_model, jnp.asarray(x0), jnp.asarray(sigmas),
                             sonar_config=cfg)
    assert float(jnp.abs(out - jnp.asarray(x)).max()) < 2e-4


class NpDpmppSde(NpSonar):
    """Numpy transcription of SonarDPMPPSDE.momentum_step (py/sonar.py:626-735)."""

    @staticmethod
    def _ancestral(sigma, sigma_next, eta=1.0):
        if sigma_next == 0 or eta == 0:
            return sigma_next, 0.0
        su = min(sigma_next,
                 eta * np.sqrt(sigma_next**2 * (sigma**2 - sigma_next**2) / sigma**2))
        return np.sqrt(sigma_next**2 - su**2), su

    def dpmpp_step(self, i, x, sigma, sigma_next, model, noise_fn, eta=1.0,
                   s_noise=1.0):
        sigma_down, _ = self._ancestral(sigma, sigma_next, eta)
        denoised = model(x, sigma)
        if sigma_next == 0:
            return self.step(i, x, denoised, sigma, sigma_down)
        adjusted = (self.m + (1 - self.m) / 2) if self.hd is not None else self.m
        t, t_next = -np.log(sigma), -np.log(sigma_next)
        r = 0.5
        h = t_next - t
        s = t + h * r
        fac = 1 / (2 * r)
        s_t, s_s = np.exp(-t), np.exp(-s)
        sd, su = self._ancestral(s_t, s_s, eta)
        s_ = -np.log(sd)
        md = self.momentum_denoised(x, denoised, sigma, i)
        diff_2 = np.expm1(t - s_) * md
        # get_momentum_d with explicit d (py/sonar.py:285-307)
        if adjusted == 1 or self.mode == "denoised":
            momentum_d = diff_2
        else:
            # reference quirk: the mix uses cfg.momentum, NOT the halved
            # value — the adjusted momentum only gates the early-out
            # (py/sonar.py:303; verified in test_reference_sampler_oracle)
            momentum_d = self.mix_with(diff_2, self.m)
            self.update_hist(diff_2 if self.mode == "new" else momentum_d, i)
            if not self.check(i):
                momentum_d = diff_2
        x_2 = (np.exp(-s_) / s_t) * x - momentum_d
        x_2 = x_2 + noise_fn(2 * i) * (s_noise * su)
        denoised_2 = model(x_2, s_s)
        md2 = self.momentum_denoised(x, denoised_2, s_s, i)
        s_t_next = np.exp(-t_next)
        sd, su = self._ancestral(s_t, s_t_next, eta)
        t_down = -np.log(sd)
        denoised_d = (1 - fac) * md + fac * md2
        diff_1 = np.expm1(t - t_down) * denoised_d
        if adjusted == 1 or self.mode == "denoised":
            momentum_d = diff_1
        else:
            momentum_d = self.mix_with(diff_1, self.m)
            self.update_hist(diff_1 if self.mode == "new" else momentum_d, i)
            if not self.check(i):
                momentum_d = diff_1
        x = (np.exp(-t_down) / s_t) * x - momentum_d
        x = x + noise_fn(2 * i + 1) * (s_noise * su)
        return x

    def mix_with(self, item, momentum):
        if self.hd is None:
            return item
        return self.hd + (item - self.hd) * momentum


def test_dpmpp_momentum_trajectory_matches_numpy_oracle():
    np_model, jx_model = np_model_factory()
    sigmas = karras(6)
    rng = np.random.default_rng(2)
    x0 = (rng.standard_normal(SHAPE) * sigmas[0]).astype(np.float32)
    noises = rng.standard_normal((2 * len(sigmas), *SHAPE)).astype(np.float32)

    oracle = NpDpmppSde(momentum=0.8, momentum_hist=0.6)
    x = x0.copy()
    for i in range(len(sigmas) - 1):
        x = oracle.dpmpp_step(i, x, sigmas[i], sigmas[i + 1], np_model,
                              lambda k: noises[k])

    from sonar_tpu.samplers import sample_sonar_dpmpp_sde

    cfg = SonarConfig(momentum=0.8, momentum_hist=0.6)
    out = sample_sonar_dpmpp_sde(
        jx_model, jnp.asarray(x0), jnp.asarray(sigmas), sonar_config=cfg,
        noise_sampler=lambda step, s, sn: jnp.asarray(noises)[step])
    assert float(jnp.abs(out - jnp.asarray(x)).max()) < 5e-4
