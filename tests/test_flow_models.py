"""Rectified-flow / prediction-parametrization tests.

The reference relies on its HOST (ComfyUI) to normalize every model
parametrization into ``model(x, sigma) -> denoised`` before the sampler sees
it (comfy/model_sampling.py EPS/V_PREDICTION/CONST + the k-diffusion
``*_RF`` ancestral variants route through ``model.model_sampling``).  A
standalone framework ships that layer itself: ``sonar_tpu.models.prediction``
+ ``cfg.model_sampling.Flow`` + ``samplers.ancestral.get_ancestral_step_rf``.

Oracles here are independent numpy transcriptions of the host formulas
(EPS/V/CONST calculate_input/denoised/noise_scaling, time_snr_shift tables,
and the euler_ancestral_RF downstep/renoise recurrence).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.cfg.model_sampling import DiscreteSampling, Flow, time_snr_shift
from sonar_tpu.models.prediction import (
    CONST,
    EPS,
    PREDICTIONS,
    V_PREDICTION,
    X0,
    get_prediction,
)
from sonar_tpu.samplers import (
    SonarConfig,
    sample_sonar_euler,
    sample_sonar_euler_ancestral,
)

# momentum=1.0 reduces the sonar samplers to plain k-diffusion steps (the
# default 0.95 blends history into every step — correct, but not what the
# hand-computed flow recurrences below model)
PLAIN = SonarConfig(momentum=1.0)
from sonar_tpu.samplers.ancestral import get_ancestral_step_rf

SHAPE = (2, 4, 8, 8)


def _rand(rng, shape=SHAPE):
    return rng.standard_normal(shape).astype(np.float32)


# ---------------------------------------------------------------- wrappers


class TestPredictionWrappers:
    def test_eps_formulas(self, rng):
        x, out = _rand(rng), _rand(rng)
        s = np.float32(3.7).reshape(1, 1, 1, 1)
        p = EPS()
        np.testing.assert_allclose(
            p.calculate_input(s, x), x / np.sqrt(s**2 + 1.0), rtol=1e-6)
        np.testing.assert_allclose(
            p.calculate_denoised(s, out, x), x - out * s, rtol=1e-6)

    def test_eps_noise_scaling(self, rng):
        noise, latent = _rand(rng), _rand(rng)
        s = np.float32(2.0)
        p = EPS()
        np.testing.assert_allclose(
            p.noise_scaling(s, noise, latent), noise * s + latent, rtol=1e-6)
        np.testing.assert_allclose(
            p.noise_scaling(s, noise, latent, max_denoise=True),
            noise * np.sqrt(1.0 + s**2) + latent, rtol=1e-6)
        np.testing.assert_array_equal(
            p.inverse_noise_scaling(s, latent), latent)

    def test_v_prediction_denoised(self, rng):
        x, out = _rand(rng), _rand(rng)
        s = np.float32(1.3).reshape(1, 1, 1, 1)
        got = V_PREDICTION().calculate_denoised(s, out, x)
        want = x / (s**2 + 1.0) - out * s / np.sqrt(s**2 + 1.0)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        # input scaling inherited from EPS
        np.testing.assert_allclose(
            V_PREDICTION().calculate_input(s, x), x / np.sqrt(s**2 + 1.0),
            rtol=1e-6)

    def test_v_prediction_roundtrip(self, rng):
        # a network that outputs the TRUE v for known (x0, eps) must
        # denoise back to x0 exactly: v = (eps - sigma*x0)/sqrt(1+sigma^2)
        # in k-diffusion sigma convention
        x0, eps = _rand(rng), _rand(rng)
        s = np.float32(2.5)
        x = x0 + s * eps
        v = (eps - s * x0) / np.sqrt(1.0 + s**2)
        got = V_PREDICTION().calculate_denoised(
            np.full((1, 1, 1, 1), s, np.float32), v, x)
        np.testing.assert_allclose(got, x0, rtol=1e-4, atol=1e-5)

    def test_x0_identity(self, rng):
        x, out = _rand(rng), _rand(rng)
        s = np.float32(5.0).reshape(1, 1, 1, 1)
        np.testing.assert_array_equal(X0().calculate_denoised(s, out, x), out)

    def test_const_formulas(self, rng):
        x, out, latent, noise = (_rand(rng) for _ in range(4))
        s = np.float32(0.6).reshape(1, 1, 1, 1)
        p = CONST()
        np.testing.assert_array_equal(p.calculate_input(s, x), x)
        np.testing.assert_allclose(
            p.calculate_denoised(s, out, x), x - out * s, rtol=1e-6)
        np.testing.assert_allclose(
            p.noise_scaling(s, noise, latent),
            s * noise + (1.0 - s) * latent, rtol=1e-6)
        np.testing.assert_allclose(
            p.inverse_noise_scaling(s, latent), latent / (1.0 - s), rtol=1e-6)

    def test_const_velocity_roundtrip(self, rng):
        # x_t = (1-t)x0 + t n; true velocity v = n - x0; denoised == x0
        x0, n = _rand(rng), _rand(rng)
        t = np.float32(0.37)
        xt = (1.0 - t) * x0 + t * n
        got = CONST().calculate_denoised(
            np.full((1, 1, 1, 1), t, np.float32), n - x0, xt)
        np.testing.assert_allclose(got, x0, rtol=1e-4, atol=1e-5)

    def test_registry_and_resolution(self):
        assert get_prediction("eps") is PREDICTIONS["eps"]
        assert get_prediction("v") is get_prediction("v_prediction")
        assert get_prediction("flow") is get_prediction("const")
        assert isinstance(get_prediction("x0"), X0)
        obj = CONST()
        assert get_prediction(obj) is obj
        with pytest.raises(ValueError, match="unknown prediction"):
            get_prediction("nope")
        with pytest.raises(TypeError):
            get_prediction(42)


# ------------------------------------------------------------ Flow sampling


class TestFlowModelSampling:
    def test_time_snr_shift(self):
        t = np.linspace(0.01, 1.0, 7)
        np.testing.assert_array_equal(time_snr_shift(1.0, t), t)
        np.testing.assert_allclose(
            time_snr_shift(3.0, t), 3.0 * t / (1.0 + 2.0 * t), rtol=1e-7)
        assert time_snr_shift(3.0, 1.0) == pytest.approx(1.0)

    def test_sigma_table_unshifted(self):
        ms = Flow()
        assert ms.sigma_max == pytest.approx(1.0)
        assert ms.sigma_min == pytest.approx(1.0 / 1000.0)
        assert ms.sigmas.shape == (1000,)
        assert np.all(np.diff(ms.sigmas) > 0)

    def test_sigma_table_shifted(self):
        ms = Flow(shift=3.0)
        t = np.arange(1, 1001, dtype=np.float64) / 1000.0
        np.testing.assert_allclose(
            ms.sigmas, 3.0 * t / (1.0 + 2.0 * t), rtol=1e-6)
        assert ms.sigma_max == pytest.approx(1.0)
        # shift>1 pushes interior sigmas UP (more time at high noise)
        assert ms.sigmas[500] > Flow().sigmas[500]

    def test_timestep_and_sigma_inverse(self):
        ms = Flow(shift=3.0)
        sig = jnp.asarray([0.1, 0.5, 0.9], jnp.float32)
        np.testing.assert_allclose(ms.timestep(sig), np.asarray(sig) * 1000.0,
                                   rtol=1e-6)
        # sigma(timestep) applies the shift to t = timestep/multiplier
        ts = jnp.asarray([100.0, 500.0, 1000.0])
        np.testing.assert_allclose(
            ms.sigma(ts), time_snr_shift(3.0, np.asarray(ts) / 1000.0),
            rtol=1e-6)

    def test_percent_to_sigma(self):
        ms = Flow(shift=2.0)
        assert ms.percent_to_sigma(0.0) == 1.0
        assert ms.percent_to_sigma(-1.0) == 1.0
        assert ms.percent_to_sigma(1.0) == 0.0
        assert ms.percent_to_sigma(0.25) == pytest.approx(
            time_snr_shift(2.0, 0.75))
        # monotone decreasing in percent
        ps = [ms.percent_to_sigma(p) for p in (0.1, 0.4, 0.7, 0.95)]
        assert all(a > b for a, b in zip(ps, ps[1:]))


# -------------------------------------------------------- RF ancestral step


class TestRFAncestralStep:
    def test_eta_zero_is_ode(self):
        sd, su, ar = get_ancestral_step_rf(
            jnp.float32(0.7), jnp.float32(0.5), 0.0)
        assert float(sd) == pytest.approx(0.5)
        assert float(su) == 0.0
        assert float(ar) == 1.0

    def test_matches_host_recurrence(self):
        # independent transcription of the host's euler_ancestral_RF step:
        # downstep_ratio = 1 + (s_next/s - 1)*eta; sigma_down = s_next*ratio;
        # alpha_ip1 = 1-s_next; alpha_down = 1-sigma_down;
        # renoise = sqrt(s_next^2 - sigma_down^2*alpha_ip1^2/alpha_down^2)
        for s, sn, eta in [(1.0, 0.8, 1.0), (0.8, 0.55, 0.7),
                           (0.55, 0.3, 1.0), (0.3, 0.1, 0.4)]:
            ratio = 1.0 + (sn / s - 1.0) * eta
            sigma_down = sn * ratio
            ar_want = (1.0 - sn) / (1.0 - sigma_down)
            renoise = np.sqrt(sn**2 - sigma_down**2 * ar_want**2)
            sd, su, ar = get_ancestral_step_rf(
                jnp.float32(s), jnp.float32(sn), eta)
            assert float(sd) == pytest.approx(sigma_down, rel=1e-6)
            assert float(ar) == pytest.approx(ar_want, rel=1e-6)
            assert float(su) == pytest.approx(renoise, rel=1e-5, abs=1e-7)

    def test_variance_identity(self):
        # the re-noised marginal must land exactly at sigma_next:
        # sigma_down^2*alpha_ratio^2 + sigma_up^2 == sigma_next^2
        for s, sn, eta in [(0.9, 0.6, 1.0), (0.6, 0.35, 0.5), (0.2, 0.05, 1.0)]:
            sd, su, ar = get_ancestral_step_rf(
                jnp.float32(s), jnp.float32(sn), eta)
            lhs = float(sd) ** 2 * float(ar) ** 2 + float(su) ** 2
            assert lhs == pytest.approx(sn**2, rel=1e-5)

    def test_final_step_to_zero(self):
        sd, su, ar = get_ancestral_step_rf(
            jnp.float32(0.2), jnp.float32(0.0), 1.0)
        assert float(sd) == 0.0
        assert float(su) == 0.0
        assert float(ar) == pytest.approx(1.0)


# ------------------------------------------------------ end-to-end sampling


def _point_mass_model(c):
    """Exact flow-matching denoiser for data = point mass at ``c``:
    v(x, t) = (x - c)/t  =>  denoised = x - t*v = c for every x, t."""

    def model(x, sigma_batch, **_kw):
        return jnp.broadcast_to(c, x.shape)

    return model


def _flow_schedule(n=8):
    t = np.linspace(1.0, 0.05, n)
    return np.concatenate([t, [0.0]]).astype(np.float32)


class TestFlowSamplingEndToEnd:
    def test_euler_ode_exact_for_point_mass(self, rng):
        # for a point-mass target the flow ODE is integrated EXACTLY by
        # Euler steps (constant velocity field along the trajectory) — the
        # deterministic sampler must land on c from any start
        c = jnp.asarray(_rand(rng))
        x1 = jnp.asarray(_rand(rng))
        out = sample_sonar_euler(_point_mass_model(c), x1,
                                 _flow_schedule(), seed=0, sonar_config=PLAIN)
        np.testing.assert_allclose(np.asarray(out), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)

    def test_rf_ancestral_recurrence_vs_numpy(self, rng):
        # deterministic fixed-noise stream -> hand-compute the RF
        # recurrence in numpy and demand near-bit agreement
        c = _rand(rng)
        x1 = _rand(rng)
        fixed_noise = _rand(rng)
        sigmas = _flow_schedule(6)
        eta = 0.8

        def noise_sampler(step, s, sn):
            return jnp.asarray(fixed_noise)

        out = sample_sonar_euler_ancestral(
            _point_mass_model(jnp.asarray(c)), jnp.asarray(x1), sigmas,
            eta=eta, ancestral_mode="rf", noise_sampler=noise_sampler,
            seed=0, sonar_config=PLAIN)

        x = x1.copy()
        for i in range(len(sigmas) - 1):
            s, sn = float(sigmas[i]), float(sigmas[i + 1])
            ratio = 1.0 + (sn / s - 1.0) * eta
            sigma_down = sn * ratio
            ar = (1.0 - sn) / max(1.0 - sigma_down, 1e-10)
            sigma_up = np.sqrt(max(sn**2 - sigma_down**2 * ar**2, 0.0))
            denoised = c
            d = (x - denoised) / s
            x_down = x + d * (sigma_down - s)
            if sn > 0:
                x = x_down * ar + fixed_noise * sigma_up
            else:
                x = x_down
        np.testing.assert_allclose(np.asarray(out), x, rtol=2e-4, atol=2e-5)

    def test_rf_marginal_statistics(self):
        # with the exact point-mass model and unit-normal injected noise,
        # every intermediate latent must sit ON the flow marginal:
        # x_i = (1 - sigma_i)*c + sigma_i * (unit noise)
        big = (4, 4, 32, 32)
        c = jnp.full(big, 2.5, jnp.float32)
        key = jax.random.key(7)
        k0, kn = jax.random.split(key)
        x1 = jax.random.normal(k0, big)

        ks = [kn]

        def noise_sampler(step, s, sn):
            ks[0], sub = jax.random.split(ks[0])
            return jax.random.normal(sub, big)

        sigmas = _flow_schedule(10)
        traj = []
        sample_sonar_euler_ancestral(
            _point_mass_model(c), x1, sigmas, eta=1.0, ancestral_mode="rf",
            noise_sampler=noise_sampler, seed=0, method="python",
            sonar_config=PLAIN,
            callback=lambda info: traj.append(np.asarray(info["x"])))
        # check a mid-trajectory latent: mean ~= (1-sigma)*2.5, std ~= sigma
        for idx in (3, 6):
            sn = float(sigmas[idx + 1])
            xi = traj[idx]
            assert xi.mean() == pytest.approx((1.0 - sn) * 2.5, abs=0.02)
            assert xi.std() == pytest.approx(sn, abs=0.03)
        # final latent is exactly c
        np.testing.assert_allclose(traj[-1], np.asarray(c), rtol=1e-4,
                                   atol=1e-5)

    def test_vp_mode_unchanged_default(self, rng):
        # default stays "vp": identical to not passing ancestral_mode
        c = jnp.asarray(_rand(rng))
        x1 = jnp.asarray(_rand(rng))
        sigmas = _flow_schedule(5)
        a = sample_sonar_euler_ancestral(
            _point_mass_model(c), x1, sigmas, seed=3)
        b = sample_sonar_euler_ancestral(
            _point_mass_model(c), x1, sigmas, seed=3, ancestral_mode="vp")
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bad_mode_raises(self, rng):
        with pytest.raises(ValueError, match="ancestral_mode"):
            sample_sonar_euler_ancestral(
                _point_mass_model(jnp.zeros(SHAPE)), jnp.zeros(SHAPE),
                _flow_schedule(4), ancestral_mode="nope")


# --------------------------------------------------------- denoiser wiring


class TestDenoiserPredictionWiring:
    def _tiny_unet(self):
        from sonar_tpu.models.unet import UNetConfig, init_unet_params

        cfg = UNetConfig(in_channels=4, model_channels=16, channel_mult=(1,),
                         num_res_blocks=1, attention_levels=())
        params = init_unet_params(jax.random.key(0), cfg)
        return cfg, params

    def test_unet_const_prediction(self, rng):
        from sonar_tpu.models.unet import make_denoiser, unet_apply

        cfg, params = self._tiny_unet()
        ms = Flow()
        den = make_denoiser(params, cfg, prediction="const",
                            timestep_fn=ms.timestep)
        x = jnp.asarray(_rand(rng, (2, 4, 8, 8)))
        sig = jnp.asarray([0.7, 0.7], jnp.float32)
        got = den(x, sig)
        # manual: NO input scaling, conditioned on sigma*1000,
        # denoised = x - sigma * raw
        raw = unet_apply(params, x, sig * 1000.0, cfg)
        want = x - 0.7 * raw
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_unet_v_prediction(self, rng):
        from sonar_tpu.models.unet import make_denoiser, unet_apply

        cfg, params = self._tiny_unet()
        den = make_denoiser(params, cfg, prediction="v")
        x = jnp.asarray(_rand(rng, (2, 4, 8, 8)))
        s = 1.5
        sig = jnp.full((2,), s, jnp.float32)
        got = den(x, sig)
        raw = unet_apply(params, x / np.sqrt(s**2 + 1.0), sig, cfg)
        want = x / (s**2 + 1.0) - raw * s / np.sqrt(s**2 + 1.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_unet_default_eps_unchanged(self, rng):
        from sonar_tpu.models.unet import make_denoiser, unet_apply

        cfg, params = self._tiny_unet()
        den = make_denoiser(params, cfg)
        x = jnp.asarray(_rand(rng, (1, 4, 8, 8)))
        sig = jnp.asarray([2.0], jnp.float32)
        raw = unet_apply(params, x / np.sqrt(5.0), sig, cfg)
        want = x - 2.0 * raw
        np.testing.assert_allclose(np.asarray(den(x, sig)), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_bf16_latents_keep_f32_conditioning(self, rng, monkeypatch):
        # casting sigma to the latent dtype (bf16) quantizes it BEFORE the
        # log inside the sigma embedding — an error the f32-angle path
        # can't undo. The wrapper must pass the network an f32 conditioning
        # value bit-exact to the requested sigma, even for bf16 latents.
        import sonar_tpu.models.dit as dit_mod
        import sonar_tpu.models.unet as unet_mod
        from sonar_tpu.models.unet import make_denoiser

        cfg, params = self._tiny_unet()
        den = make_denoiser(params, cfg)
        x = jnp.asarray(_rand(rng, (1, 4, 8, 8))).astype(jnp.bfloat16)
        s_lo = 1.0 + 2.0**-9  # NOT representable in bf16 (rounds to 1.0)
        seen = {}
        real_unet = unet_mod.unet_apply

        def spy_unet(p, xin, cond, c, **kw):
            seen["cond"] = cond
            seen["xin_dtype"] = xin.dtype
            return real_unet(p, xin, cond, c, **kw)

        monkeypatch.setattr(unet_mod, "unet_apply", spy_unet)
        out = den(x, jnp.asarray([s_lo], jnp.float32))
        assert out.dtype == jnp.bfloat16  # latent arithmetic stays bf16
        assert seen["xin_dtype"] == jnp.bfloat16
        assert seen["cond"].dtype == jnp.float32
        assert float(seen["cond"][0]) == s_lo  # no bf16 round-trip

        # the dit wrapper, through a flow timestep_fn (cond = sigma*1000)
        from sonar_tpu.models.dit import (DiTConfig, init_dit_params,
                                          make_dit_denoiser)

        dcfg = DiTConfig(in_channels=4, hidden=32, depth=2, num_heads=2,
                         patch_size=2)
        dparams = init_dit_params(jax.random.key(3), dcfg)
        dden = make_dit_denoiser(dparams, dcfg, prediction="flow",
                                 timestep_fn=Flow().timestep)
        real_dit = dit_mod.dit_apply

        def spy_dit(p, xin, cond, c, **kw):
            seen["dcond"] = cond
            return real_dit(p, xin, cond, c, **kw)

        monkeypatch.setattr(dit_mod, "dit_apply", spy_dit)
        s = 0.5 + 2.0**-10  # collides with 0.5 in bf16
        dout = dden(x, jnp.asarray([s], jnp.float32))
        assert dout.dtype == jnp.bfloat16
        assert seen["dcond"].dtype == jnp.float32
        assert float(seen["dcond"][0]) == s * 1000.0

    def test_dit_const_prediction(self, rng):
        from sonar_tpu.models.dit import (DiTConfig, dit_apply,
                                          init_dit_params, make_dit_denoiser)

        cfg = DiTConfig(in_channels=4, hidden=32, depth=2, num_heads=2,
                        patch_size=2)
        params = init_dit_params(jax.random.key(1), cfg)
        ms = Flow()
        den = make_dit_denoiser(params, cfg, prediction="flow",
                                timestep_fn=ms.timestep)
        x = jnp.asarray(_rand(rng, (2, 4, 8, 8)))
        sig = jnp.asarray([0.4, 0.4], jnp.float32)
        raw = dit_apply(params, x, sig * 1000.0, cfg)
        want = x - 0.4 * raw
        np.testing.assert_allclose(np.asarray(den(x, sig)), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------ flow training


class TestFlowTraining:
    def _dit(self, **kw):
        from sonar_tpu.models.dit import DiTConfig

        return DiTConfig(in_channels=4, hidden=32, depth=2, num_heads=4,
                         patch_size=2, **kw)

    def test_dit_flow_loss_decreases(self):
        import optax

        from sonar_tpu.models import (init_dit_params, init_train_state,
                                      make_train_step)

        cfg = self._dit()
        params = init_dit_params(jax.random.key(0), cfg)
        opt = optax.adam(2e-3)
        opt_state = init_train_state(params, opt)
        step = jax.jit(make_train_step(cfg, opt, objective="flow",
                                       flow_shift=3.0))
        batch = jnp.asarray(
            np.random.default_rng(0).standard_normal((4, 4, 8, 8),
                                                      np.float32))
        losses = []
        for i in range(40):
            params, opt_state, loss = step(params, opt_state, batch,
                                           jax.random.key(i))
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]

    def test_unet_flow_objective_runs(self):
        from sonar_tpu.models import (UNetConfig, init_train_state,
                                      init_unet_params, make_train_step)

        cfg = UNetConfig(model_channels=16, channel_mult=(1,),
                         num_res_blocks=1, attention_levels=(),
                         norm_groups=8)
        params = init_unet_params(jax.random.key(0), cfg)
        opt_state = init_train_state(params)
        step = jax.jit(make_train_step(cfg, objective="flow"))
        batch = jnp.zeros((2, 4, 8, 8), jnp.float32)
        _, _, loss = step(params, opt_state, batch, jax.random.key(1))
        assert np.isfinite(float(loss))

    def test_dit_eps_objective_and_remat_match(self):
        from sonar_tpu.models import (init_dit_params, init_train_state,
                                      make_train_step)

        cfg = self._dit()
        params = init_dit_params(jax.random.key(2), cfg)
        batch = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 4, 8, 8),
                                                      np.float32))
        losses = {}
        for remat in (False, "dots"):
            opt_state = init_train_state(params)
            step = jax.jit(make_train_step(cfg, remat=remat))
            _, _, loss = step(params, opt_state, batch, jax.random.key(3))
            losses[remat] = float(loss)
        assert losses[False] == pytest.approx(losses["dots"], rel=1e-6)

    def test_moe_dit_adds_aux_loss(self):
        from sonar_tpu.models import (init_dit_params, init_train_state,
                                      make_train_step)

        cfg = self._dit(num_experts=2, capacity_factor=2.0)
        params = init_dit_params(jax.random.key(4), cfg)
        batch = jnp.asarray(
            np.random.default_rng(2).standard_normal((2, 4, 8, 8),
                                                      np.float32))

        def loss_at(w):
            step = jax.jit(make_train_step(cfg, objective="flow",
                                           aux_weight=w))
            _, _, loss = step(params, init_train_state(params), batch,
                              jax.random.key(5))
            return float(loss)

        l0, l1 = loss_at(0.0), loss_at(0.5)
        assert np.isfinite(l0) and np.isfinite(l1)
        # Switch aux >= 1 by construction, so a 0.5 weight adds >= 0.5
        assert l1 - l0 >= 0.45, (l0, l1)

    def test_bad_objective_raises(self):
        from sonar_tpu.models import UNetConfig, make_train_step

        with pytest.raises(ValueError, match="objective"):
            make_train_step(UNetConfig(), objective="nope")


# ------------------------------------------------------------ pipeline glue


class TestPipelineFlowRouting:
    def _pipe(self, rng, **kw):
        from sonar_tpu.api.pipeline import SonarPipeline

        c = jnp.asarray(_rand(rng))
        return SonarPipeline(model=_point_mass_model(c), **kw), c

    def test_flow_defaults_rf_mode(self, rng):
        # a Flow-sampling pipeline must route ancestral sampling through
        # the RF split by default — verified against explicit calls
        pipe, c = self._pipe(rng, model_sampling=Flow(), seed=11)
        x1 = jnp.asarray(_rand(rng))
        sigmas = _flow_schedule(6)
        got = pipe(x1, sigmas)
        want = sample_sonar_euler_ancestral(
            _point_mass_model(c), x1, jnp.asarray(sigmas), seed=11,
            ancestral_mode="rf")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # and it must differ from the VP split on interior steps
        vp = sample_sonar_euler_ancestral(
            _point_mass_model(c), x1, jnp.asarray(sigmas), seed=11,
            ancestral_mode="vp")
        assert not np.allclose(np.asarray(got), np.asarray(vp))

    def test_explicit_mode_wins(self, rng):
        pipe, c = self._pipe(rng, model_sampling=Flow(), seed=11)
        x1 = jnp.asarray(_rand(rng))
        sigmas = _flow_schedule(6)
        got = pipe(x1, sigmas, ancestral_mode="vp")
        want = sample_sonar_euler_ancestral(
            _point_mass_model(c), x1, jnp.asarray(sigmas), seed=11,
            ancestral_mode="vp")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_discrete_sampling_stays_vp(self, rng):
        pipe, c = self._pipe(rng, model_sampling=DiscreteSampling(), seed=11)
        x1 = jnp.asarray(_rand(rng))
        sigmas = _flow_schedule(6)
        got = pipe(x1, sigmas)
        want = sample_sonar_euler_ancestral(
            _point_mass_model(c), x1, jnp.asarray(sigmas), seed=11)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_prepare_latent_flow(self, rng):
        pipe, _c = self._pipe(rng, model_sampling=Flow())
        latent, noise = jnp.asarray(_rand(rng)), jnp.asarray(_rand(rng))
        got = pipe.prepare_latent(latent, noise, [0.8, 0.4, 0.0])
        np.testing.assert_allclose(
            np.asarray(got), 0.8 * np.asarray(noise) + 0.2 * np.asarray(latent),
            rtol=1e-6, atol=1e-6)
        # full-denoise start (sigma0 == sigma_max == 1.0) is pure noise
        got = pipe.prepare_latent(latent, noise, [1.0, 0.5, 0.0])
        np.testing.assert_allclose(np.asarray(got), np.asarray(noise),
                                   rtol=1e-6, atol=1e-6)

    def test_prepare_latent_eps_max_denoise(self, rng):
        pipe, _c = self._pipe(rng, model_sampling=DiscreteSampling())
        latent, noise = jnp.asarray(_rand(rng)), jnp.asarray(_rand(rng))
        smax = pipe.model_sampling.sigma_max
        got = pipe.prepare_latent(latent, noise, [smax, 1.0, 0.0])
        np.testing.assert_allclose(
            np.asarray(got),
            np.sqrt(1.0 + np.float32(smax) ** 2) * np.asarray(noise)
            + np.asarray(latent), rtol=1e-5)
        # partial denoise: plain sigma scaling
        got = pipe.prepare_latent(latent, noise, [2.0, 1.0, 0.0])
        np.testing.assert_allclose(
            np.asarray(got), 2.0 * np.asarray(noise) + np.asarray(latent),
            rtol=1e-6)

    def test_finalize_latent(self, rng):
        pipe, _c = self._pipe(rng, model_sampling=Flow())
        samples = jnp.asarray(_rand(rng))
        # schedule ending at 0: identity
        np.testing.assert_array_equal(
            np.asarray(pipe.finalize_latent(samples, [1.0, 0.5, 0.0])),
            np.asarray(samples))
        # early stop at sigma=0.25: undo the (1-sigma) latent coefficient
        got = pipe.finalize_latent(samples, [1.0, 0.5, 0.25])
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(samples) / 0.75, rtol=1e-6)
        # EPS pipelines: always identity
        pipe2, _ = self._pipe(rng, model_sampling=DiscreteSampling())
        np.testing.assert_array_equal(
            np.asarray(pipe2.finalize_latent(samples, [2.0, 1.0, 0.5])),
            np.asarray(samples))

    def test_non_ancestral_sampler_unaffected(self, rng):
        # sonar_euler takes no ancestral_mode — the Flow default must not
        # TypeError it
        pipe, c = self._pipe(rng, model_sampling=Flow(),
                             sampler="sonar_euler", sonar_config=PLAIN)
        x1 = jnp.asarray(_rand(rng))
        out = pipe(x1, _flow_schedule(8))
        np.testing.assert_allclose(np.asarray(out), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)


# ----------------------------------------------- review-wave regressions


class TestFlowReviewRegressions:
    def _tiny_unet(self):
        from sonar_tpu.models.unet import UNetConfig, init_unet_params

        cfg = UNetConfig(in_channels=4, model_channels=16, channel_mult=(1,),
                         num_res_blocks=1, attention_levels=())
        return cfg, init_unet_params(jax.random.key(0), cfg)

    def test_block_patches_see_true_sigma_under_flow(self, rng):
        """FreeU/WCFG sigma windows are defined over the true noise level;
        with timestep_fn set (flow UNets condition on sigma*1000) the
        patches used to receive the SCALED timestep as ctx["sigma"], so
        every window silently missed."""
        from sonar_tpu.models.unet import make_denoiser

        cfg, params = self._tiny_unet()
        seen = []

        def spy(h, ctx):
            seen.append(ctx["sigma"])
            return h

        den = make_denoiser(params, cfg, prediction="flow",
                            timestep_fn=Flow().timestep,
                            block_patches={"input": [spy]})
        x = jnp.asarray(_rand(rng, (2, 4, 8, 8)))
        den(x, jnp.asarray([0.5, 0.5], jnp.float32))
        assert seen, "patch never ran"
        np.testing.assert_allclose(np.asarray(seen[0]), [0.5, 0.5],
                                   rtol=1e-6)

    def test_freeu_windows_fire_under_flow(self, rng):
        """End-to-end: a FreeU config windowed over flow sigmas must
        actually modify the forward (it was inert pre-fix)."""
        from sonar_tpu.cfg.freeu import FreeUExtremeConfig, make_freeu_patches
        from sonar_tpu.models.unet import make_denoiser
        from sonar_tpu.noise.power import PowerFilter

        cfg, params = self._tiny_unet()
        ms = Flow()
        fcfg = FreeUExtremeConfig(
            target="both", stage_1=True, stage_2=True, stage_3=True,
            scale=1.5, slice=0.75, start=0.0, end=1.0,
            sonar_power_filter=PowerFilter(alpha=0.5))
        patches = make_freeu_patches(
            model_sampling=ms, model_channels=cfg.model_channels,
            input_config=fcfg, middle_config=fcfg, output_config=fcfg)
        plain = make_denoiser(params, cfg, prediction="flow",
                              timestep_fn=ms.timestep)
        patched = make_denoiser(params, cfg, prediction="flow",
                                timestep_fn=ms.timestep,
                                block_patches=patches)
        x = jnp.asarray(_rand(rng, (1, 4, 8, 8)))
        sig = jnp.asarray([0.5], jnp.float32)
        assert not np.allclose(np.asarray(plain(x, sig)),
                               np.asarray(patched(x, sig)))

    def test_rf_step_ascending_pair_clamps_to_deterministic(self):
        """sigma_next > sigma would push sigma_down past 1 and explode
        alpha_ratio (~1e9 x latent); the split is undefined there and must
        degrade to the deterministic step instead."""
        down, up, ar = get_ancestral_step_rf(
            jnp.float32(0.5), jnp.float32(0.9), 1.0)
        np.testing.assert_allclose(float(down), 0.9, rtol=1e-6)
        np.testing.assert_allclose(float(up), 0.0, atol=1e-6)
        np.testing.assert_allclose(float(ar), 1.0, rtol=1e-6)

    def test_rf_step_at_sigma_one_redraws_noise(self):
        """sigma = sigma_next = 1 (flow time 1): the exact marginal is
        pure noise — alpha_ratio must be 0 and sigma_up = sigma_next."""
        down, up, ar = get_ancestral_step_rf(
            jnp.float32(1.0), jnp.float32(1.0), 1.0)
        np.testing.assert_allclose(float(ar), 0.0, atol=1e-9)
        np.testing.assert_allclose(float(up), 1.0, rtol=1e-6)

    def test_use_fused_with_rf_raises(self, rng):
        c = jnp.asarray(_rand(rng))
        with pytest.raises(ValueError, match="use_fused"):
            sample_sonar_euler_ancestral(
                _point_mass_model(c), jnp.asarray(_rand(rng)),
                jnp.asarray(_flow_schedule(4)), seed=1,
                ancestral_mode="rf", use_fused=True)

    def test_flow_pipeline_warns_on_vp_only_sampler(self, rng):
        """dpmpp_sde injects VP-style noise and has no RF knob — a Flow
        pipeline must say so instead of silently over-noising."""
        import warnings

        from sonar_tpu.api.pipeline import SonarPipeline

        c = jnp.asarray(_rand(rng))
        pipe = SonarPipeline(model=_point_mass_model(c),
                             sampler="sonar_dpmpp_sde",
                             model_sampling=Flow(), seed=3)
        with pytest.warns(UserWarning, match="over-noised"):
            pipe(jnp.asarray(_rand(rng)), _flow_schedule(5))
        # the plain-euler (noise-free) sampler stays silent
        pipe2 = SonarPipeline(model=_point_mass_model(c),
                              sampler="sonar_euler", sonar_config=PLAIN,
                              model_sampling=Flow())
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            pipe2(jnp.asarray(_rand(rng)), _flow_schedule(5))

    def test_finalize_latent_at_sigma_one_raises(self, rng):
        from sonar_tpu.api.pipeline import SonarPipeline

        pipe = SonarPipeline(model=lambda x, s, **kw: x,
                             model_sampling=Flow())
        with pytest.raises(ValueError, match="sigma_end"):
            pipe.finalize_latent(jnp.asarray(_rand(rng)), [1.0])
