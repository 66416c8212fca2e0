"""Wavelet CFG / FreeU / latent-ops subsystem tests (SURVEY §2.4-§2.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.cfg import (
    ContinuousEDM,
    DiscreteSampling,
    FreeUExtremeConfig,
    SonarLatentOperation,
    SonarLatentOperationAdvanced,
    SonarLatentOperationNoise,
    SonarLatentOperationQuantileFilter,
    WaveletCFG,
    WCFGRules,
    basic_cfg,
    make_freeu_patches,
    schedule_interp,
)
from sonar_tpu.models import UNetConfig, init_unet_params, unet_apply
from sonar_tpu.noise import get_noise_item
from sonar_tpu.noise.power import PowerFilter


@pytest.fixture(scope="module")
def cfg_args():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 16, 16)), jnp.float32) * 5.0
    cd = jnp.asarray(rng.standard_normal((1, 4, 16, 16)), jnp.float32)
    ud = jnp.asarray(rng.standard_normal((1, 4, 16, 16)), jnp.float32)
    return dict(
        input=x, sigma=jnp.asarray([5.0]), cond=x - cd * 5, uncond=x - ud * 5,
        cond_denoised=cd, uncond_denoised=ud, cond_scale=7.5,
        model_sampling=DiscreteSampling(),
        sample_sigmas=np.linspace(14.6, 0.03, 21),
    )


def test_model_sampling_timestep_monotone():
    ms = DiscreteSampling()
    ts = [float(ms.timestep(jnp.asarray(s))) for s in (0.03, 1.0, 5.0, 14.0)]
    assert ts == sorted(ts)
    assert 0 <= ts[0] and ts[-1] <= 999
    edm = ContinuousEDM()
    assert float(edm.timestep(jnp.asarray(120.0))) == pytest.approx(999.0)
    # percent_to_sigma round trips the extremes
    assert ms.percent_to_sigma(0.0) > 1e6
    assert ms.percent_to_sigma(1.0) == 0.0


def test_schedule_interp_shapes():
    for name in ("linear", "log", "exp", "half_cosine", "sine"):
        v = float(schedule_interp(name, jnp.asarray(0.5)))
        assert 0.0 <= v <= 1.0, name
    assert float(schedule_interp("linear", jnp.asarray(0.3))) == pytest.approx(0.3)
    assert float(schedule_interp("half_cosine", jnp.asarray(0.0))) == pytest.approx(0.0)
    assert float(schedule_interp("half_cosine", jnp.asarray(1.0))) == pytest.approx(1.0)


def test_wcfg_uniform_diff_scale_equals_basic_cfg(cfg_args):
    rules = WCFGRules.build(wave="db4", level=3, padding_mode="periodization",
                            high_precision_mode=False,
                            diff=dict(yl_scale=7.5, yh_scales=7.5))
    out = WaveletCFG(rules=rules)(cfg_args)
    ref = basic_cfg(cfg_args)
    assert float(jnp.abs(out - ref).max()) < 1e-4


def test_wcfg_out_of_window_falls_back(cfg_args):
    rules = WCFGRules.build(start_sigma=2.0, end_sigma=0.5, wave="haar", level=2)
    out = WaveletCFG(rules=rules)(cfg_args)  # sigma=5 outside [0.5, 2]
    assert float(jnp.abs(out - basic_cfg(cfg_args)).max()) < 1e-4


def test_wcfg_scheduled_scales_and_multirule_jit(cfg_args):
    rules = WCFGRules.build(
        start_sigma=10.0, end_sigma=3.0, wave="haar", level=1,
        high_precision_mode=False,
        diff=dict(yl_scale=7.5, yh_scales=[7.5, "fill"],
                  scales_end=dict(yl_scale=2.0, yh_scales=1.0),
                  schedule="half_cosine", schedule_mode="sampling"),
        blend_strength=dict(value_start=1.0, value_end=0.4,
                            schedule="linear", schedule_mode="sampling"),
        rules=[dict(start_sigma=3.0, end_sigma=0.5, wave="db2", level=1,
                    target_mode="noise_norm", high_precision_mode=False,
                    diff=dict(yl_scale=1.2, yh_scales=0.8))],
    )
    wcfg = WaveletCFG(rules=rules)
    run = jax.jit(lambda sig: wcfg(dict(cfg_args) | {"sigma": sig.reshape(1)}))
    for s in (12.0, 5.0, 1.0, 0.1):
        out = run(jnp.asarray(s, jnp.float32))
        assert np.isfinite(np.asarray(out)).all(), s


def test_wcfg_target_modes(cfg_args):
    for target in ("denoised", "noise", "noise_norm"):
        rules = WCFGRules.build(wave="haar", level=2, target_mode=target,
                                high_precision_mode=False)
        out = WaveletCFG(rules=rules)(cfg_args)
        assert np.isfinite(np.asarray(out)).all(), target


def test_wcfg_latent_op_hooks(cfg_args):
    calls = []

    def op(latent, sigma=None, **kw):
        calls.append("hit")
        return latent * 1.0

    rules = WCFGRules.build(wave="haar", level=1, high_precision_mode=False)
    WaveletCFG(rules=rules, operation_cond=op, operation_result=op)(cfg_args)
    assert len(calls) == 2


# -- latent operations ---------------------------------------------------------


def test_latent_operation_window():
    op = SonarLatentOperation(start_sigma=5.0, end_sigma=1.0,
                              op=lambda latent: latent * 2.0)
    x = jnp.ones((1, 4, 8, 8))
    assert float(op(x, sigma=3.0).max()) == 2.0
    assert float(op(x, sigma=10.0).max()) == 1.0


def test_latent_operation_advanced_quirk():
    x = jnp.ones((1, 4, 8, 8))
    # strict compat: output_multiplier applied only when == 1.0 (reference
    # quirk at py/latent_ops.py:102) — fixed mode applies it when != 1.0
    # default blend_mode inject, strength 1: result = t + diff
    op_strict = SonarLatentOperationAdvanced(
        ops=(lambda latent: latent * 3.0,), output_multiplier=2.0)
    op_fixed = SonarLatentOperationAdvanced(
        ops=(lambda latent: latent * 3.0,), output_multiplier=2.0,
        strict_reference_compat=False)
    # strict: multiplier NOT applied (2.0 != 1.0) → diff = 3-1 = 2 → 1+2 = 3
    assert float(op_strict(x, sigma=1.0).max()) == pytest.approx(3.0)
    # fixed: multiplier applied → diff = 6-1 = 5 → 1+5 = 6
    assert float(op_fixed(x, sigma=1.0).max()) == pytest.approx(6.0)


def test_latent_operation_noise_and_quantile():
    x = jnp.zeros((1, 4, 8, 8))
    opn = SonarLatentOperationNoise(custom_noise=get_noise_item("gaussian"), seed=3)
    out = opn(x, sigma=jnp.asarray(2.0))
    assert float(jnp.std(out)) > 0.5
    opq = SonarLatentOperationQuantileFilter(quantile=0.9, strategy="clamp")
    y = jnp.asarray(np.random.default_rng(1).standard_normal((1, 4, 8, 8)) * 3,
                    jnp.float32)
    assert np.isfinite(np.asarray(opq(y, sigma=1.0))).all()


# -- FreeU -----------------------------------------------------------------------


def test_freeu_patches_change_output():
    cfg = UNetConfig(model_channels=16, channel_mult=(1, 2), num_res_blocks=1,
                     attention_levels=(), norm_groups=4)
    params = init_unet_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (1, 4, 16, 16))
    sigma = jnp.asarray([5.0])
    base = unet_apply(params, x, sigma, cfg)
    fcfg = FreeUExtremeConfig(
        target="both", stage_1=True, stage_2=True, stage_3=True,
        scale=1.5, slice=0.75,
        sonar_power_filter=PowerFilter(alpha=0.5),
    )
    patches = make_freeu_patches(
        model_sampling=DiscreteSampling(), model_channels=cfg.model_channels,
        input_config=fcfg, middle_config=fcfg, output_config=fcfg)
    patched = unet_apply(params, x, sigma, cfg, block_patches=patches)
    assert patched.shape == base.shape
    assert not np.allclose(np.asarray(patched), np.asarray(base))
    # out-of-window pct → identity
    fcfg_off = FreeUExtremeConfig(target="both", stage_1=True, stage_2=True,
                                  stage_3=True, scale=2.0, start=0.99, end=1.0,
                                  sonar_power_filter=PowerFilter(alpha=0.5))
    patches_off = make_freeu_patches(
        model_sampling=DiscreteSampling(), model_channels=cfg.model_channels,
        input_config=fcfg_off)
    off = unet_apply(params, x, sigma, cfg, block_patches=patches_off)
    assert np.allclose(np.asarray(off), np.asarray(base), atol=1e-5)


def test_freeu_config_chain_filtering():
    leaf = FreeUExtremeConfig(stage_1=True, blend=0.0)  # skipped (blend 0)
    mid = FreeUExtremeConfig(stage_1=True, frux_config=leaf)
    head = FreeUExtremeConfig(stage_1=True, frux_config=mid)
    assert len(head.get_config_list()) == 2


def test_wcfg_5d_video_latents(cfg_args):
    rng = np.random.default_rng(5)
    shp = (1, 4, 3, 8, 8)
    x = jnp.asarray(rng.standard_normal(shp), jnp.float32) * 5
    cd = jnp.asarray(rng.standard_normal(shp), jnp.float32)
    ud = jnp.asarray(rng.standard_normal(shp), jnp.float32)
    args = dict(cfg_args) | dict(input=x, cond=x - cd * 5, uncond=x - ud * 5,
                                 cond_denoised=cd, uncond_denoised=ud)
    rules = WCFGRules.build(wave="haar", level=1, high_precision_mode=False,
                            diff=dict(yl_scale=7.5, yh_scales=7.5))
    out = WaveletCFG(rules=rules)(args)
    assert out.shape == shp
    ref = basic_cfg(args)
    assert float(jnp.abs(out - ref).max()) < 1e-3  # frames folded, PR exact


def test_wcfg_1d_dwt_for_3d_latents(cfg_args):
    rng = np.random.default_rng(6)
    shp = (1, 4, 64)
    x = jnp.asarray(rng.standard_normal(shp), jnp.float32) * 5
    cd = jnp.asarray(rng.standard_normal(shp), jnp.float32)
    ud = jnp.asarray(rng.standard_normal(shp), jnp.float32)
    args = dict(cfg_args) | dict(input=x, cond=x - cd * 5, uncond=x - ud * 5,
                                 cond_denoised=cd, uncond_denoised=ud)
    rules = WCFGRules.build(wave="db2", level=2, use_1d_dwt=True,
                            high_precision_mode=False,
                            diff=dict(yl_scale=7.5, yh_scales=7.5))
    out = WaveletCFG(rules=rules)(args)
    assert out.shape == shp
    assert float(jnp.abs(out - basic_cfg(args)).max()) < 1e-3
    # 3D without use_1d_dwt must raise
    bad = WCFGRules.build(wave="haar", level=1, high_precision_mode=False)
    with pytest.raises(RuntimeError, match="use_1d_dwt"):
        WaveletCFG(rules=bad)(args)



def test_wcfg_plain_latent_operation_callable():
    """ComfyUI-shape LATENT_OPERATIONs are plain callables taking latent
    only; the reference's maybe_op passes no extra kwargs to them
    (py/wavelet_cfg.py:663-675)."""
    rules = WCFGRules.build(wave="haar", level=2,
                            padding_mode="periodization",
                            high_precision_mode=False,
                            diff=dict(yl_scale=6.0, yh_scales=3.0))
    w = WaveletCFG(rules=rules,
                   operation_result=lambda latent: latent * 1.1)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, 16, 16)).astype(np.float32)
    out = w(dict(input=jnp.asarray(x), sigma=jnp.asarray([2.0]),
                 cond=jnp.asarray(x * 0.1), uncond=jnp.asarray(x * 0.2),
                 cond_denoised=jnp.asarray(x * 0.9),
                 uncond_denoised=jnp.asarray(x * 0.8), cond_scale=7.5,
                 model_sampling=DiscreteSampling(),
                 sample_sigmas=np.asarray([14.6, 2.0, 0.5, 0.0],
                                          np.float32)))
    assert np.isfinite(np.asarray(out)).all()


def test_wcfg_unreachable_misordered_rule_traces():
    """lax.switch traces every branch: a misordered (never-matching) rule
    or the start_sigma=-1 shorthand must not raise at trace time."""
    rules = WCFGRules.build(
        wave="haar", level=2, padding_mode="periodization",
        high_precision_mode=False, start_sigma=-1.0,
        diff=dict(yl_scale=6.0, yh_scales=3.0),
        rules=[dict(start_sigma=2.0, end_sigma=7.0, wave="haar", level=2,
                    padding_mode="periodization", high_precision_mode=False,
                    diff=dict(yl_scale=4.0, yh_scales=2.0))])
    w = WaveletCFG(rules=rules)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 16, 16)).astype(np.float32)
    out = w(dict(input=jnp.asarray(x), sigma=jnp.asarray([3.0]),
                 cond=jnp.asarray(x * 0.1), uncond=jnp.asarray(x * 0.2),
                 cond_denoised=jnp.asarray(x * 0.9),
                 uncond_denoised=jnp.asarray(x * 0.8), cond_scale=7.5,
                 model_sampling=DiscreteSampling(),
                 sample_sigmas=np.asarray([14.6, 3.0, 0.5, 0.0],
                                          np.float32)))
    assert np.isfinite(np.asarray(out)).all()


def test_latent_op_noise_derives_sigma_next():
    """With sample_sigmas, the op draws over (sigma, next_sigma) like the
    reference (py/latent_ops.py:148-182) — a brownian-style child would
    otherwise see a zero-width bridge every step."""
    from sonar_tpu.cfg.latent_ops import SonarLatentOperationNoise
    from sonar_tpu.noise.base import NoiseItem

    seen = {}

    class _Spy(NoiseItem):
        def sample(self, ctx, state, key, sigma, sigma_next, *,
                   normalized=True):
            seen["pair"] = (float(sigma), float(sigma_next))
            return jnp.zeros(ctx.shape, ctx.dtype), state

    tbl = np.asarray([14.6, 7.0, 2.0, 0.5, 0.0], np.float32)
    op = SonarLatentOperationNoise(custom_noise=_Spy(), sample_sigmas=tbl)
    op(jnp.zeros((1, 4, 8, 8)), sigma=jnp.asarray(7.0))
    assert seen["pair"] == (7.0, 2.0)
    # off-table sigma keeps sigma_next = sigma
    op(jnp.zeros((1, 4, 8, 8)), sigma=jnp.asarray(5.0))
    assert seen["pair"] == (5.0, 5.0)


def test_percent_to_sigma_respects_table_length():
    from sonar_tpu.cfg.model_sampling import DiscreteSampling as DS

    short = DS(sigmas=np.linspace(0.03, 14.6, 500).astype(np.float32))
    s = short.percent_to_sigma(0.1)  # would IndexError with hardcoded 999
    assert 0.03 <= s <= 14.6
    assert short.percent_to_sigma(0.0) > 1e6  # sentinel preserved
    assert short.percent_to_sigma(1.0) == 0.0


def test_unet_input_patch_covers_conv_in_and_downsample():
    """ComfyUI applies input_block_patch after EVERY input_blocks entry
    (conv_in and Downsample included), pushing the patched tensor onto
    the skip stack — count the patch invocations."""
    from sonar_tpu.models.unet import UNetConfig, init_unet_params, unet_apply

    cfg = UNetConfig(model_channels=8, channel_mult=(1, 2), num_res_blocks=1)
    params = init_unet_params(jax.random.key(0), cfg)
    calls = {"n": 0}

    def patch(h, ctx):
        calls["n"] += 1
        return h

    x = jnp.zeros((1, 4, 16, 16))
    unet_apply(params, x, jnp.asarray([2.0]), cfg,
               block_patches={"input": [patch]})
    # 1 conv_in + num_res_blocks per level (2 levels) + 1 downsample
    assert calls["n"] == 1 + 2 * 1 + 1, calls["n"]


def test_make_denoiser_accepts_params_argument():
    """extra_args={'params': p} must actually reach the UNet — closing
    over stale params silently ignores it (the SDXL jit-constant
    landmine)."""
    from sonar_tpu.models.unet import UNetConfig, init_unet_params, make_denoiser

    cfg = UNetConfig(model_channels=8, channel_mult=(1, 2), num_res_blocks=1)
    p1 = init_unet_params(jax.random.key(0), cfg)
    p2 = init_unet_params(jax.random.key(1), cfg)
    model = make_denoiser(p1, cfg)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 4, 16, 16)).astype(np.float32))
    out_default = model(x, jnp.asarray([2.0]))
    out_p2 = model(x, jnp.asarray([2.0]), params=p2)
    assert not np.allclose(np.asarray(out_default), np.asarray(out_p2))


def test_make_denoiser_distinct_params_kwargs():
    """A CFG pair built from DIFFERENT weight trees must be able to use
    distinct call-time override names: extra_args reaches both denoisers,
    so a shared 'params' key would feed both sides the same weights and
    silently collapse CFG (review r3)."""
    from sonar_tpu.models.unet import UNetConfig, init_unet_params, make_denoiser

    cfg = UNetConfig(model_channels=8, channel_mult=(1, 2), num_res_blocks=1)
    p_c = init_unet_params(jax.random.key(0), cfg)
    p_u = init_unet_params(jax.random.key(1), cfg)
    cond = make_denoiser(p_c, cfg, params_kwarg="cond_params")
    uncond = make_denoiser(p_u, cfg, params_kwarg="uncond_params")
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 4, 16, 16)).astype(np.float32))
    kw = dict(cond_params=p_c, uncond_params=p_u)
    out_c = cond(x, jnp.asarray([2.0]), **kw)
    out_u = uncond(x, jnp.asarray([2.0]), **kw)
    assert not np.allclose(np.asarray(out_c), np.asarray(out_u)), \
        "distinct weight trees must produce distinct cond/uncond outputs"
    # each side ignores the other's key and keeps its own weights
    np.testing.assert_array_equal(
        np.asarray(cond(x, jnp.asarray([2.0]), cond_params=p_c)),
        np.asarray(cond(x, jnp.asarray([2.0]), **kw)))


def test_wcfg_steps_mode_raises_on_nonpositive_interior_sigma():
    """A schedule with a non-positive INTERIOR sigma makes the step
    undeterminable for every sigma. The reference raises ('Step percentage
    not available', py/wavelet_cfg.py:123); we must raise too, not feed
    NaN through the scheduled scales (review r3)."""
    from sonar_tpu.cfg.wavelet_cfg import WCFGPercentages

    ms = DiscreteSampling()
    bad = np.asarray([7.0, 3.0, 0.0, 0.0], np.float64)
    pcts = WCFGPercentages.build(ms=ms, start_sigma=8.0, end_sigma=0.1,
                                 sigma=3.0, sigmas=bad)
    assert pcts.pct_steps is None
    with pytest.raises(RuntimeError, match="not available"):
        pcts.pct_from_schedmode("steps")
    # sampling/sigmas modes remain available for the same schedule
    assert pcts.pct_from_schedmode("sampling") is not None
    assert pcts.pct_from_schedmode("sigmas") is not None


def test_prepare_ref_latent_strict_compat_flag():
    """Default: zero-std guide degrades to mean-subtraction (finite);
    strict_reference_compat=True reproduces the reference's divide-by-zero
    NaN for constant guides."""
    from sonar_tpu.samplers.guidance import prepare_ref_latent

    const = jnp.ones((1, 4, 8, 8))
    safe = prepare_ref_latent(const)
    assert bool(jnp.isfinite(safe).all())
    strict = prepare_ref_latent(const, strict_reference_compat=True)
    assert not bool(jnp.isfinite(strict).all())


class TestFFilterMatmul:
    """The one-matmul spectral filter (SONAR_TPU_FREEU_MATMUL) must equal
    the rfft2·gain·irfft2 composition — it is the same linear operator."""

    def _pair(self, shape, monkeypatch, mode="1"):
        import numpy as np

        from sonar_tpu.cfg.freeu import ffilter
        from sonar_tpu.noise.power import PowerFilter

        pf = PowerFilter(alpha=0.4)
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal(shape), jnp.float32)
        monkeypatch.setenv("SONAR_TPU_FREEU_MATMUL", "0")  # explicit FFT
        ref = jax.jit(lambda v: ffilter(v, pf, 0.25))(x)
        monkeypatch.setenv("SONAR_TPU_FREEU_MATMUL", mode)
        got = jax.jit(lambda v: ffilter(v, pf, 0.25))(x)
        return np.asarray(ref), np.asarray(got)

    @pytest.mark.parametrize("shape", [(1, 8, 16, 16), (2, 4, 32, 32),
                                       (1, 4, 16, 24), (1, 4, 15, 17)])
    def test_matmul_equals_fft(self, shape, monkeypatch):
        import numpy as np

        ref, got = self._pair(shape, monkeypatch)
        scale = max(1.0, float(np.abs(ref).max()))
        assert np.abs(ref - got).max() / scale < 3e-6

    def test_fast_mode_is_close(self, monkeypatch):
        import numpy as np

        ref, got = self._pair((1, 8, 16, 16), monkeypatch, mode="fast")
        scale = max(1.0, float(np.abs(ref).max()))
        assert np.abs(ref - got).max() / scale < 2e-2  # bf16 MXU inputs

    @pytest.mark.parametrize("shape", [(1, 2, 64, 64), (1, 2, 48, 80),
                                       (1, 1, 128, 128)])
    def test_separable_equals_fft_beyond_dense_gate(self, shape,
                                                    monkeypatch):
        """VERDICT r4 item 6: above the dense-K gate (>32x32) the
        rank-decomposed factor pair (OPT-IN "sep" since the chip A/B
        measured it slower than FFT — ANALYSIS §18) must still equal
        the FFT path — up to 128x128 stage-1 activations."""
        import numpy as np

        ref, got = self._pair(shape, monkeypatch, mode="sep")
        scale = max(1.0, float(np.abs(ref).max()))
        assert np.abs(ref - got).max() / scale < 3e-5

    def test_default_mode_runs_fft_beyond_dense_gate(self, monkeypatch):
        """ANALYSIS §18: the default mode must fall through to the FFT
        path above 32x32 — the factor pair is 1.6-2.9x slower there."""
        import numpy as np

        ref, got = self._pair((1, 2, 64, 64), monkeypatch, mode="1")
        np.testing.assert_array_equal(ref, got)

    def test_separable_handles_asymmetric_masks(self, monkeypatch):
        """rotate/stretch masks have a real antisymmetric component — the
        Ms/Ma split must reproduce it (not just radial filters)."""
        import numpy as np

        from sonar_tpu.cfg.freeu import ffilter
        from sonar_tpu.noise.power import PowerFilter

        pf = PowerFilter(alpha=0.6, rotate=0.5, stretch=2.0, min_freq=0.05)
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((1, 3, 64, 64)),
            jnp.float32)
        monkeypatch.setenv("SONAR_TPU_FREEU_MATMUL", "0")
        ref = np.asarray(jax.jit(lambda v: ffilter(v, pf, 0.0))(x))
        monkeypatch.setenv("SONAR_TPU_FREEU_MATMUL", "sep")
        got = np.asarray(jax.jit(lambda v: ffilter(v, pf, 0.0))(x))
        scale = max(1.0, float(np.abs(ref).max()))
        assert np.abs(ref - got).max() / scale < 3e-5

    def test_separable_grad_flows(self, monkeypatch):
        import numpy as np

        from sonar_tpu.cfg.freeu import ffilter
        from sonar_tpu.noise.power import PowerFilter

        monkeypatch.setenv("SONAR_TPU_FREEU_MATMUL", "sep")
        pf = PowerFilter(alpha=0.4)
        x = jnp.asarray(
            np.random.default_rng(3).standard_normal((1, 2, 64, 64)),
            jnp.float32)
        g = jax.grad(lambda v: jnp.sum(ffilter(v, pf, 0.25) ** 2))(x)
        assert np.isfinite(np.asarray(g)).all()

    def test_very_large_spatial_falls_back_to_fft(self, monkeypatch):
        import numpy as np

        # above the separable gate (>128x128) both modes run the SAME
        # fft path
        ref, got = self._pair((1, 1, 192, 192), monkeypatch)
        np.testing.assert_array_equal(ref, got)

    def test_freeu_apply_through_matmul(self, monkeypatch):
        """Full config-4-style FreeU patch chain under the matmul filter."""
        import numpy as np

        from sonar_tpu.cfg import FreeUExtremeConfig, make_freeu_patches
        from sonar_tpu.cfg.model_sampling import DiscreteSampling
        from sonar_tpu.noise.power import PowerFilter

        frux = FreeUExtremeConfig(target="backbone", stage_1=True,
                                  scale=1.12, slice=0.75,
                                  sonar_power_filter=PowerFilter(alpha=0.4))
        patches = make_freeu_patches(model_sampling=DiscreteSampling(),
                                     model_channels=8,
                                     input_config=frux, output_config=frux)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((1, 16, 16, 32)),
            jnp.float32)
        ctx = {"sigma": jnp.asarray([3.0])}
        monkeypatch.setenv("SONAR_TPU_FREEU_MATMUL", "0")
        ref = jax.jit(lambda v: patches["input"][0](v, ctx))(x)
        monkeypatch.setenv("SONAR_TPU_FREEU_MATMUL", "1")
        got = jax.jit(lambda v: patches["input"][0](v, ctx))(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
