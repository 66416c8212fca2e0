"""API-layer tests: node registry coverage vs the reference's 48 node names,
chain semantics, noisy_latent_like/noise_image behavior, YAML config,
scatternet, CFG-time latent ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sonar_tpu  # noqa: F401 — full package must import
from sonar_tpu.api import (
    NODES,
    build,
    make_latent_op_cfg_function,
    noise_image,
    noisy_latent_like,
    preview_power_filter,
    sampler_config_override,
    sonar_config_from_yaml,
    split_noise_chain,
    wcfg_rules_from_yaml,
)
from sonar_tpu.cfg import DiscreteSampling, SonarLatentOperationQuantileFilter
from sonar_tpu.core.normalize import tstd
from sonar_tpu.noise import NoiseChain, get_noise_item, make_noise_sampler
from sonar_tpu.noise.power import PowerFilter
from sonar_tpu.noise.scatternet import ScatternetFilteredNoise, scat_layer_dwt

# the reference's NODE_CLASS_MAPPINGS names (py/nodes/*, 48 entries)
REFERENCE_NODES = [
    "SonarCustomNoise", "SonarCustomNoiseAdv",
    "SamplerSonarEuler", "SamplerSonarEulerA", "SamplerSonarDPMPPSDE",
    "SonarGuidanceConfig",
    "SonarAdvancedPyramidNoise", "SonarAdvanced1fNoise",
    "SonarAdvancedPowerLawNoise", "SonarAdvancedCollatzNoise",
    "SonarAdvancedDistroNoise", "SonarWaveletNoise", "SonarAdvancedVoronoiNoise",
    "SonarModulatedNoise", "SonarRepeatedNoise", "SonarScheduledNoise",
    "SonarCompositeNoise", "SonarGuidedNoise", "SonarRandomNoise",
    "SonarChannelNoise", "SonarBlendedNoise", "SonarResizedNoise",
    "SonarResizedNoiseAdv", "SonarQuantileFilteredNoise", "SonarShuffledNoise",
    "SonarPatternBreakNoise", "SonarWaveletFilteredNoise",
    "SonarScatternetFilteredNoise", "SonarRippleFilteredNoise",
    "SonarNormalizeNoiseToScale", "SonarPerDimNoise",
    "SonarLatentOperationFilteredNoise", "SonarCustomNoiseParameters",
    "SonarPowerNoise", "SonarPowerFilterNoise", "SonarPowerFilter",
    "SonarPreviewFilter",
    "NoisyLatentLike", "SonarNoiseImage", "SonarToComfyNOISE",
    "SamplerConfigOverride", "SonarSplitNoiseChain", "SonarWaveletCFG",
    "SonarApplyLatentOperationCFG",
    "SonarLatentOperationQuantileFilter", "SonarLatentOperationAdvanced",
    "SonarLatentOperationNoise", "SonarLatentOperationSetSeed",
    "FreeUExtremeConfig", "FreeUExtreme",
    "SonarBlendFilterNoise", "SonarBlehOpsNoise",
    "KRestartSamplerCustomNoise", "RestartSamplerCustomNoise",
]


def test_node_registry_covers_reference():
    missing = [n for n in REFERENCE_NODES if n not in NODES]
    assert not missing, f"missing node builders: {missing}"


def test_chain_semantics():
    # clone upstream, append unless factor == 0, rescale (py/nodes/base.py:225-239)
    c1 = build("SonarCustomNoise", factor=1.0, noise_type="gaussian")
    c2 = build("SonarCustomNoise", factor=2.0, noise_type="uniform",
               sonar_custom_noise_opt=c1)
    assert isinstance(c2, NoiseChain) and len(c2.items) == 2
    assert len(c1.items) == 1  # upstream untouched
    c3 = build("SonarCustomNoise", factor=0.0, noise_type="uniform",
               sonar_custom_noise_opt=c1)
    assert len(c3.items) == 1
    c4 = build("SonarCustomNoise", factor=3.0, noise_type="uniform", rescale=1.0,
               sonar_custom_noise_opt=c1)
    assert c4.chain_factor == pytest.approx(1.0)


def test_node_built_tree_samples():
    ms = DiscreteSampling()
    gauss = build("SonarCustomNoise", factor=1.0, noise_type="gaussian")
    sched = build("SonarScheduledNoise", factor=1.0, model_sampling=ms,
                  sonar_custom_noise=gauss, start_percent=0.0, end_percent=0.8,
                  normalize="default", fallback_sonar_custom_noise=gauss)
    fn, st = make_noise_sampler(sched, (1, 4, 8, 8), seed=0)
    noise, _ = fn(st, jnp.asarray(5.0), jnp.asarray(4.0))
    assert np.isfinite(np.asarray(noise)).all()


def test_sampler_nodes_build_callables():
    s = build("SamplerSonarEulerA", momentum=0.9, momentum_hist=0.7, eta=0.8)
    assert callable(s)
    s2 = build("SamplerConfigOverride", sampler="sonar_dpmpp_sde", s_noise=0.9)
    assert callable(s2)


def test_noisy_latent_like_strength_math():
    latent = jnp.zeros((1, 4, 8, 8))
    ms = DiscreteSampling()
    sigmas = jnp.asarray([float(ms.sigma_max), 5.0, 1.0, 0.0])
    out = noisy_latent_like(latent, seed=0, mul_by_sigmas=sigmas,
                            model_sampling=ms)
    # max_denoise: std ≈ sqrt(1 + sigma_max^2)
    expect = float(jnp.sqrt(1.0 + ms.sigma_max**2))
    assert float(tstd(out)) == pytest.approx(expect, rel=0.05)
    out2 = noisy_latent_like(latent, seed=0, repeat_batch=3)
    assert out2.shape == (3, 4, 8, 8)
    with pytest.raises(ValueError, match="model_sampling"):
        noisy_latent_like(latent, mul_by_sigmas=sigmas)


def test_noise_image_modes():
    img = jnp.full((1, 16, 16, 3), 0.5)
    out = noise_image(img, seed=0, noise_multiplier=0.3)
    assert out.shape == img.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    grey = noise_image(img, seed=0, greyscale_mode=True, pure_noise_mode=True,
                       overflow_mode="rescale")
    g = np.asarray(grey)
    assert np.allclose(g[..., 0], g[..., 1])


def test_split_noise_chain():
    chain = NoiseChain([get_noise_item("gaussian", factor=1.0),
                        get_noise_item("uniform", factor=3.0)])
    a, b = split_noise_chain(chain, 1)
    assert len(a.items) == 1 and len(b.items) == 1
    assert a.chain_factor == pytest.approx(1.0)
    assert b.chain_factor == pytest.approx(1.0)  # rescaled


def test_yaml_config_surfaces():
    cfg = sonar_config_from_yaml("momentum: 0.5\nmomentum_mode: classic\n")
    assert cfg.momentum == 0.5
    assert cfg.momentum_mode.value == "classic"
    rules = wcfg_rules_from_yaml(
        "wave: haar\nlevel: 2\nrules:\n  - start_sigma: 3.0\n    wave: db2\n")
    assert len(rules) == 2
    assert rules[1].wavelet.wave == "db2"


def test_scatternet_layer_and_noise():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 16, 16)),
                    jnp.float32)
    out = scat_layer_dwt(x)
    assert out.shape[1] == 16  # 4C
    assert out.shape[-1] in (9, 10)  # ~H/2 (+ filter padding)
    for omode in ("channels_adjusted", "channels", "flat_adjusted"):
        item = ScatternetFilteredNoise(output_mode=omode, scatternet_order=1)
        fn, st = make_noise_sampler(item, (1, 4, 16, 16), seed=0)
        noise, _ = fn(st, None, None)
        assert noise.shape == (1, 4, 16, 16), omode
        assert np.isfinite(np.asarray(noise)).all(), omode


def test_latent_op_cfg_function_post_cfg():
    ms = DiscreteSampling()
    patch, hook = make_latent_op_cfg_function(
        operation=SonarLatentOperationQuantileFilter(quantile=0.95),
        mode="denoised_sub_uncond", blend_strength=1.0,
        blend_scale_mode="none", model_sampling=ms)
    assert hook == "post_cfg"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8)), jnp.float32) * 5
    den = jnp.asarray(rng.standard_normal((1, 4, 8, 8)), jnp.float32)
    und = jnp.asarray(rng.standard_normal((1, 4, 8, 8)), jnp.float32)
    out = patch(dict(input=x, sigma=jnp.asarray([5.0]), denoised=den,
                     uncond_denoised=und))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # pred_flip round trip with identity op ≈ identity
    patch2, _ = make_latent_op_cfg_function(
        operation=lambda latent, **kw: latent, mode="denoised",
        pred_flip_mode=True, blend_strength=1.0, blend_scale_mode="none",
        model_sampling=ms)
    out2 = patch2(dict(input=x, sigma=jnp.asarray([5.0]), denoised=den,
                       uncond_denoised=und))
    assert float(jnp.abs(out2 - den).max()) < 1e-4


def test_preview_power_filter():
    img = preview_power_filter(PowerFilter(alpha=0.5, min_freq=0.1), size=(32, 32))
    assert img.shape == (32, 64)
    assert img.dtype == np.uint8


def test_blend_filter_noise_native():
    chain = NoiseChain([get_noise_item("gaussian"), get_noise_item("uniform", factor=0.5)])
    item = build("SonarBlendFilterNoise", factor=1.0, sonar_custom_noise=chain,
                 ffilter="highpass", ffilter_strength=0.8, enhance_mode="sharpen",
                 enhance_strength=0.3, affect="both")
    fn, st = make_noise_sampler(item, (1, 4, 16, 16), seed=0)
    noise, _ = fn(st, jnp.asarray(1.0), jnp.asarray(0.9))
    assert np.isfinite(np.asarray(noise)).all()
    # highpass boosts high-frequency energy share vs unfiltered
    plain_item = build("SonarBlendFilterNoise", factor=1.0,
                       sonar_custom_noise=chain, affect="result")
    fnp, stp = make_noise_sampler(plain_item, (1, 4, 16, 16), seed=0)
    plain, _ = fnp(stp, jnp.asarray(1.0), jnp.asarray(0.9))

    def hf_share(t):
        spec = jnp.abs(jnp.fft.rfft2(t))
        return float(spec[..., 6:, 6:].sum() / spec.sum())

    assert hf_share(noise) > hf_share(plain)


def test_restart_sampler_native():
    from sonar_tpu.samplers.restart import RestartSegment, sample_restart

    def model(x, sigma, **kw):
        return x * 0.9

    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 8, 8)),
                     jnp.float32) * 14.6
    sigmas = np.linspace(14.6, 0.03, 8).tolist() + [0.0]
    out = sample_restart(model, x0, sigmas,
                         segments=(RestartSegment(t_min=2.0, t_max=6.0, n=3, k=2),),
                         custom_noise=get_noise_item("gaussian"), seed=4)
    assert out.shape == x0.shape
    assert np.isfinite(np.asarray(out)).all()
    # node-level builders return callables
    s = build("RestartSamplerCustomNoise", custom_noise=get_noise_item("gaussian"))
    assert callable(s)


def test_bleh_ops_rule_engine():
    chain = NoiseChain([get_noise_item("gaussian")])
    rules = """
- when: {sigma_min: 0.5}
  ops:
    - [multiply, 2.0]
    - [ffilter, {filter: lowpass, strength: 0.5}]
    - [enhance, {mode: contrast, scale: 0.2}]
    - [normalize, {factor: 1.0}]
- when: {sigma_max: 0.4}
  ops:
    - [neg]
"""
    item = build("SonarBlehOpsNoise", factor=1.0, sonar_custom_noise=chain,
                 rules=rules, normalize="forced")
    fn, st = make_noise_sampler(item, (1, 4, 16, 16), seed=0)
    hi, st = fn(st, jnp.asarray(2.0), jnp.asarray(1.5))
    lo, st = fn(st, jnp.asarray(0.2), jnp.asarray(0.1))
    assert np.isfinite(np.asarray(hi)).all()
    assert np.isfinite(np.asarray(lo)).all()
    # bad op name raises at build time
    with pytest.raises(ValueError, match="Unknown op"):
        build("SonarBlehOpsNoise", factor=1.0, sonar_custom_noise=chain,
              rules="- ops: [[nosuch, 1]]")


def test_sonar_pipeline_end_to_end():
    from sonar_tpu.api import SonarPipeline
    from sonar_tpu.cfg import WaveletCFG, WCFGRules
    from sonar_tpu.samplers import SonarConfig

    def cond_model(x, sb, **kw):
        return x * 0.9

    def uncond_model(x, sb, **kw):
        return x * 0.88

    rules = WCFGRules.build(wave="haar", level=2, high_precision_mode=False,
                            diff=dict(yl_scale=5.0, yh_scales=5.0))
    pipe = SonarPipeline(
        model=cond_model, model_uncond=uncond_model,
        sampler="sonar_euler_ancestral",
        sonar_config=SonarConfig(momentum=0.9),
        noise=get_noise_item("pyramid"),
        cfg_scale=5.0, wavelet_cfg=WaveletCFG(rules=rules), seed=3)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 16, 16)),
                     jnp.float32) * 14.6
    sigmas = jnp.asarray([14.6, 5.0, 1.0, 0.0], jnp.float32)
    out = jax.jit(lambda v: pipe(v, sigmas))(x0)
    assert out.shape == x0.shape
    assert np.isfinite(np.asarray(out)).all()
    # unguided path (no uncond model)
    pipe2 = SonarPipeline(model=cond_model, noise=get_noise_item("gaussian"), seed=1)
    out2 = pipe2(x0, sigmas)
    assert np.isfinite(np.asarray(out2)).all()


def test_sonar_pipeline_latent_op_hook():
    from sonar_tpu.api import SonarPipeline, make_latent_op_cfg_function
    from sonar_tpu.cfg import DiscreteSampling, SonarLatentOperationQuantileFilter

    patch = make_latent_op_cfg_function(
        operation=SonarLatentOperationQuantileFilter(quantile=0.95),
        mode="denoised", blend_strength=1.0, blend_scale_mode="none",
        model_sampling=DiscreteSampling())
    pipe = SonarPipeline(model=lambda x, sb, **kw: x * 0.9,
                         model_uncond=lambda x, sb, **kw: x * 0.88,
                         latent_op_cfg=patch, seed=2)
    x0 = jnp.ones((1, 4, 8, 8)) * 10.0
    out = pipe(x0, jnp.asarray([14.6, 5.0, 1.0, 0.0], jnp.float32))
    assert np.isfinite(np.asarray(out)).all()


def test_override_sigma_escape_hatch():
    """TypedNoiseItem override_sigma* lets sigma-dependent generators run
    outside sampling (py/noise.py:100-134)."""
    from sonar_tpu.noise import TypedNoiseItem

    # brownian without sampling context normally raises (needs sigma range)
    with pytest.raises(ValueError, match="sigma_min"):
        make_noise_sampler(TypedNoiseItem(noise_type="brownian"), (1, 4, 8, 8),
                           seed=0)
    item = TypedNoiseItem(noise_type="brownian", override_sigma=5.0,
                          override_sigma_next=4.0, override_sigma_min=0.1,
                          override_sigma_max=10.0)
    fn, st = make_noise_sampler(item, (1, 4, 8, 8), seed=0)
    noise, _ = fn(st, None, None)  # no runtime sigmas needed
    assert np.isfinite(np.asarray(noise)).all()
    assert float(jnp.std(noise)) > 0.5


def test_to_comfy_noise_adapter():
    chain = build("SonarCustomNoise", factor=1.0, noise_type="gaussian")
    adapter = build("SonarToComfyNOISE", sonar_custom_noise=chain, seed=5)
    latent = {"samples": jnp.zeros((2, 4, 8, 8))}
    out = adapter.generate_noise(latent)
    assert out.shape == (2, 4, 8, 8)
    assert abs(float(jnp.std(out)) - 1.0) < 0.2


def test_noisy_latent_like_node_custom_noise_passthrough():
    """Regression: custom_noise_opt must reach noisy_latent_like (a stray
    double-pop used to drop it)."""
    chain = build("SonarCustomNoise", factor=1.0, noise_type="pyramid")
    latent = jnp.zeros((1, 4, 16, 16))
    a = build("NoisyLatentLike", latent=latent, seed=0, custom_noise_opt=chain)
    b = build("NoisyLatentLike", latent=latent, seed=0)  # gaussian default
    # pyramid noise has strong low-frequency energy vs gaussian
    def lowfreq_share(t):
        spec = jnp.abs(jnp.fft.rfft2(t))
        return float(spec[..., :3, :3].sum() / spec.sum())
    assert lowfreq_share(a) > lowfreq_share(b) * 1.5


def test_pipeline_fused_noise_scopes_env():
    """SonarPipeline(fused_noise=...) must set the fused-pyramid flag for
    exactly the duration of the (trace-time) sampler call and restore the
    environment after (VERDICT r2 item 6: one-line user opt-in)."""
    import os

    from sonar_tpu.api import SonarPipeline

    seen = {}

    def fake_sampler(model, x0, sigmas, **kw):
        seen["flag"] = os.environ.get("SONAR_TPU_FUSED_PYRAMID")
        return x0

    model = lambda x, s, **kw: x  # noqa: E731
    x0 = jnp.zeros((1, 1, 8, 8))
    sigmas = jnp.asarray([1.0, 0.0])

    assert "SONAR_TPU_FUSED_PYRAMID" not in os.environ
    SonarPipeline(model=model, sampler=fake_sampler, fused_noise=True)(
        x0, sigmas)
    assert seen["flag"] == "1"
    assert "SONAR_TPU_FUSED_PYRAMID" not in os.environ
    SonarPipeline(model=model, sampler=fake_sampler, fused_noise=False)(
        x0, sigmas)
    assert seen["flag"] == "0"
    # None defers to the ambient environment
    SonarPipeline(model=model, sampler=fake_sampler)(x0, sigmas)
    assert seen["flag"] is None


def test_pipeline_jit_runner():
    """pipe.jit() must actually work: the schedule is static (it feeds
    host-side WCFG step windows), compiled once per unique schedule."""
    from sonar_tpu.api import SonarPipeline

    def model(x, s, **kw):
        return x / (1.0 + s.reshape((-1, 1, 1, 1)) ** 2)

    pipe = SonarPipeline(model=model, sampler="sonar_euler", seed=0)
    sig = np.concatenate([np.geomspace(14.6, 0.03, 6), [0.0]]).astype(np.float32)
    x0 = jnp.asarray(np.random.default_rng(0)
                     .standard_normal((1, 4, 16, 16)).astype(np.float32)) * 14.6
    run = pipe.jit()
    out = run(x0, sig)
    assert out.shape == x0.shape and bool(jnp.isfinite(out).all())
    out2 = run(x0, sig)  # cached program
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_pipeline_jit_runner_extra_args_not_baked():
    """pipe.jit() must treat extra_args as a jit ARGUMENT: new weights
    through the same compiled program give new outputs (a baked-constant
    params tree would return the p1 result for p2 — and at SDXL scale a
    2.66GB constant breaks the remote-compile transport)."""
    from sonar_tpu.api import SonarPipeline

    def model(x, s, *, w, **kw):
        return x * w / (1.0 + s.reshape((-1, 1, 1, 1)) ** 2)

    pipe = SonarPipeline(model=model, sampler="sonar_euler", seed=0)
    sig = np.concatenate([np.geomspace(14.6, 0.03, 4), [0.0]]).astype(np.float32)
    x0 = jnp.asarray(np.random.default_rng(1)
                     .standard_normal((1, 4, 8, 8)).astype(np.float32)) * 14.6
    run = pipe.jit()
    out1 = run(x0, sig, extra_args={"w": jnp.asarray(1.0)})
    out2 = run(x0, sig, extra_args={"w": jnp.asarray(0.5)})
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    # same weights again → same (cached) result
    out3 = run(x0, sig, extra_args={"w": jnp.asarray(1.0)})
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out3))


def test_pipeline_bf16_latent_keeps_f32_schedule():
    from sonar_tpu.api import SonarPipeline

    seen = {}

    def model(x, s, **kw):
        seen["sigma_dtype"] = s.dtype
        return x * 0.5

    pipe = SonarPipeline(model=model, sampler="sonar_euler", seed=0)
    sig = np.concatenate([np.geomspace(14.6, 0.03, 4), [0.0]]).astype(np.float32)
    x0 = jnp.zeros((1, 4, 8, 8), jnp.bfloat16)
    pipe(x0, sig)
    assert seen["sigma_dtype"] == jnp.float32


def test_latent_op_cfg_no_operations_is_noop():
    """Reference: go() returns the model unpatched when no operations are
    connected (latent_operations.py:193-195)."""
    from sonar_tpu.api.guider import make_latent_op_cfg_function
    from sonar_tpu.cfg import DiscreteSampling

    patch, hook = make_latent_op_cfg_function(
        operations=(), mode="denoised", blend_mode="inject",
        blend_strength=0.5, model_sampling=DiscreteSampling())
    d = jnp.full((1, 4, 8, 8), 2.0)
    out = patch(dict(input=jnp.zeros((1, 4, 8, 8)), sigma=jnp.asarray([2.0]),
                     denoised=d, uncond_denoised=None))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(d))


def test_64bit_seeds_give_distinct_streams():
    from sonar_tpu.core.rng import key_from_seed

    a = jax.random.normal(key_from_seed(5), (8,))
    b = jax.random.normal(key_from_seed(5 + 2**32), (8,))
    c = jax.random.normal(key_from_seed(0xFFFFFFFFFFFFFFFF), (8,))
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(b), np.asarray(c))


def test_pipeline_model_batched_equals_pair():
    """model_batched (one doubled-batch denoiser call per step — the
    TPU-native CFG batching that halves program size) must reproduce the
    (model, model_uncond) pair path exactly, including under wavelet CFG
    and a post-CFG latent op."""
    from sonar_tpu.api import SonarPipeline, make_latent_op_cfg_function
    from sonar_tpu.cfg import DiscreteSampling, WaveletCFG, WCFGRules
    from sonar_tpu.samplers import SonarConfig

    def cond_model(x, sb, **kw):
        s = jnp.asarray(sb, x.dtype).reshape(-1, 1, 1, 1)
        return x / (1.0 + s)

    def uncond_model(x, sb, **kw):
        s = jnp.asarray(sb, x.dtype).reshape(-1, 1, 1, 1)
        return (x * 0.97) / (1.0 + s)

    def batched_model(x2, sb2, **kw):
        b = x2.shape[0] // 2
        sig = jnp.asarray(sb2)
        s_c = sig if sig.ndim == 0 else sig[:b]
        s_u = sig if sig.ndim == 0 else sig[b:]
        return jnp.concatenate(
            [cond_model(x2[:b], s_c), uncond_model(x2[b:], s_u)], axis=0)

    ms = DiscreteSampling()
    rules = WCFGRules.build(wave="haar", level=2, high_precision_mode=False,
                            diff=dict(yl_scale=5.0, yh_scales=4.0))
    lo_cfg = make_latent_op_cfg_function(
        operations=(lambda latent=None, **kw: latent * 1.03,),
        mode="denoised", blend_strength=0.5, model_sampling=ms)
    common = dict(sampler="sonar_euler_ancestral",
                  sonar_config=SonarConfig(momentum=0.9),
                  noise=get_noise_item("pyramid"), cfg_scale=5.0,
                  wavelet_cfg=WaveletCFG(rules=rules), latent_op_cfg=lo_cfg,
                  model_sampling=ms, seed=3)
    pipe_pair = SonarPipeline(model=cond_model, model_uncond=uncond_model,
                              **common)
    pipe_batched = SonarPipeline(model_batched=batched_model, **common)
    x0 = jnp.asarray(np.random.default_rng(7).standard_normal((2, 4, 16, 16)),
                     jnp.float32) * 14.6
    sigmas = jnp.asarray([14.6, 5.0, 1.0, 0.0], jnp.float32)
    out_pair = jax.jit(lambda v: pipe_pair(v, sigmas))(x0)
    out_batched = jax.jit(lambda v: pipe_batched(v, sigmas))(x0)
    np.testing.assert_allclose(np.asarray(out_batched), np.asarray(out_pair),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_model_batched_excludes_uncond():
    from sonar_tpu.api import SonarPipeline

    with pytest.raises(ValueError, match="mutually exclusive"):
        SonarPipeline(model_uncond=lambda x, s: x,
                      model_batched=lambda x, s: x)


def test_pipeline_model_batched_excludes_model():
    """model + model_batched must raise, not silently ignore model
    (review r3 finding: the batched branch never calls model)."""
    from sonar_tpu.api import SonarPipeline

    with pytest.raises(ValueError, match="mutually exclusive"):
        SonarPipeline(model=lambda x, s: x, model_batched=lambda x, s: x)


def test_pipeline_jit_cache_lives_on_instance():
    """pipe.jit()(x0, s) in a loop must reuse compiled programs: the cache
    is keyed on the pipeline instance, not on each jit() invocation
    (review r3: a fresh per-invocation cache recompiled every call — at
    SDXL scale ~795s of uncacheable tunnel compile per call)."""
    from sonar_tpu.api import SonarPipeline

    def model(x, s, **kw):
        return x / (1.0 + s.reshape((-1, 1, 1, 1)) ** 2)

    pipe = SonarPipeline(model=model, sampler="sonar_euler", seed=0)
    sig = np.concatenate([np.geomspace(14.6, 0.03, 4), [0.0]]).astype(np.float32)
    x0 = jnp.asarray(np.random.default_rng(2)
                     .standard_normal((1, 4, 8, 8)).astype(np.float32)) * 14.6
    out1 = pipe.jit()(x0, sig)      # fresh runner each time — the
    out2 = pipe.jit()(x0, sig)      # compiled program must still be shared
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert len(pipe._jit_cache) == 1, pipe._jit_cache.keys()


def test_batched_cfg_halves_traced_program():
    """Pin the batched-CFG program-size claim (ANALYSIS §13): ONE doubled-
    batch denoiser call must produce well under 0.7x the pair path's
    StableHLO op count — the lever that cuts the uncacheable SDXL remote
    compile. Lowering is backend-independent, so this pins it in CI."""
    from sonar_tpu.api import SonarPipeline
    from sonar_tpu.models import UNetConfig, init_unet_params, unet_apply

    cfg = UNetConfig(model_channels=16, channel_mult=(1, 2), num_res_blocks=1,
                     attention_levels=(1,), num_heads=4, norm_groups=4)
    params = init_unet_params(jax.random.key(0), cfg)

    def cond(x, sb, params=None, **kw):
        s = jnp.asarray(sb, x.dtype).reshape(-1, 1, 1, 1)
        return x - s * unet_apply(params, x / jnp.sqrt(1 + s * s), sb, cfg)

    def uncond(x, sb, params=None, **kw):
        s = jnp.asarray(sb, x.dtype).reshape(-1, 1, 1, 1)
        return x - s * unet_apply(params, x * 0.97 / jnp.sqrt(1 + s * s), sb, cfg)

    def batched(x2, sb2, params=None, **kw):
        n = x2.shape[0]
        sb = jnp.broadcast_to(jnp.asarray(sb2, x2.dtype).reshape(-1), (n,))
        s = sb.reshape(-1, 1, 1, 1)
        half = jnp.arange(n).reshape(-1, 1, 1, 1) >= (n // 2)
        scale = jnp.where(half, 0.97, 1.0)
        return x2 - s * unet_apply(params, x2 * scale / jnp.sqrt(1 + s * s),
                                   sb, cfg)

    common = dict(sampler="sonar_euler", cfg_scale=6.0,
                  model_sampling=DiscreteSampling(), seed=3)
    pair = SonarPipeline(model=cond, model_uncond=uncond, **common)
    fast = SonarPipeline(model_batched=batched, **common)
    sig = jnp.asarray([14.6, 5.0, 1.0, 0.0], jnp.float32)
    x0 = jnp.zeros((1, 4, 16, 16), jnp.float32)

    def ops(pipe):
        lowered = jax.jit(
            lambda v, p: pipe(v, sig, extra_args={"params": p})
        ).lower(x0, params)
        return lowered.as_text().count("\n")

    n_pair, n_fast = ops(pair), ops(fast)
    assert n_fast < 0.7 * n_pair, (n_fast, n_pair)


def test_pipeline_noise_with_non_ancestral_sampler_is_ignored():
    """Pipeline-level noise/eta/s_noise defaults must only be forwarded to
    samplers that accept them: in the reference, SamplerNodeSonarEuler has
    no noise input at all (sonar.py), so a pipeline configured with a noise
    item + the non-ancestral euler samples noiselessly instead of crashing
    with a TypeError inside the sampler. Explicit caller kwargs stay loud."""
    import pytest

    from sonar_tpu.api import SonarPipeline
    from sonar_tpu.noise import get_noise_item

    def model(x, s, **kw):
        return x / (1.0 + s.reshape((-1, 1, 1, 1)) ** 2)

    sig = np.concatenate([np.geomspace(14.6, 0.03, 6), [0.0]]).astype(np.float32)
    x0 = jnp.asarray(np.random.default_rng(1)
                     .standard_normal((1, 4, 16, 16)).astype(np.float32)) * 14.6

    noisy = SonarPipeline(model=model, sampler="sonar_euler",
                          noise=get_noise_item("pyramid"), eta=0.7,
                          s_noise=1.1, seed=3)
    plain = SonarPipeline(model=model, sampler="sonar_euler", seed=3)
    np.testing.assert_array_equal(np.asarray(noisy(x0, sig)),
                                  np.asarray(plain(x0, sig)))

    # an explicit bad kwarg from the caller still raises
    with pytest.raises(TypeError):
        plain(x0, sig, noise_item=get_noise_item("gaussian"))


def test_pipeline_jit_keeps_host_sigmas():
    """Code-review r5: jnp.asarray inside an active trace lifts even a
    concrete schedule to a tracer, so computing host_sigmas AFTER the
    conversion silently dropped WCFG step windows under pipe.jit() —
    the exact mode pipe.jit() exists to keep concrete. The host view
    must be taken from the raw input first."""
    from sonar_tpu.api import SonarPipeline

    def model(x, s, **kw):
        return x / (1.0 + s.reshape((-1, 1, 1, 1)) ** 2)

    pipe = SonarPipeline(model=model, sampler="sonar_euler", seed=0)
    sig = np.concatenate([np.geomspace(14.6, 0.03, 6),
                          [0.0]]).astype(np.float32)
    x0 = jnp.asarray(np.random.default_rng(0)
                     .standard_normal((1, 4, 16, 16)).astype(np.float32))
    seen = []
    orig = pipe._denoiser
    pipe._denoiser = lambda hs: (seen.append(hs), orig(hs))[1]
    pipe.jit()(x0, sig)
    assert seen and seen[-1] is not None
    np.testing.assert_allclose(np.asarray(seen[-1]), sig, rtol=1e-6)


@pytest.mark.parametrize("name", ["uni_pc", "deis", "lms", "ipndm",
                                  "dpm_fast"])
def test_pipeline_jit_host_table_samplers(name):
    """Code-review r5: host-table samplers (coefficients derived from the
    schedule on the host) must work under pipe.jit() — the pipeline hands
    them the concrete schedule instead of the constant-lifted tracer."""
    from sonar_tpu.api import SonarPipeline

    def model(x, s, **kw):
        return x / (1.0 + s.reshape((-1, 1, 1, 1)) ** 2)

    sig = np.concatenate([np.geomspace(14.6, 0.03, 8),
                          [0.0]]).astype(np.float32)
    x0 = jnp.asarray(np.random.default_rng(1)
                     .standard_normal((1, 4, 16, 16)).astype(np.float32)) * 14.6
    pipe = SonarPipeline(model=model, sampler=name, seed=2)
    eager = np.asarray(pipe(x0, sig))
    jitted = np.asarray(pipe.jit()(x0, sig))
    assert np.isfinite(jitted).all()
    np.testing.assert_allclose(jitted, eager, rtol=2e-5, atol=2e-5)
