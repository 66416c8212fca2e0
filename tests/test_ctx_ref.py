"""Exemplar-latent (ctx.ref) plumbing tests.

The reference passes the latent ``x`` into every noise-sampler build
(py/noise.py:249); items consult it by default: ModulatedNoise modulates
against x (py/noise.py:846), GuidedNoise's euler method uses x for the
shift statistics (py/noise.py:600-614), and ResizedNoise's
``initial_reference`` decides how x is conformed to the generation size
(py/noise.py:1466-1494). These tests pin the TPU build's equivalents.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.noise import (
    ChannelNoise,
    GuidedNoise,
    ModulatedNoise,
    NoiseChain,
    ResizedNoise,
    get_noise_item,
    make_noise_sampler,
)

SHAPE = (2, 4, 16, 16)


def gauss(**kw):
    return get_noise_item("gaussian", **kw)


def draw(item, shape=SHAPE, sigma=2.0, sigma_next=1.0, seed=0, **kwargs):
    fn, state = make_noise_sampler(item, shape, seed=seed, sigma_min=0.03,
                                   sigma_max=14.6, **kwargs)
    noise, _ = fn(state, jnp.asarray(sigma), jnp.asarray(sigma_next))
    return np.asarray(noise)


def structured_latent(shape=SHAPE, seed=7):
    """A latent with strong spatial structure (non-uniform std)."""
    x = jax.random.normal(jax.random.key(seed), shape)
    ramp = jnp.linspace(0.1, 4.0, shape[-1])
    return x * ramp + jnp.linspace(-2.0, 2.0, shape[-2])[:, None]


def test_modulated_defaults_to_ctx_ref():
    x = structured_latent()
    item = lambda: ModulatedNoise(noise=gauss(), modulation_type="intensity",
                                  modulation_strength=2.0, modulation_dims=2)
    via_ctx = draw(item(), ref_latent=x)
    via_opt = draw(ModulatedNoise(noise=gauss(), modulation_type="intensity",
                                  modulation_strength=2.0, modulation_dims=2,
                                  ref_latent_opt=x))
    no_ref = draw(item())
    # ctx.ref is used exactly like an explicit ref_latent_opt…
    np.testing.assert_allclose(via_ctx, via_opt, rtol=1e-6)
    # …and produces reference-shaped (non-unit) scaling, unlike the zeros ref
    assert not np.allclose(via_ctx, no_ref)


def test_modulated_explicit_ref_overrides_ctx():
    x = structured_latent(seed=7)
    y = structured_latent(seed=8) * 3.0
    item = ModulatedNoise(noise=gauss(), modulation_type="intensity",
                          modulation_strength=2.0, modulation_dims=2,
                          ref_latent_opt=y)
    with_ctx = draw(item.clone(), ref_latent=x)
    without_ctx = draw(item.clone())
    np.testing.assert_allclose(with_ctx, without_ctx, rtol=1e-6)


def test_guided_euler_uses_ctx_ref_for_shift():
    ref = jax.random.normal(jax.random.key(9), SHAPE)
    x = structured_latent()
    item = lambda: GuidedNoise(ref_latent=ref, guidance_factor=0.4,
                               method="euler", noise=gauss())
    with_x = draw(item(), ref_latent=x)
    without_x = draw(item())
    assert np.isfinite(with_x).all()
    assert not np.allclose(with_x, without_x)
    # linear method never consults x
    lin = lambda: GuidedNoise(ref_latent=ref, guidance_factor=0.4,
                              method="linear", noise=gauss())
    np.testing.assert_allclose(draw(lin(), ref_latent=x), draw(lin()))


def test_resized_initial_reference_crop_vs_scale():
    x = structured_latent()
    child = ModulatedNoise(noise=gauss(), modulation_type="intensity",
                           modulation_strength=2.0, modulation_dims=2)

    def make(mode):
        return ResizedNoise(
            custom_noise=NoiseChain([child.clone()]), width=64, height=64,
            spatial_mode="absolute", spatial_compression=8,
            initial_reference=mode)

    cropped = draw(make("prefer_crop"), ref_latent=x)
    scaled = draw(make("prefer_scale"), ref_latent=x)
    assert cropped.shape == SHAPE
    # the two modes hand the child a different exemplar → different scaling
    assert not np.allclose(cropped, scaled)
    # without a ctx ref, the option is inert
    np.testing.assert_allclose(draw(make("prefer_crop")),
                               draw(make("prefer_scale")))


def test_channel_noise_slices_ref_per_channel():
    x = structured_latent()
    child = ModulatedNoise(noise=gauss(), modulation_type="intensity",
                           modulation_strength=2.0, modulation_dims=2)
    item = ChannelNoise(noise=NoiseChain([child]),
                        insufficient_channels_mode="wrap")
    with_ref = draw(item.clone(), ref_latent=x)
    without = draw(item.clone())
    assert with_ref.shape == SHAPE
    assert not np.allclose(with_ref, without)


def test_ref_like_spatial_resize():
    from sonar_tpu.noise.base import NoiseCtx

    ref = structured_latent((2, 4, 8, 8))
    ctx = NoiseCtx(shape=SHAPE, ref=ref)
    out = ctx.ref_like()
    assert out.shape == SHAPE
    # incompatible (channel-mismatch) refs are dropped, not coerced
    ctx2 = NoiseCtx(shape=(2, 8, 16, 16), ref=ref)
    assert ctx2.ref_like() is None


def test_sampler_threads_x_as_ctx_ref():
    """End-to-end: a ModulatedNoise chain inside the ancestral sampler sees
    the sampling latent — the trajectory differs from a zeros-ref run and
    stays finite."""
    from sonar_tpu.samplers.sonar import sample_sonar_euler_ancestral

    def model(x, sigma, **kw):
        return x * 0.95

    x = structured_latent((1, 4, 16, 16), seed=3) * 5.0
    sigmas = jnp.asarray([5.0, 2.0, 0.8, 0.0], jnp.float32)
    item = ModulatedNoise(noise=gauss(), modulation_type="intensity",
                          modulation_strength=2.0, modulation_dims=2)
    out = sample_sonar_euler_ancestral(model, x, sigmas, noise_item=item, seed=1)
    assert np.isfinite(np.asarray(out)).all()
