"""Node-surface fixes: SplitNoiseChain reference semantics, ChannelNoise
mix_count acceptance, the literal "SONAR_CUSTOM_NOISE to NOISE" alias."""

import jax.numpy as jnp
import numpy as np

from sonar_tpu.api.nodes import build
from sonar_tpu.noise import (
    BlendedNoise,
    NoiseChain,
    get_noise_item,
    make_noise_sampler,
)


def _draw(item, shape=(1, 4, 8, 8), seed=0):
    fn, state = make_noise_sampler(item, shape, seed=seed, sigma_min=0.03,
                                   sigma_max=14.6)
    noise, _ = fn(state, jnp.asarray(1.0), jnp.asarray(0.5))
    return np.asarray(noise)


def test_split_noise_chain_node_semantics():
    """py/nodes/misc.py:628-663: the node wraps custom_noise in a
    BlendedNoise whose blend returns only the first input."""
    inner = build("SonarCustomNoise", factor=1.0, noise_type="gaussian")
    inner = build("SonarCustomNoise", factor=0.5, noise_type="uniform",
                  sonar_custom_noise_opt=inner)
    chain = build("SonarSplitNoiseChain", custom_noise=inner)
    assert isinstance(chain, NoiseChain)
    assert len(chain.items) == 1
    assert isinstance(chain.items[0], BlendedNoise)
    # blend(a, b, t) == a → the split chain draws exactly the inner chain
    got = _draw(chain)
    expected = _draw(NoiseChain([BlendedNoise(
        1.0, blend_function=lambda a, _b, _t: a,
        custom_noise_1=inner.clone(), custom_noise_2=None,
        noise_2_percent=0.0)]))
    np.testing.assert_allclose(got, expected, rtol=1e-6)
    # factor == 0 → item not appended (py/nodes/base.py:237)
    empty = build("SonarSplitNoiseChain", factor=0.0, custom_noise=inner)
    assert len(empty.items) == 0


def test_split_chain_appends_to_existing():
    base = build("SonarCustomNoise", factor=1.0, noise_type="gaussian")
    sub = build("SonarCustomNoise", factor=1.0, noise_type="uniform")
    out = build("SonarSplitNoiseChain", custom_noise=sub,
                sonar_custom_noise_opt=base)
    assert len(out.items) == 2


def test_channel_noise_accepts_mix_count():
    inner = build("SonarCustomNoise", factor=1.0, noise_type="gaussian")
    chain = build("SonarChannelNoise", sonar_custom_noise=inner, mix_count=3)
    assert _draw(chain).shape == (1, 4, 8, 8)


def test_comfy_noise_alias_name():
    inner = NoiseChain([get_noise_item("gaussian")])
    adapter = build("SONAR_CUSTOM_NOISE to NOISE", custom_noise=inner, seed=5)
    out = adapter.generate_noise({"samples": jnp.zeros((1, 4, 8, 8))})
    assert out.shape == (1, 4, 8, 8)
    assert np.isfinite(np.asarray(out)).all()
