"""clone() must round-trip every combinator, including ones whose __init__
doesn't take the base ``normalize`` kwarg and the multi-child wrappers whose
child list is stored as ``items`` but constructed as ``noise=``."""

import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.noise import (
    ChannelNoise,
    CompositeNoise,
    GuidedNoise,
    ModulatedNoise,
    NoiseChain,
    PatternBreakNoise,
    RandomNoise,
    get_noise_item,
    make_noise_sampler,
)


def gauss():
    return get_noise_item("gaussian")


@pytest.mark.parametrize(
    "make_item",
    [
        lambda: ModulatedNoise(noise=gauss(), modulation_type="intensity"),
        lambda: GuidedNoise(ref_latent=jnp.ones((1, 4, 8, 8)),
                            guidance_factor=0.3, method="euler", noise=gauss()),
        lambda: CompositeNoise(dst_noise=gauss(), src_noise=gauss(),
                               mask=jnp.ones((1, 4, 4))),
        lambda: PatternBreakNoise(noise=gauss(), percentage=0.4),
        lambda: RandomNoise(noise=NoiseChain([gauss(), get_noise_item("uniform")])),
        lambda: ChannelNoise(noise=NoiseChain([gauss()])),
    ],
    ids=["modulated", "guided", "composite", "patternbreak", "random", "channel"],
)
def test_clone_roundtrip(make_item):
    item = make_item()
    dup = item.clone()
    assert type(dup) is type(item)

    def draw(it):
        fn, state = make_noise_sampler(it, (1, 4, 8, 8), seed=0,
                                       sigma_min=0.03, sigma_max=14.6)
        out, _ = fn(state, jnp.asarray(1.0), jnp.asarray(0.5))
        return np.asarray(out)

    np.testing.assert_allclose(draw(item), draw(dup), rtol=1e-6)
