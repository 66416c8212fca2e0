"""Live-reference oracle for SonarNoiseImage's node machinery (reference:
SonarNoiseImageNode.go, py/nodes/misc.py:158-357): channel-mode targeting
incl. the B<->G channel-map swap quirk (misc.py:284), greyscale collapse,
noise_min/max range normalization and its disable conditions, blend
functions, overflow clamp vs rescale, pure-noise mode, and non-RGB(A)
channel counts.

Same technique as the NoisyLatentLike oracle: both sides draw the SAME
injected deterministic "noise" through custom-noise stubs, so the
comparison isolates the node machinery from RNG differences.
"""

import sys

import numpy as np
import pytest

from tests._reference_loader import load_reference

ref_pkg = load_reference()
pytestmark = pytest.mark.skipif(
    ref_pkg is None, reason="reference tree not available")

if ref_pkg is not None:
    import importlib

    import torch

    ref_misc = importlib.import_module("sonar_reference.py.nodes.misc")

import jax.numpy as jnp

from sonar_tpu.api import noise_image
from sonar_tpu.noise.base import NoiseItem


class _RefFixedNoise:
    def __init__(self, arr):
        self.arr = arr

    def make_noise_sampler(self, x, **kw):
        assert tuple(x.shape) == self.arr.shape, (x.shape, self.arr.shape)
        return lambda sigma, sigma_next: torch.from_numpy(self.arr.copy())


class _OurFixedNoise(NoiseItem):
    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        assert tuple(ctx.shape) == self.arr.shape, (ctx.shape, self.arr.shape)
        return jnp.asarray(self.arr), state


CASES = {
    "rgb_default": dict(channels=3),
    "bg_swap_quirk": dict(channels=3, channel_mode="GB"),
    "r_only_4ch": dict(channels=4, channel_mode="R"),
    "rgba_4ch": dict(channels=4, channel_mode="RGBA"),
    "alpha_on_rgb_empty": dict(channels=3, channel_mode="A"),
    "one_channel": dict(channels=1),
    "greyscale": dict(channels=3, greyscale_mode=True),
    "range_scaled": dict(channels=3, noise_min=-0.3, noise_max=0.6),
    "range_disabled_equal": dict(channels=3, noise_min=0.4, noise_max=0.4),
    "range_disabled_zero_max": dict(channels=3, noise_min=-0.5,
                                    noise_max=0.0),
    "swapped_minmax": dict(channels=3, noise_min=0.9, noise_max=0.1),
    "lerp_blend": dict(channels=3, blend_mode="lerp", blend_strength=0.35),
    "rescale_overflow": dict(channels=3, overflow_mode="rescale",
                             noise_multiplier=1.5),
    "pure_noise": dict(channels=3, pure_noise_mode=True),
}

_DEFAULTS = dict(noise_multiplier=0.5, noise_min=0.0, noise_max=1.0,
                 channel_mode="RGB", blend_mode="simple_add",
                 blend_strength=0.5, overflow_mode="clamp",
                 greyscale_mode=False, pure_noise_mode=False, normalize=True)


@pytest.mark.parametrize("case", sorted(CASES), ids=sorted(CASES))
def test_noise_image_oracle(case):
    cfg = dict(CASES[case])
    channels = cfg.pop("channels")
    kw = _DEFAULTS | cfg
    rng = np.random.default_rng(11)
    img = rng.uniform(0.0, 1.0, (2, 8, 8, channels)).astype(np.float32)
    fixed = rng.standard_normal((2, channels, 8, 8)).astype(np.float32) * 1.3

    (want,) = ref_misc.SonarNoiseImageNode.go(
        noise_type="gaussian", seed=5, image=torch.from_numpy(img.copy()),
        dtype="default", cpu_noise=True,
        custom_noise_opt=_RefFixedNoise(fixed), **kw)
    got = noise_image(jnp.asarray(img), seed=5,
                      custom_noise=_OurFixedNoise(arr=fixed), **kw)
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=3e-5, atol=3e-6, err_msg=case)


def test_noise_image_unbatched_matches_reference_values():
    """3-dim input: the reference returns a batched (1,H,W,C) tensor; ours
    preserves the input rank — values must still agree."""
    rng = np.random.default_rng(12)
    img = rng.uniform(0.0, 1.0, (8, 8, 3)).astype(np.float32)
    fixed = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    (want,) = ref_misc.SonarNoiseImageNode.go(
        noise_type="gaussian", seed=5, image=torch.from_numpy(img.copy()),
        dtype="default", cpu_noise=True,
        custom_noise_opt=_RefFixedNoise(fixed), **_DEFAULTS)
    got = noise_image(jnp.asarray(img), seed=5,
                      custom_noise=_OurFixedNoise(arr=fixed), **_DEFAULTS)
    assert np.asarray(got).shape == img.shape
    np.testing.assert_allclose(np.asarray(got), want.numpy()[0],
                               rtol=3e-5, atol=3e-6)
