"""Live-reference oracle for NoisyLatentLike's node math (reference:
NoisyLatentLikeNode.go, py/nodes/misc.py:72-155): the sigma-strength
multiplier incl. the max-denoise ``sqrt(1+sigma0^2)`` rule and the
latent-format scale-factor division, sigma_min/max extraction from the
sigma tensor, repeat_batch concatenation order, the final
``scale_noise(multiplier, normalized=True)``, and add_to_latent repeat.

Both sides draw from the SAME injected deterministic "noise" sequence (a
custom-noise stub returning precomputed arrays), so torch-vs-JAX RNG
differences are removed and the comparison isolates the node machinery.
"""

import sys
import types

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

from sonar_tpu.api import noisy_latent_like
from sonar_tpu.noise.base import NoiseItem

SHAPE = (2, 4, 8, 8)
SIGMA_MAX = 14.614643096923828  # SD1.5-style model sigma_max


def _draws(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n,) + SHAPE).astype(np.float32) * 1.7 + 0.2


class _RefFixedNoise:
    """Reference-side custom_noise_opt stub: make_noise_sampler returns a
    closure yielding the precomputed draws in order."""

    def __init__(self, draws):
        self.draws = draws

    def make_noise_sampler(self, x, *, sigma_min=None, sigma_max=None,
                           seed=None, cpu=True, normalized=True):
        it = iter(self.draws)
        return lambda sigma, sigma_next: torch.from_numpy(next(it).copy())


class _OurFixedNoise(NoiseItem):
    """Our-side custom_noise item: a draw counter in state indexes the same
    precomputed stack."""

    def init_state(self, ctx, key):
        return jnp.asarray(0, jnp.int32)

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        return jnp.asarray(self.draws)[state], state + 1


def _ref_model(scale_factor=0.13025):
    return types.SimpleNamespace(
        latent_format=types.SimpleNamespace(scale_factor=scale_factor),
        model_sampling=types.SimpleNamespace(
            sigma_max=torch.tensor(SIGMA_MAX)),
    )


class _OurMS:
    sigma_max = SIGMA_MAX


CASES = {
    "max_denoise": dict(sigmas=[SIGMA_MAX, 8.0, 2.0, 0.0], repeat=2,
                        add=True),
    "max_denoise_above": dict(sigmas=[20.0, 5.0, 0.0], repeat=1, add=False),
    "mid_schedule": dict(sigmas=[6.5, 3.0, 0.5, 0.0], repeat=1, add=True),
    "single_sigma": dict(sigmas=[4.2], repeat=2, add=False),
    "no_sigmas": dict(sigmas=None, repeat=3, add=True, multiplier=1.3),
    "multiplier_stack": dict(sigmas=[6.5, 1.0, 0.0], repeat=1, add=False,
                             multiplier=0.7),
}


@pytest.mark.parametrize("case", sorted(CASES), ids=sorted(CASES))
def test_noisy_latent_like_oracle(case):
    cfg = CASES[case]
    repeat, add = cfg["repeat"], cfg["add"]
    multiplier = cfg.get("multiplier", 1.0)
    scale_factor = 0.13025
    rng = np.random.default_rng(99)
    latent = rng.standard_normal(SHAPE).astype(np.float32)
    draws = _draws(repeat, seed=7)

    kw = dict(multiplier=multiplier, add_to_latent=add, repeat_batch=repeat)
    if cfg["sigmas"] is not None:
        sig = np.asarray(cfg["sigmas"], np.float32)
        (ref_out,) = ref_misc.NoisyLatentLikeNode.go(
            noise_type="gaussian", seed=42,
            latent={"samples": torch.from_numpy(latent.copy())},
            custom_noise_opt=_RefFixedNoise(draws),
            mul_by_sigmas_opt=torch.from_numpy(sig.copy()),
            model_opt=_ref_model(scale_factor), **kw)
        got = noisy_latent_like(
            jnp.asarray(latent), seed=42, custom_noise=_OurFixedNoise(draws=draws),
            mul_by_sigmas=jnp.asarray(sig), model_sampling=_OurMS(),
            latent_scale_factor=scale_factor, **kw)
    else:
        (ref_out,) = ref_misc.NoisyLatentLikeNode.go(
            noise_type="gaussian", seed=42,
            latent={"samples": torch.from_numpy(latent.copy())},
            custom_noise_opt=_RefFixedNoise(draws), **kw)
        got = noisy_latent_like(
            jnp.asarray(latent), seed=42, custom_noise=_OurFixedNoise(draws=draws),
            **kw)

    want = ref_out["samples"].numpy()
    assert want.shape == tuple(np.asarray(got).shape)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-5, atol=3e-6,
                               err_msg=case)


def test_noisy_latent_like_requires_model():
    with pytest.raises(ValueError):
        noisy_latent_like(jnp.zeros(SHAPE), seed=0,
                          custom_noise=_OurFixedNoise(draws=_draws(1)),
                          mul_by_sigmas=jnp.asarray([1.0, 0.0]))
    with pytest.raises(ValueError):
        ref_misc.NoisyLatentLikeNode.go(
            noise_type="gaussian", seed=0,
            latent={"samples": torch.zeros(SHAPE)},
            custom_noise_opt=_RefFixedNoise(_draws(1)),
            mul_by_sigmas_opt=torch.tensor([1.0, 0.0]))
