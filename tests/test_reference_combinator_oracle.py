"""Combinator-algebra oracle vs the LIVE reference (py/noise.py): every
wrapper is deterministic given its children's draws, so both sides consume
identical injected child streams and the outputs must match numerically —
chain Σ|factor| + rescale + normalize-once, scheduled windows, composite
masks, blends, quantile/ripple/normalize-to-scale/pattern-break filters,
per-dim and per-channel fan-outs.
"""

import numpy as np
import pytest

from tests._reference_loader import load_reference

ref_pkg = load_reference()
pytestmark = pytest.mark.skipif(
    ref_pkg is None, reason="reference tree not available")

if ref_pkg is not None:
    import sys

    import torch

    ref_noise = sys.modules["sonar_reference.py.noise"]
    ref_utils = sys.modules["sonar_reference.py.utils"]

    class RefStreamItem(ref_noise.CustomNoiseItemBase):
        """Leaf item yielding a fixed stream (reference side)."""

        def make_noise_sampler(self, x, sigma_min=None, sigma_max=None,
                               seed=None, cpu=True, normalized=True, **kwargs):
            stream = self.stream
            counter = {"i": 0}

            def ns(_s, _sn):
                v = torch.tensor(stream[counter["i"] % len(stream)]).clone()
                counter["i"] += 1
                return ref_utils.scale_noise(v, self.factor,
                                             normalized=normalized)

            return ns


import jax.numpy as jnp

from sonar_tpu.noise import (
    ChannelNoise,
    CompositeNoise,
    NoiseChain,
    NormalizeToScaleNoise,
    PatternBreakNoise,
    PerDimNoise,
    QuantileFilteredNoise,
    RippleFilteredNoise,
    ScheduledNoise,
    make_noise_sampler,
)
from sonar_tpu.noise.base import NoiseItem

SHAPE = (2, 3, 8, 8)
DRAWS = 3


class OurStreamItem(NoiseItem):
    """Leaf item yielding the same fixed stream (framework side)."""

    def init_state(self, ctx, key):
        return {"i": jnp.zeros((), jnp.int32)}

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        stream = jnp.asarray(self.stream)
        v = stream[state["i"] % stream.shape[0]].astype(ctx.dtype)
        if v.shape != tuple(ctx.shape):
            v = jnp.broadcast_to(
                v.reshape((1,) * (len(ctx.shape) - v.ndim) + v.shape), ctx.shape)
        return (self.apply_factor_normalize(v, normalized=normalized),
                {"i": state["i"] + 1})


def _stream(n, seed, shape=SHAPE, scale=2.0, offset=0.3):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((n,) + shape) * scale + offset).astype(np.float32)


def _pair(seed, factor=1.0, n=DRAWS + 4, shape=SHAPE):
    s = _stream(n, seed, shape)
    return (RefStreamItem(factor, stream=s),
            OurStreamItem(factor, stream=s))


def _run_ref(item_or_chain, sigmas=((1.0, 0.9),) * DRAWS, normalized=True):
    ns = item_or_chain.make_noise_sampler(
        torch.zeros(SHAPE), 0.03, 14.6, seed=0, cpu=True, normalized=normalized)
    return np.stack([
        ns(torch.tensor(s), torch.tensor(sn)).numpy() for s, sn in sigmas
    ])


def _run_ours(item, sigmas=((1.0, 0.9),) * DRAWS, normalized=True):
    # the reference side builds from x = zeros(SHAPE); expose the same
    # exemplar so ctx.ref-consulting wrappers (GuidedNoise euler shift)
    # see identical inputs
    fn, state = make_noise_sampler(item, SHAPE, seed=0, sigma_min=0.03,
                                   sigma_max=14.6, normalized=normalized,
                                   ref_latent=jnp.zeros(SHAPE))
    outs = []
    for s, sn in sigmas:
        o, state = fn(state, jnp.asarray(s), jnp.asarray(sn))
        outs.append(np.asarray(o))
    return np.stack(outs)


def _check(ref_obj, our_obj, sigmas=((1.0, 0.9),) * DRAWS, tol=3e-5):
    want = _run_ref(ref_obj, sigmas)
    got = _run_ours(our_obj, sigmas)
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_chain_factor_rescale_oracle():
    pairs = [_pair(1, 1.0), _pair(2, 3.0), _pair(3, -0.5)]
    ref_chain = ref_noise.CustomNoiseChain([p[0] for p in pairs]).rescaled(2.0)
    our_chain = NoiseChain([p[1] for p in pairs]).rescaled(2.0)
    _check(ref_chain, our_chain)


def test_scheduled_window_oracle():
    (ra, oa), (rb, ob) = _pair(4), _pair(5)
    ref = ref_noise.ScheduledNoise(
        1.0, noise=ref_noise.CustomNoiseChain([ra]), start_sigma=5.0,
        end_sigma=0.5, normalize=None,
        fallback_noise=ref_noise.CustomNoiseChain([rb]))
    ours = ScheduledNoise(
        1.0, noise=NoiseChain([oa]), start_sigma=5.0, end_sigma=0.5,
        normalize=None, fallback_noise=NoiseChain([ob]))
    sigmas = ((4.0, 3.0), (0.2, 0.1), (6.0, 5.5))  # in, below, above window
    _check(ref, ours, sigmas=sigmas)


def test_composite_mask_oracle():
    (rd, od), (rs, os_) = _pair(6), _pair(7)
    mask = (np.random.default_rng(8).random((8, 8)) > 0.5).astype(np.float32)
    ref = ref_noise.CompositeNoise(
        1.0, dst_noise=ref_noise.CustomNoiseChain([rd]),
        src_noise=ref_noise.CustomNoiseChain([rs]),
        normalize_dst=None, normalize_src=None, normalize_result=None,
        mask=torch.tensor(mask))
    ours = CompositeNoise(
        1.0, dst_noise=NoiseChain([od]), src_noise=NoiseChain([os_]),
        mask=jnp.asarray(mask))
    _check(ref, ours)


def test_quantile_filtered_oracle():
    ra, oa = _pair(9)
    kw = dict(quantile=0.85, norm_dim=1, norm_flatten=True, norm_fac=1.0,
              norm_pow=0.5, strategy="tanh", normalize_noise=False,
              normalize=None)
    ref = ref_noise.QuantileFilteredNoise(
        1.0, noise=ref_noise.CustomNoiseChain([ra]), **kw)
    ours = QuantileFilteredNoise(1.0, noise=NoiseChain([oa]), **kw)
    _check(ref, ours)


def test_ripple_filtered_oracle():
    ra, oa = _pair(10)
    kw = dict(dim=-1, flatten=False, mode="sin", amplitude_high=0.3,
              amplitude_low=0.2, offset=0.1, period=2.0, roll=0.5,
              normalize_noise=False, normalize=None)
    ref = ref_noise.RippleFilteredNoise(
        1.0, noise=ref_noise.CustomNoiseChain([ra]), **kw)
    ours = RippleFilteredNoise(1.0, noise=NoiseChain([oa]), **kw)
    _check(ref, ours)  # 3 draws exercise the roll counter


def test_normalize_to_scale_wrapper_oracle():
    ra, oa = _pair(11)
    kw = dict(min_negative_value=-2.0, max_negative_value=0.0,
              min_positive_value=0.0, max_positive_value=3.0, mode="simple",
              dims=(), std_dims=None, std_multiplier=0.0, mean_dims=None,
              mean_multiplier=0.0, normalize_noise=False, normalize=None)
    ref = ref_noise.NormalizeToScaleNoise(
        1.0, noise=ref_noise.CustomNoiseChain([ra]), **kw)
    ours = NormalizeToScaleNoise(1.0, noise=NoiseChain([oa]), **kw)
    _check(ref, ours)


def test_pattern_break_oracle():
    ra, oa = _pair(12)
    ref = ref_noise.PatternBreakNoise(
        1.0, noise=ref_noise.CustomNoiseChain([ra]), detail_level=0.5,
        percentage=0.6, restore_scale=True, blend_function=torch.lerp)
    ours = PatternBreakNoise(1.0, noise=NoiseChain([oa]), detail_level=0.5,
                             percentage=0.6, restore_scale=True,
                             blend_function=lambda a, b, t: a + (b - a) * t)
    want = _run_ref(ref)
    got = _run_ours(ours)
    close = np.isclose(got, want, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.97  # fmod(|x|*1e6) bucket-edge stragglers


def test_channel_noise_oracle():
    pairs = [_pair(13, n=DRAWS * 4,
                   shape=(SHAPE[0], 1) + SHAPE[2:]) for _ in range(2)]
    ref = ref_noise.ChannelNoise(
        1.0, noise=ref_noise.CustomNoiseChain([p[0] for p in pairs]),
        insufficient_channels_mode="wrap", normalize=None)
    ours = ChannelNoise(
        1.0, noise=NoiseChain([p[1] for p in pairs]),
        insufficient_channels_mode="wrap", normalize=None)
    _check(ref, ours)


def test_per_dim_oracle():
    n = DRAWS * (SHAPE[0] + 2)
    ra, oa = _pair(14, n=n)
    ref = ref_noise.PerDimNoise(
        1.0, noise=ref_noise.CustomNoiseChain([ra]), dim=0, offset=0,
        shrink_dim=False, chunk_size=1, normalize_noise=False, normalize=None)
    ours = PerDimNoise(1.0, noise=NoiseChain([oa]), dim=0, shrink_dim=False,
                       chunk_size=1, normalize_noise=False, normalize=None)
    _check(ref, ours)
