"""Randomized composition-TREE fuzz vs the LIVE reference: seeded random
trees of combinators (chains with factors/rescale, scheduled windows,
composite masks, quantile/ripple/normalize-to-scale filters, blended
scalar mixes, guided linear/euler pulls, pattern-break leaves) built
identically on both sides over matched injected leaf streams
(tests/test_reference_combinator_oracle.py plumbing) — any numeric
divergence isolates combinator machinery, independent of RNG.

Handpicked per-wrapper oracles pin each wrapper alone; this sweep pins
their *composition*: normalize-once propagation through nested chains,
state threading across wrappers, factor algebra at every level.
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

    from tests.test_reference_combinator_oracle import RefStreamItem

import jax.numpy as jnp

from sonar_tpu.noise import (
    BlendedNoise,
    CompositeNoise,
    GuidedNoise,
    NoiseChain,
    NormalizeToScaleNoise,
    PatternBreakNoise,
    QuantileFilteredNoise,
    RippleFilteredNoise,
    ScheduledNoise,
    make_noise_sampler,
)
from tests.test_reference_combinator_oracle import OurStreamItem

SHAPE = (2, 3, 8, 8)
DRAWS = 4
SIGMAS = ((6.0, 5.0), (3.0, 2.5), (1.0, 0.9), (0.2, 0.1))


def _leaf(rng):
    seed = int(rng.integers(1 << 16))
    factor = float(rng.choice([1.0, 0.5, 2.0, -1.0]))
    s = (np.random.default_rng(seed)
         .standard_normal((DRAWS + 4,) + SHAPE) * 2.0 + 0.3
         ).astype(np.float32)
    return RefStreamItem(factor, stream=s), OurStreamItem(factor, stream=s)


def _tree(rng, depth, info=None):
    """Matched (reference, ours) random subtree. ``info['loose']`` is set
    when the tree contains a pattern-break node (erfinv near the ±1 tails
    is ill-conditioned — the standalone oracle uses the same relaxation)."""
    if info is None:
        info = {}
    if depth <= 0 or rng.random() < 0.35:
        return _leaf(rng)
    kind = rng.choice(["chain", "scheduled", "composite", "quantile",
                       "ripple", "norm_scale", "blended", "guided",
                       "pattern"])
    if kind == "chain":
        pairs = [_tree(rng, depth - 1, info) for _ in range(int(rng.integers(1, 4)))]
        ref = ref_noise.CustomNoiseChain([p[0] for p in pairs])
        ours = NoiseChain([p[1] for p in pairs])
        if rng.random() < 0.5:
            rs = float(rng.uniform(0.5, 2.0))
            ref, ours = ref.rescaled(rs), ours.rescaled(rs)
        return ref, ours
    if kind == "scheduled":
        (rm, om), (rf, of) = _tree(rng, depth - 1, info), _tree(rng, depth - 1, info)
        start = float(rng.uniform(2.0, 8.0))
        end = float(rng.uniform(0.0, 1.0))
        ref = ref_noise.ScheduledNoise(
            1.0, noise=_ref_chain(rm), start_sigma=start, end_sigma=end,
            normalize=None, fallback_noise=_ref_chain(rf))
        ours = ScheduledNoise(1.0, noise=_our_chain(om), start_sigma=start,
                              end_sigma=end, normalize=None,
                              fallback_noise=_our_chain(of))
        return ref, ours
    if kind == "composite":
        (rd, od), (rs_, os_) = _tree(rng, depth - 1, info), _tree(rng, depth - 1, info)
        mask = (np.random.default_rng(int(rng.integers(1 << 16)))
                .random((8, 8)) > 0.5).astype(np.float32)
        ref = ref_noise.CompositeNoise(
            1.0, dst_noise=_ref_chain(rd), src_noise=_ref_chain(rs_),
            normalize_dst=None, normalize_src=None, normalize_result=None,
            mask=torch.tensor(mask))
        ours = CompositeNoise(1.0, dst_noise=_our_chain(od),
                              src_noise=_our_chain(os_),
                              mask=jnp.asarray(mask))
        return ref, ours
    if kind == "quantile":
        rc, oc = _tree(rng, depth - 1, info)
        kw = dict(quantile=float(rng.choice([0.75, 0.85, 0.95])),
                  norm_dim=1, norm_flatten=bool(rng.integers(2)),
                  norm_fac=1.0, norm_pow=float(rng.choice([0.5, 1.0])),
                  strategy=str(rng.choice(["clamp", "tanh", "sigmoid",
                                           "zero"])),
                  normalize_noise=False, normalize=None)
        return (ref_noise.QuantileFilteredNoise(1.0, noise=_ref_chain(rc), **kw),
                QuantileFilteredNoise(1.0, noise=_our_chain(oc), **kw))
    if kind == "ripple":
        rc, oc = _tree(rng, depth - 1, info)
        kw = dict(dim=int(rng.choice([-1, -2])), flatten=False,
                  mode=str(rng.choice(["sin", "cos"])),
                  amplitude_high=float(rng.uniform(0.1, 0.5)),
                  amplitude_low=float(rng.uniform(0.0, 0.3)),
                  offset=float(rng.uniform(-0.2, 0.2)),
                  period=float(rng.choice([1.0, 2.0, 3.0])),
                  roll=float(rng.choice([0.0, 0.5])),
                  normalize_noise=False, normalize=None)
        return (ref_noise.RippleFilteredNoise(1.0, noise=_ref_chain(rc), **kw),
                RippleFilteredNoise(1.0, noise=_our_chain(oc), **kw))
    if kind == "blended":
        (r1, o1), (r2, o2) = _tree(rng, depth - 1, info), _tree(rng, depth - 1, info)
        pct = float(rng.uniform(0.1, 0.9))
        ref = ref_noise.BlendedNoise(
            1.0, blend_function=torch.lerp, normalize=None,
            custom_noise_1=_ref_chain(r1), custom_noise_2=_ref_chain(r2),
            noise_2_percent=pct)
        ours = BlendedNoise(
            1.0, blend_function="lerp",
            custom_noise_1=_our_chain(o1), custom_noise_2=_our_chain(o2),
            noise_2_percent=pct)
        return ref, ours
    if kind == "guided":
        rc, oc = _tree(rng, depth - 1, info)
        gf = float(rng.uniform(0.1, 0.8))
        method = str(rng.choice(["linear", "euler"]))
        ref_latent = (np.random.default_rng(int(rng.integers(1 << 16)))
                      .standard_normal(SHAPE).astype(np.float32))
        ref = ref_noise.GuidedNoise(
            1.0, guidance_factor=gf, method=method,
            ref_latent=torch.from_numpy(ref_latent.copy()),
            noise=_ref_chain(rc),
            normalize_noise=None, normalize_result=None)
        ours = GuidedNoise(
            1.0, guidance_factor=gf, method=method,
            ref_latent=jnp.asarray(ref_latent), noise=_our_chain(oc))
        return ref, ours
    if kind == "pattern":
        # pattern_break hashes |x|*1e6 mod 11 — it amplifies reduction-order
        # ulps between torch and XLA into O(1e-2) output diffs, so it can
        # only be compared over a BIT-EXACT input: wrap a raw leaf stream
        # (like the standalone oracle) and relax the tree assert to the
        # same bucket-edge-straggler fraction check
        info["loose"] = True
        rc, oc = _leaf(rng)
        kw = dict(detail_level=float(rng.uniform(0.0, 1.0)),
                  percentage=float(rng.uniform(0.2, 0.9)),
                  restore_scale=bool(rng.integers(2)))
        ref = ref_noise.PatternBreakNoise(
            1.0, noise=_ref_chain(rc), blend_function=torch.lerp, **kw)
        ours = PatternBreakNoise(
            1.0, noise=_our_chain(oc),
            blend_function=lambda a, b, t: a + (b - a) * t, **kw)
        return ref, ours
    rc, oc = _tree(rng, depth - 1, info)
    kw = dict(min_negative_value=float(rng.uniform(-3.0, -1.0)),
              max_negative_value=0.0, min_positive_value=0.0,
              max_positive_value=float(rng.uniform(1.0, 3.0)),
              mode="simple", dims=(), std_dims=None, std_multiplier=0.0,
              mean_dims=None, mean_multiplier=0.0,
              normalize_noise=False, normalize=None)
    return (ref_noise.NormalizeToScaleNoise(1.0, noise=_ref_chain(rc), **kw),
            NormalizeToScaleNoise(1.0, noise=_our_chain(oc), **kw))


def _ref_chain(item):
    return (item if isinstance(item, ref_noise.CustomNoiseChain)
            else ref_noise.CustomNoiseChain([item]))


def _our_chain(item):
    return item if isinstance(item, NoiseChain) else NoiseChain([item])


@pytest.mark.parametrize("seed", range(24))
def test_random_tree_oracle(seed):
    rng = np.random.default_rng(9000 + seed)
    info = {"loose": False}
    ref_item, our_item = _tree(rng, 3, info)
    ref_chain, our_chain = _ref_chain(ref_item), _our_chain(our_item)

    ns = ref_chain.make_noise_sampler(torch.zeros(SHAPE), 0.03, 14.6, seed=0,
                                      cpu=True, normalized=True)
    want = np.stack([ns(torch.tensor(s), torch.tensor(sn)).numpy()
                     for s, sn in SIGMAS])

    fn, state = make_noise_sampler(our_chain, SHAPE, seed=0, sigma_min=0.03,
                                   sigma_max=14.6, normalized=True,
                                   ref_latent=jnp.zeros(SHAPE))
    outs = []
    for s, sn in SIGMAS:
        o, state = fn(state, jnp.asarray(s), jnp.asarray(sn))
        outs.append(np.asarray(o))
    got = np.stack(outs)

    scale = max(np.abs(want).max(), 1.0)
    if info["loose"]:
        # pattern-break trees: fmod bucket-edge stragglers (standalone
        # oracle uses the same fraction bound)
        close = np.isclose(got, want, rtol=1e-3, atol=1e-3 * scale)
        assert close.mean() > 0.95, f"tree seed {seed}: {close.mean():.4f}"
    else:
        np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5 * scale,
                                   err_msg=f"tree seed {seed}")
