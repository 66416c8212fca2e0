"""CFG-side oracles vs the live reference: the FreeU frequency filter
(rfft2·filter·irfft2, py/nodes/freeu_extreme.py:10-29) and the advanced
latent operation (multipliers + blend + sigma window incl. the inverted
output_multiplier quirk, py/latent_ops.py:61-106). Plus 5D (video) noise
statistics for the frames→channels generator family (SURVEY §5.7)."""

import numpy as np
import pytest

from tests._reference_loader import load_reference

ref_pkg = load_reference()
pytestmark = pytest.mark.skipif(
    ref_pkg is None, reason="reference tree not available")

if ref_pkg is not None:
    import sys

    import torch

    ref_frux = sys.modules["sonar_reference.py.nodes.freeu_extreme"]
    ref_pn = sys.modules["sonar_reference.py.nodes.powernoise"]
    ref_lo = sys.modules["sonar_reference.py.latent_ops"]
    ref_noise = sys.modules["sonar_reference.py.noise"]

import jax.numpy as jnp

from sonar_tpu.cfg.freeu import ffilter as our_ffilter
from sonar_tpu.cfg.latent_ops import SonarLatentOperationAdvanced
from sonar_tpu.noise import get_noise_item, make_noise_sampler
from sonar_tpu.noise.power import PowerFilter


def _rand(shape, seed=0):
    return (np.random.default_rng(seed).standard_normal(shape) * 2.0
            ).astype(np.float32)


def test_freeu_ffilter_oracle():
    x = _rand((1, 8, 16, 16), seed=1)
    for kwargs, nf in (
        ({"alpha": 0.4}, 1.0),
        ({"min_freq": 0.1, "max_freq": 0.5, "rel_bw": 0.2}, 0.7),
    ):
        # cfg_idx + filter_cache must be supplied: the reference's no-cache
        # path reads filter_rfft before assignment (freeu_extreme.py:12-15)
        want = ref_frux.ffilter(
            torch.tensor(x.copy()), ref_pn.PowerFilter(**kwargs),
            normalization_factor=nf, cfg_idx=0, filter_cache={}).numpy()
        got = np.asarray(our_ffilter(jnp.asarray(x), PowerFilter(**kwargs),
                                     normalization_factor=nf))
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


@pytest.mark.parametrize("sigma,in_window", [(2.0, True), (20.0, False)])
def test_latent_operation_advanced_oracle(sigma, in_window):
    x = _rand((1, 4, 8, 8), seed=2)
    double = lambda latent=None, **kw: latent * 2.0  # a plain latent op
    kw = dict(blend_mode="lerp", blend_strength=0.7, input_multiplier=1.5,
              output_multiplier=2.0, difference_multiplier=0.5,
              start_sigma=10.0, end_sigma=0.5)
    ref_op = ref_lo.SonarLatentOperationAdvanced(
        ops=(double,), op_alt=None, **kw)
    want = ref_op(torch.tensor(x.copy()), sigma=sigma).numpy()
    our_op = SonarLatentOperationAdvanced(ops=(double,), **kw)
    got = np.asarray(our_op(jnp.asarray(x), sigma=sigma))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
    if in_window:
        # the inverted output_multiplier quirk must be live: with
        # strict_reference_compat=False the "fixed" result differs
        fixed = SonarLatentOperationAdvanced(
            ops=(double,), strict_reference_compat=False, **kw)
        assert not np.allclose(np.asarray(fixed(jnp.asarray(x), sigma=sigma)),
                               want)


@pytest.mark.parametrize("name", ["gaussian", "pyramid", "highres_pyramid"])
def test_noise_5d_statistics_match_reference(name):
    shape = (2, 4, 3, 16, 16)  # (B, C, F, H, W)
    x = torch.zeros(shape)
    ns = ref_noise.get_noise_sampler(name, x, 0.03, 14.6, seed=7, cpu=True,
                                     normalized=True)
    want = np.stack([ns(torch.tensor(1.0), torch.tensor(0.9)).numpy()
                     for _ in range(6)])
    fn, state = make_noise_sampler(get_noise_item(name), shape, seed=7,
                                   sigma_min=0.03, sigma_max=14.6,
                                   normalized=True)
    outs = []
    for _ in range(6):
        o, state = fn(state, jnp.asarray(1.0), jnp.asarray(0.9))
        outs.append(np.asarray(o))
    got = np.stack(outs)
    assert got.shape == want.shape
    assert abs(got.std() / want.std() - 1.0) < 0.1
    assert abs(got.mean() - want.mean()) < 0.05
    # per-frame energy balance must match (frames→channels fold fidelity);
    # stacked draws have shape (N, B, C, F, H, W) → frame axis 3
    ref_fr = (want**2).mean(axis=(0, 1, 2, 4, 5))
    our_fr = (got**2).mean(axis=(0, 1, 2, 4, 5))
    np.testing.assert_allclose(our_fr, ref_fr, rtol=0.25)
