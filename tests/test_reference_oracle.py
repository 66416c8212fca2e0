"""Live-reference oracle tests: the actual reference implementation
(/root/reference, loaded with ComfyUI stubs — tests/_reference_loader.py)
runs as the ground truth and this framework's deterministic math must match
it numerically. Nothing is copied; the reference executes at test time.

Covers: scale_noise (dead-band normalizer), quantile_normalize across every
strategy, normalize_to_scale(_adv), pattern_break, the PowerFilter gain
surface + normalization, and the channel-correlation mixer.
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

    ref_utils = sys.modules["sonar_reference.py.utils"]
    ref_pn = sys.modules["sonar_reference.py.nodes.powernoise"]

import jax.numpy as jnp

from sonar_tpu.core.normalize import (
    QUANTILE_HANDLERS,
    normalize_to_scale,
    normalize_to_scale_adv,
    quantile_normalize,
    scale_noise,
)
from sonar_tpu.noise.power import PowerFilter, build_channel_mixer
from sonar_tpu.utils.misc import pattern_break


def _rand(shape, seed=0, scale=3.0, offset=0.5):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale + offset).astype(np.float32)


@pytest.mark.parametrize("factor", [1.0, 0.7])
@pytest.mark.parametrize("normalized", [True, False])
@pytest.mark.parametrize("dims", [None, (-3, -2, -1)])
def test_scale_noise_oracle(factor, normalized, dims):
    x = _rand((2, 4, 8, 8), seed=1)
    want = ref_utils.scale_noise(torch.tensor(x.copy()), factor,
                                 normalized=normalized,
                                 normalize_dims=dims).numpy()
    got = np.asarray(scale_noise(jnp.asarray(x), factor,
                                 normalized=normalized, normalize_dims=dims))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_scale_noise_dead_band_oracle():
    """Inputs inside the 2.5/sqrt(N) significance dead-band must pass
    through un-normalized, exactly as the reference decides."""
    rng = np.random.default_rng(2)
    base = rng.standard_normal((1, 4, 16, 16)).astype(np.float32)
    base = (base - base.mean()) / base.std(ddof=1)
    for eps in (0.0, 1e-4, 0.05):
        x = (base + eps).astype(np.float32)
        want = ref_utils.scale_noise(torch.tensor(x.copy())).numpy()
        got = np.asarray(scale_noise(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def _ref_strategies():
    return sorted(ref_utils.quantile_handlers) if ref_pkg is not None else []


def test_strategy_registries_match():
    assert set(_ref_strategies()) == set(QUANTILE_HANDLERS)


@pytest.mark.parametrize("strategy", _ref_strategies())
def test_quantile_normalize_strategy_oracle(strategy):
    x = _rand((2, 4, 8, 8), seed=3, scale=2.0, offset=0.0)
    for quantile, flatten in ((0.85, True), (0.85, False), (-0.8, True)):
        want = ref_utils.quantile_normalize(
            torch.tensor(x.copy()), quantile=quantile, dim=1, flatten=flatten,
            strategy=strategy).numpy()
        got = np.asarray(quantile_normalize(
            jnp.asarray(x), quantile=quantile, dim=1, flatten=flatten,
            strategy=strategy))
        # wave strategies amplify the fp32 quantile-interpolation difference
        # through sin/cos multipliers → ~1e-5 worst case
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=2e-5,
                                   err_msg=f"{strategy} q={quantile}")


def test_quantile_normalize_list_oracle():
    x = _rand((1, 4, 8, 8), seed=4, scale=2.0, offset=0.0)
    want = ref_utils.quantile_normalize(
        torch.tensor(x.copy()), quantile=[0.9, 0.8], dim=1,
        strategy="tanh_outliers").numpy()
    got = np.asarray(quantile_normalize(
        jnp.asarray(x), quantile=[0.9, 0.8], dim=1,
        strategy="tanh_outliers"))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-6)


@pytest.mark.parametrize("dim", [(-3, -2, -1), ()])
def test_normalize_to_scale_oracle(dim):
    x = _rand((2, 4, 8, 8), seed=5)
    want = ref_utils.normalize_to_scale(
        torch.tensor(x.copy()), -2.0, 3.0, dim=dim if dim else ()).numpy()
    got = np.asarray(normalize_to_scale(jnp.asarray(x), -2.0, 3.0, dim=dim))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_normalize_to_scale_adv_oracle():
    x = _rand((1, 4, 8, 8), seed=6, scale=2.0, offset=0.0)
    kwargs = dict(min_pos=0.1, max_pos=2.5, min_neg=-3.0, max_neg=-0.2)
    want = ref_utils.normalize_to_scale_adv(
        torch.tensor(x.copy()), dim=(), **kwargs).numpy()
    got = np.asarray(normalize_to_scale_adv(jnp.asarray(x), dim=(), **kwargs))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("detail,pct,restore", [(0.0, 0.5, True),
                                                (1.5, 1.0, False)])
def test_pattern_break_oracle(detail, pct, restore):
    x = _rand((1, 4, 8, 8), seed=7)
    want = ref_utils.pattern_break(
        torch.tensor(x.copy()), percentage=pct, detail_level=detail,
        restore_scale=restore).numpy()
    got = np.asarray(pattern_break(
        jnp.asarray(x), percentage=pct, detail_level=detail,
        restore_scale=restore,
        blend_function=lambda a, b, t: a + (b - a) * t))
    # fmod of |x|*1e6 amplifies float error catastrophically for a tiny
    # fraction of elements near bucket edges — compare the bulk exactly and
    # bound the stragglers.
    close = np.isclose(got, want, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.97
    assert np.abs(got[close] - want[close]).max() < 1e-2


@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"alpha": 0.5, "min_freq": 0.05},
        {"min_freq": 0.1, "max_freq": 0.4, "stretch": 2.0, "rotate": 30.0,
         "pnorm": 4.0, "rel_bw": 0.25},
        {"alpha": -0.75, "oversample": 2, "scale": 1.5},
    ],
    ids=["default", "alpha", "band", "neg-alpha"],
)
def test_power_filter_surface_oracle(kwargs):
    shape = (1, 1, 32, 48)
    # the reference returns (1, 1, H, hbins); ours returns the bare surface
    want = np.squeeze(ref_pn.PowerFilter(**kwargs).build(shape).numpy())
    got = np.asarray(PowerFilter(**kwargs).build(shape), np.float32)
    assert got.shape == tuple(want.shape)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_power_filter_compose_and_normalize_oracle():
    shape = (1, 1, 32, 32)
    ref_f = ref_pn.PowerFilter(
        alpha=0.3, compose_with=ref_pn.PowerFilter(min_freq=0.2, max_freq=0.5),
        compose_mode="max")
    our_f = PowerFilter(alpha=0.3,
                        compose_with=PowerFilter(min_freq=0.2, max_freq=0.5),
                        compose_mode="max")
    want = np.squeeze(ref_pn.PowerFilter.normalize(
        ref_f.build(shape), shape, mix=0.7, normalization_factor=0.9).numpy())
    got = np.asarray(PowerFilter.normalize(
        our_f.build(shape), shape, mix=0.7, normalization_factor=0.9),
        np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_modulation_functions_oracle():
    """ModulatedNoise's three modulation transforms are deterministic given
    (ref, noise) — run the reference staticmethods as oracles
    (py/noise.py:859-1018)."""
    from sonar_tpu.noise.combinators import (
        _frequency_modulate,
        _intensity_modulate,
        _spectral_modulate,
    )

    ref_noise_mod = sys.modules["sonar_reference.py.noise"].ModulatedNoise
    x = _rand((1, 4, 16, 16), seed=8)
    nz = _rand((1, 4, 16, 16), seed=9, scale=1.0, offset=0.0)
    sigma_up = 0.8
    dims = (-2, -1)
    pairs = [
        (_intensity_modulate, ref_noise_mod.intensity_based_multiplicative_noise,
         2e-4),
        (_frequency_modulate, ref_noise_mod.frequency_based_noise, 5e-4),
        (_spectral_modulate, ref_noise_mod.spectral_modulate_noise, 5e-3),
    ]
    for ours, theirs, atol in pairs:
        want = theirs(torch.tensor(x.copy()), torch.tensor(nz.copy()), 1.0,
                      torch.tensor(sigma_up), 2.0, dims).numpy()
        got = np.asarray(ours(jnp.asarray(x), jnp.asarray(nz), 1.0,
                              jnp.asarray(sigma_up), 2.0, dims))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=atol,
                                   err_msg=theirs.__name__)


def test_guidance_oracle():
    """guidance_shift / guidance_linear / guidance_euler vs the reference
    mixin (py/sonar.py:323-411), with real to_d math in the stub."""
    from sonar_tpu.core.blend import BLENDING_MODES
    from sonar_tpu.samplers.guidance import (
        guidance_euler,
        guidance_linear,
        guidance_shift,
    )

    mixin = sys.modules["sonar_reference.py.sonar"].SonarGuidanceMixin
    x = _rand((1, 4, 8, 8), seed=10)
    ref = _rand((1, 4, 8, 8), seed=11, scale=1.0, offset=0.0)
    want = mixin.guidance_shift(torch.tensor(x.copy()),
                                torch.tensor(ref.copy())).numpy()
    got = np.asarray(guidance_shift(jnp.asarray(x), jnp.asarray(ref)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)

    want = mixin.guidance_linear(torch.tensor(x.copy()),
                                 torch.tensor(ref.copy()), 0.3).numpy()
    got = np.asarray(guidance_linear(jnp.asarray(x), jnp.asarray(ref), 0.3,
                                     blend=BLENDING_MODES["lerp"]))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)

    denoised = _rand((1, 4, 8, 8), seed=12)
    want = mixin.guidance_euler(
        torch.tensor(2.0), torch.tensor(1.0), torch.tensor(x.copy()),
        torch.tensor(denoised.copy()), torch.tensor(ref.copy()), 0.4).numpy()
    got = np.asarray(guidance_euler(
        jnp.asarray(2.0), jnp.asarray(1.0), jnp.asarray(x),
        jnp.asarray(denoised), jnp.asarray(ref), 0.4,
        blend=BLENDING_MODES["lerp"]))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_channel_mixer_oracle():
    corr = torch.tensor([1.0, 0.5, 0.2, 0.7, 0.1, 0.4])
    want = ref_pn.ChannelMixer(4, 0.5, corr).mixer.numpy()
    got = np.asarray(build_channel_mixer(4, 0.5, [1.0, 0.5, 0.2, 0.7, 0.1, 0.4]),
                     np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("size", [(32, 32), (32, 48)], ids=["sq", "rect"])
def test_power_filter_preview_oracle(size):
    """The preview render pipeline (PowerFilter.preview raw path,
    py/nodes/powernoise.py:268-294): rfft->fft2 unfold, ortho irfft2
    kernel + fftshift roll, tanh gain mapping, uint8 assembly."""
    from sonar_tpu.api import preview_power_filter

    kwargs = dict(alpha=0.4, min_freq=0.05, max_freq=0.45, rel_bw=0.3)
    f_img, k_img = ref_pn.PowerFilter(**kwargs).preview(
        size=size, mix=0.8, normalization_factor=0.9, raw=True,
        kernel_gain=0.4, filter_gain=0.25)
    want = (torch.cat((f_img, k_img), dim=-1)
            .clamp(0, 255).to(torch.uint8)[0, 0].numpy())
    got = preview_power_filter(
        PowerFilter(**kwargs), size=size, mix=0.8,
        normalization_factor=0.9, kernel_gain=0.4, filter_gain=0.25)
    assert got.shape == want.shape
    # uint8 quantization makes off-by-one the only acceptable fp slack
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_blending_modes_oracle():
    """The reference's core BLENDING_MODES table (py/utils.py:17-21);
    the rest of our table is native+ surface from the bleh extension."""
    from sonar_tpu.core.blend import BLENDING_MODES

    a = _rand((2, 4, 8, 8), seed=20)
    b = _rand((2, 4, 8, 8), seed=21, scale=2.0, offset=-0.3)
    for mode in ("lerp", "inject", "subtract_b"):
        want = ref_utils.BLENDING_MODES[mode](
            torch.tensor(a.copy()), torch.tensor(b.copy()),
            torch.tensor(0.37)).numpy()
        got = np.asarray(BLENDING_MODES[mode](jnp.asarray(a), jnp.asarray(b),
                                              jnp.asarray(0.37)))
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-7,
                                   err_msg=mode)
