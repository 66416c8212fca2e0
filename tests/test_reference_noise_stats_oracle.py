"""Per-noise-type statistical oracle vs the LIVE reference generators —
the BASELINE fidelity criterion: "matching power-spectrum/mean/std
statistics per noise type" (BASELINE.md). For every registry noise type the
reference's torch generator and this framework's generator each draw a
batch; their global std, mean, and radial power-spectrum band fractions
must agree within sampling tolerance.

Types whose reference implementation needs a stubbed-out dependency
(torchsde brownian) are excluded; everything else in the 38-name registry
is swept.
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

import jax.numpy as jnp

from sonar_tpu.noise import get_noise_item, make_noise_sampler
from sonar_tpu.noise.presets import noise_type_names

SHAPE = (4, 4, 32, 32)
DRAWS = 8
SIGMA, SIGMA_NEXT = 1.0, 0.9
SIGMA_MIN, SIGMA_MAX = 0.03, 14.6

# brownian: the reference delegates to comfy's torchsde BrownianTree (a stub
# here); ours is oracle-tested for bridge consistency in test_noise_generators
_SKIP = {"brownian"}

# spectra are estimates from finite draws; spatially exotic types get wider
# band tolerance
_BAND_TOL = {"collatz": 0.12, "voronoi_fuzz": 0.12, "voronoi_mix": 0.1,
             "pyramid_old": 0.1, "pyramid_old_area": 0.1,
             "pyramid_old_bislerp": 0.1, "pyramid_bislerp": 0.08}
_STD_TOL = {"collatz": 0.35, "green_test": 0.25, "rainbow_mild": 0.25,
            "rainbow_intense": 0.25}
# voronoi_fuzz raw diff2 at this shape has |mean| sitting EXACTLY on the
# dead-band threshold 2.5/sqrt(numel): both implementations flip between
# centering and not depending on their own RNG draw, so a grand-mean
# comparison is meaningless (verified against the live reference; see the
# scale_noise dead-band, py/utils.py:100-104)
_SKIP_MEAN = {"voronoi_fuzz"}


def _names():
    if ref_pkg is None:
        return []
    return [n for n in noise_type_names(None) if n not in _SKIP]


def _radial_band_fractions(batch: np.ndarray) -> np.ndarray:
    """Energy fractions in 3 radial-frequency bands, averaged over draws."""
    spec = np.abs(np.fft.fft2(batch.astype(np.float64), axes=(-2, -1))) ** 2
    h, w = batch.shape[-2:]
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    r = np.sqrt(fy**2 + fx**2) / np.sqrt(0.5)
    bands = []
    for lo, hi in ((0.0, 0.33), (0.33, 0.66), (0.66, 1.01)):
        mask = (r >= lo) & (r < hi)
        bands.append(spec[..., mask].sum())
    bands = np.asarray(bands)
    return bands / bands.sum()


def _draw_reference(name: str) -> np.ndarray:
    # the reference draws from torch's GLOBAL RNG (e.g. pyramid's random
    # per-iteration resize factors, py/noise_generation.py:626-630), so its
    # stream depends on whatever ran earlier in this process; pin it or the
    # spectral comparison is order-dependent across the suite
    torch.manual_seed(1234)
    x = torch.zeros(SHAPE)
    ns = ref_noise.get_noise_sampler(
        name, x, SIGMA_MIN, SIGMA_MAX, seed=1234, cpu=True, normalized=True)
    outs = [ns(torch.tensor(SIGMA), torch.tensor(SIGMA_NEXT)).numpy()
            for _ in range(DRAWS)]
    return np.stack(outs)


def _draw_ours(name: str) -> np.ndarray:
    fn, state = make_noise_sampler(get_noise_item(name), SHAPE, seed=1234,
                                   sigma_min=SIGMA_MIN, sigma_max=SIGMA_MAX,
                                   normalized=True)
    outs = []
    for _ in range(DRAWS):
        noise, state = fn(state, jnp.asarray(SIGMA), jnp.asarray(SIGMA_NEXT))
        outs.append(np.asarray(noise))
    return np.stack(outs)


@pytest.mark.parametrize("name", _names())
def test_noise_type_statistics_match_reference(name):
    want = _draw_reference(name)
    got = _draw_ours(name)
    assert got.shape == want.shape

    # normalized draws: unit-ish std both sides, matching ratio
    std_tol = _STD_TOL.get(name, 0.15)
    ref_std, our_std = want.std(), got.std()
    assert abs(our_std / ref_std - 1.0) < std_tol, (
        f"{name}: std {our_std:.4f} vs reference {ref_std:.4f}")
    if name not in _SKIP_MEAN:
        assert abs(got.mean() - want.mean()) < 0.1, (
            f"{name}: mean {got.mean():.4f} vs reference {want.mean():.4f}")

    band_tol = _BAND_TOL.get(name, 0.06)
    ref_bands = _radial_band_fractions(want)
    our_bands = _radial_band_fractions(got)
    assert np.abs(ref_bands - our_bands).max() < band_tol, (
        f"{name}: spectrum bands {our_bands} vs reference {ref_bands}")
