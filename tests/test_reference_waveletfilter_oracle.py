"""WaveletFilteredNoise machinery vs the LIVE reference — unlocked by the
faithful pytorch_wavelets stub (see test_reference_wcfg_oracle): both
sides transform with this repo's DWT, identical injected base/high
tensors remove RNG, and the comparison isolates the yl/yh scale
expansion, high-band preblend + band-wise blending, and the two-step
inverse."""

import sys

import numpy as np
import pytest

from tests._reference_loader import load_reference

ref_pkg = load_reference()
pytestmark = pytest.mark.skipif(
    ref_pkg is None, reason="reference tree not available")

if ref_pkg is not None:
    import torch

    ref_gen = sys.modules["sonar_reference.py.noise_generation"]

import jax
import jax.numpy as jnp

from tests.test_reference_wcfg_oracle import _install_faithful_ptwav

from sonar_tpu.noise.base import NoiseCtx
from sonar_tpu.noise.wavelet import WaveletFilteredGenerator

SHAPE = (1, 4, 32, 32)


class _ConstNoise:
    def __init__(self, arr):
        self.arr = np.asarray(arr, np.float32)

    def check_dims(self, ctx):
        pass

    def init_state(self, ctx, key):
        return ()

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        return jnp.asarray(self.arr), state


def _run_pair(seed=0, **params):
    _install_faithful_ptwav()
    rng = np.random.default_rng(seed)
    base = rng.standard_normal(SHAPE).astype(np.float32)
    high = rng.standard_normal(SHAPE).astype(np.float32)
    use_high = params.pop("with_high", False)

    ours = WaveletFilteredGenerator(
        noise_sampler=_ConstNoise(base),
        noise_sampler_high=_ConstNoise(high) if use_high else None,
        **params)
    ctx = NoiseCtx(shape=SHAPE, dtype=jnp.float32, sigma_min=0.03,
                   sigma_max=14.6)
    got, _ = ours.generate(ctx, ours.init_state(ctx, jax.random.key(0)),
                           jax.random.key(1), None, None)

    x = torch.zeros(SHAPE)
    ref = ref_gen.WaveletFilteredNoiseGenerator(
        x, sigma_min=0.03, sigma_max=14.6, normalized=False,
        noise_sampler=lambda *a: torch.from_numpy(base.copy()),
        noise_sampler_high=(
            (lambda *a: torch.from_numpy(high.copy())) if use_high else None),
        **params)
    want = ref(torch.tensor(1.0), torch.tensor(0.9))
    return np.asarray(got), want.numpy()


CASES = [
    dict(wave="haar", level=3, yl_scale=2.0, yh_scales=0.5),
    dict(wave="db4", level=3, yl_scale=1.0,
         yh_scales=[2.0, [0.5, 1.5, 1.0], 3.0]),
    dict(wave="db4", level=4, yh_scales=[2.0, "fill"], yl_scale=0.25),
    dict(wave="db2", level=2, mode="symmetric", yl_scale=1.5,
         yh_scales=0.75),
    dict(wave="haar", level=3, two_step_inverse=True, yl_scale=2.0,
         yh_scales=0.5),
    dict(wave="haar", level=2, with_high=True, yl_blend_high=0.3,
         yh_blend_high=0.8),
    dict(wave="db2", level=3, with_high=True,
         preblend_yl_scale_high=1.5, preblend_yh_scales_high=0.5,
         preblend_yl_scale_low=0.8, preblend_yh_scales_low=1.2,
         yl_blend_high=0.5, yh_blend_high=0.5),
    dict(wave="db4", level=2, inv_wave="db2", yl_scale=1.0, yh_scales=2.0),
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_waveletfilter_machinery_matches_reference(case):
    params = dict(CASES[case])
    got, want = _run_pair(seed=case, **params)
    assert got.shape == want.shape, params
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=2e-5,
                               err_msg=str(CASES[case]))
