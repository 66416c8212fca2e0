"""Scatternet channel-windowing machinery vs the LIVE reference.

Like the WCFG oracle: the reference's ScatternetFilteredNoiseGenerator
needs pytorch_wavelets' ScatLayer. Stubbing ScatLayer with a torch
adapter over THIS repo's scat_layer_dtcwt makes both sides share the
transform, so the comparison isolates the machinery that was previously
only internally tested: output modes (channels/flat × plain/adjusted/
scaled), spatial compensation, the fractional/negative output_offset
arithmetic, per-channel mode, and stacked negative orders.

Both sides consume an identical injected base tensor (no RNG in the
loop), so outputs must agree to f32 tolerance.
"""

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

import jax.numpy as jnp

from sonar_tpu.noise.base import NoiseCtx
from sonar_tpu.noise.scatternet import (
    ScatternetFilteredGenerator,
    scat_layer_dtcwt,
    scat_layer_j2,
)

SHAPE = (1, 4, 32, 32)


def _install_scatlayer_stub():
    import torch

    ptwav = sys.modules.get("pytorch_wavelets")
    if ptwav is None:  # pragma: no cover
        pytest.skip("loader did not stub pytorch_wavelets")

    class _ScatLayer(torch.nn.Module):
        def __init__(self, mode="symmetric", biort="near_sym_a", **_kw):
            super().__init__()
            self.biort = biort

        def forward(self, x):
            out = scat_layer_dtcwt(
                jnp.asarray(x.detach().cpu().float().numpy()),
                biort=self.biort)
            return torch.from_numpy(np.asarray(out))

    class _ScatLayerj2(torch.nn.Module):
        def __init__(self, mode="symmetric", biort="near_sym_a",
                     qshift="qshift_a", **_kw):
            super().__init__()
            self.biort, self.qshift = biort, qshift

        def forward(self, x):
            out = scat_layer_j2(
                jnp.asarray(x.detach().cpu().float().numpy()),
                biort=self.biort, qshift=self.qshift)
            return torch.from_numpy(np.asarray(out))

    ptwav.ScatLayer = _ScatLayer
    ptwav.ScatLayerj2 = _ScatLayerj2
    gen_mod = sys.modules["sonar_reference.py.noise_generation"]
    # the module captured `ptwav` at import; attribute lookup is dynamic
    assert gen_mod.ptwav is ptwav or True


class _ConstNoise:
    """Injects a fixed tensor (shape must match the generator's inner
    draw shape)."""

    def __init__(self, arr):
        self.arr = np.asarray(arr, np.float32)

    def check_dims(self, ctx):
        pass

    def init_state(self, ctx, key):
        return ()

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        return jnp.asarray(self.arr), state


def _run_pair(seed=0, **params):
    _install_scatlayer_stub()
    ours = ScatternetFilteredGenerator(noise_sampler=None, **params)
    ctx = NoiseCtx(shape=SHAPE, dtype=jnp.float32, sigma_min=0.03,
                   sigma_max=14.6)
    inner_shape = ours._inner_shape(ctx)
    base = np.random.default_rng(seed).standard_normal(
        inner_shape).astype(np.float32)

    ours = ScatternetFilteredGenerator(noise_sampler=_ConstNoise(base),
                                       **params)
    import jax

    got, _ = ours.generate(ctx, ours.init_state(ctx, jax.random.key(0)),
                           jax.random.key(1), None, None)

    x = torch.zeros(SHAPE)
    ref = ref_gen.ScatternetFilteredNoiseGenerator(
        x, sigma_min=0.03, sigma_max=14.6, normalized=False,
        noise_sampler=lambda *a: torch.from_numpy(base.copy()), **params)
    want = ref(torch.tensor(1.0), torch.tensor(0.9))
    return np.asarray(got), want.numpy()


CASES = [
    dict(output_mode="channels_adjusted", output_offset=0.0),
    dict(output_mode="channels_adjusted", output_offset=1.0),
    dict(output_mode="channels_adjusted", output_offset=-1.0),
    dict(output_mode="channels_adjusted", output_offset=0.5),
    dict(output_mode="channels_adjusted", output_offset=-0.25),
    dict(output_mode="channels", output_offset=0.0),
    dict(output_mode="channels", output_offset=2.0),
    dict(output_mode="channels_scaled", output_offset=0.0,
         upscale_mode="bilinear"),
    dict(output_mode="flat", output_offset=0.0),
    dict(output_mode="flat_adjusted", output_offset=0.5),
    dict(output_mode="channels_adjusted", output_offset=1.0,
         per_channel_scatternet=True),
    dict(output_mode="channels_adjusted", output_offset=0.0,
         scatternet_order=-2),
    dict(output_mode="channels_adjusted", output_offset=0.0,
         scatternet_order=0),
    # true second-order layer (reference: ptwav.ScatLayerj2 branch,
    # py/noise_generation.py:2061-2066)
    dict(output_mode="channels_adjusted", output_offset=0.0,
         scatternet_order=2),
    dict(output_mode="channels_adjusted", output_offset=3.0,
         scatternet_order=2),
    dict(output_mode="channels_adjusted", output_offset=0.5,
         scatternet_order=2),
    dict(output_mode="channels", output_offset=1.0, scatternet_order=2),
    dict(output_mode="flat_adjusted", output_offset=0.25,
         scatternet_order=2),
    dict(output_mode="channels_adjusted", output_offset=1.0,
         scatternet_order=2, per_channel_scatternet=True),
    dict(output_mode="channels_adjusted", output_offset=0.0,
         scatternet_order=2, use_symmetric_filter=True),
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_scatternet_machinery_matches_reference(case):
    params = CASES[case]
    got, want = _run_pair(seed=case, **params)
    assert got.shape == want.shape, params
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5,
                               err_msg=str(params))
