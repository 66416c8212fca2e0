"""Wavelet subsystem tests: filter-bank orthogonality, perfect
reconstruction over the full (wave × mode × dimensionality) matrix, the
pyramid utility surface, and jit-compatibility."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.core.blend import BLENDING_MODES
from sonar_tpu.wavelets import (
    Wavelet,
    dwt1d,
    dwt2d,
    expand_yh_scales,
    get_wavelet,
    idwt1d,
    idwt2d,
    wavelet_blend,
    wavelet_scaling,
)
from sonar_tpu.wavelets.coeffs import daubechies, symlet


@pytest.mark.parametrize("p", [1, 2, 4, 8])
def test_daubechies_orthonormal(p):
    h = daubechies(p)
    assert len(h) == 2 * p
    assert h.sum() == pytest.approx(math.sqrt(2), abs=1e-9)
    assert (h * h).sum() == pytest.approx(1.0, abs=1e-8)
    for k in range(1, p):
        assert abs(np.dot(h[2 * k :], h[: len(h) - 2 * k])) < 1e-8


def test_symlet_is_orthonormal_and_less_asymmetric():
    h = symlet(4)
    assert (h * h).sum() == pytest.approx(1.0, abs=1e-8)
    assert h.sum() == pytest.approx(math.sqrt(2), abs=1e-9)
    # sym4 differs from db4 (different root selection)
    assert not np.allclose(h, daubechies(4), atol=1e-6)


@pytest.mark.parametrize("wave", ["haar", "db4", "sym4", "bior2.2", "bior4.4"])
@pytest.mark.parametrize("mode", ["zero", "symmetric", "periodization"])
def test_dwt1d_perfect_reconstruction(wave, mode):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 32)), jnp.float32)
    yl, yh = dwt1d(x, wave, 2, mode)
    rec = idwt1d(yl, yh, wave, mode, out_len=32)
    assert float(jnp.abs(rec - x).max()) < 1e-4


@pytest.mark.parametrize("wave", ["haar", "db4", "bior2.2"])
@pytest.mark.parametrize("mode", ["zero", "symmetric", "periodization"])
def test_dwt2d_perfect_reconstruction_odd_sizes(wave, mode):
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 3, 24, 20)), jnp.float32
    )
    yl, yh = dwt2d(x, wave, 2, mode)
    assert yh[0].shape[2] == 3  # (LH, HL, HH) orientation axis
    rec = idwt2d(yl, yh, wave, mode, out_hw=(24, 20))
    assert float(jnp.abs(rec - x).max()) < 1e-4


def test_dwt2d_under_jit():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 4, 16, 16)),
                    jnp.float32)

    @jax.jit
    def roundtrip(x):
        yl, yh = dwt2d(x, "db4", 2, "periodization")
        return idwt2d(yl, yh, "db4", "periodization", out_hw=(16, 16))

    assert float(jnp.abs(roundtrip(x) - x).max()) < 1e-4


def test_wavelet_facade_two_step_inverse():
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 4, 16, 16)),
                    jnp.float32)
    w = Wavelet(wave="db4", level=2, mode="periodization")
    yl, yh = w.forward(x)
    one = w.inverse(yl, yh)
    two = w.inverse(yl, yh, two_step_inverse=True)
    assert float(jnp.abs(one - x).max()) < 1e-4
    assert float(jnp.abs(two - one).max()) < 1e-3  # linear ⇒ equal


def test_wavelet_1d_mode_for_3d_latents():
    x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 4, 64)), jnp.float32)
    w = Wavelet(wave="db2", level=3, mode="zero", use_1d_dwt=True)
    yl, yh = w.forward(x)
    assert len(yh) == 3
    rec = w.inverse(yl, yh)
    assert float(jnp.abs(rec - x).max()) < 1e-4


def test_dtcwt_facade_constructs():
    w = Wavelet(use_dtcwt=True, level=2)
    assert w.use_dtcwt  # full coverage in test_dtcwt.py


def test_expand_yh_scales():
    yh = [jnp.zeros((1, 4, 3, 8, 8))] * 3
    assert expand_yh_scales(yh, yh_scales=2.0) == ((2.0, 2.0, 2.0),) * 3
    got = expand_yh_scales(yh, yh_scales=(1.0, [2.0, 3.0], 4.0))
    assert got == ((1.0, 1.0, 1.0), (2.0, 3.0, 1.0), (4.0, 4.0, 4.0))
    # fill replication
    got = expand_yh_scales(yh, yh_scales=(5.0, "fill"))
    assert got == ((5.0,) * 3,) * 3
    with pytest.raises(ValueError):
        expand_yh_scales(yh, yh_scales=("fill", 1.0))


def test_wavelet_scaling_and_blend():
    x = jnp.asarray(np.random.default_rng(5).standard_normal((1, 2, 16, 16)),
                    jnp.float32)
    yl, yh = dwt2d(x, "haar", 2, "periodization")
    yl2, yh2 = wavelet_scaling(yl, yh, 2.0, (0.0, [1.0, 0.5, 0.0]))
    assert jnp.allclose(yl2, yl * 2)
    assert float(jnp.abs(yh2[0]).max()) == 0.0
    assert jnp.allclose(yh2[1][:, :, 0], yh[1][:, :, 0])
    assert jnp.allclose(yh2[1][:, :, 1], yh[1][:, :, 1] * 0.5)
    blended = wavelet_blend((yl, yh), (yl2, yh2), yl_factor=1.0,
                            blend_function=BLENDING_MODES["lerp"])
    assert jnp.allclose(blended[0], yl2)


def test_get_wavelet_errors():
    with pytest.raises(ValueError):
        get_wavelet("nosuchwave")
