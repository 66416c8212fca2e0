"""Fused-pyramid Pallas kernel (kernels/fused_pyramid.py).

The deterministic matmul-accumulate surface is bit-testable on CPU in
interpret mode against the XLA composition (same interpolation matrices,
same precision); the hardware-PRNG base path is TPU-only and covered by
the statistical validation in kernels/hwrng.py's Box-Muller construction
plus the on-chip A/B in bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.kernels.fused_pyramid import (fused_pyramid_accumulate,
                                             fused_pyramid_supported)
from sonar_tpu.noise.generators import _size_ladder_pyramid
from sonar_tpu.ops.resample import scale_samples


def _xla_reference(base, smalls, discounts, mode, h, w):
    out = base
    for small, d in zip(smalls, discounts):
        out = out + scale_samples(small, w, h, mode=mode) * d
    return out


@pytest.mark.parametrize("mode", ["bilinear", "bicubic", "nearest-exact"])
def test_accumulate_matches_xla_composition(mode):
    h, w = 64, 128
    bc = 3
    key = jax.random.key(0)
    base = jax.random.normal(key, (bc, h, w), jnp.float32)
    shapes = [(25, 50), (7, 11), (1, 1)]
    smalls = [
        jax.random.normal(jax.random.fold_in(key, i + 1), (bc, sh, sw),
                          jnp.float32)
        for i, (sh, sw) in enumerate(shapes)
    ]
    discounts = [0.7, 0.49, 0.343]
    got = fused_pyramid_accumulate(base, smalls, discounts, mode=mode,
                                   interpret=True)
    want = _xla_reference(base, smalls, discounts, mode, h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)


def test_accumulate_tiled_rows():
    # h large enough that the kernel tiles the row axis (tile=256 < h)
    h, w = 512, 128
    bc = 2
    key = jax.random.key(3)
    base = jax.random.normal(key, (bc, h, w), jnp.float32)
    smalls = [jax.random.normal(jax.random.fold_in(key, 9), (bc, 40, 40),
                                jnp.float32)]
    got = fused_pyramid_accumulate(base, smalls, [0.7], interpret=True)
    want = _xla_reference(base, smalls, [0.7], "bilinear", h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)


def test_no_small_levels_is_identity():
    base = jax.random.normal(jax.random.key(1), (2, 16, 128), jnp.float32)
    got = fused_pyramid_accumulate(base, [], [], interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


def test_supported_gating():
    sizes = _size_ladder_pyramid(128, 128, 10, 0)
    assert sizes[0] == (128, 128)
    # CPU has no pltpu? pltpu imports fine on CPU wheels; the gate is about
    # ladder shape + mode + tiling, use_fused_pyramid() handles the backend.
    ok = fused_pyramid_supported(sizes, 128, 128, "bilinear")
    assert ok in (True, False)
    assert not fused_pyramid_supported(sizes, 128, 128, "bislerp")
    assert not fused_pyramid_supported([(64, 64)], 128, 128, "bilinear")
    assert not fused_pyramid_supported(sizes, 129, 128, "bilinear")


def test_default_pyramid_path_unchanged_by_flag_off(monkeypatch):
    """With the flag unset, PyramidGenerator must take the XLA path (the
    bit-reproducibility invariant)."""
    monkeypatch.delenv("SONAR_TPU_FUSED_PYRAMID", raising=False)
    from sonar_tpu.noise.base import make_noise_sampler
    from sonar_tpu.noise.presets import get_noise_item

    item = get_noise_item("pyramid")
    fn, st = make_noise_sampler(item, (1, 4, 32, 32), seed=5,
                                sigma_min=0.03, sigma_max=14.6)
    n1, _ = fn(st, jnp.asarray(1.0), jnp.asarray(0.9))
    fn2, st2 = make_noise_sampler(item, (1, 4, 32, 32), seed=5,
                                  sigma_min=0.03, sigma_max=14.6)
    n2, _ = fn2(st2, jnp.asarray(1.0), jnp.asarray(0.9))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))


# ---------------------------------------------------------------------------
# Fused downscale pyramids (highres_pyramid / pyramid_old): scatter the
# compressed tap fields back into the oversized levels and check the XLA
# composition reproduces the kernel output (tap injectivity at scale >= 2).
# ---------------------------------------------------------------------------


def _scatter_level(g, sh, sw, h, w, mode):
    """Place the (BC, 4, H, W) tap fields into a zeros (BC, sh, sw) level at
    the exact positions _resize_matrix taps for each output pixel."""
    bc = g.shape[0]
    big = np.zeros((bc, sh, sw), np.float32)
    if sh == h and sw == w:
        return np.asarray(g[:, 0])
    if mode in ("nearest", "nearest-exact"):
        r = np.minimum(((np.arange(h) + 0.5) * sh / h).astype(np.int64), sh - 1)
        c = np.minimum(((np.arange(w) + 0.5) * sw / w).astype(np.int64), sw - 1)
        big[:, r[:, None], c[None, :]] = np.asarray(g[:, 0])
        return big
    r0 = np.floor((np.arange(h) + 0.5) * sh / h - 0.5).astype(np.int64)
    c0 = np.floor((np.arange(w) + 0.5) * sw / w - 0.5).astype(np.int64)
    for p, (a, b) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        big[:, (r0 + a)[:, None], (c0 + b)[None, :]] = np.asarray(g[:, p])
    return big


@pytest.mark.parametrize("mode", ["bilinear", "nearest-exact"])
def test_downscale_accumulate_matches_scattered_composition(mode):
    from sonar_tpu.kernels.fused_pyramid import fused_downscale_accumulate

    bc, h, w = 2, 16, 128
    sizes = [(16, 128), (33, 257), (64, 512)]  # identity + two >=2x levels
    coefs = [1.0, 0.7, 0.49]
    key = jax.random.key(11)
    gs = [jax.random.normal(jax.random.fold_in(key, i), (bc, 4, h, w),
                            jnp.float32) for i in range(len(sizes))]
    base = jax.random.normal(jax.random.fold_in(key, 99), (bc, h, w),
                             jnp.float32)
    got = fused_downscale_accumulate(gs, (h, w), sizes, coefs, mode=mode,
                                     base=base, interpret=True)
    want = np.asarray(base)
    for g, (sh, sw), cf in zip(gs, sizes, coefs):
        big = _scatter_level(g, sh, sw, h, w, mode)
        want = want + np.asarray(
            scale_samples(jnp.asarray(big), w, h, mode=mode)) * cf
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=3e-5)


def test_downscale_accumulate_no_base():
    from sonar_tpu.kernels.fused_pyramid import fused_downscale_accumulate

    bc, h, w = 1, 8, 128
    sizes = [(32, 512)]
    gs = [jax.random.normal(jax.random.key(4), (bc, 4, h, w), jnp.float32)]
    got = fused_downscale_accumulate(gs, (h, w), sizes, [0.4],
                                     mode="nearest-exact", interpret=True)
    big = _scatter_level(gs[0], 32, 512, h, w, "nearest-exact")
    want = np.asarray(
        scale_samples(jnp.asarray(big), w, h, mode="nearest-exact")) * 0.4
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=3e-5)


def test_downscale_supported_gating():
    from sonar_tpu.kernels.fused_pyramid import fused_downscale_supported

    assert fused_downscale_supported([(16, 128), (33, 257)], 16, 128,
                                     "bilinear") in (True, False)
    # 1 < scale < 2 violates tap injectivity
    assert not fused_downscale_supported([(24, 200)], 16, 128, "bilinear")
    assert not fused_downscale_supported([(32, 256)], 16, 128, "bicubic")


def test_downscale_area_mode():
    from sonar_tpu.kernels.fused_pyramid import (_area_std,
                                                 fused_downscale_accumulate,
                                                 fused_downscale_supported)

    # gating: integer scales only
    assert fused_downscale_supported([(32, 256)], 16, 128, "area") in (True,
                                                                       False)
    assert not fused_downscale_supported([(33, 256)], 16, 128, "area")

    # the analytic fresh-field std must match the real area resize of iid
    # noise: blocks partition the source, output std = 1/sqrt(block size)
    bc, h, w, sh, sw = 8, 16, 128, 64, 512
    big = jax.random.normal(jax.random.key(7), (bc, sh, sw), jnp.float32)
    down = np.asarray(scale_samples(big, w, h, mode="area"))
    assert abs(down.std() / _area_std(sh, sw, h, w) - 1.0) < 0.03
    # outputs are independent across pixels (blocks are exclusive)
    flat = down.reshape(bc, -1)
    corr = np.corrcoef(flat[:, 0], flat[:, 1])[0, 1]
    assert abs(corr) < 0.7  # bc=8 samples: loose bound, catches sharing

    # kernel formula: base + coef * area_std * g00, exactly
    g = jax.random.normal(jax.random.key(8), (1, 4, h, w), jnp.float32)
    base = jax.random.normal(jax.random.key(9), (1, h, w), jnp.float32)
    got = fused_downscale_accumulate([g], (h, w), [(sh, sw)], [0.7],
                                     mode="area", base=base, interpret=True)
    want = np.asarray(base) + 0.7 * _area_std(sh, sw, h, w) * np.asarray(g[:, 0])
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=2e-6)
