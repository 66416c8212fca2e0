"""Resample ops vs torch.nn.functional.interpolate (the reference's backend)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sonar_tpu.ops import scale_samples

SHAPES = [((1, 4, 16, 16), (32, 32)), ((2, 4, 32, 24), (16, 12)), ((1, 4, 8, 8), (20, 12))]


@pytest.mark.parametrize("mode,torch_mode", [
    ("bilinear", "bilinear"),
    ("bicubic", "bicubic"),
    ("nearest", "nearest"),
    ("nearest-exact", "nearest-exact"),
    ("area", "area"),
])
@pytest.mark.parametrize("shape,out_hw", SHAPES)
def test_scale_samples_matches_torch(rng, mode, torch_mode, shape, out_hw):
    x = rng.standard_normal(shape).astype(np.float32)
    oh, ow = out_hw
    got = np.asarray(scale_samples(jnp.asarray(x), ow, oh, mode=mode))
    want = F.interpolate(torch.from_numpy(x), size=(oh, ow), mode=torch_mode).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shape,out_hw", SHAPES)
def test_adaptive_avg_pool(rng, shape, out_hw):
    x = rng.standard_normal(shape).astype(np.float32)
    oh, ow = out_hw
    got = np.asarray(scale_samples(jnp.asarray(x), ow, oh, mode="adaptive_avg_pool2d"))
    want = F.adaptive_avg_pool2d(torch.from_numpy(x), (oh, ow)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bislerp_shape_and_stats(rng):
    x = rng.standard_normal((1, 4, 16, 16)).astype(np.float32)
    out = np.asarray(scale_samples(jnp.asarray(x), 32, 32, mode="bislerp"))
    assert out.shape == (1, 4, 32, 32)
    assert np.isfinite(out).all()
    # Identity when size unchanged
    same = np.asarray(scale_samples(jnp.asarray(x), 16, 16, mode="bislerp"))
    np.testing.assert_array_equal(same, x)
