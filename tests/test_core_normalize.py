"""Oracle tests for the core normalization layer vs torch-CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sonar_tpu.core import (
    normalize_to_scale,
    quantile_normalize,
    scale_noise,
    tmedian,
    tmode,
    tquantile,
    tstd,
)
from sonar_tpu.core.normalize import QUANTILE_HANDLERS


def test_tstd_matches_torch(rng):
    x = rng.standard_normal((4, 8, 16)).astype(np.float32)
    got = np.asarray(tstd(jnp.asarray(x)))
    want = torch.from_numpy(x).std().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5)
    got_d = np.asarray(tstd(jnp.asarray(x), axis=(-2, -1), keepdims=True))
    want_d = torch.from_numpy(x).std(dim=(-2, -1), keepdim=True).numpy()
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5)


def test_tquantile_matches_torch(rng):
    x = np.abs(rng.standard_normal((3, 100))).astype(np.float32)
    got = np.asarray(tquantile(jnp.asarray(x), 0.75, axis=-1, keepdims=True))
    want = torch.quantile(torch.from_numpy(x), 0.75, dim=-1, keepdim=True).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_tmedian_matches_torch(rng):
    x = rng.standard_normal((5, 64)).astype(np.float32)
    got = np.asarray(tmedian(jnp.asarray(x), axis=-1, keepdims=True))
    want = torch.from_numpy(x).median(dim=-1, keepdim=True).values.numpy()
    np.testing.assert_allclose(got, want)


def test_tmode_matches_torch(rng):
    x = np.round(rng.standard_normal((4, 200)) * 10) / 10
    x = x.astype(np.float32)
    got = np.asarray(tmode(jnp.asarray(x), axis=-1, keepdims=True))
    want = torch.from_numpy(x).mode(dim=-1, keepdim=True).values.numpy()
    np.testing.assert_allclose(got, want)


def test_scale_noise_deadband(rng):
    # Already-standard-normal large sample: both thresholds not exceeded →
    # untouched (py/utils.py:100-106 dead-band).
    n = rng.standard_normal((1, 4, 64, 64)).astype(np.float32)
    n = (n - n.mean()) / n.std(ddof=1)
    out = np.asarray(scale_noise(jnp.asarray(n)))
    np.testing.assert_array_equal(out, n)


def test_scale_noise_normalizes(rng):
    n = (rng.standard_normal((1, 4, 32, 32)) * 5 + 3).astype(np.float32)
    out = np.asarray(scale_noise(jnp.asarray(n)))
    assert abs(out.mean()) < 1e-3
    assert abs(out.std(ddof=1) - 1) < 1e-3


def test_scale_noise_factor_and_unnormalized(rng):
    n = rng.standard_normal((8, 8)).astype(np.float32)
    out = np.asarray(scale_noise(jnp.asarray(n), 2.0, normalized=False))
    np.testing.assert_allclose(out, n * 2.0, rtol=1e-6)


def test_scale_noise_dims(rng):
    n = (rng.standard_normal((2, 4, 16, 16)) * 3 + 1).astype(np.float32)
    out = np.asarray(scale_noise(jnp.asarray(n), normalize_dims=(-2, -1)))
    # per-(B,C) plane: mean 0 (exact by construction), std near 1
    means = out.mean(axis=(-2, -1))
    np.testing.assert_allclose(means, 0, atol=1e-6)
    stds = out.std(axis=(-2, -1), ddof=1)
    np.testing.assert_allclose(stds, 1, atol=0.05)


@pytest.mark.parametrize("strategy", sorted(QUANTILE_HANDLERS))
def test_quantile_normalize_all_strategies_finite(rng, strategy):
    n = (rng.standard_normal((2, 4, 8, 8)) * 2).astype(np.float32)
    out = np.asarray(
        quantile_normalize(jnp.asarray(n), quantile=0.75, strategy=strategy)
    )
    assert out.shape == n.shape
    assert np.isfinite(out).all()


def test_quantile_normalize_clamp_oracle(rng):
    n = (rng.standard_normal((2, 4, 8, 8)) * 2).astype(np.float32)
    out = np.asarray(
        quantile_normalize(jnp.asarray(n), quantile=0.75, strategy="clamp", pow_fac=1.0)
    )
    t = torch.from_numpy(n)
    flat = t.flatten(start_dim=1)
    nq = torch.quantile(flat.abs(), 0.75, dim=-1, keepdim=True) + 1e-08
    want = flat.clamp(-nq, nq).reshape(n.shape).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


def test_quantile_normalize_replace_semantics(rng):
    n = (rng.standard_normal((256,)) * 2).astype(np.float32)
    out = np.asarray(
        quantile_normalize(
            jnp.asarray(n), quantile=0.5, dim=0, flatten=False,
            strategy="replace", pow_fac=1.0,
        )
    )
    nq = np.quantile(np.abs(n), 0.5) + 1e-08
    inliers = np.abs(n) <= nq
    # inliers untouched; outliers replaced by some inlier value
    np.testing.assert_array_equal(out[inliers], n[inliers])
    inlier_vals = set(np.round(n[inliers], 5).tolist())
    for v in out[~inliers]:
        assert np.round(v, 5) in inlier_vals


def test_quantile_normalize_centered_runs(rng):
    n = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    out = np.asarray(quantile_normalize(jnp.asarray(n), quantile=-0.75))
    assert out.shape == n.shape and np.isfinite(out).all()


def test_quantile_normalize_list(rng):
    n = rng.standard_normal((2, 64)).astype(np.float32)
    out1 = quantile_normalize(jnp.asarray(n), quantile=[0.9, 0.8])
    step = quantile_normalize(jnp.asarray(n), quantile=0.9)
    out2 = quantile_normalize(step, quantile=0.8)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_normalize_to_scale(rng):
    n = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    out = np.asarray(normalize_to_scale(jnp.asarray(n), -1.0, 1.0))
    np.testing.assert_allclose(out.min(axis=(-3, -2, -1)), -1, atol=1e-5)
    np.testing.assert_allclose(out.max(axis=(-3, -2, -1)), 1, atol=1e-5)


def test_quantile_normalize_jittable(rng):
    n = jnp.asarray(rng.standard_normal((2, 4, 8, 8)).astype(np.float32))
    f = jax.jit(lambda x: quantile_normalize(x, quantile=0.75, strategy="replace_3pt_flip"))
    out = f(n)
    assert np.isfinite(np.asarray(out)).all()
