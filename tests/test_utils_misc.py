import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.utils import (
    crop_samples,
    elementwise_shuffle_by_dim,
    pattern_break,
    step_from_sigmas,
    step_from_sigmas_traced,
    trunc_decimals,
)


def test_trunc_decimals():
    x = jnp.asarray([1.23456, -1.23456, 0.9999])
    out = np.asarray(trunc_decimals(x, 3))
    np.testing.assert_allclose(out, [1.234, -1.234, 0.999], atol=1e-6)


def test_crop_center():
    x = jnp.arange(64, dtype=jnp.float32).reshape(1, 1, 8, 8)
    out = crop_samples(x, 4, 4, mode="center")
    assert out.shape == (1, 1, 4, 4)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[..., 2:6, 2:6])
    out2 = crop_samples(x, 4, 4, mode="top_left")
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(x)[..., 0:4, 0:4])
    out3 = crop_samples(x, 4, 4, mode="bottom_right", offset_width=-1)
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(x)[..., 4:8, 3:7])


def test_pattern_break_stats(rng):
    n = jnp.asarray(rng.standard_normal((1, 4, 16, 16)).astype(np.float32))
    out = np.asarray(pattern_break(n, percentage=1.0))
    assert out.shape == n.shape and np.isfinite(out).all()
    # restore_scale keeps the original range approximately
    assert abs(out.min() - float(n.min())) < 0.3
    zero = np.asarray(pattern_break(n, percentage=0.0))
    np.testing.assert_allclose(zero, np.asarray(n), atol=1e-6)


def test_shuffle_permutes_only(rng):
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 8)).astype(np.float32))
    key = jax.random.key(0)
    out = elementwise_shuffle_by_dim(x, key, dim=1)
    assert out.shape == x.shape
    # multiset preserved along the shuffled axis
    np.testing.assert_allclose(
        np.sort(np.asarray(out), axis=1), np.sort(np.asarray(x), axis=1), rtol=1e-6
    )


def test_shuffle_no_identity(rng):
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 16))
    key = jax.random.key(3)
    out = np.asarray(elementwise_shuffle_by_dim(x, key, dim=-1, no_identity=True))
    assert not np.any(out == np.asarray(x))  # derangement


def test_step_from_sigmas():
    sigmas = np.array([10.0, 5.0, 2.0, 1.0, 0.0])
    assert step_from_sigmas(5.0, sigmas) == 1.0
    assert step_from_sigmas(7.5, sigmas) == 0.5
    assert step_from_sigmas(11.0, sigmas) is None
    got, valid = step_from_sigmas_traced(jnp.asarray(7.5), jnp.asarray(sigmas))
    assert bool(valid) and abs(float(got) - 0.5) < 1e-4
    _, valid2 = step_from_sigmas_traced(jnp.asarray(11.0), jnp.asarray(sigmas))
    assert not bool(valid2)
