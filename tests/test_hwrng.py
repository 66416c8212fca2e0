"""Hardware-PRNG gaussian kernel (kernels/hwrng.py).

On CPU the public entry falls back to jax.random.normal; the kernel itself
is validated on-chip (profiles/ANALYSIS.md: correct moment statistics,
deterministic streams, throughput-neutral vs threefry — the roofline
experiment). These tests pin the host-side contract: fallback correctness,
seed derivation, and the opt-in gating."""

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.kernels.hwrng import hw_randn, seed_from_key, use_hw_rng


def test_cpu_fallback_is_threefry():
    key = jax.random.key(5)
    out = hw_randn(key, (2, 4, 8, 8))
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(jax.random.normal(key, (2, 4, 8, 8))))


def test_seed_from_key_deterministic_and_distinct():
    k = jax.random.key(1)
    s1 = int(seed_from_key(k))
    assert int(seed_from_key(jax.random.key(1))) == s1
    assert int(seed_from_key(jax.random.fold_in(k, 1))) != s1
    assert int(seed_from_key(jax.random.fold_in(k, 2))) != int(
        seed_from_key(jax.random.fold_in(k, 1)))


def test_hw_rng_off_by_default(monkeypatch):
    monkeypatch.delenv("SONAR_TPU_HW_RNG", raising=False)
    assert use_hw_rng() is False
    monkeypatch.setenv("SONAR_TPU_HW_RNG", "1")
    # still requires a TPU backend
    assert use_hw_rng() == (jax.default_backend() == "tpu")


def test_generator_randn_unchanged_without_flag(monkeypatch):
    monkeypatch.delenv("SONAR_TPU_HW_RNG", raising=False)
    from sonar_tpu.noise import get_noise_item, make_noise_sampler

    fn, st = make_noise_sampler(get_noise_item("gaussian"), (1, 4, 8, 8),
                                seed=0)
    a, _ = fn(st, None, None)
    fn2, st2 = make_noise_sampler(get_noise_item("gaussian"), (1, 4, 8, 8),
                                  seed=0)
    b, _ = fn2(st2, None, None)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
