"""Statistical-contract tests for the tier-1 noise zoo (SURVEY §4b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.noise import (
    NoiseChain,
    NoiseSamplerHandle,
    get_noise_item,
    make_noise_sampler,
)

SHAPE = (2, 4, 32, 32)

TIER1 = [
    "gaussian", "uniform", "perlin", "studentt", "pink_old", "laplacian",
    "green_test", "pyramid_old", "pyramid", "highres_pyramid",
    "onef_pinkish", "onef_greenish", "onef_pinkishgreenish",
    "onef_pinkish_mix", "onef_greenish_mix", "white", "grey", "velvet",
    "violet", "rainbow_mild", "rainbow_intense", "pyramid_bislerp",
    "pyramid_area", "highres_pyramid_area", "pyramid_old_area",
    "pyramid_discount5", "pyramid_mix",
]


@pytest.mark.parametrize("name", TIER1)
def test_generator_normalized_stats(name):
    item = get_noise_item(name)
    ns = NoiseSamplerHandle(item, SHAPE, sigma_min=0.03, sigma_max=15.0, seed=7)
    n = np.asarray(ns(jnp.asarray(1.0), jnp.asarray(0.8)))
    assert n.shape == SHAPE
    assert np.isfinite(n).all()
    # normalized=True at the top level → mean≈0, std≈1 (scale_noise contract)
    assert abs(n.mean()) < 0.05, n.mean()
    assert abs(n.std(ddof=1) - 1) < 0.05, n.std(ddof=1)


def test_independent_draws():
    item = get_noise_item("gaussian")
    ns = NoiseSamplerHandle(item, SHAPE, seed=3)
    a = np.asarray(ns(1.0, 0.5))
    b = np.asarray(ns(1.0, 0.5))
    assert not np.allclose(a, b)


def test_seed_reproducibility():
    item = get_noise_item("pyramid")
    a = np.asarray(NoiseSamplerHandle(item, SHAPE, seed=11)(1.0, 0.5))
    b = np.asarray(NoiseSamplerHandle(item, SHAPE, seed=11)(1.0, 0.5))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(NoiseSamplerHandle(item, SHAPE, seed=12)(1.0, 0.5))
    assert not np.allclose(a, c)


def test_brownian_consistency():
    """W(a,c)·sqrt == W(a,b)+W(b,c) — interval additivity of the bridge."""
    item = get_noise_item("brownian")
    fn, state = make_noise_sampler(
        item, (1, 4, 16, 16), sigma_min=0.1, sigma_max=10.0, seed=5,
        normalized=False,
    )
    a, b, c = jnp.asarray(10.0), jnp.asarray(5.0), jnp.asarray(1.0)
    w_ab, state = fn(state, a, b)
    w_bc, state = fn(state, b, c)
    w_ac, state = fn(state, a, c)
    lhs = np.asarray(w_ac) * np.sqrt(9.0)
    rhs = np.asarray(w_ab) * np.sqrt(5.0) + np.asarray(w_bc) * np.sqrt(4.0)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4, atol=1e-4)


def test_brownian_increment_stats():
    item = get_noise_item("brownian")
    fn, state = make_noise_sampler(
        item, (4, 4, 64, 64), sigma_min=0.1, sigma_max=10.0, seed=9,
        normalized=False,
    )
    n, _ = fn(state, jnp.asarray(7.0), jnp.asarray(3.0))
    n = np.asarray(n)
    assert abs(n.mean()) < 0.02
    assert abs(n.std() - 1) < 0.02  # normalized increments are unit variance


def test_onef_spectrum_slope():
    """onef alpha shapes the spectrum: with the reference's k/power inversion
    (py/noise_generation.py:746-748), alpha=+0.5 (greenish) boosts low
    spatial frequencies and alpha=-0.5 (pinkish) boosts high ones."""

    def spectrum(name):
        item = get_noise_item(name)
        ns = NoiseSamplerHandle(item, (1, 4, 64, 64), seed=0)
        n = np.asarray(ns(1.0, 0.5))[0]
        spec = np.abs(np.fft.fft2(n)) ** 2
        lo = spec[:, 1:4, 1:4].mean()
        hi = spec[:, 28:36, 28:36].mean()
        return lo, hi

    lo_g, hi_g = spectrum("onef_greenish")
    assert lo_g > hi_g * 1.5
    lo_p, hi_p = spectrum("onef_pinkish")
    assert hi_p > lo_p * 1.5


def test_uniform_bounds():
    item = get_noise_item("uniform")
    fn, state = make_noise_sampler(item, SHAPE, seed=1, normalized=False)
    n, _ = fn(state, None, None)
    n = np.asarray(n)
    assert n.min() >= -0.5 * 3.46 - 1e-5 and n.max() <= 0.5 * 3.46 + 1e-5
    assert abs(n.std() - 1.0) < 0.02  # 3.46 ≈ sqrt(12)


def test_chain_rescaled_and_sum():
    chain = NoiseChain([
        get_noise_item("gaussian", factor=3.0),
        get_noise_item("uniform", factor=1.0),
    ])
    assert chain.chain_factor == 4.0
    r = chain.rescaled(1.0)
    assert abs(r.chain_factor - 1.0) < 1e-9
    assert abs(r.items[0].factor - 0.75) < 1e-9
    ns = NoiseSamplerHandle(r, SHAPE, seed=2)
    n = np.asarray(ns(1.0, 0.5))
    assert np.isfinite(n).all()
    assert abs(n.std(ddof=1) - 1.0) < 0.05


def test_scan_compatible():
    """A noise spec tree must compile into a lax.scan loop."""
    item = NoiseChain([
        get_noise_item("pyramid", factor=0.5),
        get_noise_item("gaussian", factor=0.5),
    ])
    fn, state0 = make_noise_sampler(item, (1, 4, 16, 16), seed=0)

    def body(state, sigma):
        noise, state = fn(state, sigma, sigma * 0.9)
        return state, noise.std()

    _, stds = jax.lax.scan(body, state0, jnp.linspace(10.0, 0.1, 8))
    assert np.isfinite(np.asarray(stds)).all()


def test_unknown_noise_type():
    with pytest.raises(ValueError, match="Unknown noise type"):
        get_noise_item("not_a_noise")


def test_brownian_endpoint_cache_chain_consistency():
    """Increments over consecutive steps chain to the direct endpoint
    difference — the endpoint cache (state w_last) must not break W's
    functional consistency."""
    from sonar_tpu.noise import get_noise_item, make_noise_sampler
    from sonar_tpu.noise.brownian import brownian_w

    fn, st = make_noise_sampler(get_noise_item("brownian"), (1, 4, 16, 16),
                                seed=0, sigma_min=0.1, sigma_max=10.0)
    sig = [10.0, 7.0, 4.0, 1.0, 0.1]
    tot = 0.0
    for a, b in zip(sig[:-1], sig[1:]):
        inc, st = fn(st, jnp.asarray(a), jnp.asarray(b))
        tot = tot + inc * np.sqrt(abs(b - a))
    key = st["node"]["base"]
    span = 10.0 - 0.1
    w_hi = brownian_w(key, jnp.asarray(1.0), (1, 4, 16, 16))
    w_lo = brownian_w(key, jnp.asarray(0.0), (1, 4, 16, 16))
    direct = (w_lo - w_hi) * np.sqrt(span)
    assert float(jnp.abs(tot - direct).max()) < 1e-4
