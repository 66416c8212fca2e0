"""Statistical contracts for the raw distribution samplers (pre
quantile-normalize) — moment and support checks against analytic values
(SURVEY §4b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.noise.distro import DISTRO_PARAMS, _parse_param

KEY = jax.random.key(0)
N = (200_000,)


def draw(name, **overrides):
    fn, defaults = DISTRO_PARAMS[name]
    params = {k: _parse_param(k, overrides.get(k, v)) for k, v in defaults.items()}
    return np.asarray(fn(KEY, params, N, jnp.float32))


def test_normal_moments():
    x = draw("normal")
    assert abs(x.mean()) < 0.02 and abs(x.std() - 1.0) < 0.02


def test_exponential_mean():
    x = draw("exponential", lambd=2.0)
    assert x.min() >= 0
    assert abs(x.mean() - 0.5) < 0.02  # mean = 1/lambda


def test_geometric_support_and_mean():
    x = draw("geometric", p=0.25)
    assert np.all(x >= 1) and np.allclose(x, np.round(x))
    assert abs(x.mean() - 4.0) < 0.1  # mean = 1/p


def test_beta_support_and_mean():
    x = draw("beta", concentration0="2.0", concentration1="3.0")
    assert x.min() >= 0 and x.max() <= 1
    assert abs(x.mean() - 3.0 / 5.0) < 0.01  # a/(a+b), a=c1, b=c0


def test_gamma_mean_var():
    x = draw("gamma", concentration="3.0", rate="2.0")
    assert abs(x.mean() - 1.5) < 0.02  # k/rate
    assert abs(x.var() - 0.75) < 0.05  # k/rate^2


def test_pareto_support():
    x = draw("pareto", scale="2.0", alpha="3.0")
    assert x.min() >= 2.0
    assert abs(x.mean() - 3.0) < 0.1  # alpha*scale/(alpha-1)


def test_poisson_mean():
    x = draw("poisson", rate="1.5")
    assert np.allclose(x, np.round(x))
    assert abs(x.mean() - 1.5) < 0.05


def test_uniform_bounds():
    x = draw("uniform", low=-2.0, high=3.0)
    assert x.min() >= -2.0 and x.max() <= 3.0
    assert abs(x.mean() - 0.5) < 0.02


def test_laplace_var():
    x = draw("laplacian", scale="1.5")
    assert abs(x.var() - 2 * 1.5**2) < 0.2


def test_weibull_mean():
    x = draw("weibull", scale="2.0", concentration="1.0")
    # k=1 → exponential with mean = scale
    assert abs(x.mean() - 2.0) < 0.05


def test_vonmises_support_and_center():
    x = draw("vonmises", loc="0.0", concentration="4.0")
    assert x.min() >= -np.pi - 1e-3 and x.max() <= np.pi + 1e-3
    # circular mean near loc
    assert abs(np.angle(np.exp(1j * x).mean())) < 0.02


def test_studentt_heavy_tails():
    x = draw("studentt", df="3.0")
    g = np.asarray(jax.random.normal(KEY, N))
    # kurtosis proxy: tail mass beyond 4 sigma far exceeds the gaussian's
    assert (np.abs(x) > 4).mean() > 5 * max((np.abs(g) > 4).mean(), 1e-7)


def test_dirichlet_simplex():
    fn, defaults = DISTRO_PARAMS["dirichlet"]
    params = {k: _parse_param(k, v) for k, v in defaults.items()}
    x = np.asarray(fn(KEY, params, (10_000,), jnp.float32))
    assert x.shape == (10_000, 2)
    assert np.allclose(x.sum(-1), 1.0, atol=1e-5)


def test_wishart_positive_definite():
    fn, defaults = DISTRO_PARAMS["wishart"]
    params = {k: _parse_param(k, v) for k, v in defaults.items()}
    x = np.asarray(fn(KEY, params, (500,), jnp.float32))
    assert x.shape == (500, 2, 2)
    eig = np.linalg.eigvalsh(x)
    assert (eig > -1e-4).all()


def test_lkj_cholesky_unit_rows():
    fn, defaults = DISTRO_PARAMS["lkjcholesky"]
    params = {k: _parse_param(k, v) for k, v in defaults.items()}
    x = np.asarray(fn(KEY, params, (500,), jnp.float32))
    assert x.shape == (500, 3, 3)
    # rows of a correlation Cholesky factor have unit norm
    assert np.allclose((x**2).sum(-1), 1.0, atol=1e-4)
    # lower triangular
    assert np.allclose(x[:, 0, 1:], 0.0, atol=1e-6)
