"""Distribution-zoo noise generator (reference: DistroNoiseGenerator,
py/noise_generation.py:805-1256).

25 distributions re-expressed with counter-based ``jax.random`` primitives
(inverse-CDF / standard transforms) instead of torch.distributions objects:
every sampler is a pure function of (key, params, shape) with static shapes.
Vector params (space-separated strings, py/noise_generation.py:1199-1215)
broadcast into a trailing batch dim that ``result_index`` cycling trims
(py/noise_generation.py:1177-1196); output goes through quantile_normalize
(default q=0.85 dim=1 pow=0.5, py/noise_generation.py:1197-1215).

Rejection-sampled distributions (vonmises) run a fixed number of proposal
rounds with mask-select — compile-friendly; the acceptance probability per
round is >0.65 so 16 rounds leave a miss chance < 1e-7 per element (misses
fall back to the last proposal).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from ..core.normalize import quantile_normalize
from .generators import Generator

# ---------------------------------------------------------------------------
# per-distribution samplers: fn(key, params, shape, dtype) -> array
# params values are jnp arrays shaped (k,) (vector params) or python scalars
# ---------------------------------------------------------------------------


def _u(key, shape, dtype, lo=1e-7, hi=1.0 - 1e-7):
    return jax.random.uniform(key, shape, dtype, minval=lo, maxval=hi)


def _cauchy(key, p, shape, dtype):
    return p["median"] + p["sigma"] * jax.random.cauchy(key, shape, dtype)


def _exponential(key, p, shape, dtype):
    return jax.random.exponential(key, shape, dtype) / p["lambd"]


def _geometric(key, p, shape, dtype):
    # torch.Tensor.geometric_: k ∈ {1, 2, ...}, P(k) = (1-p)^(k-1) p
    u = _u(key, shape, dtype)
    return jnp.floor(jnp.log(u) / jnp.log1p(-p["p"])) + 1.0


def _log_normal(key, p, shape, dtype):
    return jnp.exp(p["mean"] + p["std"] * jax.random.normal(key, shape, dtype))


def _normal(key, p, shape, dtype):
    return p["mean"] + p["std"] * jax.random.normal(key, shape, dtype)


def _beta(key, p, shape, dtype):
    # torch Beta(concentration1=a, concentration0=b): pdf ∝ x^(a-1)(1-x)^(b-1)
    return jax.random.beta(key, p["concentration1"], p["concentration0"], shape, dtype)


def _continuous_bernoulli(key, p, shape, dtype):
    lam = jnp.broadcast_to(jnp.asarray(p["probs"], dtype), shape)
    u = _u(key, shape, dtype)
    near_half = jnp.abs(lam - 0.5) < 1e-4
    lam_safe = jnp.where(near_half, 0.4, lam)
    x = (
        jnp.log1p(u * (2.0 * lam_safe - 1.0) / (1.0 - lam_safe))
        / jnp.log(lam_safe / (1.0 - lam_safe))
    )
    return jnp.where(near_half, u, x)


def _dirichlet(key, p, shape, dtype):
    conc = jnp.asarray(p["concentration"], dtype)
    return jax.random.dirichlet(key, conc, shape, dtype)


def _fisher_snedecor(key, p, shape, dtype):
    k1, k2 = jax.random.split(key)
    d1, d2 = p["df1"], p["df2"]
    g1 = jax.random.gamma(k1, d1 / 2.0, shape, dtype) * 2.0
    g2 = jax.random.gamma(k2, d2 / 2.0, shape, dtype) * 2.0
    return (g1 / d1) / jnp.maximum(g2 / d2, 1e-20)


def _gamma(key, p, shape, dtype):
    return jax.random.gamma(key, p["concentration"], shape, dtype) / p["rate"]


def _gumbel(key, p, shape, dtype):
    return p["loc"] + p["scale"] * jax.random.gumbel(key, shape, dtype)


def _inverse_gamma(key, p, shape, dtype):
    g = jax.random.gamma(key, p["concentration"], shape, dtype)
    return p["rate"] / jnp.maximum(g, 1e-20)


def _kumaraswamy(key, p, shape, dtype):
    a, b = p["concentration1"], p["concentration0"]
    u = _u(key, shape, dtype)
    return (1.0 - (1.0 - u) ** (1.0 / b)) ** (1.0 / a)


def _laplacian(key, p, shape, dtype):
    return p["loc"] + p["scale"] * jax.random.laplace(key, shape, dtype)


def _lkjcholesky(key, p, shape, dtype):
    """LKJ Cholesky-factor sampling via the onion method. Event shape
    (dim, dim); sample shape (*shape, dim, dim)."""
    dim = int(p["dim"])
    eta = jnp.asarray(p["concentration"], dtype).reshape(-1)[0]
    if dim < 2:
        return jnp.ones(shape + (1, 1), dtype)
    kb, kn = jax.random.split(key)
    L = jnp.zeros(shape + (dim, dim), dtype).at[..., 0, 0].set(1.0)
    beta_par = eta + (dim - 2) / 2.0
    for i in range(1, dim):
        kbi = jax.random.fold_in(kb, i)
        kni = jax.random.fold_in(kn, i)
        beta_par_i = beta_par - (i - 1) / 2.0
        y = jax.random.beta(kbi, i / 2.0, beta_par_i, shape, dtype)
        v = jax.random.normal(kni, shape + (i,), dtype)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        r = jnp.sqrt(y)[..., None]
        L = L.at[..., i, :i].set(r * v)
        L = L.at[..., i, i].set(jnp.sqrt(1.0 - y))
    return L


def _lrmvariate_normal(key, p, shape, dtype):
    loc = jnp.asarray(p["loc"], dtype)
    k = loc.shape[0]
    cov_factor = jnp.asarray(p["cov_factor"], dtype).reshape(k, -1)
    cov_diag = jnp.asarray(p["cov_diag"], dtype)
    r = cov_factor.shape[1]
    k1, k2 = jax.random.split(key)
    z1 = jax.random.normal(k1, shape + (r,), dtype)
    z2 = jax.random.normal(k2, shape + (k,), dtype)
    return loc + jnp.einsum("...r,kr->...k", z1, cov_factor) + jnp.sqrt(cov_diag) * z2


def _mvariate_normal(key, p, shape, dtype):
    loc = jnp.asarray(p["loc"], dtype)
    k = loc.shape[0]
    z = jax.random.normal(key, shape + (k,), dtype)
    return loc + math.sqrt(float(p["cov_multiplier"])) * z


def _pareto(key, p, shape, dtype):
    u = _u(key, shape, dtype)
    return p["scale"] / u ** (1.0 / p["alpha"])


def _poisson(key, p, shape, dtype):
    return jax.random.poisson(key, p["rate"], shape).astype(dtype)


def _relaxed_bernoulli(key, p, shape, dtype):
    probs = jnp.asarray(p["probs"], dtype)
    u = _u(key, shape, dtype)
    logistic = jnp.log(u) - jnp.log1p(-u)
    logits = jnp.log(probs) - jnp.log1p(-probs)
    return jax.nn.sigmoid((logits + logistic) / p["temperature"])


def _relaxed_onehotcategorical(key, p, shape, dtype):
    probs = jnp.asarray(p["probs"], dtype)
    k = probs.shape[0]
    g = jax.random.gumbel(key, shape + (k,), dtype)
    return jax.nn.softmax((jnp.log(probs) + g) / p["temperature"], axis=-1)


def _studentt(key, p, shape, dtype):
    # core.rng.draw_t: exact polar construction (zero rejection) — the
    # gamma rejection sampler behind jax.random.t was the per-draw
    # bottleneck for this type (VERDICT r4 item 8, ANALYSIS §16)
    from ..core.rng import draw_t

    return p["loc"] + p["scale"] * draw_t(key, p["df"], shape, dtype)


def _uniform(key, p, shape, dtype):
    return jax.random.uniform(key, shape, dtype, minval=p["low"], maxval=p["high"])


def _vonmises(key, p, shape, dtype, rounds: int = 16):
    """Best-Fisher (1979) rejection with a fixed round count."""
    kappa = jnp.maximum(jnp.asarray(p["concentration"], dtype), 1e-6)
    loc = p["loc"]
    tau = 1.0 + jnp.sqrt(1.0 + 4.0 * kappa**2)
    rho = (tau - jnp.sqrt(2.0 * tau)) / (2.0 * kappa)
    rpar = (1.0 + rho**2) / (2.0 * rho)
    result = jnp.zeros(shape, dtype)
    accepted = jnp.zeros(shape, bool)
    for i in range(rounds):
        k1, k2, k3 = jax.random.split(jax.random.fold_in(key, i), 3)
        u1 = _u(k1, shape, dtype)
        u2 = _u(k2, shape, dtype)
        u3 = _u(k3, shape, dtype)
        z = jnp.cos(jnp.pi * u1)
        f = (1.0 + rpar * z) / (rpar + z)
        c = kappa * (rpar - f)
        accept = (c * (2.0 - c) - u2 > 0) | (jnp.log(c / u2) + 1.0 - c >= 0)
        theta = jnp.sign(u3 - 0.5) * jnp.arccos(jnp.clip(f, -1.0, 1.0))
        take = accept & jnp.logical_not(accepted)
        result = jnp.where(take, theta, result)
        accepted = accepted | accept
        fallback = theta  # last proposal if (vanishingly) never accepted
    result = jnp.where(accepted, result, fallback)
    return result + loc


def _weibull(key, p, shape, dtype):
    e = jax.random.exponential(key, shape, dtype)
    return p["scale"] * e ** (1.0 / p["concentration"])


def _wishart(key, p, shape, dtype):
    """Bartlett decomposition with covariance = cov_multiplier · I."""
    k = int(p["cov_size"])
    df = jnp.asarray(p["df"], dtype).reshape(-1)[0]
    kd, kn = jax.random.split(key)
    diag_vals = []
    for i in range(k):
        g = jax.random.gamma(jax.random.fold_in(kd, i), (df - i) / 2.0, shape, dtype)
        diag_vals.append(jnp.sqrt(2.0 * g))
    A = jnp.zeros(shape + (k, k), dtype)
    for i in range(k):
        A = A.at[..., i, i].set(diag_vals[i])
    tril = jax.random.normal(kn, shape + (k, k), dtype)
    mask = jnp.tril(jnp.ones((k, k), bool), -1)
    A = jnp.where(mask, tril, A)
    W = jnp.einsum("...ij,...kj->...ik", A, A) * float(p["cov_multiplier"])
    return W


_SIMPLE = frozenset(("cauchy", "exponential", "geometric", "log_normal", "normal"))

# (sampler, {param: default}) — defaults transcribed from
# py/noise_generation.py:823-1131 (string defaults = vector-capable params)
DISTRO_PARAMS: dict[str, tuple[Callable, dict]] = {
    "exponential": (_exponential, {"lambd": 1.0}),
    "cauchy": (_cauchy, {"median": "0.0", "sigma": 1.0}),
    "geometric": (_geometric, {"p": 0.25}),
    "log_normal": (_log_normal, {"mean": 1.0, "std": 2.0}),
    "normal": (_normal, {"mean": 0.0, "std": 1.0}),
    "beta": (_beta, {"concentration0": "0.5", "concentration1": "0.5"}),
    "continuous_bernoulli": (_continuous_bernoulli, {"probs": "0.5"}),
    "dirichlet": (_dirichlet, {"concentration": "0.5 0.5"}),
    "fisher_snedecor": (_fisher_snedecor, {"df1": "1.0", "df2": "2.0"}),
    "gamma": (_gamma, {"concentration": "1.0", "rate": "1.0"}),
    "gumbel": (_gumbel, {"loc": "1.0", "scale": "2.0"}),
    "inverse_gamma": (_inverse_gamma, {"concentration": "1.0", "rate": "1.0"}),
    "kumaraswamy": (_kumaraswamy, {"concentration0": "1.0", "concentration1": "1.0"}),
    "laplacian": (_laplacian, {"loc": "0.0", "scale": "1.0"}),
    "lkjcholesky": (_lkjcholesky, {"dim": 3, "concentration": "1.0"}),
    "lrmvariate_normal": (
        _lrmvariate_normal,
        {"loc": "0.0 0.0", "cov_factor": "1.0 0.0", "cov_diag": "1.0 1.0"},
    ),
    "mvariate_normal": (_mvariate_normal, {"loc": "0.0 0.0", "cov_multiplier": 1.0}),
    "pareto": (_pareto, {"scale": "1.0", "alpha": "1.0"}),
    "poisson": (_poisson, {"rate": "1.5"}),
    "relaxed_bernoulli": (_relaxed_bernoulli, {"temperature": 0.75, "probs": "0.66"}),
    "relaxed_onehotcategorical": (
        _relaxed_onehotcategorical,
        {"temperature": 1.5, "probs": "0.33 0.66"},
    ),
    "studentt": (_studentt, {"loc": "0.0", "scale": "1.0", "df": "1.0"}),
    "uniform": (_uniform, {"low": 0.0, "high": 1.0}),
    "vonmises": (_vonmises, {"loc": "1.0", "concentration": "1.0"}),
    "weibull": (_weibull, {"scale": "1.0", "concentration": "1.0"}),
    "wishart": (_wishart, {"df": "2.0", "cov_size": 2, "cov_multiplier": 1.0}),
}

# distributions whose raw sample already carries trailing event dims
_EVENT_DIMS = {
    "dirichlet": 1,
    "lrmvariate_normal": 1,
    "mvariate_normal": 1,
    "relaxed_onehotcategorical": 1,
    "lkjcholesky": 2,
    "wishart": 2,
}

_SCALAR_PARAMS = {"dim", "cov_size", "cov_multiplier", "lambd", "p",
                  "temperature", "low", "high", "mean", "std"}
_VECTOR_EXPECTED = {"concentration", "loc", "cov_factor", "cov_diag", "probs"}


def _parse_param(name: str, val):
    if isinstance(val, str):
        parts = tuple(float(v) for v in val.split())
        if name in _SCALAR_PARAMS:
            return parts[0]
        return jnp.asarray(parts) if (len(parts) > 1 or name in _VECTOR_EXPECTED) else parts[0]
    if isinstance(val, (tuple, list)):
        return jnp.asarray([float(v) for v in val])
    return val


def build_params() -> dict:
    """Flat ``{distro}_{param}: default`` map for schema construction
    (py/noise_generation.py:1139-1150)."""
    return {
        f"{dk}_{pk}": pv
        for dk, (_fn, pd) in DISTRO_PARAMS.items()
        for pk, pv in pd.items()
    }


class DistroGenerator(Generator):
    """py/noise_generation.py:805-1256."""

    name = "distro"

    @classmethod
    def ng_params(cls):
        return (
            super().ng_params()
            | {
                "distro": "normal",
                "quantile_norm": 0.85,
                "quantile_norm_flatten": True,
                "quantile_norm_dim": 1,
                "quantile_norm_pow": 0.5,
                "quantile_norm_fac": 1.0,
                "result_index": "-1",
            }
            | build_params()
        )

    def _result_indices(self):
        ri = self.result_index
        if isinstance(ri, str):
            ri = tuple(int(v) for v in ri.split())
        elif not isinstance(ri, (tuple, list)):
            ri = (int(ri),)
        if not ri:
            raise ValueError("When result_index is a list, it must not be empty")
        return tuple(ri)

    def generate(self, ctx, state, key, sigma, sigma_next):
        distro = self.distro
        if distro not in DISTRO_PARAMS:
            raise ValueError("Bad distro")
        fn, pdef = DISTRO_PARAMS[distro]
        params = {
            k: _parse_param(k, getattr(self, f"{distro}_{k}")) for k in pdef
        }
        shape = tuple(ctx.shape)
        # vector params without event dims broadcast into one trailing dim
        event = _EVENT_DIMS.get(distro, 0)
        if event == 0 and distro not in _SIMPLE:
            klen = max(
                (v.shape[0] for v in params.values() if isinstance(v, jax.Array) and v.ndim),
                default=1,
            )
            if klen > 1:
                shape = shape + (klen,)
        noise = fn(key, params, shape, ctx.dtype)
        # trim extra trailing dims via result_index cycling
        ris = self._result_indices()
        trim = 0
        while noise.ndim > len(ctx.shape):
            idx = ris[trim % len(ris)]
            if idx < 0:
                idx = noise.shape[-1] + idx
            noise = noise[..., max(0, min(noise.shape[-1] - 1, idx))]
            trim += 1
        noise = quantile_normalize(
            noise,
            quantile=self.quantile_norm,
            dim=self.quantile_norm_dim,
            flatten=self.quantile_norm_flatten,
            nq_fac=self.quantile_norm_fac,
            pow_fac=self.quantile_norm_pow,
        ).reshape(ctx.shape)
        return noise, state
