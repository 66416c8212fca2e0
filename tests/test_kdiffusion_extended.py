"""Numpy trajectory oracles for the round-5 sampler registry expansion
(VERDICT r4 item 3): dpm_2, dpm_2_ancestral, heunpp2, res_multistep(_a),
ddpm, deis, lms, ipndm, ipndm_v, uni_pc(_bh2), dpm_fast, dpm_adaptive.

Each oracle is an INDEPENDENT numpy implementation of the published
algorithm (k-diffusion / ComfyUI semantics, float64, Python loops,
growing history lists) checked against the traced scan/while_loop
implementations — the class of bug this catches is tracing/select/carry
mistakes, not formula provenance (no k-diffusion source exists in this
environment)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.samplers.kdiffusion import KDIFFUSION_SAMPLERS

SHAPE = (2, 3, 8, 8)
N_STEPS = 8


def karras(n=N_STEPS, smin=0.03, smax=14.6, rho=7.0):
    ramp = np.linspace(0, 1, n)
    s = (smax ** (1 / rho)
         + ramp * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho
    return np.concatenate([s, [0.0]]).astype(np.float32)


def np_model(x, sigma):
    return x / (1.0 + sigma) + 0.05 * np.sin(x)


def jx_model(x, sigma_b, **kw):
    s = sigma_b.reshape(-1, 1, 1, 1)
    return x / (1.0 + s) + 0.05 * jnp.sin(x)


def make_stream(n, seed=11):
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n,) + SHAPE).astype(np.float32)


def jx_noise_sampler(stream):
    stack = jnp.asarray(stream)
    return lambda step, s, sn: stack[step]


def np_ancestral(sigma, sigma_next, eta):
    if not eta or sigma_next == 0:
        return float(sigma_next), 0.0
    su = min(sigma_next,
             eta * math.sqrt(sigma_next**2 * (sigma**2 - sigma_next**2)
                             / sigma**2))
    return math.sqrt(sigma_next**2 - su**2), su


@pytest.fixture(scope="module")
def x0():
    rng = np.random.RandomState(3)
    return (rng.standard_normal(SHAPE) * 14.6).astype(np.float32)


def _run(name, x0, sigmas, stream=None, **kw):
    fn = KDIFFUSION_SAMPLERS[name]
    if stream is not None:
        kw["noise_sampler"] = jx_noise_sampler(stream)
    out = fn(jx_model, jnp.asarray(x0), jnp.asarray(sigmas), **kw)
    return np.asarray(out)


def _close(a, b, tol=3e-4):
    scale = max(1.0, float(np.abs(b).max()))
    assert np.abs(a - b).max() / scale < tol, np.abs(a - b).max()


# ---------------------------------------------------------------------------
# single/two-stage samplers
# ---------------------------------------------------------------------------

def np_dpm_2(x, sigmas, noise, s_churn=0.0, s_tmin=0.0,
             s_tmax=float("inf"), s_noise=1.0):
    x = x.astype(np.float64)
    n = len(sigmas) - 1
    for i in range(n):
        sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
        gamma = (min(s_churn / n, 2**0.5 - 1)
                 if s_tmin <= sigma <= s_tmax else 0.0)
        sigma_hat = sigma * (1 + gamma)
        if gamma > 0:
            x = x + noise[i] * s_noise * math.sqrt(sigma_hat**2 - sigma**2)
        denoised = np_model(x, sigma_hat)
        d = (x - denoised) / sigma_hat
        if sigma_next == 0:
            x = x + d * (sigma_next - sigma_hat)
        else:
            sigma_mid = math.exp(
                0.5 * (math.log(sigma_hat) + math.log(sigma_next)))
            x_2 = x + d * (sigma_mid - sigma_hat)
            denoised_2 = np_model(x_2, sigma_mid)
            d_2 = (x_2 - denoised_2) / sigma_mid
            x = x + d_2 * (sigma_next - sigma_hat)
    return x


def np_dpm_2_ancestral(x, sigmas, noise, eta=1.0, s_noise=1.0):
    x = x.astype(np.float64)
    for i in range(len(sigmas) - 1):
        sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
        sd, su = np_ancestral(sigma, sigma_next, eta)
        denoised = np_model(x, sigma)
        d = (x - denoised) / sigma
        if sd == 0:
            x = x + d * (sd - sigma)
        else:
            sigma_mid = math.exp(0.5 * (math.log(sigma) + math.log(sd)))
            x_2 = x + d * (sigma_mid - sigma)
            denoised_2 = np_model(x_2, sigma_mid)
            d_2 = (x_2 - denoised_2) / sigma_mid
            x = x + d_2 * (sd - sigma)
            x = x + noise[i] * s_noise * su
    return x


def np_heunpp2(x, sigmas, noise=None, s_churn=0.0, s_tmin=0.0,
               s_tmax=float("inf"), s_noise=1.0):
    x = x.astype(np.float64)
    n = len(sigmas) - 1
    s_end = float(sigmas[-1])
    for i in range(n):
        sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
        gamma = (min(s_churn / n, 2**0.5 - 1)
                 if s_tmin <= sigma <= s_tmax else 0.0)
        sigma_hat = sigma * (1 + gamma)
        if gamma > 0:
            x = x + noise[i] * s_noise * math.sqrt(sigma_hat**2 - sigma**2)
        denoised = np_model(x, sigma_hat)
        d = (x - denoised) / sigma_hat
        dt = sigma_next - sigma_hat
        if sigma_next == s_end:
            x = x + d * dt
        elif float(sigmas[i + 2]) == s_end:
            x_2 = x + d * dt
            denoised_2 = np_model(x_2, sigma_next)
            d_2 = (x_2 - denoised_2) / sigma_next
            w2 = sigma_next / (2 * float(sigmas[0]))
            x = x + (d * (1 - w2) + d_2 * w2) * dt
        else:
            x_2 = x + d * dt
            denoised_2 = np_model(x_2, sigma_next)
            d_2 = (x_2 - denoised_2) / sigma_next
            sigma_nn = float(sigmas[i + 2])
            x_3 = x_2 + d_2 * (sigma_nn - sigma_next)
            denoised_3 = np_model(x_3, sigma_nn)
            d_3 = (x_3 - denoised_3) / sigma_nn
            w2 = sigma_next / (3 * float(sigmas[0]))
            w3 = sigma_nn / (3 * float(sigmas[0]))
            x = x + (d * (1 - w2 - w3) + d_2 * w2 + d_3 * w3) * dt
    return x


def np_res_multistep(x, sigmas, noise=None, eta=0.0, s_noise=1.0):
    x = x.astype(np.float64)
    old = None
    for i in range(len(sigmas) - 1):
        sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
        sd, su = np_ancestral(sigma, sigma_next, eta) if eta \
            else (sigma_next, 0.0)
        denoised = np_model(x, sigma)
        if sd == 0 or old is None:
            d = (x - denoised) / sigma
            x = x + d * (sd - sigma)
        else:
            t, t_old = -math.log(sigma), -math.log(float(sigmas[i - 1]))
            t_next = -math.log(sd)
            h = t_next - t
            c2 = (t_old - t) / h
            phi1 = math.expm1(-h) / (-h)
            phi2 = (phi1 - 1.0) / (-h)
            b1 = phi1 - phi2 / c2
            b2 = phi2 / c2
            x = math.exp(-h) * x + h * (b1 * denoised + b2 * old)
        if eta and sigma_next > 0:
            x = x + noise[i] * s_noise * su
        old = denoised
    return x


def np_ddpm(x, sigmas, noise, s_noise=1.0):
    x = x.astype(np.float64)
    for i in range(len(sigmas) - 1):
        sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
        denoised = np_model(x, sigma)
        eps = (x - denoised) / sigma
        x_vp = x / math.sqrt(1 + sigma**2)
        ac = 1 / (sigma**2 + 1)
        ac_prev = 1 / (sigma_next**2 + 1)
        alpha = ac / ac_prev
        mu = math.sqrt(1 / alpha) * (
            x_vp - (1 - alpha) * eps / math.sqrt(1 - ac))
        if sigma_next > 0:
            mu = mu + math.sqrt(
                (1 - alpha) * (1 - ac_prev) / (1 - ac)) * s_noise * noise[i]
            x = mu * math.sqrt(1 + sigma_next**2)
        else:
            x = mu
    return x


def test_dpm_2_oracle(x0):
    sigmas = karras()
    _close(_run("dpm_2", x0, sigmas), np_dpm_2(x0, sigmas, None))


def test_dpm_2_churn_oracle(x0):
    sigmas = karras()
    stream = make_stream(N_STEPS, seed=17)
    _close(_run("dpm_2", x0, sigmas, stream, s_churn=0.6, s_tmin=0.05,
                s_tmax=6.0),
           np_dpm_2(x0, sigmas, stream, s_churn=0.6, s_tmin=0.05,
                    s_tmax=6.0))


@pytest.mark.parametrize("eta", [1.0, 0.4])
def test_dpm_2_ancestral_oracle(x0, eta):
    sigmas = karras()
    stream = make_stream(N_STEPS, seed=19)
    _close(_run("dpm_2_ancestral", x0, sigmas, stream, eta=eta),
           np_dpm_2_ancestral(x0, sigmas, stream, eta=eta))


def test_heunpp2_oracle(x0):
    sigmas = karras()
    _close(_run("heunpp2", x0, sigmas), np_heunpp2(x0, sigmas))


def test_heunpp2_churn_oracle(x0):
    sigmas = karras()
    stream = make_stream(N_STEPS, seed=23)
    _close(_run("heunpp2", x0, sigmas, stream, s_churn=0.5),
           np_heunpp2(x0, sigmas, stream, s_churn=0.5))


def test_res_multistep_oracle(x0):
    sigmas = karras()
    _close(_run("res_multistep", x0, sigmas), np_res_multistep(x0, sigmas))


@pytest.mark.parametrize("eta", [1.0, 0.5])
def test_res_multistep_ancestral_oracle(x0, eta):
    sigmas = karras()
    stream = make_stream(N_STEPS, seed=29)
    _close(_run("res_multistep_ancestral", x0, sigmas, stream, eta=eta),
           np_res_multistep(x0, sigmas, stream, eta=eta))


def test_ddpm_oracle(x0):
    sigmas = karras()
    stream = make_stream(N_STEPS, seed=31)
    _close(_run("ddpm", x0, sigmas, stream), np_ddpm(x0, sigmas, stream))


# ---------------------------------------------------------------------------
# linear-multistep family (coefficients by numerical quadrature so the
# analytic Lagrange integrals are independently checked)
# ---------------------------------------------------------------------------

def _quad_lagrange(nodes, start, end, n_quad=20001):
    taus = np.linspace(start, end, n_quad)
    out = []
    for j in range(len(nodes)):
        vals = np.ones_like(taus)
        for k in range(len(nodes)):
            if k == j:
                continue
            vals = vals * (taus - nodes[k]) / (nodes[j] - nodes[k])
        out.append(np.trapezoid(vals, taus))
    return out


def np_d_multistep(x, sigmas, max_order, mode):
    x = x.astype(np.float64)
    sig = np.asarray(sigmas, np.float64)
    ds = []
    ab = {1: [1.0], 2: [1.5, -0.5], 3: [23 / 12, -16 / 12, 5 / 12],
          4: [55 / 24, -59 / 24, 37 / 24, -9 / 24]}
    for i in range(len(sig) - 1):
        denoised = np_model(x, sig[i])
        d = (x - denoised) / sig[i]
        ds.insert(0, d)
        ds = ds[:max_order]
        order = min(i + 1, max_order)
        if mode == "deis" and sig[i + 1] <= 0:
            order = 1
        if mode == "fixed":
            coeffs = [c * (sig[i + 1] - sig[i]) for c in ab[order]]
        else:
            nodes = sig[i - order + 1:i + 1][::-1]
            coeffs = _quad_lagrange(nodes, sig[i], sig[i + 1])
        for c, dk in zip(coeffs, ds):
            x = x + c * dk
    return x


@pytest.mark.parametrize("name,max_order,mode", [
    ("deis", 3, "deis"),
    ("lms", 4, "lagrange"),
    ("ipndm", 4, "fixed"),
    ("ipndm_v", 4, "lagrange"),
])
def test_d_multistep_oracles(x0, name, max_order, mode):
    sigmas = karras()
    _close(_run(name, x0, sigmas),
           np_d_multistep(x0, sigmas, max_order, mode))


def test_ipndm_v_order2_matches_nested_ab_form():
    """ComfyUI's ipndm_v order-2 nested coefficients ((2 + hn/hn1)/2,
    -(hn/hn1)/2, scaled by hn) equal the Lagrange-basis integrals."""
    from sonar_tpu.samplers.multistep import _lagrange_integrals

    t_prev, t_cur, t_next = 5.0, 3.0, 1.7
    hn = t_next - t_cur
    hn1 = t_cur - t_prev
    want = [hn * (2 + hn / hn1) / 2, hn * (-(hn / hn1) / 2)]
    got = _lagrange_integrals([t_cur, t_prev], t_cur, t_next)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_multistep_rejects_traced_sigmas(x0):
    with pytest.raises(TypeError, match="concrete sigma"):
        jax.jit(lambda s: KDIFFUSION_SAMPLERS["deis"](
            jx_model, jnp.asarray(x0), s))(jnp.asarray(karras()))


# ---------------------------------------------------------------------------
# UniPC — independent list-based predictor-corrector oracle
# ---------------------------------------------------------------------------

def np_unipc(x, sigmas, variant="bh1"):
    ts = np.asarray(sigmas, np.float64).copy()
    if ts[-1] == 0:
        ts[-1] = 0.001
    alpha = lambda s: 1.0 / math.sqrt(1 + s * s)  # noqa: E731
    sig_vp = lambda s: s / math.sqrt(1 + s * s)  # noqa: E731
    lam = lambda s: -math.log(s)  # noqa: E731
    steps = len(ts) - 1
    order_cap = max(1, min(3, steps - 1))

    def model_fn(xv, s):
        # vp-space x0 prediction == EDM denoised of x_edm = xv / alpha
        return np_model(xv / alpha(s), s)

    def update(x, m_list, t_list, t, order, use_corrector):
        t0, m0 = t_list[-1], m_list[-1]
        h = lam(t) - lam(t0)
        rks, d1s = [], []
        for i in range(1, order):
            ti, mi = t_list[-(i + 1)], m_list[-(i + 1)]
            rk = (lam(ti) - lam(t0)) / h
            rks.append(rk)
            d1s.append((mi - m0) / rk)
        rks.append(1.0)
        rks = np.asarray(rks)
        hh = -h
        h_phi_1 = np.expm1(hh)
        B_h = hh if variant == "bh1" else np.expm1(hh)
        R, b = [], []
        h_phi_k = h_phi_1 / hh - 1
        fac = 1
        for i in range(1, order + 1):
            R.append(rks ** (i - 1))
            b.append(h_phi_k * fac / B_h)
            fac *= i + 1
            h_phi_k = h_phi_k / hh - 1 / fac
        R = np.stack(R)
        b = np.asarray(b)
        if d1s:
            d1s_arr = np.stack(d1s)
            rhos_p = (np.asarray([0.5]) if order == 2
                      else np.linalg.solve(R[:-1, :-1], b[:-1]))
        else:
            d1s_arr = None
        rhos_c = (np.asarray([0.5]) if order == 1
                  else np.linalg.solve(R, b))
        x_base = sig_vp(t) / sig_vp(t0) * x - alpha(t) * h_phi_1 * m0
        pred = (np.tensordot(rhos_p, d1s_arr, axes=1)
                if d1s_arr is not None else 0.0)
        x_t = x_base - alpha(t) * B_h * pred
        model_t = None
        if use_corrector:
            model_t = model_fn(x_t, t)
            corr = (np.tensordot(rhos_c[:-1], d1s_arr, axes=1)
                    if d1s_arr is not None else 0.0)
            x_t = x_base - alpha(t) * (
                B_h * (corr + rhos_c[-1] * (model_t - m0)))
        return x_t, model_t

    x = x.astype(np.float64) * alpha(ts[0])
    m_list = [model_fn(x, ts[0])]
    t_list = [ts[0]]
    for init_order in range(1, order_cap):
        t = ts[init_order]
        x, m = update(x, m_list, t_list, t, init_order, True)
        if m is None:
            m = model_fn(x, t)
        m_list.append(m)
        t_list.append(t)
    for step in range(order_cap, steps + 1):
        t = ts[step]
        step_order = min(order_cap, steps + 1 - step)
        x, m = update(x, m_list, t_list, t, step_order, step != steps)
        if m is None:
            m = model_fn(x, t)
        m_list.append(m)
        t_list.append(t)
    return x / alpha(ts[-1])


@pytest.mark.parametrize("name,variant", [("uni_pc", "bh1"),
                                          ("uni_pc_bh2", "bh2")])
def test_unipc_oracle(x0, name, variant):
    sigmas = karras()
    _close(_run(name, x0, sigmas), np_unipc(x0, sigmas, variant))


def test_unipc_short_schedules(x0):
    """steps < 3 exercises the order-cap clamps (order_cap 1 at 2 sigmas,
    init-phase-free plans)."""
    for n in (1, 2, 3):
        sigmas = karras(max(n, 2))[:n + 1].copy()
        sigmas[-1] = 0.0
        got = _run("uni_pc", x0, sigmas)
        want = np_unipc(x0, sigmas)
        _close(got, want)


# ---------------------------------------------------------------------------
# DPM-Solver fast / adaptive — numpy mirror of the published solver
# ---------------------------------------------------------------------------

def _np_eps(x, t):
    sigma = math.exp(-t)
    return (x - np_model(x, sigma)) / sigma


def _np_dpm1(x, t, t_next, eps):
    return x - math.exp(-t_next) * math.expm1(t_next - t) * eps


def _np_dpm2(x, t, t_next, eps, r1=0.5):
    h = t_next - t
    s1 = t + r1 * h
    u1 = x - math.exp(-s1) * math.expm1(r1 * h) * eps
    eps_r1 = _np_eps(u1, s1)
    x2 = (x - math.exp(-t_next) * math.expm1(h) * eps
          - math.exp(-t_next) / (2 * r1) * math.expm1(h) * (eps_r1 - eps))
    return x2, eps_r1


def _np_dpm3(x, t, t_next, eps, eps_r1, r1=1 / 3, r2=2 / 3):
    h = t_next - t
    s2 = t + r2 * h
    u2 = (x - math.exp(-s2) * math.expm1(r2 * h) * eps
          - math.exp(-s2) * (r2 / r1)
          * (math.expm1(r2 * h) / (r2 * h) - 1) * (eps_r1 - eps))
    eps_r2 = _np_eps(u2, s2)
    return (x - math.exp(-t_next) * math.expm1(h) * eps
            - math.exp(-t_next) / r2 * (math.expm1(h) / h - 1)
            * (eps_r2 - eps))


def np_dpm_fast(x, sigmas, eta=0.0, noise=None, s_noise=1.0):
    x = x.astype(np.float64)
    sig = np.asarray(sigmas, np.float64)
    sigma_max = float(sig[0])
    sigma_min = float(sig[-1]) if sig[-1] > 0 else float(sig[-2])
    nfe = len(sig) - 1
    t_start, t_end = -math.log(sigma_max), -math.log(sigma_min)
    m = nfe // 3 + 1
    ts = np.linspace(t_start, t_end, m + 1)
    orders = ([3] * (m - 2) + [2, 1] if nfe % 3 == 0
              else [3] * (m - 1) + [nfe % 3])
    for i, order in enumerate(orders):
        t, t_next = float(ts[i]), float(ts[i + 1])
        if eta:
            sg, sn = math.exp(-t), math.exp(-t_next)
            sd, _ = np_ancestral(sg, sn, eta)
            t_ = min(t_end, -math.log(max(sd, 1e-12)))
            su = math.sqrt(max(sn**2 - math.exp(-t_) ** 2, 0.0))
        else:
            t_, su = t_next, 0.0
        eps = _np_eps(x, t)
        if order == 1:
            x = _np_dpm1(x, t, t_, eps)
        elif order == 2:
            x, _ = _np_dpm2(x, t, t_, eps)
        else:
            x2, eps_r1 = _np_dpm2(x, t, t_, eps, r1=1 / 3)
            x = _np_dpm3(x, t, t_, eps, eps_r1)
        if eta:
            x = x + noise[i] * s_noise * su
    return x


def np_dpm_adaptive(x, sigmas, order=3, rtol=0.05, atol=0.0078,
                    h_init=0.05, accept_safety=0.81, icoeff=1.0):
    x = x.astype(np.float64)
    sig = np.asarray(sigmas, np.float64)
    sigma_max = float(sig[0])
    sigma_min = float(sig[-1]) if sig[-1] > 0 else float(sig[-2])
    s, t_end = -math.log(sigma_max), -math.log(sigma_min)
    h = abs(h_init)
    b1 = icoeff / order
    errs = None
    x_prev = x
    it = 0
    while s < t_end - 1e-5 and it < 1000:
        t = min(t_end, s + h)
        eps = _np_eps(x, s)
        if order == 2:
            x_low = _np_dpm1(x, s, t, eps)
            x_high, _ = _np_dpm2(x, s, t, eps)
        else:
            x_low, eps_r1 = _np_dpm2(x, s, t, eps, r1=1 / 3)
            x_high = _np_dpm3(x, s, t, eps, eps_r1)
        delta = np.maximum(atol, rtol * np.maximum(np.abs(x_low),
                                                   np.abs(x_prev)))
        error = (np.linalg.norm((x_low - x_high) / delta)
                 / math.sqrt(x.size))
        inv = 1.0 / (error + 1e-8)
        if errs is None:
            errs = [inv, inv, inv]
        errs[0] = inv
        factor = 1 + math.atan(errs[0] ** b1 - 1)
        accept = factor >= accept_safety
        if accept:
            x_prev = x_low
            x = x_high
            s = t
            errs[2] = errs[1]
            errs[1] = errs[0]
        h *= factor
        it += 1
    return x


def test_dpm_fast_oracle(x0):
    for n in (7, 8, 9, 10):  # hits every segment-plan shape (nfe % 3)
        sigmas = karras(n)
        _close(_run("dpm_fast", x0, sigmas), np_dpm_fast(x0, sigmas))


def test_dpm_fast_eta_oracle(x0):
    sigmas = karras(9)
    m = (len(sigmas) - 1) // 3 + 1
    stream = make_stream(m + 1, seed=37)
    _close(_run("dpm_fast", x0, sigmas, stream, eta=0.7),
           np_dpm_fast(x0, sigmas, eta=0.7, noise=stream))


@pytest.mark.parametrize("order", [2, 3])
def test_dpm_adaptive_oracle(x0, order):
    sigmas = karras()
    got = _run("dpm_adaptive", x0, sigmas, order=order)
    want = np_dpm_adaptive(x0, sigmas, order=order)
    # accept/reject decisions quantize the trajectory: f32-vs-f64 factor
    # rounding near the threshold would flip steps, so the tolerance is
    # looser than the fixed-step oracles
    _close(got, want, tol=2e-3)


def test_registry_covers_common_comfy_names():
    """VERDICT r4 item 3: registry >= 22 including the SamplerConfigOverride
    wrap set (uni_pc, dpm_2(_ancestral), dpm_fast/adaptive, heunpp2, deis,
    ipndm, res_multistep)."""
    from sonar_tpu.samplers import SAMPLERS

    needed = {"uni_pc", "uni_pc_bh2", "dpm_2", "dpm_2_ancestral",
              "dpm_fast", "dpm_adaptive", "heunpp2", "deis", "ipndm",
              "ipndm_v", "lms", "ddpm", "res_multistep",
              "res_multistep_ancestral"}
    assert needed <= set(SAMPLERS)
    assert len(SAMPLERS) >= 22


def test_pipeline_forwards_only_declared_kwargs(x0):
    """Code-review r5: bare **kw wrappers (uni_pc, res_multistep*) read
    as 'accepts everything' to SonarPipeline._sampler_params, so a
    pipeline-configured noise item was forwarded into samplers that
    don't take one -> TypeError. uni_pc must IGNORE the noise (like the
    reference node) and res_multistep_ancestral must ACCEPT it."""
    from sonar_tpu.api.pipeline import SonarPipeline
    from sonar_tpu.noise.presets import get_noise_item

    sigmas = karras()

    def model(x, sigma_b, **kw):
        return jx_model(x, sigma_b)

    for name in ("uni_pc", "uni_pc_bh2", "res_multistep",
                 "res_multistep_ancestral"):
        pipe = SonarPipeline(model=model, sampler=name,
                             noise=get_noise_item("pyramid"),
                             eta=0.8, s_noise=0.9, seed=3)
        out = np.asarray(pipe(jnp.asarray(x0), sigmas))
        assert out.shape == x0.shape and np.isfinite(out).all(), name
    # the filter must actually see the explicit signatures
    for name in ("uni_pc", "res_multistep_ancestral"):
        pipe = SonarPipeline(model=model, sampler=name)
        accepts = pipe._sampler_params()
        assert accepts is not None, name
    assert "noise_item" not in SonarPipeline(
        model=model, sampler="uni_pc")._sampler_params()
    assert "noise_item" in SonarPipeline(
        model=model, sampler="res_multistep_ancestral")._sampler_params()


@pytest.mark.parametrize("name", ["res_multistep_ancestral", "ddpm"])
def test_final_step_never_advances_noise_stream(name, x0):
    """Code-review r5: the reference draws only when sigmas[i+1] > 0;
    the final (sigma_next == 0) step must neither draw nor advance the
    carried noise state (a brownian item would fold -log(0) into its
    endpoint cache)."""
    fn = KDIFFUSION_SAMPLERS[name]
    sigmas = jnp.asarray(karras())
    xj = jnp.asarray(x0)
    n = int(sigmas.shape[0]) - 1
    kw = dict(seed=11, return_state=True)
    _, carry_full = fn(jx_model, xj, sigmas, stop_step=n, **kw)
    _, carry_prev = fn(jx_model, xj, sigmas, stop_step=n - 1, **kw)
    ns_full = jax.tree_util.tree_leaves(carry_full[-1])
    ns_prev = jax.tree_util.tree_leaves(carry_prev[-1])
    assert len(ns_full) == len(ns_prev)
    for a, b in zip(ns_full, ns_prev):
        if jnp.issubdtype(a.dtype, jax.dtypes.prng_key):
            a, b = jax.random.key_data(a), jax.random.key_data(b)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
