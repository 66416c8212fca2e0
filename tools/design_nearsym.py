"""Design the near-sym level-1 biorthogonal pair used by the native DTCWT
(sonar_tpu/wavelets/dtcwt.py _NEARSYM_H0/_NEARSYM_G0).

Background: with the one-sample-roll level-1 dual-tree scheme, any
ORTHONORMAL bank has a hard level-1 one-sidedness ceiling of 1/2 + 1/pi
(~0.8183): the complex spectrum is |H1(w)|^2 * 2(1+sin w) and the halfband
constraint |H0|^2+|H1|^2=2 pins the integral. A biorthogonal pair whose
analysis wavelet concentrates near w=pi/2 lifts the ceiling — the
"near-sym" idea.

Method: symmetric h0 (13 taps, free) determines the PR-complementary
symmetric g0 (17 taps) up to ~1 null-space DOF (exposed as an extra
optimizer parameter). Objective: level-1 analyticity + level-2 cascade
analyticity (with the in-repo q-shift pair) + lowpass quality of both
filters + conditioning. Lengths (13, 17) (not 13/19) so the base filter
delay parity matches the even-length padded filter-bank convention of the
periodization kernels. Deterministic (fixed seeds); results are pasted
into dtcwt.py with a PR test guarding them.
"""
import numpy as np
import numpy.fft as fft
from scipy.optimize import minimize

LH, LG = 13, 17


def sym(half, L):
    return np.concatenate([half[1:][::-1], half])


def g0_family(h0):
    """Return (particular, null_basis) for symmetric PR-complementary g0."""
    kg = (LG + 1) // 2
    c = (LG - 1) // 2
    B = np.zeros((LG, kg))
    for i in range(kg):
        B[c + i, i] = 1.0
        if i > 0:
            B[c - i, i] = 1.0
    Lp = LH + LG - 1
    pc = (Lp - 1) // 2
    conv_mat = np.zeros((Lp, LG))
    for n in range(Lp):
        for m in range(max(0, n - LH + 1), min(LG, n + 1)):
            conv_mat[n, m] = h0[n - m]
    rows, vals = [], []
    for k in range(1, pc // 2 + 1):
        for s in (+1, -1):
            idx = pc + s * 2 * k
            if 0 <= idx < Lp:
                rows.append(conv_mat[idx] @ B)
                vals.append(0.0)
    rows.append(conv_mat[pc] @ B)
    vals.append(1.0)
    rows.append(np.ones(LG) @ B)
    vals.append(np.sqrt(2.0))
    A = np.asarray(rows)
    b = np.asarray(vals)
    x_p, *_ = np.linalg.lstsq(A, b, rcond=None)
    _, s, vt = np.linalg.svd(A)
    null = vt[len(s[s > 1e-10]):].T  # (kg, n_null)
    return B @ x_p, B @ null if null.size else np.zeros((LG, 0)), A, b, B


def onesided_of_g0(g0):
    h1 = g0.copy()
    h1[::2] *= -1
    N = 4096
    w = np.fft.fftfreq(N) * 2 * np.pi
    H = fft.fft(h1, N)
    S = np.abs(H * (1 + 1j * np.exp(-1j * w))) ** 2
    pos = S[1:N // 2].sum()
    neg = S[N // 2 + 1:].sum()
    return max(pos, neg) / (pos + neg)


import sys as _sys

_sys.path.insert(0, "/root/repo")


def cascade2_metric(h0):
    """Level-2 cascade one-sidedness with the existing q-shift pair."""
    from sonar_tpu.wavelets.dtcwt import qshift_banks

    qa, qb = qshift_banks()
    lo1 = h0[::-1]
    hia = qa.dec_hi[::-1]
    hib = qb.dec_hi[::-1]

    def up(f, k):
        out = np.zeros(len(f) * k - (k - 1))
        out[::k] = f
        return out

    pa = np.concatenate([[0], np.convolve(lo1, up(hia, 2))])
    pb = np.convolve(lo1, up(hib, 2))
    Lm = max(len(pa), len(pb)) + 8
    pa = np.pad(pa, (0, Lm - len(pa)))
    pb = np.pad(pb, (0, Lm - len(pb)))
    S = np.abs(fft.fft(pa + 1j * pb, 8192)) ** 2
    return max(S[:4096].sum(), S[4096:].sum()) / S.sum()


def build(params):
    kh = (LH + 1) // 2
    h0 = sym(params[:kh], LH)
    s = h0.sum()
    if abs(s) < 1e-6:
        return None, None
    h0 = h0 * (np.sqrt(2.0) / s)
    gp, gnull, A, b, B = g0_family(h0)
    t = params[kh:]
    # use at most as many null dims as allocated parameters (a >2-dim
    # null space would otherwise shape-mismatch inside the optimizer)
    nt = min(gnull.shape[1], len(t))
    g0 = gp + (gnull[:, :nt] @ t[:nt] if nt else 0.0)
    res = np.abs(A @ np.linalg.lstsq(B, g0, rcond=None)[0] - b).max()
    if res > 1e-8:
        return None, None
    return h0, g0


def objective(params):
    h0, g0 = build(params)
    if h0 is None or not np.all(np.isfinite(g0)):
        return 1e6
    osd = onesided_of_g0(g0)
    N = 1024
    w = np.fft.fftfreq(N) * 2 * np.pi
    H0 = np.abs(fft.fft(h0, N))
    G0 = np.abs(fft.fft(g0, N))
    r2 = np.sqrt(2.0)
    # both lowpasses must BE lowpasses: flat passband, attenuated stopband
    h_pass = ((H0[np.abs(w) < 0.35 * np.pi] - r2) ** 2).mean()
    h_stop = (H0[np.abs(w) > 0.62 * np.pi] ** 2).mean()
    g_pass = ((G0[np.abs(w) < 0.30 * np.pi] - r2) ** 2).mean()
    g_stop = (G0[np.abs(w) > 0.65 * np.pi] ** 2).mean()
    vm = H0[N // 2] ** 2 + G0[N // 2] ** 2
    norm_pen = max(0.0, np.linalg.norm(g0) - 1.8) ** 2
    c2 = cascade2_metric(h0)
    return (-10.0 * osd - 8.0 * c2 + 3.0 * h_pass + 2.0 * h_stop + 2.0 * g_pass
            + 1.0 * g_stop + 5.0 * vm + 1.0 * norm_pen)


kh = (LH + 1) // 2
n_t = 2  # allow up to 2 null dims (clipped inside)
best = None
for seed in range(12):
    rng = np.random.default_rng(seed)
    x0 = np.concatenate([
        np.exp(-0.5 * (np.arange(kh) / 2.2) ** 2) * 0.5
        + rng.normal(0, 0.04, kh),
        rng.normal(0, 0.2, n_t),
    ])
    res = minimize(objective, x0, method="Nelder-Mead",
                   options={"maxiter": 8000, "xatol": 1e-9, "fatol": 1e-11})
    res = minimize(objective, res.x, method="Powell",
                   options={"maxiter": 4000})
    if best is None or res.fun < best.fun:
        best = res
    h0, g0 = build(res.x)
    osd = onesided_of_g0(g0) if g0 is not None else -1
    print(f"seed {seed}: f={res.fun:.4f} onesided={osd:.4f} "
          f"|g0|={np.linalg.norm(g0) if g0 is not None else -1:.2f}")

h0, g0 = build(best.x)
print("\nBEST one-sided:", onesided_of_g0(g0), "|g0|:", np.linalg.norm(g0))
np.save("/tmp/nearsym_h0.npy", h0); print("h0 =", repr(h0))
np.save("/tmp/nearsym_g0.npy", g0); print("g0 =", repr(g0))

import sys
sys.path.insert(0, "/root/repo")
from sonar_tpu.wavelets.coeffs import _np_pr_error
import itertools

L = max(LH, LG) + (max(LH, LG) % 2)


def pad(f, off):
    return np.concatenate([np.zeros(off), f, np.zeros(L - len(f) - off)])


found = None
for off_d in range(L - LH + 1):
    for off_r in range(L - LG + 1):
        dl, rl = pad(h0, off_d), pad(g0, off_r)
        for pd, pr_ in itertools.product((0, 1), (0, 1)):
            dh = rl.copy(); dh[pd::2] *= -1
            rh = dl.copy(); rh[pr_::2] *= -1
            err = _np_pr_error(dl, dh, rl, rh)
            if err < 1e-9:
                found = (off_d, off_r, pd, pr_, err)
                break
        if found: break
    if found: break
print("PR convention:", found)
