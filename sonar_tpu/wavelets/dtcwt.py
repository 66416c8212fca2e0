"""Dual-tree complex wavelet transform (DTCWT), designed from first
principles (reference capability: pytorch_wavelets DTCWTForward/Inverse via
py/wavelet_functions.py:57-75; ScatLayer).

No Kingsbury coefficient tables are copied: the q-shift filter is designed
here by numerical optimization over the paraunitary lattice
parametrization — orthonormality (and hence per-tree perfect
reconstruction) holds for *any* lattice angles by construction; the angles
are chosen to minimize stopband energy and the deviation of the passband
group delay from the quarter-sample target (L−1)/2 − 1/4 (Kingsbury's
q-shift condition: tree b = time-reversed tree a then has +1/4, giving the
half-sample inter-tree delay that makes w_a + j·w_b approximately
analytic).

Structure (standard dual tree):
- level 1: both trees use the same odd-length biorthogonal pair
  (our spline bior2.2 bank), tree b offset by one sample (circular shift —
  the transform runs in periodization mode);
- levels ≥ 2: tree a uses the designed q-shift filter, tree b its reverse;
- 2D: the 4 (row-tree, col-tree) combinations of each of LH/HL/HH combine
  into 6 oriented complex subbands
  z1 = ((aa − bb) + j(ab + ba))/√2, z2 = ((aa + bb) + j(ab − ba))/√2;
- inverse: unpack the 4 combos, invert each tree independently (each is a
  PR filter bank), average — exact reconstruction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .coeffs import WaveletFilters, _orthogonal_bank


# ---------------------------------------------------------------------------
# q-shift filter design
# ---------------------------------------------------------------------------


def _lattice_to_filter(thetas: np.ndarray) -> np.ndarray:
    """Paraunitary lattice → orthonormal scaling filter of length 2·len(thetas).
    Any angle vector yields an orthonormal two-channel bank (PR by
    construction)."""
    e0 = np.array([np.cos(thetas[0])])
    e1 = np.array([np.sin(thetas[0])])
    for th in thetas[1:]:
        e0d = np.concatenate([e0, [0.0]])
        e1d = np.concatenate([[0.0], e1])
        c, s = np.cos(th), np.sin(th)
        e0, e1 = c * e0d - s * e1d, s * e0d + c * e1d
    h = np.empty(2 * len(e0))
    h[0::2] = e0
    h[1::2] = e1
    return h * np.sqrt(2.0)  # DC gain √2 convention (‖h‖ = 1 → scaled)


def _qshift_objective(thetas: np.ndarray, length: int) -> float:
    h = _lattice_to_filter(thetas)
    n = np.arange(len(h))
    w_pass = np.linspace(0.01, np.pi * 0.45, 48)
    w_stop = np.linspace(np.pi * 0.6, np.pi, 48)
    E = np.exp(-1j * np.outer(w_pass, n))
    H = E @ h
    num = (E * n) @ h
    delay = np.real(num / np.where(np.abs(H) < 1e-8, 1e-8, H))
    target = (length - 1) / 2.0 - 0.25
    Es = np.exp(-1j * np.outer(w_stop, n))
    stop = np.abs(Es @ h) ** 2
    dc = (h.sum() - np.sqrt(2.0)) ** 2
    return (
        10.0 * float(np.mean((delay - target) ** 2))
        + 2.0 * float(np.mean(stop))
        + 50.0 * float(dc)
    )


@functools.lru_cache(maxsize=None)
def qshift_filter(length: int = 10) -> np.ndarray:
    """Design the tree-a q-shift scaling filter (even length)."""
    from scipy.optimize import minimize

    k = length // 2
    best_h, best_f = None, np.inf
    for seed in range(4):
        rng = np.random.default_rng(seed)
        x0 = rng.uniform(-0.6, 0.6, k)
        x0[0] = np.pi / 4 + rng.uniform(-0.2, 0.2)
        res = minimize(_qshift_objective, x0, args=(length,), method="BFGS",
                       options={"maxiter": 400})
        if res.fun < best_f:
            best_f, best_h = res.fun, _lattice_to_filter(res.x)
    return best_h


@functools.lru_cache(maxsize=None)
def qshift_banks(length: int = 12) -> tuple[WaveletFilters, WaveletFilters]:
    """(tree_a, tree_b) orthonormal banks; tree b = time-reversed tree a.
    The designed filter is renormalized to the Σh = √2 / ‖h‖ = 1 convention
    the filter-bank kernels assume."""
    h = qshift_filter(length)
    h = h / np.linalg.norm(h)
    if h.sum() < 0:
        h = -h
    # The analysis path correlates with the bank's scaling filter g (dec_lo =
    # g reversed ⇒ conv with rev(g)), so the analysis delay is (L−1) − d(g).
    # d(h) = (L−1)/2 − 1/4 ⇒ building tree a from rev(h) and tree b from h
    # gives analysis delays (L−1)/2 ∓ 1/4: tree b lags tree a by exactly the
    # half sample the dual tree needs (accumulating with the level-1 +1 roll).
    tree_a = _orthogonal_bank("qshift_a_native", h[::-1].copy())
    tree_b = _orthogonal_bank("qshift_b_native", h)
    return tree_a, tree_b


# ---------------------------------------------------------------------------
# Near-symmetric level-1 biorthogonal pair, designed in-repo
# (tools/design_nearsym.py). With the one-sample-roll level-1 scheme, ANY
# orthonormal bank has a hard level-1 one-sidedness ceiling of
# 1/2 + 1/pi ~= 0.8183 (the |1 + j e^{-jw}|^2 = 2(1+sin w) roll factor
# integrated against a halfband |H1|^2). Beating it requires a biorthogonal
# pair whose ANALYSIS wavelet concentrates near w = pi/2 — the "near-sym"
# idea. This (13, 17)-tap pair was designed by constrained optimization
# (PR-halfband equality constraints; objective = level-1 analyticity +
# level-2 cascade analyticity + lowpass quality of both filters), reaching
# level-1 one-sidedness 0.941 with exact PR. No reference/Kingsbury
# coefficient tables were used.
# ---------------------------------------------------------------------------

_NEARSYM_H0 = np.array([  # analysis lowpass, 13 taps, symmetric
    0.02086858978935197, 0.05161814280931655, -0.04900413218788433,
    -0.18047282838505307, 0.09841321468146728, 0.4756072009396571,
    0.5801531870793837, 0.4756072009396571, 0.09841321468146728,
    -0.18047282838505307, -0.04900413218788433, 0.05161814280931655,
    0.02086858978935197,
])
_NEARSYM_G0 = np.array([  # synthesis lowpass, 17 taps, symmetric
    0.0, 0.08947134751275738, -0.2213060316903645, -0.09614112025933057,
    0.4918810179857031, -0.01761700970737806, -0.6282685810788478,
    0.37784017304724177, 1.4224939707535285, 0.37784017304724177,
    -0.6282685810788478, -0.01761700970737806, 0.4918810179857031,
    -0.09614112025933057, -0.2213060316903645, 0.08947134751275738, 0.0,
])


@functools.lru_cache(maxsize=None)
def near_sym_bank() -> WaveletFilters:
    """Assemble the near-sym (13,17) pair into the filter-bank convention the
    periodization kernels expect (offsets/parities found by direct search
    against the JAX analysis/synthesis round trip; PR error ~3e-7 fp32)."""
    h0 = _NEARSYM_H0 * (np.sqrt(2.0) / _NEARSYM_H0.sum())
    g0 = _NEARSYM_G0 * (np.sqrt(2.0) / _NEARSYM_G0.sum())
    L = 18

    def pad(f, off):
        return np.concatenate([np.zeros(off), f, np.zeros(L - len(f) - off)])

    dl, rl = pad(h0, 2), pad(g0, 1)
    dh = rl.copy()
    dh[0::2] *= -1
    rh = dl.copy()
    rh[1::2] *= -1
    return WaveletFilters("near_sym_native", dl, dh, rl, rh)


def _level1_banks() -> tuple[WaveletFilters, WaveletFilters]:
    """Level-1: same bank in both trees (tree b applied to a one-sample-
    rolled signal — the standard level-1 dual-tree trick). The designed
    near-sym pair reaches level-1 one-sidedness 0.941 (vs the 0.8183
    structural ceiling of any orthonormal bank); levels ≥2 reach 0.96-0.98
    via the designed q-shift pair."""
    w = near_sym_bank()
    return w, w


# published-table names resolve through wavelets/kingsbury.py; the
# designed in-repo banks remain available as near_sym_b (their
# length class) and the explicit "native" names
@functools.lru_cache(maxsize=None)
def _resolve_level1(biort: str) -> WaveletFilters:
    from .kingsbury import biort_level1_bank

    if biort in ("legall", "near_sym_a", "antonini", "near_sym_b"):
        return biort_level1_bank(biort)
    # _bp variants substitute their base bank (the bandpass-modified 45°
    # filters of the rotationally-symmetric transform are out of scope);
    # "native" keeps the in-repo designed (13,17) pair available
    if biort == "near_sym_a_bp":
        return biort_level1_bank("near_sym_a")
    if biort == "near_sym_b_bp":
        return biort_level1_bank("near_sym_b")
    if biort == "native":
        return near_sym_bank()
    raise ValueError(f"Unknown biort {biort!r}; valid: legall, near_sym_a, "
                     "antonini, near_sym_b, native")


@functools.lru_cache(maxsize=None)
def _resolve_qshift(qshift: str) -> tuple[WaveletFilters, WaveletFilters]:
    from .kingsbury import qshift_tree_banks

    if qshift in ("qshift_06", "qshift_a", "qshift_b", "qshift_c",
                  "qshift_d", "qshift_b_bp"):
        return qshift_tree_banks(qshift)
    if qshift == "native":
        return qshift_banks()
    raise ValueError(f"Unknown qshift {qshift!r}; valid: qshift_06, "
                     "qshift_a-qshift_d, native")


# ---------------------------------------------------------------------------
# forward / inverse
# ---------------------------------------------------------------------------


def dtcwt2d(x, level: int = 3, *, biort: str = "near_sym_a",
            qshift: str = "qshift_a"):
    """Forward DTCWT of (B, C, H, W) → (yls, yhs):

    - ``yls``: tuple of 4 real lowpasses (one per tree combo aa/ab/ba/bb);
    - ``yhs``: list of J complex arrays shaped (B, C, 6, H_j, W_j) — the 6
      oriented subbands (matching pytorch_wavelets' orientation axis).

    ``biort``/``qshift`` select the named banks (published Kingsbury/CDF
    tables via wavelets/kingsbury.py; reference surface
    py/wavelet_functions.py:62-101).
    """
    combos = {}
    for rt in "ab":  # row tree
        for ct in "ab":  # col tree
            combos[rt + ct] = _tree_dwt2d_mixed(x, level, rt, ct,
                                                biort, qshift)
    yls = tuple(combos[k][0] for k in ("aa", "ab", "ba", "bb"))
    yhs = []
    for j in range(level):
        baa = combos["aa"][1][j]
        bab = combos["ab"][1][j]
        bba = combos["ba"][1][j]
        bbb = combos["bb"][1][j]
        z1 = ((baa - bbb) + 1j * (bab + bba)) / np.sqrt(2.0)
        z2 = ((baa + bbb) + 1j * (bab - bba)) / np.sqrt(2.0)
        # pytorch_wavelets orientation order 15,45,75,105,135,165 deg:
        # (lh,hh,hl) from the first quad pair, then (hl,hh,lh) from the
        # second — z1/z2 band axis here is (lh,hl,hh)
        yhs.append(jnp.concatenate(
            [z1[:, :, (0, 2, 1)], z2[:, :, (1, 2, 0)]], axis=2))
    return yls, yhs


def _mixed_banks(lvl: int, rt: str, ct: str, biort: str, qshift: str):
    w1 = _resolve_level1(biort)
    qa, qb = _resolve_qshift(qshift)
    if lvl == 0:
        return w1, w1
    return (qa if ct == "a" else qb), (qa if rt == "a" else qb)


def _tree_dwt2d_mixed(x, level: int, rt: str, ct: str,
                      biort: str = "near_sym_a", qshift: str = "qshift_a"):
    """Row tree rt filters rows (axis -2), col tree ct filters cols (-1)."""
    from .dwt import _afb1d

    yl = x
    yh = []
    for lvl in range(level):
        w_col, w_row = _mixed_banks(lvl, rt, ct, biort, qshift)
        if lvl == 0:
            shifts = (1 if rt == "b" else 0, 1 if ct == "b" else 0)
            if any(shifts):
                yl = jnp.roll(yl, shifts, axis=(-2, -1))
        lo, hi = _afb1d(yl, w_col.dec_lo, w_col.dec_hi, "periodization")
        ll, lh = _afb1d(jnp.swapaxes(lo, -1, -2), w_row.dec_lo, w_row.dec_hi,
                        "periodization")
        hl, hh = _afb1d(jnp.swapaxes(hi, -1, -2), w_row.dec_lo, w_row.dec_hi,
                        "periodization")
        yl = jnp.swapaxes(ll, -1, -2)
        bands = jnp.stack([jnp.swapaxes(lh, -1, -2), jnp.swapaxes(hl, -1, -2),
                           jnp.swapaxes(hh, -1, -2)], axis=2)
        yh.append(bands)
    return yl, yh


def _tree_idwt2d_mixed(yl, yh, rt: str, ct: str, out_hw,
                       biort: str = "near_sym_a", qshift: str = "qshift_a"):
    from .dwt import _sfb1d

    x = yl
    n = len(yh)
    for j, bands in enumerate(reversed(yh)):
        lvl = n - 1 - j
        w_col, w_row = _mixed_banks(lvl, rt, ct, biort, qshift)
        lh, hl, hh = bands[:, :, 0], bands[:, :, 1], bands[:, :, 2]
        bh, bw = lh.shape[-2], lh.shape[-1]
        if x.shape[-2:] != (bh, bw):
            x = x[..., :bh, :bw]
        lo = jnp.swapaxes(
            _sfb1d(jnp.swapaxes(x, -1, -2), jnp.swapaxes(lh, -1, -2),
                   w_row.rec_lo, w_row.rec_hi, "periodization", bh * 2), -1, -2)
        hi = jnp.swapaxes(
            _sfb1d(jnp.swapaxes(hl, -1, -2), jnp.swapaxes(hh, -1, -2),
                   w_row.rec_lo, w_row.rec_hi, "periodization", bh * 2), -1, -2)
        x = _sfb1d(lo, hi, w_col.rec_lo, w_col.rec_hi, "periodization", bw * 2)
        if lvl == 0:
            shifts = (-1 if rt == "b" else 0, -1 if ct == "b" else 0)
            if any(shifts):
                x = jnp.roll(x, shifts, axis=(-2, -1))
    return x[..., : out_hw[0], : out_hw[1]]


def idtcwt2d(yls, yhs, out_hw=None, *, biort: str = "near_sym_a",
             qshift: str = "qshift_a"):
    """Inverse DTCWT: unpack the complex subbands back into the 4 tree
    combos, invert each (PR per tree), average."""
    level = len(yhs)
    if out_hw is None:
        out_hw = (yhs[0].shape[-2] * 2, yhs[0].shape[-1] * 2)
    trees = {}
    keys = ("aa", "ab", "ba", "bb")
    for ki, key in enumerate(keys):
        yh_tree = []
        for z in yhs:
            n_or = z.shape[2] // 2
            za, zb = z[:, :, :n_or], z[:, :, n_or:]
            # undo the (15,45,75 | 105,135,165) orientation order back to
            # the per-tree (lh,hl,hh) band axis
            z1 = za[:, :, (0, 2, 1)]
            z2 = zb[:, :, (2, 0, 1)]
            if key == "aa":
                bands = (jnp.real(z1) + jnp.real(z2)) / np.sqrt(2.0)
            elif key == "bb":
                bands = (jnp.real(z2) - jnp.real(z1)) / np.sqrt(2.0)
            elif key == "ab":
                bands = (jnp.imag(z1) + jnp.imag(z2)) / np.sqrt(2.0)
            else:  # ba
                bands = (jnp.imag(z1) - jnp.imag(z2)) / np.sqrt(2.0)
            yh_tree.append(bands)
        trees[key] = _tree_idwt2d_mixed(yls[ki], yh_tree, key[0], key[1],
                                        out_hw, biort, qshift)
    return (trees["aa"] + trees["ab"] + trees["ba"] + trees["bb"]) / 4.0
