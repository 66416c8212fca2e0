"""Exact derivation of Kingsbury's near_sym_b (13,19)-tap DTCWT pair.

VERDICT r3 item 7 asked for the exact published ``near_sym_b`` bank or "a
principled derivation matching the published filters". This script IS that
derivation, in exact rational arithmetic end to end:

1. The published 13-tap h0o decimals (-0.0017578, 0, 0.0222656, -0.046875,
   -0.0482422, 0.296875, 0.5554688, ...) are the rationals
   (-9, 0, 114, -240, -247, 1520, 2844, ...)/5120 — they sum to exactly 1
   and H0(-1) = 0, confirming the rational reading.
2. Kingsbury designed the (13,19) pair by Tay-Kingsbury transformation of
   variables from the (5,7) near_sym_a prototype: write near_sym_a as
   polynomials in x = z + 1/z —
       Q(x) = (-x^2 + 5x + 14)/20        (h0o)
       R(x) = (-3x^3 - 15x^2 + 82x + 200)/280   (g0o)
   and substitute a zero-phase odd-harmonic map
       M(z) = c + b(z + 1/z) + a(z^3 + 1/z^3).
   Because M(z) + M(-z) = 2c, the substitution maps the prototype's
   halfband product P(x) = Q(x)R(x) to a halfband product in z — perfect
   reconstruction transfers structurally.
3. Fitting Q(M(z)) = h0o has EXACTLY one odd-harmonic solution:
       a = -3/16, b = 19/16, c = 0.
   (The second root (3/16, -19/16, 5) violates zero-phase oddness: c != 0
   breaks M(z) + M(-z) = 0 needed for the halfband transfer at this
   normalization; it also fails PR numerically.)
4. g0o := R(M(z)) is then FORCED:
       (81, 0, -1539, -2160, 8208, 27360, -63816, -59280, 343786, 641600,
        ... mirrored)/1146880
   whose decimals are the published table to 8 places (0.55943090,
   0.29975763, -0.05168866, -0.05564314, 0.02385603, 0.00715681,
   -0.00188337, -0.00134190, 0.00007063).

Running this script re-derives both tables and checks them against
wavelets/kingsbury.py.
"""

import pathlib
import sys

import numpy as np
import sympy as sp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def derive():
    z = sp.symbols("z")
    a, b, c = sp.symbols("a b c", rational=True)
    x = sp.symbols("x")
    Q = (-x**2 + 5 * x + 14) / 20
    R = (-3 * x**3 - 15 * x**2 + 82 * x + 200) / 280

    h0_target = [sp.Rational(v, 5120) for v in
                 (-9, 0, 114, -240, -247, 1520, 2844,
                  1520, -247, -240, 114, 0, -9)]

    M = c + b * (z + 1 / z) + a * (z**3 + 1 / z**3)
    poly = sp.expand(sp.expand(Q.subs(x, M)) * z**6)
    eqs = [sp.Eq(poly.coeff(z, k), h0_target[k]) for k in range(13)]
    sols = sp.solve(eqs, [a, b, c], dict=True)
    sols = [s for s in sols if s[c] == 0]  # zero-phase oddness: M(z)+M(-z)=0
    assert len(sols) == 1, sols
    s = sols[0]
    assert s[a] == sp.Rational(-3, 16) and s[b] == sp.Rational(19, 16)

    Msol = M.subs(s)
    polyR = sp.expand(sp.expand(R.subs(x, Msol)) * z**9)
    g0 = [polyR.coeff(z, k) for k in range(19)]
    assert sum(g0) == 1
    assert sum((-1) ** k * v for k, v in enumerate(g0)) == 0

    # halfband PR of the product (even lags about the center vanish)
    h0poly = sum(h * z**k for k, h in enumerate(h0_target))
    P = sp.expand(h0poly * polyR)  # degrees 0..30, zero-phase center 15
    for m in range(1, 8):
        assert P.coeff(z, 15 + 2 * m) == 0, m
        assert P.coeff(z, 15 - 2 * m) == 0, m
    assert P.coeff(z, 15) == sp.Rational(1, 2)
    return ([float(v) for v in h0_target], [float(v) for v in g0])


def main():
    h0, g0 = derive()
    from sonar_tpu.wavelets import kingsbury as K

    sh0, sg0, exact = K.biort_pair("near_sym_b")
    assert exact
    np.testing.assert_array_equal(np.asarray(h0), sh0)
    np.testing.assert_allclose(np.asarray(g0), sg0, rtol=0, atol=1e-18)
    print("near_sym_b derivation reproduces the shipped tables exactly")
    print("h0o:", np.round(sh0, 7).tolist())
    print("g0o:", np.round(sg0, 8).tolist())


if __name__ == "__main__":
    main()
