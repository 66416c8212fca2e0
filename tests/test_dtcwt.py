"""DTCWT tests: q-shift design quality, perfect reconstruction, analyticity
(orientation discrimination + spectrum one-sidedness), facade + scatternet
integration."""

import numpy as np
import jax.numpy as jnp
import pytest

from sonar_tpu.noise import make_noise_sampler
from sonar_tpu.noise.scatternet import ScatternetFilteredNoise, scat_layer_dtcwt
from sonar_tpu.wavelets import Wavelet
from sonar_tpu.wavelets.dtcwt import (
    _level1_banks,
    dtcwt2d,
    idtcwt2d,
    qshift_banks,
    qshift_filter,
)


def test_qshift_filter_design():
    h = qshift_filter(10)
    hn = h / np.linalg.norm(h)
    # double-shift orthonormality (PR by lattice construction)
    for k in range(1, 5):
        assert abs(np.dot(hn[2 * k :], hn[: len(hn) - 2 * k])) < 1e-8
    # quarter-sample group delay in the passband
    n = np.arange(len(h))
    for w in (0.3, 0.8):
        E = np.exp(-1j * w * n)
        H = (E * h).sum()
        d = np.real(((E * n * h).sum()) / H)
        assert abs(d - 4.25) < 0.15, (w, d)


def test_dtcwt_perfect_reconstruction():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 32, 32)),
                    jnp.float32)
    yls, yhs = dtcwt2d(x, level=3)
    assert len(yls) == 4
    assert [z.shape[2] for z in yhs] == [6, 6, 6]
    assert all(jnp.iscomplexobj(z) for z in yhs)
    rec = idtcwt2d(yls, yhs, out_hw=(32, 32))
    assert float(jnp.abs(rec - x).max()) < 1e-4


def test_dtcwt_orientation_discrimination():
    """±45° gratings must separate perfectly between the two orientation
    groups — the signature of analyticity."""
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    gp = jnp.asarray(np.sin(2 * np.pi * (xx + yy) / 8), jnp.float32)[None, None]
    gm = jnp.asarray(np.sin(2 * np.pi * (xx - yy) / 8), jnp.float32)[None, None]
    _, yhp = dtcwt2d(gp, 2)
    _, yhm = dtcwt2d(gm, 2)
    ep = np.asarray(jnp.sum(jnp.abs(yhp[1]) ** 2, axis=(0, 1, 3, 4)))
    em = np.asarray(jnp.sum(jnp.abs(yhm[1]) ** 2, axis=(0, 1, 3, 4)))
    # +45° lives in the first 3 orientations, −45° in the last 3
    assert ep[:3].sum() / ep.sum() > 0.95
    assert em[3:].sum() / em.sum() > 0.95


def test_level1_one_sidedness_beats_orthonormal_ceiling():
    """Any orthonormal bank under the one-sample-roll level-1 scheme is
    capped at 1/2 + 1/pi ≈ 0.8183 one-sidedness; the designed near-sym
    biorthogonal pair must clearly beat it (≥ 0.93)."""
    import numpy.fft as fft

    from sonar_tpu.wavelets.dtcwt import near_sym_bank

    bank = near_sym_bank()
    h1 = bank.dec_hi[::-1]
    N = 8192
    w = np.fft.fftfreq(N) * 2 * np.pi
    S = np.abs(fft.fft(h1, N) * (1 + 1j * np.exp(-1j * w))) ** 2
    pos, neg = S[1 : N // 2].sum(), S[N // 2 + 1 :].sum()
    assert max(pos, neg) / (pos + neg) > 0.93


def test_near_sym_bank_is_pr():
    from sonar_tpu.wavelets.dtcwt import near_sym_bank
    from sonar_tpu.wavelets.dwt import _afb1d, _sfb1d

    b = near_sym_bank()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 1, 32)),
                    jnp.float32)
    lo, hi = _afb1d(x, b.dec_lo, b.dec_hi, "periodization")
    rec = _sfb1d(lo, hi, b.rec_lo, b.rec_hi, "periodization", 32)
    assert float(jnp.abs(rec - x).max()) < 1e-5


def test_dtcwt_cascade_one_sidedness():
    """Level-2/3 equivalent complex wavelets must be ≥94% one-sided
    (near-sym level 1 + the L=12 q-shift pair measure 0.96 / 0.976)."""
    import numpy.fft as fft

    qa, qb = qshift_banks()
    l1, _ = _level1_banks()

    def eff(bank):
        return bank.dec_lo[::-1], bank.dec_hi[::-1]

    def up(f, k):
        out = np.zeros(len(f) * k - (k - 1))
        out[::k] = f
        return out

    lo1, _ = eff(l1)
    loa, hia = eff(qa)
    lob, hib = eff(qb)
    pa = np.concatenate([[0], np.convolve(lo1, up(hia, 2))])
    pb = np.convolve(lo1, up(hib, 2))
    L = max(len(pa), len(pb)) + 8
    pa = np.pad(pa, (0, L - len(pa)))
    pb = np.pad(pb, (0, L - len(pb)))
    S = np.abs(fft.fft(pa + 1j * pb, 8192)) ** 2
    assert max(S[:4096].sum(), S[4096:].sum()) / S.sum() > 0.94


def test_dtcwt_shift_invariance_beats_dwt():
    from sonar_tpu.wavelets import dwt2d

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 1, 64, 64)),
                    jnp.float32)
    xs = jnp.roll(x, 1, axis=-1)
    _, yh = dtcwt2d(x, 2)
    _, yhs = dtcwt2d(xs, 2)
    m, ms = jnp.abs(yh[1]), jnp.abs(yhs[1])
    dt = float(jnp.linalg.norm(m - ms) / jnp.linalg.norm(m))
    _, wh = dwt2d(x, "db4", 2, "periodization")
    _, whs = dwt2d(xs, "db4", 2, "periodization")
    wm, wms = jnp.abs(wh[1]), jnp.abs(whs[1])
    dw = float(jnp.linalg.norm(wm - wms) / jnp.linalg.norm(wm))
    assert dt < 0.6 * dw  # magnitudes far more stable than real DWT


def test_wavelet_facade_dtcwt():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 4, 32, 32)),
                    jnp.float32)
    w = Wavelet(use_dtcwt=True, level=2)
    yl, yh = w.forward(x)
    assert yl.shape[0] == 4  # stacked tree lowpasses
    rec = w.inverse(yl, yh)
    assert float(jnp.abs(rec - x).max()) < 1e-4


def test_scatternet_dtcwt_backend():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 4, 16, 16)),
                    jnp.float32)
    out = scat_layer_dtcwt(x)
    assert out.shape[1] == 28  # 7C
    item = ScatternetFilteredNoise(output_mode="channels_adjusted",
                                   scatternet_order=1, wavelet_backend="dtcwt")
    fn, st = make_noise_sampler(item, (1, 4, 16, 16), seed=0)
    noise, _ = fn(st, None, None)
    assert noise.shape == (1, 4, 16, 16)
    assert np.isfinite(np.asarray(noise)).all()


def test_scat_layer_band_major_layout():
    """pytorch_wavelets ScatLayer layout: (B, 7, C, H', W') viewed as
    (B, 7C) — band-major, so channels [0:C] are the lowpass and the rest
    are biased magnitudes (≥ 0)."""
    from sonar_tpu.noise.scatternet import scat_layer_dwt

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 4, 32, 32)), jnp.float32)
    out = scat_layer_dtcwt(x)
    assert out.shape == (2, 28, 16, 16)
    assert float(out[:, 4:].min()) >= -1e-6  # magnitudes after the lowpass
    assert float(out[:, :4].min()) < -1e-3   # lowpass of noise goes negative
    d = scat_layer_dwt(x)
    assert d.shape[1] == 16
    assert float(d[:, 4:].min()) >= -1e-6
    assert float(d[:, :4].min()) < -1e-3


def test_scat_layer_j2_structure():
    """True second-order layer: ×49 channels, ÷4 spatial, band-major
    [lowpass, S1_j1@2 (6), S1_j2 (6), S2 (36)]; S1_j2 must equal the
    level-2 magnitudes of a plain 2-level DTCWT (same banks)."""
    from sonar_tpu.noise.scatternet import scat_layer_j2

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 2, 32, 32)), jnp.float32)
    out = scat_layer_j2(x)
    assert out.shape == (1, 98, 8, 8)
    assert float(out[:, 2:].min()) >= -1e-6
    # S1_j2 block: channels [(1+6)*C : (1+6+6)*C], band-major
    yls, yhs = dtcwt2d(x, level=2)
    z = yhs[1]
    bias = 1e-2
    mags = jnp.sqrt(jnp.real(z) ** 2 + jnp.imag(z) ** 2 + bias**2) - bias
    want = np.asarray(jnp.moveaxis(mags, 2, 1)).reshape(1, 12, 8, 8)
    got = np.asarray(out[:, 14:26])
    np.testing.assert_allclose(got, want, atol=1e-5)
    # lowpass block is the tree-averaged 2-level lowpass
    want_lp = np.asarray(sum(yls) / 4.0)
    np.testing.assert_allclose(np.asarray(out[:, :2]), want_lp, atol=1e-5)


def test_scat_layer_j2_differs_from_stacked():
    """Order 2 is NOT two stacked first-order layers (the pre-fix
    behavior): the level-2/second-order bands use different filters."""
    from sonar_tpu.noise.scatternet import scat_layer_j2

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 1, 32, 32)), jnp.float32)
    j2 = scat_layer_j2(x)
    stacked = scat_layer_dtcwt(scat_layer_dtcwt(x))
    assert j2.shape == stacked.shape == (1, 49, 8, 8)
    assert float(jnp.abs(j2 - stacked).max()) > 1e-2


def test_scatternet_generator_order2():
    for backend in ("dtcwt", "dwt"):
        item = ScatternetFilteredNoise(
            output_mode="channels_adjusted", scatternet_order=2,
            wavelet_backend=backend)
        fn, st = make_noise_sampler(item, (1, 4, 16, 16), seed=0)
        noise, _ = fn(st, None, None)
        assert noise.shape == (1, 4, 16, 16), backend
        assert np.isfinite(np.asarray(noise)).all(), backend


def test_scatternet_symmetric_filter_banks():
    item = ScatternetFilteredNoise(
        output_mode="channels_adjusted", scatternet_order=2,
        use_symmetric_filter=True)
    fn, st = make_noise_sampler(item, (1, 4, 16, 16), seed=0)
    noise, _ = fn(st, None, None)
    assert np.isfinite(np.asarray(noise)).all()


def test_orientation_axis_order():
    """The 6-orientation axis must follow pytorch_wavelets' order
    (15,45,75,105,135,165 deg): near-horizontal features excite the outer
    slots (0,5), diagonal the middle pair (1,4), near-vertical the inner
    pair (2,3), and mirrored angles land in mirrored slots k / 5-k."""
    H = W = 64
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)

    def band_energies(wavevec_deg):
        th = np.deg2rad(wavevec_deg)
        g = np.cos(2 * np.pi * 0.2 * (xx * np.cos(th) + yy * np.sin(th)))
        _, yhs = dtcwt2d(jnp.asarray(g.astype(np.float32))[None, None],
                         level=2)
        return np.asarray(jnp.abs(yhs[1]) ** 2).sum(axis=(0, 1, 3, 4))

    # wave-vector angle -> stripe orientation is +90 deg; the pairs below
    # cover all six slots
    for wv_a, wv_b, slots in [(75, 105, (0, 5)),   # near-horizontal stripes
                              (45, 135, (1, 4)),   # diagonals
                              (15, 165, (2, 3))]:  # near-vertical stripes
        ea, eb = band_energies(wv_a), band_energies(wv_b)
        assert {int(ea.argmax()), int(eb.argmax())} == set(slots), \
            (wv_a, wv_b, ea, eb)
        # mirrored angles land in mirrored slots
        assert int(ea.argmax()) + int(eb.argmax()) == 5
        # strong selectivity: the winning band dominates
        assert ea.max() / ea.sum() > 0.5 and eb.max() / eb.sum() > 0.5
