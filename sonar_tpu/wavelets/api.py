"""Wavelet facade + pyramid utilities (reference: py/wavelet_functions.py).

:class:`Wavelet` mirrors the reference wrapper surface (forward / inverse /
two_step_inverse, separate inverse wave+mode) over the native JAX DWT and
DTCWT. ``biort``/``qshift`` select named DTCWT banks (published tables via
wavelets/kingsbury.py; reference surface py/wavelet_functions.py:62-101).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..utils.misc import fallback
from .coeffs import get_wavelet, wavelist as _wavelist
from .dwt import dwt1d, dwt2d, idwt1d, idwt2d


class Wavelet:
    DEFAULT_MODE = "symmetric"
    DEFAULT_LEVEL = 3
    DEFAULT_WAVE = "db4"

    def __init__(
        self,
        *,
        wave: str = DEFAULT_WAVE,
        level: int = DEFAULT_LEVEL,
        mode: str = DEFAULT_MODE,
        use_1d_dwt: bool = False,
        use_dtcwt: bool = False,
        biort: str = "near_sym_a",
        qshift: str = "qshift_a",
        inv_wave: str | None = None,
        inv_mode: str | None = None,
        inv_biort: str | None = None,
        inv_qshift: str | None = None,
        device=None,
    ):
        del device
        self.wave = wave
        self.level = level
        self.mode = mode
        self.use_1d_dwt = use_1d_dwt
        self.use_dtcwt = use_dtcwt
        self.biort = biort
        self.qshift = qshift
        self.inv_wave = fallback(inv_wave, wave)
        self.inv_mode = fallback(inv_mode, mode)
        self.inv_biort = fallback(inv_biort, biort)
        self.inv_qshift = fallback(inv_qshift, qshift)
        if not use_dtcwt:
            get_wavelet(self.wave)  # validate eagerly
            get_wavelet(self.inv_wave)
        else:
            from .dtcwt import _resolve_level1, _resolve_qshift

            _resolve_level1(self.biort)  # validate eagerly
            _resolve_level1(self.inv_biort)
            _resolve_qshift(self.qshift)
            _resolve_qshift(self.inv_qshift)
        self._fwd_shape = None

    def forward(self, t: jax.Array, *, forward_function: Callable | None = None):
        if forward_function is not None:
            return forward_function(t)
        self._fwd_shape = t.shape
        if self.use_dtcwt:
            from .dtcwt import dtcwt2d

            yls, yhs = dtcwt2d(t, self.level, biort=self.biort,
                               qshift=self.qshift)
            # yl carried as the 4 tree lowpasses stacked on a leading axis so
            # the (yl, yh) pyramid protocol (scaling/blend) applies unchanged
            return jnp.stack(yls, axis=0), yhs
        if self.use_1d_dwt:
            return dwt1d(t, self.wave, self.level, self.mode)
        return dwt2d(t, self.wave, self.level, self.mode)

    def inverse(
        self,
        yl: jax.Array,
        yh,
        *,
        inverse_function: Callable | None = None,
        two_step_inverse: bool = False,
        out_shape: tuple | None = None,
    ) -> jax.Array:
        out_shape = fallback(out_shape, self._fwd_shape)
        if inverse_function is not None:
            inv = inverse_function
        elif self.use_dtcwt:
            from .dtcwt import idtcwt2d

            inv = lambda pair: idtcwt2d(  # noqa: E731
                tuple(pair[0][i] for i in range(4)), pair[1],
                out_hw=None if out_shape is None else out_shape[-2:],
                biort=self.inv_biort, qshift=self.inv_qshift,
            )
        elif self.use_1d_dwt:
            inv = lambda pair: idwt1d(  # noqa: E731
                pair[0], pair[1], self.inv_wave, self.inv_mode,
                out_len=None if out_shape is None else out_shape[-1],
            )
        else:
            inv = lambda pair: idwt2d(  # noqa: E731
                pair[0], pair[1], self.inv_wave, self.inv_mode,
                out_hw=None if out_shape is None else out_shape[-2:],
            )
        if not two_step_inverse:
            return inv((yl, yh))
        # inverse lows and highs separately, then sum (py/wavelet_functions.py:96-106)
        highs = inv((jnp.zeros_like(yl), yh))
        lows = inv((yl, tuple(jnp.zeros_like(b) for b in yh)))
        return highs + lows

    @staticmethod
    def wavelist() -> tuple:
        return _wavelist()

    @staticmethod
    def modelist() -> tuple:
        return ("symmetric", "zero", "reflect", "replicate", "periodization",
                "periodic", "constant")


def expand_yh_scales(yh: Sequence, *, yh_scales=1.0):
    """Normalize yh scale specs to per-band-per-orientation tuples
    (py/wavelet_functions.py:148-190), incl. the single-``"fill"`` replicator."""
    yhlen = len(yh)
    yh_shape = yh[0].shape
    olen = yh_shape[2] if len(yh_shape) > 3 else 1
    def _num(v):
        # traced jax scalars pass through; python numbers normalize to float
        return float(v) if isinstance(v, (float, int)) else v

    if isinstance(yh_scales, (float, int)) or isinstance(yh_scales, jax.Array):
        return ((_num(yh_scales),) * olen,) * yhlen
    otemplate = (1.0,) * olen
    yh_scales = tuple(
        (_num(band),) * olen
        if isinstance(band, (float, int)) or isinstance(band, jax.Array)
        else (
            (
                *(_num(i) for i in band[:olen]),
                *otemplate[: olen - len(band[:olen])],
            )
            if isinstance(band, (tuple, list))
            else band
        )
        for band in yh_scales
    )
    if "fill" in yh_scales:
        fillidx = yh_scales.index("fill")
        if "fill" in yh_scales[fillidx + 1:]:
            raise ValueError("Only one fill allowed.")
        if fillidx == 0 or len(yh_scales) < 2:
            raise ValueError(
                "Invalid fill value, cannot be in the first position or the only item."
            )
        if len(yh_scales) - 1 < yhlen:
            fill = (yh_scales[fillidx - 1],) * (yhlen - (len(yh_scales) - 1))
            yh_scales = (*yh_scales[:fillidx], *fill, *yh_scales[fillidx + 1:])
        else:
            yh_scales = (*yh_scales[:fillidx], *yh_scales[fillidx + 1:])
    return yh_scales[:yhlen]


def wavelet_scaling(yl, yh, yl_scale, yh_scales, *, in_place: bool = False):
    """yl·yl_scale; per-band (and per-orientation dim-2) yh multiplies
    (py/wavelet_functions.py:193-216). Arrays are immutable here so
    ``in_place`` is accepted and ignored."""
    del in_place
    if isinstance(yl_scale, (int, float)):
        if yl_scale != 1.0:
            yl = yl * yl_scale
    else:
        yl = yl * yl_scale
    scales = expand_yh_scales(yh, yh_scales=yh_scales if yh_scales is not None else 1.0)
    out_yh = []
    for hscale, ht in zip(scales, yh):
        if isinstance(hscale, (int, float)):
            out_yh.append(ht * hscale)
            continue
        if ht.ndim > 3:
            ol = min(ht.shape[2], len(hscale))
            vec = jnp.asarray(tuple(hscale[:ol]) + (1.0,) * (ht.shape[2] - ol),
                              ht.dtype)
            out_yh.append(ht * vec.reshape((1, 1, -1) + (1,) * (ht.ndim - 3)))
        else:
            out_yh.append(ht * float(hscale[0]))
    # remaining bands unscaled
    out_yh.extend(yh[len(out_yh):])
    return yl, tuple(out_yh)


def wavelet_blend(a, b, *, yl_factor, blend_function,
                  yh_factor=None, yh_blend_function=None):
    """Blend two (yl, yh) pyramids with separate yl/yh factors + functions
    (py/wavelet_functions.py:219-238)."""
    yh_factor = fallback(yh_factor, yl_factor)
    yh_blend_function = fallback(yh_blend_function, blend_function)
    return (
        blend_function(a[0], b[0], yl_factor),
        tuple(yh_blend_function(ta, tb, yh_factor) for ta, tb in zip(a[1], b[1])),
    )
