"""Wavelet subsystem: filter banks, DWT/IDWT, and the reference's wavelet
utility surface (py/wavelet_functions.py) rebuilt in JAX."""

from .api import Wavelet, expand_yh_scales, wavelet_blend, wavelet_scaling  # noqa: F401
from .coeffs import WaveletFilters, get_wavelet, wavelist  # noqa: F401
from .dtcwt import dtcwt2d, idtcwt2d, qshift_filter  # noqa: F401
from .dwt import dwt1d, dwt2d, idwt1d, idwt2d  # noqa: F401
