from .blend import BLENDING_MODES, blend, blend_scalar, register_blend_mode
from .normalize import (
    normalize_to_scale,
    normalize_to_scale_adv,
    quantile_normalize,
    scale_noise,
    tmedian,
    tmode,
    tquantile,
    tstd,
)
from .rng import derive_key, key_from_seed

__all__ = [
    "BLENDING_MODES",
    "blend",
    "blend_scalar",
    "derive_key",
    "key_from_seed",
    "normalize_to_scale",
    "normalize_to_scale_adv",
    "quantile_normalize",
    "register_blend_mode",
    "scale_noise",
    "tmedian",
    "tmode",
    "tquantile",
    "tstd",
]
