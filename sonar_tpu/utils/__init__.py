from .misc import (
    adjust_slice,
    clamp_float,
    crop_samples,
    elementwise_shuffle_by_dim,
    fallback,
    filter_dict,
    maybe_apply,
    pattern_break,
    step_from_sigmas,
    step_from_sigmas_traced,
    trunc_decimals,
)

__all__ = [
    "adjust_slice",
    "clamp_float",
    "crop_samples",
    "elementwise_shuffle_by_dim",
    "fallback",
    "filter_dict",
    "maybe_apply",
    "pattern_break",
    "step_from_sigmas",
    "step_from_sigmas_traced",
    "trunc_decimals",
]
