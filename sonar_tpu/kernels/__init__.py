"""Pallas TPU kernel tier (SURVEY §2.9) with jnp fallbacks off-TPU."""

from .fused import (  # noqa: F401
    fused_momentum_step,
    fused_momentum_step_reference,
    fused_scale_noise,
    pack_momentum_scalars,
    use_pallas,
)
