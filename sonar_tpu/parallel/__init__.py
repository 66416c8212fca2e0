"""Mesh/sharding layer — SPMD scaling for samplers, noise, and the denoiser."""

from .mesh import (  # noqa: F401
    latent_spec,
    make_mesh,
    shard_latent,
    shard_unet_params,
    unet_param_shardings,
)
