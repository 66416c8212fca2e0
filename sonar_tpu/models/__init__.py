"""Flagship model family: latent-diffusion UNet denoisers (pure JAX pytrees)."""

from .checkpoint import restore_checkpoint, save_checkpoint  # noqa: F401
from .train import ema_update, init_train_state, make_train_step  # noqa: F401
from .unet import UNetConfig, init_unet_params, make_denoiser, unet_apply  # noqa: F401
