"""Model families: latent-diffusion UNet (flagship) and DiT transformer
denoisers (pure JAX pytrees)."""

from .checkpoint import restore_checkpoint, save_checkpoint  # noqa: F401
from .dit import (  # noqa: F401
    DiTConfig,
    dit_apply,
    dit_param_shardings,
    dit_pp_apply,
    init_dit_params,
    make_dit_denoiser,
    pp_stage_params,
)
from .flops import (  # noqa: F401
    TPU_V5E_PEAK_FLOPS,
    dit_forward_flops,
    mfu_pct,
    unet_forward_flops,
)
from .prediction import (  # noqa: F401
    CONST,
    EPS,
    PREDICTIONS,
    V_PREDICTION,
    X0,
    get_prediction,
)
from .train import ema_update, init_train_state, make_train_step  # noqa: F401
from .unet import UNetConfig, init_unet_params, make_denoiser, unet_apply  # noqa: F401
