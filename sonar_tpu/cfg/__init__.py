"""Model-patch subsystems that consume the denoiser (reference L4):
Wavelet CFG, FreeU-Extreme, latent operations, model-sampling protocol."""

from .freeu import FreeUExtremeConfig, ffilter, make_freeu_patches  # noqa: F401
from .latent_ops import (  # noqa: F401
    SonarLatentOperation,
    SonarLatentOperationAdvanced,
    SonarLatentOperationNoise,
    SonarLatentOperationQuantileFilter,
    apply_operations,
)
from .model_sampling import (  # noqa: F401
    ContinuousEDM,
    DiscreteSampling,
    Flow,
    make_beta_sigmas,
    time_snr_shift,
)
from .wavelet_cfg import (  # noqa: F401
    WaveletCFG,
    WCFGPercentages,
    WCFGRule,
    WCFGRules,
    WCFGScales,
    WCFGScalesRange,
    WCFGScheduledFloat,
    WCFGScheduledScale,
    WCFGWaveletSettings,
    basic_cfg,
    schedule_interp,
)
