from .ancestral import get_ancestral_step, to_d
from .kdiffusion import (
    KDIFFUSION_SAMPLERS,
    sample_ddim,
    sample_dpmpp_2m,
    sample_dpmpp_2m_sde,
    sample_dpmpp_2s_ancestral,
    sample_dpmpp_3m_sde,
    sample_dpmpp_sde,
    sample_euler,
    sample_euler_ancestral,
    sample_heun,
    sample_lcm,
)
from .momentum import GuidanceConfig, HistoryType, MomentumMode, SonarConfig
from .restart import RestartSegment, default_segments, sample_restart
from .schedules import SCHEDULERS, get_sigmas
from .sonar import (
    sample_sonar_dpmpp_sde,
    sample_sonar_euler,
    sample_sonar_euler_ancestral,
)

SAMPLERS = {
    "sonar_euler": sample_sonar_euler,
    "sonar_euler_ancestral": sample_sonar_euler_ancestral,
    "sonar_dpmpp_sde": sample_sonar_dpmpp_sde,
    "restart": sample_restart,
    **KDIFFUSION_SAMPLERS,
}

__all__ = [
    "KDIFFUSION_SAMPLERS",
    "SAMPLERS",
    "GuidanceConfig",
    "HistoryType",
    "MomentumMode",
    "SonarConfig",
    "RestartSegment",
    "default_segments",
    "get_ancestral_step",
    "sample_ddim",
    "sample_dpmpp_2m",
    "sample_dpmpp_2m_sde",
    "sample_dpmpp_2s_ancestral",
    "sample_dpmpp_3m_sde",
    "sample_dpmpp_sde",
    "sample_euler",
    "sample_euler_ancestral",
    "sample_heun",
    "sample_lcm",
    "sample_restart",
    "sample_sonar_dpmpp_sde",
    "sample_sonar_euler",
    "sample_sonar_euler_ancestral",
    "to_d",
]
