"""High-level user API: functional node equivalents, the node-name builder
registry (workflow porting), YAML config loaders, preview tooling."""

from .config import (  # noqa: F401
    load_yaml_params,
    sonar_config_from_yaml,
    wavelet_cfg_from_yaml,
    wcfg_rules_from_yaml,
)
from .functions import (  # noqa: F401
    SAMPLERS,
    get_sampler,
    noise_image,
    noisy_latent_like,
    register_sampler,
    sampler_config_override,
    split_noise_chain,
)
from . import extensions  # noqa: F401
from .guider import make_latent_op_cfg_function  # noqa: F401
from .nodes import NODES, build, register_node, tristate  # noqa: F401
from .pipeline import SonarPipeline  # noqa: F401
from .workflow import (  # noqa: F401
    PortResult,
    pipeline_from_workflow,
    port_workflow,
    read_workflow,
)
from .preview import noise_to_rgb, preview_power_filter, preview_power_noise  # noqa: F401
