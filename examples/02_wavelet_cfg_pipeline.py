"""CFG-guided sampling with per-band Wavelet CFG + FreeU, via SonarPipeline.

Run (CPU):  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/02_wavelet_cfg_pipeline.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.api import SonarPipeline
from sonar_tpu.cfg import (
    DiscreteSampling,
    FreeUExtremeConfig,
    WaveletCFG,
    WCFGRules,
    make_freeu_patches,
)
from sonar_tpu.models import UNetConfig, init_unet_params, unet_apply
from sonar_tpu.noise.power import PowerFilter, PowerNoiseItem
from sonar_tpu.samplers import SonarConfig


def main():
    ms = DiscreteSampling()
    cfg = UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                     attention_levels=(1,), norm_groups=8)
    params = init_unet_params(jax.random.key(0), cfg)

    # FreeU-Extreme: boost stage-1 backbone, filtered by a soft lowpass
    frux = FreeUExtremeConfig(target="backbone", stage_1=True, scale=1.15,
                              slice=0.75,
                              sonar_power_filter=PowerFilter(alpha=0.4))
    patches = make_freeu_patches(model_sampling=ms,
                                 model_channels=cfg.model_channels,
                                 input_config=frux, output_config=frux)

    def cond_model(x, sb, **kw):
        s = sb.reshape(-1, 1, 1, 1)
        c_in = 1.0 / jnp.sqrt(1.0 + s**2)
        return x - s * unet_apply(params, x * c_in, sb, cfg, block_patches=patches)

    def uncond_model(x, sb, **kw):
        s = sb.reshape(-1, 1, 1, 1)
        c_in = 1.0 / jnp.sqrt(1.0 + s**2)
        return x - s * unet_apply(params, x * c_in * 0.97, sb, cfg)

    # Wavelet CFG: stronger CFG on low frequencies, gentler on fine detail,
    # relaxing over the first half of sampling
    rules = WCFGRules.build(
        wave="db4", level=3, padding_mode="periodization",
        high_precision_mode=False,
        diff=dict(
            yl_scale=8.0, yh_scales=[7.0, [6.0, 6.0, 7.0], "fill"],
            scales_end=dict(yl_scale=6.0, yh_scales=6.0),
            schedule="half_cosine", schedule_mode="sampling",
        ),
    )

    pipe = SonarPipeline(
        model=cond_model, model_uncond=uncond_model,
        sampler="sonar_dpmpp_sde",
        sonar_config=SonarConfig(momentum=0.9),
        noise=PowerNoiseItem(alpha=0.5, min_freq=0.05, time_brownian=True),
        cfg_scale=7.0, wavelet_cfg=WaveletCFG(rules=rules),
        model_sampling=ms, seed=7,
    )
    ramp = np.linspace(0, 1, 15)
    sigmas = jnp.asarray(np.concatenate([
        (14.6 ** (1 / 7.0) + ramp * (0.03 ** (1 / 7.0) - 14.6 ** (1 / 7.0))) ** 7.0,
        [0.0]]), jnp.float32)
    x0 = jax.random.normal(jax.random.key(2), (1, 4, 64, 64)) * 14.6
    out = jax.jit(lambda v: pipe(v, sigmas))(x0)
    print("guided sample:", out.shape, "finite:", bool(jnp.isfinite(out).all()))


if __name__ == "__main__":
    main()
