"""Basic momentum sampling with a custom noise tree.

Run (CPU):  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/01_basic_sampling.py
Run (TPU):  python examples/01_basic_sampling.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.models import UNetConfig, init_unet_params, make_denoiser
from sonar_tpu.noise import ScheduledNoise, get_noise_item
from sonar_tpu.samplers import SonarConfig, sample_sonar_euler_ancestral


def karras(n, smin=0.03, smax=14.6, rho=7.0):
    ramp = np.linspace(0, 1, n)
    s = (smax ** (1 / rho) + ramp * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho
    return jnp.asarray(np.concatenate([s, [0.0]]), jnp.float32)


def main():
    cfg = UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                     attention_levels=(1,), norm_groups=8)
    params = init_unet_params(jax.random.key(0), cfg)
    model = make_denoiser(params, cfg)

    # pyramid noise for the first 65% of sampling, gaussian after — the
    # classic sonar recipe (docs/base_noise_types.md)
    noise = ScheduledNoise(
        noise=get_noise_item("pyramid"),
        start_sigma=14.6, end_sigma=1.0,
        fallback_noise=get_noise_item("gaussian"),
    )
    sigmas = karras(20)
    x0 = jax.random.normal(jax.random.key(1), (1, 4, 64, 64)) * float(sigmas[0])

    run = jax.jit(lambda x: sample_sonar_euler_ancestral(
        model, x, sigmas,
        sonar_config=SonarConfig(momentum=0.95, momentum_hist=0.75),
        noise_item=noise, seed=42))
    out = run(x0)
    print("sampled:", out.shape, "std:", float(out.std()))


if __name__ == "__main__":
    main()
