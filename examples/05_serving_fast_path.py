"""Serving-tuned sampling: batched CFG + bf16 UNet compute + fused noise.

The three TPU-native levers this example composes:

1. ``model_batched`` — ONE denoiser call per step on the doubled batch
   (rows [:B] conditional, [B:] unconditional). The compiled sampling
   program contains a single UNet instance instead of two. Numerically
   identical to the (model, model_uncond) pair (tests/test_api.py).
   MEASURED CAVEAT (profiles/ANALYSIS.md §14): this wins ~12% per call
   at small scale (per-program overhead amortized) but loses ~24% at
   SDXL scale, where the doubled-batch 1280-channel convs tile worse
   than two batch-1 calls — for big models prefer the plain pair with
   bf16 (31.3 ms/call, 57.9% MFU on v5e).
2. bf16 compute — ``UNetConfig(dtype=jnp.bfloat16)`` doubles MXU rate and
   halves HBM traffic for the model; the sampler carry and the sigma
   schedule stay float32 (SonarPipeline re-stabilizes the scan carry).
3. ``fused_noise=True`` — the fused pyramid-ladder Pallas kernels
   (kernels/fused_pyramid.py), measured 2.70x end-to-end on 20-step
   pyramid_old sampling. Different deterministic stream than the default
   threefry path (hardware PRNG base) — equally valid samples, not
   bit-identical to CPU runs.

Run (CPU):  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/05_serving_fast_path.py
Run (TPU):  python examples/05_serving_fast_path.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.api import SonarPipeline
from sonar_tpu.cfg import DiscreteSampling
from sonar_tpu.models import UNetConfig, init_unet_params, unet_apply
from sonar_tpu.samplers import SonarConfig


def main():
    # a small UNet so the example runs quickly anywhere; at SDXL scale the
    # same code is the bench's sdxl_euler_fast configuration
    cfg = UNetConfig(model_channels=64, channel_mult=(1, 2, 4),
                     num_res_blocks=1, attention_levels=(1, 2), num_heads=4,
                     norm_groups=8, dtype=jnp.bfloat16)
    params = init_unet_params(jax.random.key(0), cfg)

    def batched_model(x2, sigma2, *, params, **kw):
        """One eps-prediction forward on [cond | uncond]. A real SD model
        would concatenate the two text-conditioning embeddings the same
        way; this stand-in UNet is unconditional, so the uncond half just
        gets a slightly perturbed input scale."""
        n = x2.shape[0]
        sb = jnp.broadcast_to(jnp.asarray(sigma2, x2.dtype).reshape(-1), (n,))
        s = sb.reshape(-1, 1, 1, 1)
        c_in = 1.0 / jnp.sqrt(1.0 + s ** 2)
        half = jnp.arange(n).reshape(-1, 1, 1, 1) >= (n // 2)
        scale = jnp.where(half, 0.97, 1.0).astype(x2.dtype)
        eps = unet_apply(params, x2 * c_in * scale, sb, cfg)
        return x2 - s * eps

    steps = 12
    ramp = jnp.linspace(0, 1, steps)
    sigmas = (14.6 ** (1 / 7.0)
              + ramp * (0.03 ** (1 / 7.0) - 14.6 ** (1 / 7.0))) ** 7.0
    sigmas = jnp.concatenate([sigmas, jnp.zeros((1,))]).astype(jnp.float32)

    from sonar_tpu.noise import get_noise_item

    pipe = SonarPipeline(
        model_batched=batched_model,
        sampler="sonar_euler_ancestral",
        sonar_config=SonarConfig(momentum=0.95),
        noise=get_noise_item("pyramid_old"),
        cfg_scale=6.5,
        model_sampling=DiscreteSampling(),
        seed=42,
        fused_noise=None,  # None = honor SONAR_TPU_FUSED_PYRAMID; True on TPU
    )

    x0 = jax.random.normal(jax.random.key(1), (2, 4, 64, 64),
                           jnp.float32) * float(sigmas[0])
    run = jax.jit(lambda v, p: pipe(v, sigmas, extra_args={"params": p}))
    out = run(x0, params)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    print(f"sampled {out.shape} latents | carry dtype f32, UNet compute "
          f"{cfg.dtype.__name__ if hasattr(cfg.dtype, '__name__') else cfg.dtype}")
    print(f"latent stats: mean {out.mean():+.4f} std {out.std():.4f}")


if __name__ == "__main__":
    main()
