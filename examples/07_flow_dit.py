"""Rectified-flow DiT sampling (the SD3/Flux model family).

The reference relies on its ComfyUI host to adapt flow-matching models to
the sampler protocol (CONST model sampling + ModelSamplingDiscreteFlow +
the *_RF ancestral variants). This framework ships that layer natively:

1. ``make_dit_denoiser(..., prediction="flow", timestep_fn=ms.timestep)``
   builds the CONST parametrization into the compiled program: no input
   scaling, ``denoised = x - sigma * v_hat``, network conditioned on
   ``sigma * 1000``.
2. ``SonarPipeline(model_sampling=Flow(shift=...))`` exposes the SD3-style
   resolution-shifted sigma schedule to WCFG/FreeU windows AND routes the
   ancestral samplers to the rectified-flow noise split
   (``ancestral_mode="rf"`` — samplers/ancestral.py:get_ancestral_step_rf),
   which keeps every intermediate latent exactly on the flow marginal
   ``x_t = (1 - t) x0 + t noise``.
3. The img2img contract differs for flow models too:
   ``pipe.prepare_latent`` interpolates instead of adding noise.

Run (CPU):  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/07_flow_dit.py
Run (TPU):  python examples/07_flow_dit.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.api import SonarPipeline
from sonar_tpu.cfg import Flow
from sonar_tpu.models import DiTConfig, init_dit_params, make_dit_denoiser
from sonar_tpu.noise import get_noise_item
from sonar_tpu.samplers import SonarConfig


def main():
    # a small DiT so the example runs quickly anywhere
    cfg = DiTConfig(in_channels=4, patch_size=2, hidden=128, depth=4,
                    num_heads=4)
    params = init_dit_params(jax.random.key(0), cfg)

    ms = Flow(shift=3.0)  # SD3-style resolution shift
    den = make_dit_denoiser(params, cfg, prediction="flow",
                            timestep_fn=ms.timestep)

    pipe = SonarPipeline(
        model=den,
        sampler="sonar_euler_ancestral",  # -> ancestral_mode="rf" via Flow
        sonar_config=SonarConfig(momentum=0.95),
        noise=get_noise_item("pyramid"),
        eta=0.6,
        model_sampling=ms,
        seed=7,
    )

    # flow schedules live in (0, 1]: shift-warped uniform time, like the
    # host's ModelSamplingDiscreteFlow table
    steps = 12
    t = np.linspace(1.0, 1.0 / steps, steps)
    sigmas = jnp.concatenate([
        jnp.asarray(3.0 * t / (1.0 + 2.0 * t), jnp.float32), jnp.zeros((1,))])

    # txt2img: start from pure noise at sigma_max = 1.0
    noise = jax.random.normal(jax.random.key(1), (2, 4, 32, 32), jnp.float32)
    x0 = pipe.prepare_latent(jnp.zeros_like(noise), noise, sigmas)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(noise), atol=1e-6)

    run = jax.jit(lambda v, p: pipe(v, sigmas, extra_args={"params": p}))
    out = np.asarray(run(x0, params))
    assert np.isfinite(out).all()
    print(f"flow-sampled {out.shape} latents through {steps} RF-ancestral "
          f"steps (shift={ms.shift})")
    print(f"latent stats: mean {out.mean():+.4f} std {out.std():.4f}")

    # img2img: interpolate a 'clean' latent to t=0.5 and resample
    clean = out
    sig2 = sigmas[sigmas <= 0.5]
    x_mid = pipe.prepare_latent(jnp.asarray(clean),
                                jax.random.normal(jax.random.key(2),
                                                  clean.shape), sig2)
    out2 = np.asarray(jax.jit(lambda v, p: pipe(
        v, sig2, extra_args={"params": p}))(x_mid, params))
    assert np.isfinite(out2).all()
    print(f"img2img from t={float(sig2[0]):.3f}: mean {out2.mean():+.4f} "
          f"std {out2.std():.4f}")


if __name__ == "__main__":
    main()
