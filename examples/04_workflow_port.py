"""Port a ComfyUI-sonar workflow (embedded in any ComfyUI PNG) and run it.

Run (CPU):  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/04_workflow_port.py [workflow.png]
Defaults to a reference example image when the reference tree is mounted.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from sonar_tpu.api import pipeline_from_workflow

DEFAULT = ("/root/reference/assets/example_images/noise_adv/"
           "noise_composite_brownian.png")


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT
    if not pathlib.Path(src).exists():
        print(f"no workflow at {src}; pass a ComfyUI PNG path")
        return

    # any denoiser callable works; a contraction stub keeps this runnable
    model = lambda x, sb, **kw: x * 0.95  # noqa: E731

    pipe, report = pipeline_from_workflow(
        src, model=model,
        externals={"mask": jnp.ones((64, 64)), "sampler": "sonar_euler"})
    print(report.summary())
    if report.host_sampler:
        # the workflow's own run configuration (cfg scale, seed, sampler
        # selection) rides its host SamplerCustom/KSampler node and is
        # already applied as the pipeline's defaults
        print("host run config:", report.host_sampler,
              "-> cfg_scale", pipe.cfg_scale, "seed", pipe.seed)

    sigmas = report.sigmas  # a native scheduler node, if the workflow has one
    if sigmas is None:
        sigmas = report.host_sigmas()  # or the host KSampler widgets
    if sigmas is None:
        sigmas = jnp.concatenate([jnp.linspace(14.6, 0.03, 12),
                                  jnp.zeros((1,))]).astype(jnp.float32)
    x0 = jax.random.normal(jax.random.key(0), (1, 4, 64, 64)) * 14.6
    out = jax.jit(lambda v: pipe(v, sigmas))(x0)
    print("sampled:", out.shape, "finite:", bool(jnp.isfinite(out).all()))


if __name__ == "__main__":
    main()
