"""End-to-end sampling speedup from the fused pyramid kernels.

The flagship demonstration that the kernels matter in practice: at SD1.5
scale a pyramid_old noise draw (~3.7ms on the XLA path) costs several
UNet steps (~0.64ms), so euler-ancestral sampling with pyramid_old noise
is NOISE-dominated — exactly the case the reference docs warn about
("quite slow ... ~60x the latent size"). Measures whole sampling runs
(20 steps, bundled UNet, per-step noise injection) with the flag off/on.

Usage: python tools/bench_e2e_fused_sampling.py [noise_type]
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from bench import _force

STEPS = 20
SHAPE = (1, 4, 64, 64)


def build_run(noise_type):
    from sonar_tpu.models import UNetConfig, init_unet_params, make_denoiser
    from sonar_tpu.noise.presets import get_noise_item
    from sonar_tpu.samplers.sonar import sample_sonar_euler_ancestral

    cfg = UNetConfig()
    params = init_unet_params(jax.random.key(0), cfg)
    model = make_denoiser(params, cfg)
    ramp = jnp.linspace(0, 1, STEPS)
    sigmas = (14.6 ** (1 / 7.0)
              + ramp * (0.03 ** (1 / 7.0) - 14.6 ** (1 / 7.0))) ** 7.0
    sigmas = jnp.concatenate([sigmas, jnp.zeros((1,))]).astype(jnp.float32)
    item = get_noise_item(noise_type)

    @jax.jit
    def run(x):
        return sample_sonar_euler_ancestral(model, x, sigmas,
                                            noise_item=item, seed=7)

    x0 = jax.random.normal(jax.random.key(1), SHAPE) * 14.6
    return run, x0


def timed(run, x0, iters=10, reps=4):
    _force(run(x0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(x0)
        _force(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    nt = sys.argv[1] if len(sys.argv) > 1 else "pyramid_old"
    os.environ["SONAR_TPU_FUSED_PYRAMID"] = "0"
    xla_run, x0 = build_run(nt)
    _force(xla_run(x0))
    os.environ["SONAR_TPU_FUSED_PYRAMID"] = "1"
    fused_run, _ = build_run(nt)
    _force(fused_run(x0))
    os.environ["SONAR_TPU_FUSED_PYRAMID"] = "0"
    t_x = timed(xla_run, x0)
    t_f = timed(fused_run, x0)
    print(f"noise={nt}  {STEPS}-step euler_ancestral sampling, SD1.5 {SHAPE}")
    print(f"xla:   {t_x * 1e3:8.3f} ms/run  {STEPS / t_x:8.1f} steps/s")
    print(f"fused: {t_f * 1e3:8.3f} ms/run  {STEPS / t_f:8.1f} steps/s")
    print(f"end-to-end sampling speedup: {t_x / t_f:.3f}x")


def _sdxl_single(flag: str, nt: str) -> None:
    """Child mode: ONE SDXL-scale program per process. Two large compiled
    programs in one process degrade later TPU executions ~200x through
    the tunnel (CLAUDE.md, bisected both orderings) — the parent spawns
    one subprocess per variant instead."""
    from bench import _sdxl_setup, _time_pipeline
    from sonar_tpu.api import SonarPipeline
    from sonar_tpu.noise.presets import get_noise_item
    from sonar_tpu.samplers import SonarConfig

    os.environ["SONAR_TPU_FUSED_PYRAMID"] = flag
    cond, uncond, ms, sigmas, x0, params = _sdxl_setup()
    pipe = SonarPipeline(model=cond, model_uncond=uncond,
                         sampler="sonar_euler_ancestral",
                         sonar_config=SonarConfig(momentum=0.95),
                         noise=get_noise_item(nt), cfg_scale=7.0,
                         model_sampling=ms, seed=7)
    print(_time_pipeline(pipe, params, x0, sigmas, stages=1))


def main_sdxl(nt="pyramid_old"):
    """SDXL-scale variant: 664M-param UNet at 4x128x128, euler-ancestral
    with CFG, per model call — the production-scale e2e number. Each
    variant runs in its own subprocess (process-contamination rule)."""
    from bench import subprocess_float

    times = {
        flag: subprocess_float(
            [sys.executable, __file__, "--sdxl-single", flag, nt],
            timeout=2400, label=f"sdxl flag={flag}")
        for flag in ("0", "1")
    }
    t_x, t_f = times.get("0"), times.get("1")
    if t_x is not None:
        print(f"SDXL e2e, noise={nt}: xla {t_x:.3f} ms/call")
    if t_f is not None:
        print(f"SDXL e2e, noise={nt}: fused {t_f:.3f} ms/call")
    if t_x is not None and t_f is not None:
        print(f"speedup {t_x / t_f:.3f}x")


if __name__ == "__main__":
    if "--sdxl-single" in sys.argv:
        i = sys.argv.index("--sdxl-single")
        _sdxl_single(sys.argv[i + 1], sys.argv[i + 2])
    elif "--sdxl" in sys.argv:
        sys.argv.remove("--sdxl")
        main_sdxl(sys.argv[1] if len(sys.argv) > 1 else "pyramid_old")
    else:
        main()
