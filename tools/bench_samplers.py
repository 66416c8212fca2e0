"""Per-sampler steps/s at the config-1 shape (SD1.5 4x64x64, bundled
UNet, 20 steps) — the BASELINE deliverable "per-step ms for each sampler
on the config shapes". One process, samplers timed sequentially with
pipelined forced readbacks (the programs are large enough that process
contamination is not a concern at this scale; cross-check: the euler_a
number matches bench.py's subprocess-isolated metric)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from bench import _timeit

STEPS = 20
SHAPE = (1, 4, 64, 64)


def main():
    from sonar_tpu.api.functions import SAMPLERS
    from sonar_tpu.models import UNetConfig, init_unet_params, make_denoiser

    cfg = UNetConfig()
    params = init_unet_params(jax.random.key(0), cfg)
    model = make_denoiser(params, cfg)
    ramp = jnp.linspace(0, 1, STEPS)
    sigmas = (14.6 ** (1 / 7.0)
              + ramp * (0.03 ** (1 / 7.0) - 14.6 ** (1 / 7.0))) ** 7.0
    sigmas = jnp.concatenate([sigmas, jnp.zeros((1,))]).astype(jnp.float32)
    x = jax.random.normal(jax.random.key(1), SHAPE) * float(sigmas[0])

    # model calls per step (heun/dpmpp_2s/dpmpp_sde are 2-stage; the
    # multistep 2m/2m_sde/3m_sde and everything else are single-call)
    CALLS = {"heun": 2, "dpmpp_2s_ancestral": 2, "dpmpp_sde": 2,
             "sonar_dpmpp_sde": 2, "restart": 1}
    seen = set()
    print(f"backend={jax.default_backend()} shape={SHAPE} steps={STEPS}")
    for name in sorted(SAMPLERS):
        sampler = SAMPLERS[name]
        if id(sampler) in seen:  # _gpu aliases point at the same fn
            continue
        seen.add(id(sampler))
        run = jax.jit(lambda v, s=sampler: s(model, v, sigmas, seed=7))
        try:
            dt = _timeit(run, x, warmup=1, iters=5)
        except Exception as e:  # pragma: no cover
            print(f"{name:>22}: FAILED {str(e)[:120]}", flush=True)
            continue
        calls = CALLS.get(name, 1)
        print(f"{name:>22}: {STEPS / dt:8.1f} steps/s  "
              f"{dt / STEPS * 1e3:6.3f} ms/step  ({calls} model call/step)",
              flush=True)


if __name__ == "__main__":
    main()
