"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: sonar_euler_ancestral sampler steps/sec on the flagship
UNet at the SD1.5 latent shape (BASELINE.json config 1), plus secondary
noise-synthesis throughput (Mpix/s) compared against a PyTorch-CPU anchor
measured in-process (the reference generates noise on CPU by default —
py/sonar.py:163 — so torch-CPU is the faithful baseline; BASELINE.md).

``vs_baseline`` is the noise-throughput ratio vs the torch-CPU anchor
(target ≥10× per BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_sampler_steps_per_sec(steps: int = 20, shape=(1, 4, 64, 64)) -> float:
    from sonar_tpu.models import UNetConfig, init_unet_params, make_denoiser
    from sonar_tpu.samplers.sonar import sample_sonar_euler_ancestral

    cfg = UNetConfig()
    params = init_unet_params(jax.random.key(0), cfg)
    model = make_denoiser(params, cfg)
    # Karras-ish schedule
    ramp = jnp.linspace(0, 1, steps)
    sigmas = (14.6 ** (1 / 7.0) + ramp * (0.03 ** (1 / 7.0) - 14.6 ** (1 / 7.0))) ** 7.0
    sigmas = jnp.concatenate([sigmas, jnp.zeros((1,))]).astype(jnp.float32)
    x = jax.random.normal(jax.random.key(1), shape, jnp.float32) * float(sigmas[0])

    @jax.jit
    def run(x):
        return sample_sonar_euler_ancestral(model, x, sigmas, seed=7)

    dt = _timeit(run, x, warmup=1, iters=5)
    return steps / dt


def bench_noise_mpix_per_sec(shape=(1, 4, 128, 128), iters=50) -> float:
    from sonar_tpu.noise.base import make_noise_sampler
    from sonar_tpu.noise.presets import get_noise_item

    item = get_noise_item("pyramid")
    fn, state0 = make_noise_sampler(item, shape, seed=3, sigma_min=0.03, sigma_max=14.6)

    @jax.jit
    def draw_many(state):
        # stack every draw as scan output: forces each noise tensor to be
        # fully materialized (a sum-only consumer lets XLA fuse generation
        # into the reduction and never write the pixels)
        def body(st, _):
            noise, st = fn(st, jnp.asarray(1.0), jnp.asarray(0.9))
            return st, noise

        st, stacked = jax.lax.scan(body, state, None, length=iters)
        return stacked

    dt = _timeit(draw_many, state0, warmup=1, iters=3)
    npix = 1
    for d in shape:
        npix *= d
    return npix * iters / dt / 1e6


def bench_torch_cpu_anchor(shape=(1, 4, 128, 128), iters=10) -> float:
    """PyTorch-CPU pyramid-noise throughput (Mpix/s) — the reference's
    default execution mode (CPU noise, py/sonar.py:163), reimplemented
    minimally (10-iter Whitaker pyramid, py/noise_generation.py:609-649)."""
    import torch
    import torch.nn.functional as F

    b, c, h, w = shape

    def pyramid_once(gen):
        noise = torch.randn(b, c, h, w, generator=gen)
        r = 1
        for i in range(10):
            r *= 2
            if h // r < 1 or w // r < 1:
                break
            small = torch.randn(b, c, max(1, h // r), max(1, w // r), generator=gen)
            noise += F.interpolate(small, size=(h, w), mode="bilinear") * (0.7 ** i)
        return noise

    gen = torch.Generator().manual_seed(3)
    pyramid_once(gen)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pyramid_once(gen)
    dt = (time.perf_counter() - t0) / iters
    del out
    return b * c * h * w / dt / 1e6


def bench_power_noise_mpix(shape=(1, 4, 128, 128), iters=50) -> float:
    from sonar_tpu.noise.base import make_noise_sampler
    from sonar_tpu.noise.power import PowerNoiseItem

    item = PowerNoiseItem(alpha=0.5, min_freq=0.05)
    fn, state0 = make_noise_sampler(item, shape, seed=4, sigma_min=0.03,
                                    sigma_max=14.6)

    @jax.jit
    def draw_many(state):
        def body(st, _):
            noise, st = fn(st, jnp.asarray(1.0), jnp.asarray(0.9))
            return st, noise

        return jax.lax.scan(body, state, None, length=iters)[1]

    dt = _timeit(draw_many, state0, warmup=1, iters=3)
    npix = 1
    for d in shape:
        npix *= d
    return npix * iters / dt / 1e6


def bench_sampler_b8(steps: int = 20):
    """Batched throughput (serving-shaped): batch 8, same latent size."""
    return bench_sampler_steps_per_sec(steps=steps, shape=(8, 4, 64, 64)) * 8


_SINGLE = {
    "sampler": bench_sampler_steps_per_sec,
    "sampler_b8": bench_sampler_b8,
    "noise": bench_noise_mpix_per_sec,
    "power": bench_power_noise_mpix,
    "anchor": bench_torch_cpu_anchor,
}


def _run_isolated(name: str) -> float:
    """Run one benchmark in a fresh subprocess.

    Sharing one process between large compiled programs degrades subsequent
    executions ~200x through this environment's TPU tunnel (measured both
    orderings); per-metric processes give honest numbers. Falls back to
    in-process on any subprocess failure."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    # persistent XLA compilation cache: repeat bench runs (and the metrics
    # sharing programs) skip the multi-minute TPU compiles
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sonar_jax_cache")
    try:
        out = subprocess.run(
            [sys.executable, __file__, "--single", name],
            capture_output=True, text=True, timeout=560, check=True, env=env,
        )
        return float(out.stdout.strip().splitlines()[-1])
    except Exception:
        return _SINGLE[name]()


def main():
    import sys

    if len(sys.argv) >= 3 and sys.argv[1] == "--single":
        print(_SINGLE[sys.argv[2]]())
        return
    steps_per_sec = _run_isolated("sampler")
    b8 = _run_isolated("sampler_b8")
    mpix = _run_isolated("noise")
    power_mpix = _run_isolated("power")
    anchor = _run_isolated("anchor")
    print(
        json.dumps(
            {
                "metric": "sonar_euler_ancestral_steps_per_sec_sd15_64x64",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(mpix / anchor, 3),
                "extra": {
                    "per_step_ms_p50": round(1000.0 / steps_per_sec, 3),
                    "batch8_latent_steps_per_sec": round(b8, 3),
                    "noise_pyramid_mpix_per_sec": round(mpix, 3),
                    "noise_power_mpix_per_sec": round(power_mpix, 3),
                    "torch_cpu_anchor_mpix_per_sec": round(anchor, 3),
                    "vs_baseline_is": "pyramid-noise Mpix/s vs torch-CPU anchor",
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
