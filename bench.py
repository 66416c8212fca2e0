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

import functools
import json
import time

import jax
import jax.numpy as jnp


def _force(out) -> float:
    """Force completion with a host readback of one element.

    CRITICAL on this environment's TPU tunnel: ``jax.block_until_ready``
    can resolve ~30us after dispatch WITHOUT waiting for execution when
    the program's outputs are large (measured: 8 queued 84MB-output scans
    all "ready" in 30us each; a one-element readback shows the true 65ms).
    Any timing that does not read data back is measuring enqueue latency.
    A single-element fetch waits for the whole producing program (buffer-
    level dependency) while transferring 4 bytes."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.ravel()[0])


def _timeit(fn, *args, warmup=2, iters=10):
    """Pipelined average: enqueue all iterations, read back once. Device
    execution is in-order, so the final readback waits for every queued
    program while the single round-trip amortizes across iters."""
    for _ in range(warmup):
        _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def _group_time(fn, args, G, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(G):
            out = fn(*args)
        _force(out)
        best = min(best, time.perf_counter() - t0)
    return best


def _ab_slope(fn_a, args_a, fn_b, args_b, g1=4, g2=16, reps=4):
    """Slope-timed A/B with INTERLEAVED groups: each rep times a group of
    A then a group of B at both sizes, so both variants sample the same
    tunnel phase (the degraded phases last longer than one group)."""
    best = {("a", g1): float("inf"), ("a", g2): float("inf"),
            ("b", g1): float("inf"), ("b", g2): float("inf")}
    for _ in range(reps):
        for g in (g1, g2):
            for tag, f, a in (("a", fn_a, args_a), ("b", fn_b, args_b)):
                t0 = time.perf_counter()
                for _ in range(g):
                    out = f(*a)
                _force(out)
                best[(tag, g)] = min(best[(tag, g)],
                                     time.perf_counter() - t0)
    sa = max((best[("a", g2)] - best[("a", g1)]) / (g2 - g1),
             best[("a", g2)] / g2 * 1e-3)
    sb = max((best[("b", g2)] - best[("b", g1)]) / (g2 - g1),
             best[("b", g2)] / g2 * 1e-3)
    return sa / sb


def _timeit_slope(fn, *args, g1=4, g2=16, reps=4):
    """True per-execution time via two-point group timing.

    The tunnel's forced-readback round trip costs ~25-35ms — larger than
    most noise programs — so any single forced timing measures the round
    trip, not the device. Execution is in-order, so enqueueing G runs and
    forcing the last measures RTT + G*t_exec; the slope between two group
    sizes cancels the intercept. (Validated on chip: a 50-draw randn scan
    measures 31ms forced single but 0.62ms/exec by slope, consistent with
    its 13MB of writes; see profiles/ANALYSIS.md section 5.)"""
    _force(fn(*args))  # warm
    t1 = _group_time(fn, args, g1, reps)
    t2 = _group_time(fn, args, g2, reps)
    slope = (t2 - t1) / (g2 - g1)
    if slope <= 0:
        # RTT noise swamped the subtraction (program much faster than the
        # round trip): fall back to the conservative per-exec upper bound
        # instead of reporting absurd throughput
        return t2 / g2
    return slope


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

    dt = _timeit_slope(draw_many, state0)
    npix = 1
    for d in shape:
        npix *= d
    return npix * iters / dt / 1e6


def bench_noise_bulk_mpix(batch=800, shape=(4, 128, 128)) -> float:
    """Bulk batched pyramid generation (serving-shaped): one program,
    batch-dim parallelism instead of a sequential scan."""
    from sonar_tpu.noise.base import make_noise_sampler
    from sonar_tpu.noise.presets import get_noise_item

    big = (batch,) + shape
    item = get_noise_item("pyramid")
    fn, state0 = make_noise_sampler(item, big, seed=3, sigma_min=0.03,
                                    sigma_max=14.6)

    @jax.jit
    def draw(state):
        return fn(state, jnp.asarray(1.0), jnp.asarray(0.9))[0]

    dt = _timeit_slope(draw, state0)
    npix = 1
    for d in big:
        npix *= d
    return npix / dt / 1e6


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

    dt = _timeit_slope(draw_many, state0)
    npix = 1
    for d in shape:
        npix *= d
    return npix * iters / dt / 1e6


def bench_sampler_b8(steps: int = 20):
    """Batched throughput (serving-shaped): batch 8, same latent size."""
    return bench_sampler_steps_per_sec(steps=steps, shape=(8, 4, 64, 64)) * 8


def bench_hw_rng_speedup(shape=(1, 4, 128, 128), iters=50, reps=8) -> float:
    """Hardware-PRNG vs threefry pyramid ratio, measured INTERLEAVED in one
    process: the tunnel has long degraded phases that poison even min-of-N
    in a single subprocess, but alternating reps see the same phase, so the
    ratio stays meaningful (profiles/ANALYSIS.md)."""
    import os

    from sonar_tpu.noise.base import make_noise_sampler
    from sonar_tpu.noise.presets import get_noise_item

    def build_fn():
        item = get_noise_item("pyramid")
        fn, state0 = make_noise_sampler(item, shape, seed=3, sigma_min=0.03,
                                        sigma_max=14.6)

        @jax.jit
        def draw_many(state):
            def body(st, _):
                noise, st = fn(st, jnp.asarray(1.0), jnp.asarray(0.9))
                return st, noise

            return jax.lax.scan(body, state, None, length=iters)[1]

        return draw_many, state0

    # the flag is read at trace time: trace each variant under its setting
    # the flag is read at TRACE time (the first call): warm each variant
    # under its own env setting before switching
    os.environ["SONAR_TPU_HW_RNG"] = "0"
    tf_fn, tf_st = build_fn()
    _force(tf_fn(tf_st))
    os.environ["SONAR_TPU_HW_RNG"] = "1"
    hw_fn, hw_st = build_fn()
    _force(hw_fn(hw_st))
    os.environ["SONAR_TPU_HW_RNG"] = "0"
    # interleaved slope A/B: cancels both the ~30ms readback round trip
    # (which compresses single-forced ratios toward 1) and tunnel phases
    return _ab_slope(tf_fn, (tf_st,), hw_fn, (hw_st,),
                     reps=max(2, reps // 2))


def bench_fused_pyramid_speedup(noise_type="pyramid", shape=(4, 4, 512, 512),
                                iters=50, reps=8) -> float:
    """Fused-pyramid Pallas kernels vs the XLA path, measured INTERLEAVED
    in one process (kernels/fused_pyramid.py): upscale ladders accumulate
    small levels as MXU matmuls over a hardware-PRNG base; oversized
    (downscale) ladders generate only the tapped samples in VMEM. The
    default shape is bandwidth-dominated — at (1,4,128,128) XLA keeps the
    intermediates in VMEM and the comparison only measures fixed costs."""
    import os

    from sonar_tpu.noise.base import make_noise_sampler
    from sonar_tpu.noise.presets import get_noise_item

    def build_fn():
        item = get_noise_item(noise_type)
        fn, state0 = make_noise_sampler(item, shape, seed=3, sigma_min=0.03,
                                        sigma_max=14.6)

        @jax.jit
        def draw_many(state):
            def body(st, _):
                noise, st = fn(st, jnp.asarray(1.0), jnp.asarray(0.9))
                return st, noise

            return jax.lax.scan(body, state, None, length=iters)[1]

        return draw_many, state0

    # the flag is read at TRACE time (the first call): warm each variant
    # under its own env setting before switching
    os.environ["SONAR_TPU_FUSED_PYRAMID"] = "0"
    xla_fn, xla_st = build_fn()
    _force(xla_fn(xla_st))
    os.environ["SONAR_TPU_FUSED_PYRAMID"] = "1"
    fused_fn, fused_st = build_fn()
    _force(fused_fn(fused_st))
    os.environ["SONAR_TPU_FUSED_PYRAMID"] = "0"
    return _ab_slope(xla_fn, (xla_st,), fused_fn, (fused_st,),
                     reps=max(2, reps // 2))


# ---------------------------------------------------------------------------
# BASELINE config 3 at SDXL scale (VERDICT r1 item 1): sonar_dpmpp_sde
# 30-step + scheduled time-brownian power noise + db4-L3 wavelet CFG vs plain
# Euler + basic CFG, on an SDXL-class UNet (model_channels=320,
# channel_mult=(1,2,4,4), 664M params) at the 4x128x128 latent. Reported
# per *model call* (steps × solver stages; each call runs cond+uncond), the
# normalization established in round 1.
# ---------------------------------------------------------------------------

_SDXL_STEPS = 30
_SDXL_SHAPE = (1, 4, 128, 128)


def _sdxl_setup():
    import jax

    from sonar_tpu.cfg import DiscreteSampling
    from sonar_tpu.models import UNetConfig, init_unet_params, unet_apply

    cfg = UNetConfig(model_channels=320, channel_mult=(1, 2, 4, 4),
                     num_res_blocks=2, attention_levels=(2, 3), num_heads=8,
                     norm_groups=32)
    params = init_unet_params(jax.random.key(0), cfg)

    # params arrive through the samplers' extra_args channel so they are jit
    # ARGUMENTS, not captured constants (2.66GB of baked-in constants breaks
    # the remote-compile transport).
    def cond_model(x, sb, params=None, **kw):
        s = sb.reshape(-1, 1, 1, 1)
        c_in = 1.0 / jnp.sqrt(1.0 + s**2)
        return x - s * unet_apply(params, x * c_in, sb, cfg)

    def uncond_model(x, sb, params=None, **kw):
        s = sb.reshape(-1, 1, 1, 1)
        c_in = 1.0 / jnp.sqrt(1.0 + s**2)
        return x - s * unet_apply(params, x * c_in * 0.97, sb, cfg)

    ramp = jnp.linspace(0, 1, _SDXL_STEPS)
    sigmas = (14.6 ** (1 / 7.0) + ramp * (0.03 ** (1 / 7.0)
                                          - 14.6 ** (1 / 7.0))) ** 7.0
    sigmas = jnp.concatenate([sigmas, jnp.zeros((1,))]).astype(jnp.float32)
    x0 = jax.random.normal(jax.random.key(2), _SDXL_SHAPE, jnp.float32) * 14.6
    return cond_model, uncond_model, DiscreteSampling(), sigmas, x0, params


def _time_pipeline(pipe, params, x0, sigmas, stages: int) -> float:
    """Per-model-call milliseconds for one full sampling run."""
    import jax

    run = jax.jit(lambda p, v: pipe(v, sigmas, extra_args={"params": p}))
    dt = _timeit(run, params, x0, warmup=1, iters=2)
    return dt * 1000.0 / (_SDXL_STEPS * stages)


def bench_sdxl_euler_per_call_ms() -> float:
    """Plain Euler + basic CFG on the SDXL-class UNet (the baseline side)."""
    from sonar_tpu.api import SonarPipeline
    from sonar_tpu.samplers import SonarConfig

    cond, uncond, ms, sigmas, x0, params = _sdxl_setup()
    pipe = SonarPipeline(model=cond, model_uncond=uncond, sampler="sonar_euler",
                         sonar_config=SonarConfig(momentum=1.0),
                         cfg_scale=7.0, model_sampling=ms, seed=7)
    return _time_pipeline(pipe, params, x0, sigmas, stages=1)


def bench_sdxl_config3_per_call_ms() -> float:
    """BASELINE config 3: dpmpp_sde + scheduled time-brownian power noise +
    db4-L3 wavelet CFG (2 solver stages per step)."""
    from sonar_tpu.api import SonarPipeline
    from sonar_tpu.cfg import WaveletCFG, WCFGRules
    from sonar_tpu.noise import ScheduledNoise, get_noise_item
    from sonar_tpu.noise.power import PowerNoiseItem
    from sonar_tpu.samplers import SonarConfig

    cond, uncond, ms, sigmas, x0, params = _sdxl_setup()
    noise = ScheduledNoise(
        noise=PowerNoiseItem(alpha=0.5, min_freq=0.05, time_brownian=True),
        start_sigma=14.7, end_sigma=0.3,
        fallback_noise=get_noise_item("gaussian"))
    rules = WCFGRules.build(
        wave="db4", level=3, padding_mode="periodization",
        high_precision_mode=False,
        diff=dict(yl_scale=8.0, yh_scales=[7.0, [6.0, 6.0, 7.0], "fill"],
                  scales_end=dict(yl_scale=6.0, yh_scales=6.0),
                  schedule="half_cosine", schedule_mode="sampling"))
    pipe = SonarPipeline(model=cond, model_uncond=uncond,
                         sampler="sonar_dpmpp_sde",
                         sonar_config=SonarConfig(momentum=0.95),
                         noise=noise, cfg_scale=7.0,
                         wavelet_cfg=WaveletCFG(rules=rules),
                         model_sampling=ms, seed=7)
    return _time_pipeline(pipe, params, x0, sigmas, stages=2)


_SINGLE = {
    "sampler": bench_sampler_steps_per_sec,
    "sampler_b8": bench_sampler_b8,
    "noise": bench_noise_mpix_per_sec,
    "power": bench_power_noise_mpix,
    "anchor": bench_torch_cpu_anchor,
    "sdxl_euler": bench_sdxl_euler_per_call_ms,
    "sdxl_config3": bench_sdxl_config3_per_call_ms,
}

# the SDXL-scale runs compile a 664M-param UNet through the TPU tunnel;
# first pallas remote-compiles can take minutes
_TIMEOUTS = {"sdxl_euler": 1800, "sdxl_config3": 1800, "noise_fused": 1200,
             "noise_bulk_fused": 1200, "fused_ab": 1200,
             "fused_old_ab": 1200, "fused_highres_ab": 1200, "hw_ab": 1200}

# per-metric env overrides (noise_hw = the pyramid metric with the
# hardware-PRNG Pallas kernel enabled — profiles/ANALYSIS.md §1)
_METRIC_ENV = {
    "noise_hw": {"SONAR_TPU_HW_RNG": "1"},
    "noise_fused": {"SONAR_TPU_FUSED_PYRAMID": "1"},
    "noise_bulk_fused": {"SONAR_TPU_FUSED_PYRAMID": "1"},
}
_SINGLE["noise_hw"] = bench_noise_mpix_per_sec
_SINGLE["hw_ab"] = bench_hw_rng_speedup
_SINGLE["noise_fused"] = bench_noise_mpix_per_sec
_SINGLE["noise_bulk"] = bench_noise_bulk_mpix
_SINGLE["noise_bulk_fused"] = bench_noise_bulk_mpix
_SINGLE["fused_ab"] = bench_fused_pyramid_speedup
_SINGLE["fused_old_ab"] = functools.partial(
    bench_fused_pyramid_speedup, "pyramid_old", (1, 4, 128, 128), 20)
_SINGLE["fused_highres_ab"] = functools.partial(
    bench_fused_pyramid_speedup, "highres_pyramid", (1, 4, 128, 128), 20)


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
    env.update(_METRIC_ENV.get(name, {}))
    try:
        out = subprocess.run(
            [sys.executable, __file__, "--single", name],
            capture_output=True, text=True, timeout=_TIMEOUTS.get(name, 560),
            check=True, env=env,
        )
        return float(out.stdout.strip().splitlines()[-1])
    except Exception:
        # in-process fallback must still see the metric's env overrides
        # (e.g. the fused flag is read at trace time)
        old = {k: os.environ.get(k) for k in _METRIC_ENV.get(name, {})}
        os.environ.update(_METRIC_ENV.get(name, {}))
        try:
            return _SINGLE[name]()
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


def main():
    import sys

    if len(sys.argv) >= 3 and sys.argv[1] == "--single":
        print(_SINGLE[sys.argv[2]]())
        return
    steps_per_sec = _run_isolated("sampler")
    b8 = _run_isolated("sampler_b8")
    mpix = _run_isolated("noise")
    mpix_hw = _run_isolated("noise_hw")
    hw_ratio = _run_isolated("hw_ab")
    mpix_fused = _run_isolated("noise_fused")
    mpix_bulk = _run_isolated("noise_bulk")
    mpix_bulk_fused = _run_isolated("noise_bulk_fused")
    fused_ratio = _run_isolated("fused_ab")
    fused_old_ratio = _run_isolated("fused_old_ab")
    fused_highres_ratio = _run_isolated("fused_highres_ab")
    power_mpix = _run_isolated("power")
    anchor = _run_isolated("anchor")
    sdxl_euler = _run_isolated("sdxl_euler")
    sdxl_config3 = _run_isolated("sdxl_config3")
    overhead_pct = (sdxl_config3 - sdxl_euler) / sdxl_euler * 100.0
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
                    "noise_pyramid_hw_rng_mpix_per_sec": round(mpix_hw, 3),
                    # interleaved-group slope A/B (_ab_slope): cancels the
                    # readback RTT and samples both variants in each phase
                    "hw_rng_pyramid_speedup_ratio": round(hw_ratio, 4),
                    "noise_pyramid_fused_mpix_per_sec": round(mpix_fused, 3),
                    "noise_pyramid_bulk_mpix_per_sec": round(mpix_bulk, 3),
                    "noise_pyramid_bulk_fused_mpix_per_sec":
                        round(mpix_bulk_fused, 3),
                    # fused-pyramid Pallas kernels vs XLA path,
                    # interleaved-group slope A/Bs (kernels/fused_pyramid.py);
                    # the pyramid ratio is at the traffic-dominated 512x512
                    "fused_pyramid_512_speedup_ratio": round(fused_ratio, 4),
                    "fused_pyramid_old_speedup_ratio":
                        round(fused_old_ratio, 4),
                    "fused_highres_pyramid_speedup_ratio":
                        round(fused_highres_ratio, 4),
                    "noise_power_mpix_per_sec": round(power_mpix, 3),
                    "torch_cpu_anchor_mpix_per_sec": round(anchor, 3),
                    "vs_baseline_is": "pyramid-noise Mpix/s vs torch-CPU anchor",
                    # BASELINE config 3 measured at SDXL scale (664M-param
                    # UNet, 4x128x128, 30 steps), per model call; target <5%
                    "sdxl_euler_per_call_ms": round(sdxl_euler, 3),
                    "sdxl_config3_per_call_ms": round(sdxl_config3, 3),
                    "config3_overhead_pct": round(overhead_pct, 2),
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
