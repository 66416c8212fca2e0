"""BASELINE configs 2, 4, 5 measured at production scale on the real chip.

Configs 1 and 3 live in bench.py (driver metrics); this tool measures the
remaining BASELINE.json configs with the same methodology — 664M-param
SDXL-class UNet at 4x128x128, per-metric subprocess isolation (two large
compiled programs in one process degrade later TPU executions through the
tunnel — CLAUDE.md), per-model-call normalization:

- config2: sonar_euler_ancestral + perlin & 1/f-fractal noise chain
- config4: per-band + per-orientation Wavelet CFG + FreeU-Extreme patches
- config5: 16-frame temporally correlated power / voronoi-z-walk noise at
  the 1024-pixel-equivalent latent (4x16x128x128), Mpix/s

Usage: python tools/bench_configs.py            # run all, JSON line
       python tools/bench_configs.py --single config2
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from bench import (_SDXL_STEPS, _sdxl_setup, _time_pipeline, _timeit_slope,
                   subprocess_float)


def bench_config2_per_call_ms() -> float:
    """sonar_euler_ancestral + perlin + fractal (1/f pinkish) chain."""
    from sonar_tpu.api import SonarPipeline
    from sonar_tpu.noise import NoiseChain, get_noise_item
    from sonar_tpu.samplers import SonarConfig

    cond, uncond, ms, sigmas, x0, params = _sdxl_setup()
    noise = NoiseChain([
        get_noise_item("perlin", factor=0.6),
        get_noise_item("onef_pinkish", factor=0.4),
    ])
    pipe = SonarPipeline(model=cond, model_uncond=uncond,
                         sampler="sonar_euler_ancestral",
                         sonar_config=SonarConfig(momentum=0.95),
                         noise=noise, cfg_scale=7.0, model_sampling=ms,
                         seed=7)
    return _time_pipeline(pipe, params, x0, sigmas, stages=1)


def bench_config4_per_call_ms() -> float:
    """Per-band + per-orientation WCFG + FreeU-Extreme block patches."""
    from sonar_tpu.api import SonarPipeline
    from sonar_tpu.cfg import (FreeUExtremeConfig, WaveletCFG, WCFGRules,
                               make_freeu_patches)
    from sonar_tpu.models import UNetConfig, init_unet_params, unet_apply
    from sonar_tpu.noise.power import PowerFilter
    from sonar_tpu.samplers import SonarConfig

    _, _, ms, sigmas, x0, params = _sdxl_setup()
    cfg = UNetConfig(model_channels=320, channel_mult=(1, 2, 4, 4),
                     num_res_blocks=2, attention_levels=(2, 3), num_heads=8,
                     norm_groups=32)
    frux = FreeUExtremeConfig(target="backbone", stage_1=True, scale=1.12,
                              slice=0.75,
                              sonar_power_filter=PowerFilter(alpha=0.4))
    patches = make_freeu_patches(model_sampling=ms,
                                 model_channels=cfg.model_channels,
                                 input_config=frux, output_config=frux)

    def cond_model(x, sb, params=None, **kw):
        s = sb.reshape(-1, 1, 1, 1)
        c_in = 1.0 / jnp.sqrt(1.0 + s**2)
        return x - s * unet_apply(params, x * c_in, sb, cfg,
                                  block_patches=patches)

    def uncond_model(x, sb, params=None, **kw):
        s = sb.reshape(-1, 1, 1, 1)
        c_in = 1.0 / jnp.sqrt(1.0 + s**2)
        return x - s * unet_apply(params, x * c_in * 0.97, sb, cfg)

    # per-band (yl + 3 levels) AND per-orientation ([h, v, d]) scales
    rules = WCFGRules.build(
        wave="db4", level=3, padding_mode="periodization",
        high_precision_mode=False,
        diff=dict(yl_scale=8.0,
                  yh_scales=[[7.0, 6.5, 7.5], [6.0, 6.0, 7.0], "fill"],
                  scales_end=dict(yl_scale=6.0, yh_scales=6.0),
                  schedule="half_cosine", schedule_mode="sampling"))
    pipe = SonarPipeline(model=cond_model, model_uncond=uncond_model,
                         sampler="sonar_euler",
                         sonar_config=SonarConfig(momentum=0.95),
                         cfg_scale=7.0, wavelet_cfg=WaveletCFG(rules=rules),
                         model_sampling=ms, seed=7)
    return _time_pipeline(pipe, params, x0, sigmas, stages=1)


def bench_sdxl_euler_per_call_ms() -> float:
    from bench import bench_sdxl_euler_per_call_ms as fn

    return fn()


_VIDEO_SHAPE = (1, 4, 16, 128, 128)  # 16 frames at the 1024px-equiv latent


def _noise_mpix(item, shape, iters=20, g2=8) -> float:
    from sonar_tpu.noise.base import make_noise_sampler

    fn, state0 = make_noise_sampler(item, shape, seed=3, sigma_min=0.03,
                                    sigma_max=14.6)

    @jax.jit
    def draw_many(state):
        def body(st, _):
            noise, st = fn(st, jnp.asarray(1.0), jnp.asarray(0.9))
            return st, noise

        return jax.lax.scan(body, state, None, length=iters)[1]

    dt = _timeit_slope(draw_many, state0, g1=2, g2=g2)
    npix = 1
    for d in shape:
        npix *= d
    return npix * iters / dt / 1e6


def bench_config5_power_mpix() -> float:
    """16-frame 5D time-brownian power noise (temporal correlation across
    the sampling trajectory via the carried Brownian endpoint state).
    PowerNoiseItem is 4D-spatial like the reference — frames fold into
    channels (py/noise.py:2103-2104 recipe)."""
    from sonar_tpu.noise import CustomNoiseParametersNoise
    from sonar_tpu.noise.power import PowerNoiseItem

    item = CustomNoiseParametersNoise(
        noise=PowerNoiseItem(alpha=0.5, min_freq=0.05, time_brownian=True),
        frames_to_channels=True)
    return _noise_mpix(item, _VIDEO_SHAPE)


def bench_config5_voronoi_mpix() -> float:
    """16-frame voronoi with a per-frame z-walk (temporal correlation
    across the frame axis) — the reference recipe of PerDimNoise over
    frames + frames_to_channels folding."""
    from sonar_tpu.noise import CustomNoiseParametersNoise, PerDimNoise
    from sonar_tpu.noise.voronoi import VoronoiGenerator

    inner = VoronoiGenerator(n_points=(32,), z_increment=0.35, z_range=10.0,
                             result_mode=("f1",))
    item = PerDimNoise(
        noise=CustomNoiseParametersNoise(noise=inner,
                                         frames_to_channels=True,
                                         normalize=False),
        dim=2, chunk_size=1, normalize=False)
    return _noise_mpix(item, _VIDEO_SHAPE, iters=5)


_SINGLE = {
    "config2": bench_config2_per_call_ms,
    "config4": bench_config4_per_call_ms,
    "euler": bench_sdxl_euler_per_call_ms,
    "config5_power": bench_config5_power_mpix,
    "config5_voronoi": bench_config5_voronoi_mpix,
}


def _run_isolated(name: str) -> float | None:
    """One metric per subprocess (bench.subprocess_float). Failures/timeouts
    return None instead of raising: each config costs ~800s of uncacheable
    compile, so one dead config (or a wedged tunnel) must not discard the
    completed rows."""
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sonar_jax_cache")
    return subprocess_float(
        [sys.executable, __file__, "--single", name],
        env=env, timeout=2400, label=name)


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--single":
        print(_SINGLE[sys.argv[2]]())
        return
    results = {}
    for name in ("euler", "config2", "config4", "config5_power",
                 "config5_voronoi"):
        t0 = time.time()
        value = _run_isolated(name)
        if value is not None:
            results[name] = value
            print(f"# {name}: {value:.3f}  ({time.time() - t0:.0f}s)",
                  file=sys.stderr, flush=True)

    def rnd(key, nd=3):
        v = results.get(key)
        return None if v is None else round(v, nd)

    def pct(key):
        v, e = results.get(key), results.get("euler")
        return None if v is None or not e else round((v - e) / e * 100, 2)

    print(json.dumps({
        "sdxl_euler_per_call_ms": rnd("euler"),
        "config2_per_call_ms": rnd("config2"),
        "config2_overhead_pct": pct("config2"),
        "config4_per_call_ms": rnd("config4"),
        "config4_overhead_pct": pct("config4"),
        "config5_power_mpix_per_sec": rnd("config5_power"),
        "config5_voronoi_mpix_per_sec": rnd("config5_voronoi"),
        "steps": _SDXL_STEPS,
    }))


if __name__ == "__main__":
    main()
