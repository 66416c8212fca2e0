"""Config-4 overhead decomposition (VERDICT r2 item 5).

Config 4 measured +5.46% per model call at SDXL scale; configs 2/3 show
the framework machinery at ≈0%, implicating the FreeU rfft filtering
itself. This tool splits the overhead into:

  A. plain euler + basic CFG                       (baseline)
  B. FreeU patches, NO power filter               (patch machinery +
     hidden-mean scale — the non-FFT part)
  C. FreeU patches WITH the config-4 power filter (adds rfft2 · filter ·
     irfft2 per patched stage-1 activation)

B−A = machinery cost; C−B = FFT cost. Each variant runs in its own
subprocess (process contamination — CLAUDE.md).

Usage: python tools/profile_freeu.py            # all three + split
       python tools/profile_freeu.py --single A|B|C
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax.numpy as jnp

from bench import _sdxl_setup, _time_pipeline


def _freeu_pipeline(with_filter: bool):
    from sonar_tpu.api import SonarPipeline
    from sonar_tpu.cfg import FreeUExtremeConfig, make_freeu_patches
    from sonar_tpu.models import UNetConfig, unet_apply
    from sonar_tpu.noise.power import PowerFilter
    from sonar_tpu.samplers import SonarConfig

    cond, uncond, ms, sigmas, x0, params = _sdxl_setup()
    cfg = UNetConfig(model_channels=320, channel_mult=(1, 2, 4, 4),
                     num_res_blocks=2, attention_levels=(2, 3), num_heads=8,
                     norm_groups=32)
    frux = FreeUExtremeConfig(
        target="backbone", stage_1=True, scale=1.12, slice=0.75,
        sonar_power_filter=PowerFilter(alpha=0.4) if with_filter else None)
    patches = make_freeu_patches(model_sampling=ms,
                                 model_channels=cfg.model_channels,
                                 input_config=frux, output_config=frux)

    def cond_model(x, sb, params=None, **kw):
        s = sb.reshape(-1, 1, 1, 1)
        c_in = 1.0 / jnp.sqrt(1.0 + s**2)
        return x - s * unet_apply(params, x * c_in, sb, cfg,
                                  block_patches=patches)

    pipe = SonarPipeline(model=cond_model, model_uncond=uncond,
                         sampler="sonar_euler",
                         sonar_config=SonarConfig(momentum=1.0),
                         cfg_scale=7.0, model_sampling=ms, seed=7)
    return pipe, params, x0, sigmas


def run_variant(name: str) -> float:
    if name == "A":
        from bench import bench_sdxl_euler_per_call_ms

        return bench_sdxl_euler_per_call_ms()
    # D/E: the one-matmul filter operator (cfg/freeu.py _ffilter_mode) —
    # D at HIGHEST matmul precision (numerically equal to the FFT path),
    # E at DEFAULT (bf16 MXU inputs). VERDICT r3 item 4: the +5.1% floor
    # was attributed to FFT data movement; the K-matrix path deletes the
    # complex intermediates entirely.
    if name == "D":
        os.environ["SONAR_TPU_FREEU_MATMUL"] = "1"
    elif name == "E":
        os.environ["SONAR_TPU_FREEU_MATMUL"] = "fast"
    else:
        # B/C measure the FFT filter path; the matmul operator is the
        # DEFAULT since round 4, so pin it OFF or C silently duplicates D
        # and fft_pct mislabels the matmul cost (ADVICE r4).
        os.environ["SONAR_TPU_FREEU_MATMUL"] = "0"
    pipe, params, x0, sigmas = _freeu_pipeline(with_filter=(name != "B"))
    return _time_pipeline(pipe, params, x0, sigmas, stages=1)


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--single":
        print(run_variant(sys.argv[2]))
        return
    from bench import subprocess_float

    variants = sys.argv[1] if len(sys.argv) >= 2 else "ABCDE"
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sonar_jax_cache")
    out = {}
    for name in variants:
        out[name] = subprocess_float(
            [sys.executable, __file__, "--single", name], env=env,
            label=name)
        if out[name] is not None:
            print(f"# {name}: {out[name]:.3f} ms/call", file=sys.stderr,
                  flush=True)
    if all(out.get(k) for k in "ABC"):
        a, b, c = out["A"], out["B"], out["C"]
        out["machinery_pct"] = round((b - a) / a * 100.0, 2)
        out["fft_pct"] = round((c - b) / a * 100.0, 2)
        out["total_pct"] = round((c - a) / a * 100.0, 2)
    if out.get("A") and out.get("D"):
        out["matmul_total_pct"] = round(
            (out["D"] - out["A"]) / out["A"] * 100.0, 2)
    if out.get("A") and out.get("E"):
        out["matmul_fast_total_pct"] = round(
            (out["E"] - out["A"]) / out["A"] * 100.0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
