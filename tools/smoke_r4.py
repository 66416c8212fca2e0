"""Round-4 on-chip smoke of the sixth-session fix set (VERDICT r3 item 10).

Each check runs in its own subprocess (one TPU process at a time — the
tunnel serializes; two large programs in one process contaminate later
executions, CLAUDE.md) at small shapes so compiles stay cheap:

1. bf16    — bf16 UNet with f32 sigma-embedding angles: outputs finite,
             sigma-conditioning alive (nearby sigmas more correlated than
             distant ones), and bf16 tracks the f32 model coarsely.
2. weights — pipe.jit() weight-flow: extra_args={"params": p} is a jit
             ARGUMENT; two different trees through ONE compiled program
             must give different outputs (no constant baking).
3. voronoi — Pallas k-smallest kernel vs XLA path bit-parity on hardware
             (kernels/voronoi.py gate SONAR_TPU_VORONOI_KERNEL).
4. fused   — fused pyramid_old downscale ladder vs XLA path: moment-level
             agreement on hardware (different PRNG stream by design; full
             spectra live in tools/validate_fused_spectrum.py).

Usage: python tools/smoke_r4.py            # all checks, PASS/FAIL table
       python tools/smoke_r4.py --single bf16
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def check_bf16() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sonar_tpu.models import UNetConfig, init_unet_params, make_denoiser

    base_cfg = UNetConfig(model_channels=64, channel_mult=(1, 2),
                          num_res_blocks=1, attention_levels=(1,),
                          num_heads=4, norm_groups=8)
    # ONE weight tree for both dtypes (jax.random draws a DIFFERENT
    # stream per dtype — initializing separately compares two different
    # models, not two precisions)
    shared = init_unet_params(jax.random.key(0), base_cfg)

    def outs(dtype):
        import dataclasses

        cfg = dataclasses.replace(base_cfg, dtype=dtype)
        params = shared
        den = jax.jit(make_denoiser(params, cfg))
        x = jax.random.normal(jax.random.key(1), (1, 4, 32, 32), jnp.float32)
        # compare the raw eps predictions: denoised = x - sigma*eps is
        # dominated by x itself at low sigma, washing out conditioning
        return [np.asarray((x - den(x, jnp.full((1,), s))) / s)
                for s in (0.5, 0.55, 8.0)]

    lo_b, lo2_b, hi_b = outs(jnp.bfloat16)
    lo_f, _, hi_f = outs(jnp.float32)
    assert all(np.isfinite(o).all() for o in (lo_b, lo2_b, hi_b))

    def corr(a, b):
        a, b = a.ravel() - a.mean(), b.ravel() - b.mean()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    # conditioning alive: sigma=0.5 vs 0.55 nearly identical, vs 8.0 not
    near, far = corr(lo_b, lo2_b), corr(lo_b, hi_b)
    assert near > 0.99 and near > far + 0.001, (near, far)
    # bf16 model tracks the f32 model (same weights, coarse tolerance)
    assert corr(lo_b, lo_f) > 0.98 and corr(hi_b, hi_f) > 0.98
    return 1.0


def check_weights() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sonar_tpu.api import SonarPipeline
    from sonar_tpu.cfg import DiscreteSampling
    from sonar_tpu.models import UNetConfig, init_unet_params, unet_apply

    cfg = UNetConfig(model_channels=32, channel_mult=(1, 2),
                     num_res_blocks=1, attention_levels=(1,), num_heads=4,
                     norm_groups=8)
    p1 = init_unet_params(jax.random.key(0), cfg)
    p2 = init_unet_params(jax.random.key(9), cfg)

    def cond(x, sb, params=None, **kw):
        s = sb.reshape(-1, 1, 1, 1)
        return x - s * unet_apply(params, x / jnp.sqrt(1 + s**2), sb, cfg)

    pipe = SonarPipeline(model=cond, model_uncond=cond, sampler="sonar_euler",
                         cfg_scale=1.0, model_sampling=DiscreteSampling(),
                         seed=3)
    sigmas = jnp.array([7.0, 3.0, 1.0, 0.3, 0.0], jnp.float32)
    x0 = jax.random.normal(jax.random.key(2), (1, 4, 32, 32)) * 7.0
    run = pipe.jit()
    a = np.asarray(run(x0, sigmas, extra_args={"params": p1}))
    b = np.asarray(run(x0, sigmas, extra_args={"params": p2}))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-3, "different weight trees gave equal out"
    return 1.0


def _draws(env: dict, item, shape, n=8, seed=5):
    for k, v in env.items():
        os.environ[k] = v
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sonar_tpu.noise.base import make_noise_sampler

    fn, st = make_noise_sampler(item(), shape, seed=seed, sigma_min=0.03,
                                sigma_max=14.6)

    @jax.jit
    def many(state):
        def body(s, _):
            noise, s = fn(s, jnp.asarray(1.0), jnp.asarray(0.9))
            return s, noise

        return jax.lax.scan(body, state, None, length=n)[1]

    return np.asarray(jax.block_until_ready(many(st)))


def check_voronoi() -> float:
    import numpy as np

    def item():
        from sonar_tpu.noise.voronoi import VoronoiGenerator

        return VoronoiGenerator(n_points=(64,), octaves=2)

    shape = (1, 4, 64, 64)
    a = _draws({"SONAR_TPU_VORONOI_KERNEL": "1"}, item, shape)
    b = _draws({"SONAR_TPU_VORONOI_KERNEL": "0"}, item, shape)
    assert np.isfinite(a).all()
    assert (a == b).all(), f"bit-parity broke: maxdiff {np.abs(a - b).max()}"
    return 1.0


def check_fused() -> float:
    import numpy as np

    def item():
        from sonar_tpu.noise.presets import get_noise_item

        return get_noise_item("pyramid_old")

    shape = (4, 4, 64, 64)
    a = _draws({"SONAR_TPU_FUSED_PYRAMID": "1"}, item, shape, n=32)
    b = _draws({"SONAR_TPU_FUSED_PYRAMID": "0"}, item, shape, n=32)
    assert np.isfinite(a).all()
    # different PRNG stream by design: moment-level agreement only
    assert abs(float(a.mean()) - float(b.mean())) < 0.05, (a.mean(), b.mean())
    assert abs(float(a.std()) / float(b.std()) - 1.0) < 0.05, (a.std(), b.std())
    return 1.0


_SINGLE = {"bf16": check_bf16, "weights": check_weights,
           "voronoi": check_voronoi, "fused": check_fused}


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--single":
        print(_SINGLE[sys.argv[2]]())
        return
    from bench import subprocess_float

    results = {}
    for name in _SINGLE:
        t0 = time.time()
        env = dict(os.environ)
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sonar_jax_cache")
        v = subprocess_float([sys.executable, __file__, "--single", name],
                             env=env, timeout=900, label=name)
        results[name] = "PASS" if v == 1.0 else "FAIL"
        print(f"{name}: {results[name]}  ({time.time() - t0:.0f}s)",
              flush=True)
    ok = all(v == "PASS" for v in results.values())
    print("SMOKE", "PASS" if ok else "FAIL", results, flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
