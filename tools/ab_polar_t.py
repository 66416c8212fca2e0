"""Polar vs rejection Student-t on-chip A/B (VERDICT r4 item 8).

Interleaved in ONE process so tunnel phase cancels; each variant is
traced under its own SONAR_TPU_POLAR_T value (env flags are read at
trace time — CLAUDE.md timing rules). The program is the same
per-draw-shaped scan bench_slow_types uses: ``iters`` stacked studentt
noise-type draws at (1, 4, 128, 128).

Prints one JSON line: median + IQR of the slope-ratio samples
(rejection_time / polar_time; > 1 means polar is faster) and each
side's absolute Mpix/s.
"""

import json
import os
import pathlib
import statistics
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

SHAPE = (1, 4, 128, 128)
ITERS = 20


def _draw_fn(flag: str):
    os.environ["SONAR_TPU_POLAR_T"] = flag
    from sonar_tpu.noise.base import make_noise_sampler
    from sonar_tpu.noise.presets import get_noise_item

    fn, st0 = make_noise_sampler(get_noise_item("studentt"), SHAPE, seed=5,
                                 sigma_min=0.03, sigma_max=14.6)

    @jax.jit
    def run(state):
        def body(st, _):
            noise, st = fn(st, jnp.asarray(1.0), jnp.asarray(0.9))
            return st, noise

        _, stacked = jax.lax.scan(body, state, None, length=ITERS)
        return stacked

    run(st0)  # trace + compile NOW, while the flag is set
    return run, st0


def main():
    from bench import _ab_slope_samples, _timeit_slope

    rej, rej_st = _draw_fn("0")
    pol, pol_st = _draw_fn("1")
    samples = _ab_slope_samples(rej, (rej_st,), pol, (pol_st,), k=5)
    samples.sort()
    npix = 1
    for d in SHAPE:
        npix *= d
    out = {
        "ratio_median": round(statistics.median(samples), 3),
        "ratio_iqr": [round(samples[1], 3), round(samples[-2], 3)],
        "rejection_mpix_s": round(npix * ITERS / _timeit_slope(rej, rej_st) / 1e6, 1),
        "polar_mpix_s": round(npix * ITERS / _timeit_slope(pol, pol_st) / 1e6, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
