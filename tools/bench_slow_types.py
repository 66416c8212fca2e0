"""Slope-timed throughput of the reference's qualitatively-slow noise
types (BASELINE.md rows: collatz "EXTREMELY slow", pyramid_old "~60x the
latent size", scatternet VRAM warning). One metric per process when run
via --all; prints Mpix/s per type."""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from bench import _timeit_slope

SHAPE = (1, 4, 128, 128)

ITEMS = {
    "collatz": lambda: _preset("collatz"),
    "voronoi": lambda: _voronoi(),
    "scatternet": lambda: _scatternet(),
    "wavelet": lambda: _preset("wavelet"),
    "pyramid_old": lambda: _preset("pyramid_old"),
}


def _preset(name, **kw):
    from sonar_tpu.noise.presets import get_noise_item

    return get_noise_item(name, **kw)


def _voronoi():
    from sonar_tpu.noise.voronoi import VoronoiGenerator

    return VoronoiGenerator(n_points=(256,))


def _scatternet():
    from sonar_tpu.api import build

    chain = build("SonarCustomNoise", factor=1.0, noise_type="gaussian")
    return build("SonarScatternetFilteredNoise", custom_noise=chain)


def measure(name, iters=50, shape=SHAPE) -> float:
    from sonar_tpu.noise.base import make_noise_sampler

    item = ITEMS[name]()
    fn, st = make_noise_sampler(item, shape, seed=3, sigma_min=0.03,
                                sigma_max=14.6)

    @jax.jit
    def draw_many(state):
        def body(s, _):
            noise, s = fn(s, jnp.asarray(1.0), jnp.asarray(0.9))
            return s, noise

        return jax.lax.scan(body, state, None, length=iters)[1]

    dt = _timeit_slope(draw_many, st, g1=2, g2=8, reps=4)
    npix = 1
    for d in shape:
        npix *= d
    return npix * iters / dt / 1e6


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--single":
        print(measure(sys.argv[2]))
        return
    from bench import subprocess_float

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sonar_jax_cache")
    out = {}
    for name in ITEMS:
        v = subprocess_float([sys.executable, __file__, "--single", name],
                             env=env, label=name)
        out[name] = round(v, 1) if v is not None else None
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps({f"{k}_mpix_per_sec": v for k, v in out.items()}))


if __name__ == "__main__":
    main()
