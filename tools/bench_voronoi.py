"""On-chip Voronoi A/Bs (run from /root/repo, ONE process on the TPU):

1. bit-parity of the fused kernel vs the XLA path on real hardware
2. slope-timed interleaved speedup kernel vs XLA (f1, 256 points, 2 oct)
3. itermin (k fused argmin passes) vs lax.top_k for the f4 prefix
4. absolute Mpix/s for both paths at the bench shape

Usage: python tools/bench_voronoi.py [quick]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _ab_slope, _force, _timeit_slope
from sonar_tpu.noise.base import make_noise_sampler
from sonar_tpu.noise.voronoi import VoronoiGenerator

SHAPE = (1, 4, 128, 128)
NPIX = int(np.prod(SHAPE))
N = 256
ITERS = 10


def build(env: dict, **genkw):
    for k, v in env.items():
        os.environ[k] = v
    item = VoronoiGenerator(n_points=(N,), octaves=genkw.pop("octaves", 2),
                            **genkw)
    fn, st = make_noise_sampler(item, SHAPE, seed=5, sigma_min=0.03,
                                sigma_max=14.6)

    @jax.jit
    def draw_many(state):
        def body(s, _):
            n, s = fn(s, jnp.asarray(1.0), jnp.asarray(0.9))
            return s, n

        return jax.lax.scan(body, state, None, length=ITERS)[1]

    return draw_many, st


def main():
    reps = 2 if "quick" in sys.argv[1:] else 4
    print("backend:", jax.default_backend(), flush=True)

    on_fn, on_st = build({"SONAR_TPU_VORONOI_KERNEL": "1"})
    a = np.asarray(on_fn(on_st))
    print("kernel path compiled+ran", flush=True)
    off_fn, off_st = build({"SONAR_TPU_VORONOI_KERNEL": "0"})
    b = np.asarray(off_fn(off_st))
    print("f1 bitparity kernel-vs-xla:", bool((a == b).all()),
          "maxdiff:", float(np.abs(a - b).max()), flush=True)

    ratio = _ab_slope(off_fn, (off_st,), on_fn, (on_st,), reps=reps)
    print(f"f1 kernel speedup (xla_t/kernel_t): {ratio:.3f}", flush=True)

    dt_on = _timeit_slope(on_fn, on_st, reps=reps)
    dt_off = _timeit_slope(off_fn, off_st, reps=reps)
    print(f"f1 kernel {NPIX * ITERS / dt_on / 1e6:.1f} Mpix/s  "
          f"xla {NPIX * ITERS / dt_off / 1e6:.1f} Mpix/s", flush=True)

    # k=4 prefix: itermin (fused argmin passes) vs lax.top_k, kernel off
    it_fn, it_st = build({"SONAR_TPU_VORONOI_KERNEL": "0",
                          "SONAR_TPU_VORONOI_ITERMIN": "4"},
                         result_mode=("f4",))
    _force(it_fn(it_st))
    tk_fn, tk_st = build({"SONAR_TPU_VORONOI_KERNEL": "0",
                          "SONAR_TPU_VORONOI_ITERMIN": "0"},
                         result_mode=("f4",))
    _force(tk_fn(tk_st))
    os.environ["SONAR_TPU_VORONOI_ITERMIN"] = "4"
    r = _ab_slope(tk_fn, (tk_st,), it_fn, (it_st,), reps=reps)
    print(f"f4 itermin speedup (topk_t/itermin_t): {r:.3f}", flush=True)

    # f4 kernel vs xla
    k4_fn, k4_st = build({"SONAR_TPU_VORONOI_KERNEL": "1"},
                         result_mode=("f4",))
    c = np.asarray(k4_fn(k4_st))
    d = np.asarray(it_fn(it_st))
    print("f4 bitparity kernel-vs-xla:", bool((c == d).all()),
          "maxdiff:", float(np.abs(c - d).max()), flush=True)
    r = _ab_slope(it_fn, (it_st,), k4_fn, (k4_st,), reps=reps)
    print(f"f4 kernel speedup (xla_t/kernel_t): {r:.3f}", flush=True)
    dt4 = _timeit_slope(k4_fn, k4_st, reps=reps)
    print(f"f4 kernel {NPIX * ITERS / dt4 / 1e6:.1f} Mpix/s", flush=True)

    # k=2 (diff — the ridge default): confirms the k>=2 kernel threshold
    d2k_fn, d2k_st = build({"SONAR_TPU_VORONOI_KERNEL": "1"},
                           result_mode=("diff",))
    _force(d2k_fn(d2k_st))
    d2x_fn, d2x_st = build({"SONAR_TPU_VORONOI_KERNEL": "0"},
                           result_mode=("diff",))
    _force(d2x_fn(d2x_st))
    r = _ab_slope(d2x_fn, (d2x_st,), d2k_fn, (d2k_st,), reps=reps)
    print(f"diff(k=2) kernel speedup (xla_t/kernel_t): {r:.3f}", flush=True)


if __name__ == "__main__":
    main()
