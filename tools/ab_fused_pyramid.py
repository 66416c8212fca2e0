"""On-chip interleaved A/B: fused-pyramid Pallas kernel vs the XLA path.

Run sizes large enough that HBM bandwidth (not tunnel dispatch or pipeline
fill) dominates: the bench shape (1,4,128,128) writes only 256KB/draw.

Usage: python tools/ab_fused_pyramid.py [B C H W ITERS REPS [NOISE_TYPE]]
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from bench import _force, _timeit_slope

NOISE_TYPE = "pyramid"


def build_fn(shape, iters):
    from sonar_tpu.noise.base import make_noise_sampler
    from sonar_tpu.noise.presets import get_noise_item

    item = get_noise_item(NOISE_TYPE)
    fn, state0 = make_noise_sampler(item, shape, seed=3, sigma_min=0.03,
                                    sigma_max=14.6)

    @jax.jit
    def draw_many(state):
        def body(st, _):
            noise, st = fn(st, jnp.asarray(1.0), jnp.asarray(0.9))
            return st, noise

        return jax.lax.scan(body, state, None, length=iters)[1]

    return draw_many, state0


def main():
    global NOISE_TYPE
    argv = sys.argv[1:]
    if argv and not argv[-1].isdigit():
        NOISE_TYPE = argv.pop()
    args = [int(a) for a in argv]
    if 0 < len(args) < 4:
        sys.exit("pass 4+ sizes (B C H W [ITERS REPS]) or none for defaults")
    b, c, h, w = args[:4] if len(args) >= 4 else (4, 4, 512, 512)
    iters = args[4] if len(args) >= 5 else 50
    reps = args[5] if len(args) >= 6 else 10
    print("noise type:", NOISE_TYPE)
    shape = (b, c, h, w)
    npix = b * c * h * w * iters

    os.environ["SONAR_TPU_FUSED_PYRAMID"] = "0"
    xla_fn, xla_st = build_fn(shape, iters)
    out_x = xla_fn(xla_st)
    _force(out_x)
    print("xla   stats: mean %.4f std %.4f" % (float(out_x.mean()), float(out_x.std())), flush=True)
    os.environ["SONAR_TPU_FUSED_PYRAMID"] = "1"
    fused_fn, fused_st = build_fn(shape, iters)
    out_f = fused_fn(fused_st)
    _force(out_f)
    print("fused stats: mean %.4f std %.4f" % (float(out_f.mean()), float(out_f.std())), flush=True)
    os.environ["SONAR_TPU_FUSED_PYRAMID"] = "0"

    # slope timing: single forced timings are dominated by the ~30ms
    # tunnel round trip (bench._timeit_slope docs)
    best_x = _timeit_slope(xla_fn, xla_st, reps=max(2, reps // 2))
    best_f = _timeit_slope(fused_fn, fused_st, reps=max(2, reps // 2))
    print("shape=%s iters=%d" % (shape, iters))
    print("xla:   %.3f ms  %.1f GPix/s" % (best_x * 1e3, npix / best_x / 1e9))
    print("fused: %.3f ms  %.1f GPix/s" % (best_f * 1e3, npix / best_f / 1e9))
    print("ratio xla/fused (best-slopes): %.4f" % (best_x / best_f))

    # median + IQR over >=5 interleaved slope-ratio samples — the single
    # quotable number per kernel (VERDICT r2 item 7)
    import numpy as np

    from bench import _ab_slope_samples

    samples = sorted(_ab_slope_samples(xla_fn, (xla_st,),
                                       fused_fn, (fused_st,),
                                       k=max(5, reps // 2)))
    q1, med, q3 = np.percentile(samples, [25, 50, 75])
    print("speedup median %.2fx  IQR [%.2f, %.2f]  (k=%d samples: %s)"
          % (med, q1, q3, len(samples),
             " ".join("%.2f" % s for s in samples)))


if __name__ == "__main__":
    main()
