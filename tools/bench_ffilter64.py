"""FreeU spectral filter A/B at 64x64 stage-1 activations (VERDICT r4
item 6 "Done" criterion): FFT path vs the rank-decomposed separable
matmul path, slope-timed interleaved in ONE process so tunnel phase
cancels (CLAUDE.md timing rules).

The shape models config-4 beyond 1024px: stage-1 backbone activations
(B, 640, 64, 64) — the dense-K operator is impossible there (64 MB).

MEASURED (2026-08-20, v5e, profiles/ANALYSIS.md §18): fft/sep ratio
median 0.346 at HIGHEST precision, 0.620 at DEFAULT ("sep_fast") —
the separable path LOSES both ways (config-4 masks are rank 24-28 →
20-41x the FFT's FLOPs), so the default now falls through to FFT
beyond the 32x32 dense-K gate and "sep"/"sep_fast" are opt-in.

Usage: python tools/bench_ffilter64.py [B] [H] [sep|sep_fast]
Prints one float: median speedup ratio (fft_time / separable_time);
>= 1.0 would mean the separable matmul path is at least as fast.
"""

import os
import pathlib
import statistics
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    # matmul-path variant: "sep" = HIGHEST precision factor pair,
    # "sep_fast" = DEFAULT precision (bf16 MXU inputs)
    mm_mode = sys.argv[3] if len(sys.argv) > 3 else "sep"
    from bench import _ab_slope_samples

    from sonar_tpu.cfg.freeu import ffilter
    from sonar_tpu.noise.power import PowerFilter

    pf = PowerFilter(alpha=0.4)  # the config-4 filter
    shape = (b, 640, hw, hw)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(shape), jnp.float32)

    # env-flag kernels trace at first CALL — warm each variant under its
    # own flag before timing (CLAUDE.md timing rule 3)
    os.environ["SONAR_TPU_FREEU_MATMUL"] = "0"
    fft_fn = jax.jit(lambda v: ffilter(v, pf, 0.25))
    fft_fn(x).block_until_ready()
    os.environ["SONAR_TPU_FREEU_MATMUL"] = mm_mode
    sep_fn = jax.jit(lambda v: ffilter(v, pf, 0.25))
    sep_fn(x).block_until_ready()
    # sanity: the two paths must agree (else the ratio is meaningless)
    d = float(jnp.max(jnp.abs(fft_fn(x) - sep_fn(x))))
    scale = float(jnp.max(jnp.abs(fft_fn(x))))
    tol = 2e-2 if mm_mode.endswith("fast") else 3e-5
    assert d / max(scale, 1.0) < tol, f"paths diverge: {d} vs {scale}"

    ratios = _ab_slope_samples(fft_fn, (x,), sep_fn, (x,), k=5)
    print(f"# ratios: {['%.3f' % r for r in ratios]}", file=sys.stderr)
    print(statistics.median(ratios))


if __name__ == "__main__":
    main()
