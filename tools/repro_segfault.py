"""Minimal-repro harness for the late-suite XLA CPU segfault (VERDICT r4 item 7).

Observed ONCE (2026-08-19): `backend_compile` segfaulted while the full
corpus sweep compiled its ~100th distinct sampling loop at the tail of a
40-minute suite run. The structural fix shipped immediately (the sweep
runs subprocess-isolated, tools/sweep_corpus.py); this harness tries to
PIN DOWN the trigger so the fix is understood, not just applied.

Hypothesis space:
  A. unbounded compiler-state growth — each distinct program leaks some
     CPU-client JIT state (LLVM object buffers) until an allocation
     fails unsafely. Signature: monotonic RSS growth per unique compile.
  B. cache-eviction bug — `jax.clear_caches()` mid-stream frees state a
     later compile still references. Signature: crash only in --clear
     mode, shortly after a clear.
  C. a specific program shape — one corpus workflow's program is the
     trigger regardless of history. Signature: crash at a fixed index.

Protocol: compile N DISTINCT sampling-loop programs in one process
(distinctness forced by varying the static sigma-table length and a
baked constant), logging RSS every compile. Modes:
  --clear K   call jax.clear_caches() every K compiles (default never)
  -n N        number of distinct programs (default 150, > the observed
              ~100-compile regime)

Exit code 0 = survived (prints final RSS delta); a segfault kills the
process (rc -11/139) — run under a parent that records the index from
the last stdout line.

Result 2026-08-20 (this box, CPU): SURVIVED 150 distinct compiles in
both modes — no crash at any index (C ruled out for these programs).
Without clearing, RSS grew monotonically ~2.9 MB/compile (432 MB over
the run, unbounded — hypothesis A's precondition); with --clear 20 it
PLATEAUED at ~340 MB (delta 178 MB, fully reclaimed each cycle — no
evidence for B). The crash itself needs the 40-minute suite's multi-GB
compiler-state baseline that isolation cannot cheaply rebuild.
Conclusion in profiles/ANALYSIS.md §21; the shipped mitigation
(subprocess isolation + clear_caches every 20 workflows in
tools/sweep_corpus.py) bounds both the baseline and the growth.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def rss_mb() -> float:
    for line in open("/proc/self/status"):
        if line.startswith("VmRSS"):
            return int(line.split()[1]) / 1024.0
    return -1.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=150)
    ap.add_argument("--clear", type=int, default=0,
                    help="jax.clear_caches() every K compiles (0=never)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sonar_tpu.api import SonarPipeline
    from sonar_tpu.noise import get_noise_item

    def toy_model(x, sb, **kw):
        return x / (1.0 + sb.reshape(-1, 1, 1, 1))

    base = rss_mb()
    print(f"start rss={base:.1f}MB", flush=True)
    for i in range(args.n):
        # distinct static schedule length + baked constant -> every
        # iteration is a brand-new XLA program, like the corpus sweep
        steps = 4 + (i % 7)
        sigmas = jnp.concatenate([
            jnp.geomspace(14.6 + 0.01 * i, 0.03, steps),
            jnp.zeros((1,))]).astype(jnp.float32)
        noise = get_noise_item(
            ["gaussian", "pyramid", "uniform"][i % 3])
        pipe = SonarPipeline(model=toy_model, sampler="sonar_euler",
                             noise=noise, cfg_scale=1.0 + 0.1 * (i % 5))
        x0 = jnp.full((1, 4, 16, 16), float(sigmas[0]))
        out = np.asarray(pipe(x0, sigmas))
        assert np.isfinite(out).all()
        if args.clear and (i + 1) % args.clear == 0:
            jax.clear_caches()
        if (i + 1) % 10 == 0:
            print(f"compile {i + 1}/{args.n} rss={rss_mb():.1f}MB",
                  flush=True)
    print(f"SURVIVED {args.n} rss_delta={rss_mb() - base:.1f}MB",
          flush=True)


if __name__ == "__main__":
    main()
