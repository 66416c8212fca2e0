"""Execute EVERY reference example workflow end-to-end (VERDICT r4 item 2).

The reference ships 105 example images whose PNGs embed the ComfyUI
prompt graphs that produced them (/root/reference/assets/example_images,
docs/advanced_noise_nodes.md:35-39); 102 carry sonar nodes. This sweep
ports each graph (api/workflow.py), builds its pipeline — whatever its
sampler node is (KSamplerSelect -> SamplerConfigOverride, SamplerSonar*,
RestartSamplerCustomNoise) — and runs a short schedule on a toy model,
asserting finite outputs.

Run standalone: ``python tools/sweep_corpus.py [--stride N]``.
Prints one line per failure and a final ``OK <n>/<total>`` line; exits
nonzero if fewer than --min-ok (default 100 at stride 1) succeed.

The slow test lane invokes this in a SUBPROCESS: compiling 100+
sampling loops on top of a 40-minute suite's XLA compiler state
segfaulted backend_compile once (2026-08-19) — process isolation is the
structural fix (VERDICT r4 item 7), replacing the in-suite
jax.clear_caches() workaround.
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

ASSETS = pathlib.Path("/root/reference/assets/example_images")


def load_corpus():
    from sonar_tpu.api.nodes import NODES
    from sonar_tpu.api.workflow import read_png_metadata

    corpus = []
    for p in sorted(ASSETS.rglob("*.png")):
        try:
            meta = read_png_metadata(p)
        except Exception:  # noqa: BLE001 — non-PNG/no-metadata files skip
            continue
        if "prompt" not in meta:
            continue
        g = json.loads(meta["prompt"])
        sonar = {n.get("class_type") for n in g.values()
                 if isinstance(n, dict)} & set(NODES)
        if sonar:
            corpus.append((p, g))
    return corpus


def run_sweep(stride: int = 1, verbose: bool = True):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sonar_tpu.api import pipeline_from_workflow

    externals = {
        "mask": jnp.ones((64, 64)),
        "latent": jnp.zeros((1, 4, 32, 32)),
        "image": jnp.zeros((1, 64, 64, 3)),
        "sampler": "sonar_euler",
        "model_channels": 320,
    }

    def toy_model(x, sb, **kw):
        s = sb.reshape(-1, 1, 1, 1)
        return x / (1.0 + s)

    corpus = load_corpus()[::stride]
    sigmas = jnp.concatenate(
        [jnp.geomspace(14.6, 0.03, 6), jnp.zeros((1,))]).astype(jnp.float32)
    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 4, 16, 16)),
        jnp.float32) * 14.6
    ok, fails = 0, []
    for i, (p, g) in enumerate(corpus):
        try:
            pipe, _res = pipeline_from_workflow(
                g, model=toy_model, externals=externals, cfg_scale=3.0)
            out = np.asarray(pipe(x0, sigmas))
            assert out.shape == x0.shape, f"shape {out.shape}"
            assert np.isfinite(out).all(), "non-finite output"
            ok += 1
        except Exception as e:  # noqa: BLE001 — per-workflow diagnostics
            fails.append(f"{p.name}: {type(e).__name__}: {e}")
        if (i + 1) % 20 == 0:
            if verbose:
                print(f"... {i + 1}/{len(corpus)} ok={ok}", file=sys.stderr,
                      flush=True)
            # bound compiler-state growth across 100+ loop compiles —
            # a stability bound, so it must not depend on the logging flag
            jax.clear_caches()
    return ok, len(corpus), fails


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--min-ok", type=int, default=None)
    args = ap.parse_args()
    ok, total, fails = run_sweep(stride=args.stride)
    for f in fails:
        print(f"FAIL {f[:300]}", flush=True)
    print(f"OK {ok}/{total}", flush=True)
    min_ok = args.min_ok if args.min_ok is not None else (
        100 if args.stride == 1 else total - 1)
    sys.exit(0 if ok >= min_ok else 1)


if __name__ == "__main__":
    main()
