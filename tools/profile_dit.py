"""DiT serving-MFU decomposition (VERDICT r4 item 5).

BENCH_r04's validation runs put the DiT sampler at 32.4% MFU vs
55.4-57.9% for the SDXL UNet. This tool decomposes that gap the way
profile_freeu.py decomposed config-4. Hypotheses, one variant each:

  base      bench_dit_sampler methodology as shipped in round 4
            (_timeit, 5 pipelined iters + ONE forced readback): for a
            ~20 ms program the amortized ~30 ms round trip adds ~6 ms
            per iter -> a built-in ~25% MFU UNDER-estimate. The SDXL
            metric is immune (its program is ~1 s).
  slope     same program, bench._timeit_slope (two-point group timing
            cancels the round trip) — the honest per-call number and
            what bench.py emits from round 5 on.
  bf16      DiTConfig(dtype=bf16) under slope timing (f32 softmax/LN
            stats stay f32 inside the model — models/dit.py design).
  unroll    lax.scan(unroll=depth) over the stacked blocks: isolates
            per-iteration scan overhead at depth 12.
  b8        batch 8, f32: fixed per-program overhead amortizes and the
            matmul M dim grows 8x (MFU normalized by 8x flops).
  b8_bf16   both levers together — the serving configuration.
  skel      matmul-only skeleton: the SAME matmul/einsum shapes as one
            block stack x 20 sequential calls with LN/softmax/gelu/adaLN
            deleted — the MXU ceiling for these shapes. MFU above this
            is unreachable without changing the model geometry
            (attention's K=head_dim=64 is half an MXU tile at DiT-S).
  ditb      DiT-B geometry (hidden 768, heads 12): arithmetic-intensity
            scaling evidence — if MFU rises with width, the DiT-S floor
            is the model size, not the implementation.

Every variant runs in its own subprocess (process contamination,
CLAUDE.md) and prints ms PER MODEL CALL; the driver derives MFU from
models/flops.py analytic counts.

Usage: python tools/profile_dit.py                   # all variants
       python tools/profile_dit.py --single <name>
       python tools/profile_dit.py base slope bf16   # a subset
"""

import json
import math
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# SMOKE=1 shrinks every dimension so the code paths run in seconds on
# CPU (numbers are meaningless there — chip runs only for real rows)
SMOKE = os.environ.get("SONAR_PROFILE_DIT_SMOKE") == "1"
STEPS = 3 if SMOKE else 20
SHAPE_HW = (16, 16) if SMOKE else (64, 64)


def _cfg(name):
    import jax.numpy as jnp
    from sonar_tpu.models import DiTConfig

    if SMOKE:
        dt = jnp.bfloat16 if "bf16" in name else jnp.float32
        return DiTConfig(hidden=64, depth=2, num_heads=2, patch_size=2,
                         dtype=dt)
    if name == "ditb":
        return DiTConfig(hidden=768, depth=12, num_heads=12, patch_size=2)
    dt = jnp.bfloat16 if "bf16" in name else jnp.float32
    return DiTConfig(hidden=384, depth=12, num_heads=6, patch_size=2,
                     dtype=dt)


def _batch(name):
    return 8 if name.startswith("b8") else 1


def _sampling_ms_per_call(cfg, batch, timer):
    """Build the exact bench_dit_sampler program and time it."""
    import jax
    import jax.numpy as jnp

    from sonar_tpu.models import init_dit_params, make_dit_denoiser
    from sonar_tpu.samplers.sonar import sample_sonar_euler_ancestral

    params = init_dit_params(jax.random.key(0), cfg)
    model = make_dit_denoiser(params, cfg)
    ramp = jnp.linspace(0, 1, STEPS)
    sigmas = (14.6 ** (1 / 7.0)
              + ramp * (0.03 ** (1 / 7.0) - 14.6 ** (1 / 7.0))) ** 7.0
    sigmas = jnp.concatenate([sigmas, jnp.zeros((1,))]).astype(jnp.float32)
    x = jax.random.normal(jax.random.key(1),
                          (batch, cfg.in_channels) + SHAPE_HW,
                          jnp.float32) * float(sigmas[0])

    @jax.jit
    def run(x, w):
        return sample_sonar_euler_ancestral(model, x, sigmas, seed=7,
                                            extra_args={"params": w})

    return timer(run, x, params) * 1e3 / STEPS


def _unroll_ms_per_call():
    """slope variant with the block scan fully unrolled."""
    import jax

    import sonar_tpu.models.dit as dit
    from bench import _timeit_slope

    # patch only the block scan (sampler scans stay sequential programs)
    real = dit._scan_blocks

    def scan_unrolled(stacked, h, emb, cfg, tp_axis=None):
        def body(carry, bp):
            out, aux = dit._block(bp, carry, emb, cfg, tp_axis)
            return out, aux

        h, auxs = jax.lax.scan(body, h, stacked, unroll=True)
        import jax.numpy as jnp
        return h, jnp.mean(auxs)

    dit._scan_blocks = scan_unrolled
    try:
        return _sampling_ms_per_call(_cfg("slope"), 1, _timeit_slope)
    finally:
        dit._scan_blocks = real


def _skel_ms_per_call():
    """20 sequential block-stack passes, matmuls/einsums only."""
    import jax
    import jax.numpy as jnp

    from bench import _timeit_slope

    d, depth, heads, mlp = _skel_dims()
    n = (SHAPE_HW[0] // 2) * (SHAPE_HW[1] // 2)
    dh = d // heads
    ks = jax.random.split(jax.random.key(0), 4)
    s = 0.02
    ws = {
        "qkv": jax.random.normal(ks[0], (depth, d, 3 * d), jnp.float32) * s,
        "out": jax.random.normal(ks[1], (depth, d, d), jnp.float32) * s,
        "mi": jax.random.normal(ks[2], (depth, d, mlp * d), jnp.float32) * s,
        "mo": jax.random.normal(ks[3], (depth, mlp * d, d), jnp.float32) * s,
    }
    x0 = jax.random.normal(jax.random.key(1), (1, n, d), jnp.float32)

    def block(h, w):
        qkv = h @ w["qkv"]
        qkv = qkv.reshape(1, n, heads, 3, dh)
        q, k, v = (qkv[:, :, :, i].transpose(0, 2, 1, 3) for i in range(3))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        att = (logits * (1.0 / math.sqrt(dh))).astype(h.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        o = o.transpose(0, 2, 1, 3).reshape(1, n, d)
        h = h + o @ w["out"]
        return h + (h @ w["mi"]) @ w["mo"], None

    @jax.jit
    def run(x, ws):
        def call(h, _):
            out, _ = jax.lax.scan(block, h, ws)
            # sequential dependency between "model calls" without growth
            return x + 1e-3 * out, None

        h, _ = jax.lax.scan(call, x, None, length=STEPS)
        return h

    return _timeit_slope(run, x0, ws) * 1e3 / STEPS


def _skel_dims():
    return (64, 2, 2, 4) if SMOKE else (384, 12, 6, 4)


def skel_flops():
    d, depth, _, mlp = _skel_dims()
    n = (SHAPE_HW[0] // 2) * (SHAPE_HW[1] // 2)
    per = 2.0 * n * d * 3 * d + 2.0 * 2 * n * n * d + 2.0 * n * d * d \
        + 2.0 * 2 * n * d * mlp * d
    return depth * per


def _forward_ms_per_call(cfg, batch, timer):
    """Time jit(dit_apply) directly — one model call per program.

    The flash-attention A/B uses this framing: the pallas kernel inside
    the full 20-step sampling scan costs >15 min of remote compile (two
    900s child timeouts, 2026-08-20), while the forward-only program
    compiles in minutes. Per-model-call ms is the quantity every ANALYSIS
    §19 row reports anyway; sampler overhead at b8 is sub-1%."""
    import jax
    import jax.numpy as jnp

    from sonar_tpu.models import dit_apply, init_dit_params

    params = init_dit_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1),
                          (batch, cfg.in_channels) + SHAPE_HW, jnp.float32)
    sigma = jnp.full((batch,), 2.5, jnp.float32)

    @jax.jit
    def run(p, x, s):
        return dit_apply(p, x, s, cfg)

    return timer(run, params, x, sigma) * 1e3


def run_variant(name):
    from bench import _timeit, _timeit_slope

    # pin the attention path so the b8 dense rows stay dense even now
    # that the auto-gate turns the flash kernel on in the collapse regime
    # (SMOKE runs on CPU where the TPU pallas kernel cannot execute)
    os.environ["SONAR_TPU_DIT_FLASH"] = (
        "1" if "_flash" in name and not SMOKE else "0")
    if name == "skel":
        return _skel_ms_per_call()
    if name == "unroll":
        return _unroll_ms_per_call()
    if name.endswith("_fwd"):
        return _forward_ms_per_call(_cfg(name), _batch(name), _timeit_slope)
    timer = _timeit if name == "base" else _timeit_slope
    if name == "base":
        def timer(fn, *a):
            return _timeit(fn, *a, warmup=1, iters=5)
    return _sampling_ms_per_call(_cfg(name), _batch(name), timer)


VARIANTS = ("base", "slope", "bf16", "unroll", "b8", "b8_bf16", "skel",
            "ditb", "b8_flash", "b8_bf16_flash")


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--single":
        print(run_variant(sys.argv[2]))
        return
    from bench import subprocess_float
    from sonar_tpu.models import dit_forward_flops, mfu_pct

    names = sys.argv[1:] or list(VARIANTS)
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sonar_jax_cache")
    out = {}
    for name in names:
        ms = subprocess_float(
            [sys.executable, __file__, "--single", name], env=env,
            label=name,
            timeout=int(os.environ.get("SONAR_PROFILE_DIT_TIMEOUT", "900")))
        if ms is None:
            out[name] = None
            continue
        if name == "skel":
            f = skel_flops()
        else:
            b, hw = _batch(name), SHAPE_HW
            f = dit_forward_flops(_cfg(name), (b, 4) + hw)
        out[name] = {"ms_per_call": round(ms, 4),
                     "mfu_pct": round(mfu_pct(f, ms), 2)}
        print(f"# {name}: {ms:.3f} ms/call  MFU {out[name]['mfu_pct']}%",
              file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
