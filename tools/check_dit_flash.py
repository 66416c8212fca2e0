"""On-chip numerics check: dense vs pallas-flash DiT attention.

The flash kernel (jax.experimental.pallas.ops.tpu.flash_attention)
replaces the dense path in the auto-gated collapse regime
(models/dit.py:_use_flash_attention, profiles/ANALYSIS.md §19-20). It
computes the SAME f32-accumulated softmax attention with a different
reduction blocking, so outputs must agree to fusion-order ulps — this
script asserts that on the real chip at the serving shape before the
default stays on.

Checks (each printed with its max |Δ|):
  1. full dit_apply forward at b=8 f32: dense vs flash
  2. same at bf16 compute dtype
Tolerances: f32 2e-4 absolute on a ~N(0,1)-scaled output; bf16 2e-2.
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def forward(flash: bool, dtype_name: str):
    os.environ["SONAR_TPU_DIT_FLASH"] = "1" if flash else "0"
    import jax
    import jax.numpy as jnp

    from sonar_tpu.models import DiTConfig, dit_apply, init_dit_params

    dt = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    cfg = DiTConfig(hidden=384, depth=12, num_heads=6, patch_size=2,
                    dtype=dt)
    params = init_dit_params(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (8, 4, 64, 64), jnp.float32)
    sigma = jnp.full((8,), 2.5, jnp.float32)
    out = jax.jit(lambda p, x, s: dit_apply(p, x, s, cfg))(params, x, sigma)
    import numpy as np

    return np.asarray(out, np.float32)


def main():
    import numpy as np

    ok = True
    for dtype_name, tol in (("f32", 2e-4), ("bf16", 2e-2)):
        dense = forward(False, dtype_name)
        fl = forward(True, dtype_name)
        d = float(np.abs(dense - fl).max())
        scale = float(np.abs(dense).max())
        line = (f"{dtype_name}: max|Δ|={d:.3e} (out scale {scale:.2f}) "
                f"tol={tol}")
        if not (np.isfinite(fl).all() and d <= tol):
            ok = False
            line += "  FAIL"
        print(line, flush=True)
    print("PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
