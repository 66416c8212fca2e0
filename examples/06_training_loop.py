"""Diffusion training on TPU: remat, mixed precision, EMA, checkpointing.

The reference has no training path (its denoiser is host-supplied); this
framework ships one so the flagship UNet can be trained and then sampled
with the sonar machinery. The TPU levers composed here:

1. ``remat="dots"`` — jax.checkpoint with the dots-saveable policy:
   matmul/conv outputs are kept, the cheap elementwise/norm chains between
   them recompute in the backward pass. Most of the activation-HBM win at
   a fraction of full remat's ~30% FLOPs overhead.
2. ``compute_dtype=jnp.bfloat16`` — f32 master weights in the optimizer,
   bf16 forward/backward (2x MXU rate, half the activation HBM). The
   sigma embedding stays f32 internally (models/unet.py) — bf16 angles
   would quantize away the high-frequency noise-conditioning bands.
3. ``ema_update`` — sample from the EMA weights, train the raw ones
   (standard diffusion practice); pure tree_map, folds into the jit.
4. ``save_checkpoint``/``restore_checkpoint`` — orbax round trip of
   (params, opt_state, ema, step); restore can target a sharded mesh
   layout directly (see tests/test_train.py::test_checkpoint_roundtrip).

Run (CPU):  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/06_training_loop.py
Run (TPU):  python examples/06_training_loop.py
"""

import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sonar_tpu.models import (
    UNetConfig,
    ema_update,
    init_train_state,
    init_unet_params,
    make_denoiser,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)
from sonar_tpu.samplers.sonar import sample_sonar_euler_ancestral


def main():
    cfg = UNetConfig(model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                     attention_levels=(1,), num_heads=4, norm_groups=8)
    params = init_unet_params(jax.random.key(0), cfg)
    optimizer = optax.adam(2e-3)
    opt_state = init_train_state(params, optimizer)
    ema = params

    step_fn = jax.jit(make_train_step(cfg, optimizer, remat="dots",
                                      compute_dtype=jnp.bfloat16))
    ema_fn = jax.jit(lambda e, p: ema_update(e, p, decay=0.99))

    # toy dataset: smooth random latents (stands in for VAE-encoded images)
    rng = np.random.default_rng(7)
    data = jnp.asarray(rng.standard_normal((4, 4, 16, 16)), jnp.float32)

    losses = []
    for i in range(10):
        params, opt_state, loss = step_fn(params, opt_state, data,
                                          jax.random.key(100 + i))
        ema = ema_fn(ema, params)
        losses.append(float(loss))
    print(f"loss {losses[0]:.4f} -> {losses[-1]:.4f} over {len(losses)} steps "
          f"(bf16 compute, f32 master weights, remat=dots)")
    assert losses[-1] < losses[0], "training should reduce the loss"

    # checkpoint round trip — the restored opt_state is optimizer-ready
    ckpt = tempfile.mkdtemp() + "/ckpt"
    save_checkpoint(ckpt, {"params": params, "opt_state": opt_state,
                           "ema": ema, "step": jnp.asarray(len(losses))})
    restored = restore_checkpoint(ckpt)
    params, opt_state = restored["params"], restored["opt_state"]
    params, opt_state, loss = step_fn(params, opt_state, data,
                                      jax.random.key(999))
    print(f"resumed from checkpoint at step {int(restored['step'])}, "
          f"next loss {float(loss):.4f}")

    # sample from the EMA weights with the sonar machinery. The weights
    # flow through extra_args as a jit ARGUMENT — closing over them would
    # bake the tree into the program as constants (recompile per weight
    # update; breaks remote compile at SDXL scale — see
    # docs/porting_guide.md "weights as jit arguments")
    model = make_denoiser(restored["ema"], cfg)
    sigmas = jnp.concatenate([jnp.geomspace(14.6, 0.03, 8),
                              jnp.zeros((1,))]).astype(jnp.float32)
    x0 = jax.random.normal(jax.random.key(1), (1, 4, 16, 16)) * 14.6
    out = jax.jit(lambda x, w: sample_sonar_euler_ancestral(
        model, x, sigmas, seed=11, extra_args={"params": w}))(
            x0, restored["ema"])
    out = np.asarray(out)
    assert np.isfinite(out).all()
    print(f"sampled {out.shape} from EMA weights | std {out.std():.3f}")


if __name__ == "__main__":
    main()
