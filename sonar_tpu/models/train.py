"""Denoiser training step (diffusion denoising-score-matching loss).

The reference never trains anything (the denoiser is host-supplied), but a
standalone framework that ships its own flagship model needs the matching
training path. This is the canonical EDM/k-diffusion objective: sample a
sigma per example, noise the clean latent, and regress the denoiser output
back to the clean latent with 1/sigma^2-ish weighting.

The step is pure and jit/pjit-friendly: under a dp×tp mesh the batch is
sharded on dp and the params on tp; ``jax.grad`` + GSPMD give the gradient
all-reduce over dp and the activation collectives over tp for free.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from .unet import UNetConfig, unet_apply


def _remat_apply(remat: bool | str, apply_fn: Callable):
    """Resolve the ``remat`` knob to a (possibly checkpointed) apply fn."""
    if remat is False:
        return apply_fn
    if remat is True or remat == "full":
        # policy=None: save nothing between the boundaries — recompute the
        # whole forward during the backward pass
        return jax.checkpoint(apply_fn, static_argnums=(3,))
    if remat == "dots":
        return jax.checkpoint(
            apply_fn, static_argnums=(3,),
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    raise ValueError(
        f"unknown remat policy {remat!r}; valid: False, True, 'full', 'dots'")


def _base_apply(cfg, moe_aux: bool):
    """Per-family apply fn with the uniform ``(params, x, cond, cfg)``
    signature ``_remat_apply`` checkpoints (cfg static)."""
    from .dit import DiTConfig, dit_apply

    if isinstance(cfg, DiTConfig):
        if moe_aux:

            def apply_fn(params, x, cond, c):
                return dit_apply(params, x, cond, c, return_aux=True)

            return apply_fn
        return dit_apply
    return unet_apply


def make_train_step(
    cfg,
    optimizer: optax.GradientTransformation | None = None,
    *,
    sigma_min: float = 0.03,
    sigma_max: float = 14.6,
    remat: bool | str = False,
    compute_dtype: Any = None,
    objective: str = "eps",
    flow_shift: float = 1.0,
    timestep_multiplier: float = 1000.0,
    aux_weight: float = 0.01,
) -> Callable:
    """Returns ``train_step(params, opt_state, batch, key) ->
    (params, opt_state, loss)``; ``batch`` is clean latents (B,C,H,W).
    ``cfg`` selects the model family: a :class:`UNetConfig` trains the
    UNet, a :class:`~sonar_tpu.models.dit.DiTConfig` the DiT (MoE configs
    automatically add ``aux_weight`` x the Switch load-balance loss).

    ``objective`` picks the parametrization the trained weights expect at
    sampling time (models/prediction.py):

    - ``"eps"`` — noise prediction with EDM input scaling, log-uniform
      sigmas in [sigma_min, sigma_max]; pair with
      ``make_denoiser(..., prediction="eps")`` (the default).
    - ``"flow"`` — rectified-flow matching (SD3/Flux recipe): t uniform in
      (0, 1] warped by ``time_snr_shift(flow_shift, t)``, input
      ``(1-t)*x0 + t*eps`` unscaled, network conditioned on
      ``t * timestep_multiplier``, target velocity ``eps - x0``; pair with
      ``make_*_denoiser(..., prediction="flow",
      timestep_fn=Flow(...).timestep)``.

    ``remat`` rematerializes the model forward in the backward pass
    (jax.checkpoint) — the standard TPU lever for trading FLOPs against
    activation HBM. ``True``/``"full"`` saves nothing (max memory saving,
    ~30% more FLOPs); ``"dots"`` saves matmul/conv outputs and recomputes
    only the cheap elementwise/norm chains between them (most of the
    memory win at a fraction of the recompute); ``False`` disables.
    Gradients are bit-identical either way — remat changes scheduling,
    not math (tests/test_train.py).

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) enables mixed-precision
    training the standard TPU way: the optimizer keeps float32 master
    weights, the forward/backward runs with params + activations cast to
    ``compute_dtype`` (2x MXU rate, half the activation HBM), and the
    loss + gradients land back in float32 (grad-of-cast is cast-back)."""
    import dataclasses

    if objective not in ("eps", "flow"):
        raise ValueError(
            f"objective must be 'eps' or 'flow', got {objective!r}")
    optimizer = optimizer or optax.adam(1e-4)
    apply_cfg = (cfg if compute_dtype is None
                 else dataclasses.replace(cfg, dtype=compute_dtype))
    moe_aux = getattr(cfg, "num_experts", 0) > 0
    apply = _remat_apply(remat, _base_apply(cfg, moe_aux))

    def _cast(tree):
        if compute_dtype is None:
            return tree
        return jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)

    def loss_fn(params, batch, key):
        ksig, keps = jax.random.split(key)
        b = batch.shape[0]
        eps = jax.random.normal(keps, batch.shape, batch.dtype)
        u = jax.random.uniform(ksig, (b,), batch.dtype)
        if objective == "flow":
            # t in (0, 1] (t=0 is degenerate: zero noise, zero signal to
            # match); SD3-style resolution shift warps the density
            from ..cfg.model_sampling import time_snr_shift

            t = time_snr_shift(flow_shift, 1.0 - u * (1.0 - 1e-4))
            t4 = t.reshape(-1, 1, 1, 1)
            net_in = (1.0 - t4) * batch + t4 * eps
            cond = t * timestep_multiplier
            target = eps - batch
        else:
            # log-uniform sigmas, EDM input scaling
            sigma = jnp.exp(jnp.log(sigma_min)
                            + u * (jnp.log(sigma_max) - jnp.log(sigma_min)))
            s4 = sigma.reshape(-1, 1, 1, 1)
            net_in = (batch + s4 * eps) / jnp.sqrt(1.0 + s4**2)
            cond = sigma
            target = eps
        out = apply(_cast(params), net_in, cond, apply_cfg)
        aux = 0.0
        if moe_aux:
            out, aux = out
        # the loss reduces in float32 regardless of compute precision
        return (jnp.mean((out.astype(jnp.float32)
                          - target.astype(jnp.float32)) ** 2)
                + aux_weight * aux)

    def train_step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def init_train_state(params, optimizer: optax.GradientTransformation | None = None) -> Any:
    return (optimizer or optax.adam(1e-4)).init(params)


def ema_update(ema_params: Any, params: Any, decay: float = 0.999) -> Any:
    """One EMA step: ``ema ← decay·ema + (1−decay)·params`` per leaf.

    Standard practice for diffusion models: sample from the EMA weights,
    train the raw ones. Pure and jit-friendly — fold it into the jitted
    train loop; initialize with ``ema = params``."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params)
