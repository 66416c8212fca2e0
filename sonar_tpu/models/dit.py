"""Diffusion-Transformer (DiT) denoiser — the modern model family the
reference's samplers run against in ComfyUI (SD3/Flux-style latent
transformers; the reference itself is model-agnostic and patches whatever
the host provides, see /root/reference/py/sonar.py model wrapping).

TPU-first design choices:

- **Stacked homogeneous blocks + ``lax.scan``**: every transformer block's
  params carry a leading ``depth`` axis, so the whole stack compiles as ONE
  scanned program — compile time is O(1) in depth (the SDXL-scale lesson:
  the tunnel's remote compile is the bottleneck, not FLOPs).
- **f32 conditioning angles**: the sigma Fourier embedding computes its
  angles in float32 regardless of compute dtype (same measured bf16
  quantization failure as models/unet.py:_sigma_embedding).
- **f32 softmax**: attention logits/softmax in float32 under bf16 compute
  (bf16 logits lose ~2 decimal digits exactly where softmax is sharpest).
- **Pipeline parallelism**: the stacked-block layout reshapes to
  ``(stages, depth/stages, ...)`` and shards its leading axis over a
  ``pp`` mesh axis; :func:`dit_pp_apply` runs a GPipe microbatch schedule
  with ``shard_map`` + ``lax.ppermute`` (activations ride ICI stage to
  stage), composing with ``dp`` batch sharding. Equal to the
  single-device scan up to fusion-order ulps (tests/test_dit.py).
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

# Batch serving collapses to HBM-bound attention once the per-layer f32
# logits tensor (b·h·n²·4 bytes) far exceeds the ~16 MB/core VMEM: at
# DiT-S b=8/n=1024 that is 192 MB/layer and the measured step time is
# ~2.5× the linear-in-batch extrapolation (profiles/ANALYSIS.md §19).
# The pallas flash kernel (logits never leave VMEM) was A/B'd on chip as
# the fix and LOST at this geometry — dh=64 is half an MXU tile, so the
# kernel's blocked matmuls run at worse MXU utilization than the dense
# path's 1024×1024×64 GEMMs save in HBM traffic: f32 22.6 vs 12.8 ms,
# bf16 18.5 vs 20.6 ms, and every bf16 path loses to f32 dense
# (ANALYSIS §20, profiles/profile_dit_flash_r5.json). It therefore stays
# OPT-IN: SONAR_TPU_DIT_FLASH=1 forces the kernel (numerics are
# validated — f32 max|Δ| 1.3e-05, tools/check_dit_flash.py); the default
# and =0 use the dense path. Single-chip b8+ serving should prefer f32
# over bf16 and dp-parallelism over in-chip batching past b≈2.
def _use_flash_attention(b: int, heads: int, n: int) -> bool:
    return os.environ.get("SONAR_TPU_DIT_FLASH") == "1"


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    in_channels: int = 4
    patch_size: int = 2
    hidden: int = 256
    depth: int = 8
    num_heads: int = 8
    mlp_ratio: int = 4
    # num_experts > 0 swaps every block's MLP for a Switch-style top-1
    # mixture of experts (einsum dispatch/combine, static per-sample
    # capacity — shapes stay trace-static). Expert weights gain a leading
    # E axis that shards over the ``ep`` mesh axis.
    num_experts: int = 0
    capacity_factor: float = 1.25
    dtype: Any = jnp.float32

    @property
    def patch_dim(self) -> int:
        return self.patch_size * self.patch_size * self.in_channels

    def expert_capacity(self, n_tokens: int) -> int:
        return max(1, math.ceil(self.capacity_factor * n_tokens
                                / self.num_experts))


# ---------------------------------------------------------------------------
# Init. Block params are STACKED: every leaf has a leading ``depth`` axis.
# ---------------------------------------------------------------------------


def _dense_init(key, din, dout, dtype, scale=1.0):
    std = scale * math.sqrt(1.0 / din)
    return {
        "w": jax.random.normal(key, (din, dout), dtype) * std,
        "b": jnp.zeros((dout,), dtype),
    }


def _expert_dense_init(key, n_experts, din, dout, dtype, scale=1.0):
    std = scale * math.sqrt(1.0 / din)
    return {
        "w": jax.random.normal(key, (n_experts, din, dout), dtype) * std,
        "b": jnp.zeros((n_experts, dout), dtype),
    }


def _block_init(key, cfg: DiTConfig):
    d, dt = cfg.hidden, cfg.dtype
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    p = {
        # adaLN modulation: emb -> (shift/scale/gate) x (attn, mlp).
        # Small-random weights + zero bias: near-identity blocks at init
        # (DiT's adaLN-zero spirit) while keeping the compute path
        # non-degenerate for numerics tests.
        "ada": _dense_init(k1, d, 6 * d, dt, scale=1e-2),
        "qkv": _dense_init(k2, d, 3 * d, dt),
        "attn_out": _dense_init(k3, d, d, dt, scale=1e-2),
    }
    if cfg.num_experts:
        p["router"] = _dense_init(k6, d, cfg.num_experts, dt, scale=1e-2)
        p["mlp_in"] = _expert_dense_init(k4, cfg.num_experts, d,
                                         cfg.mlp_ratio * d, dt)
        p["mlp_out"] = _expert_dense_init(k5, cfg.num_experts,
                                          cfg.mlp_ratio * d, d, dt,
                                          scale=1e-2)
    else:
        p["mlp_in"] = _dense_init(k4, d, cfg.mlp_ratio * d, dt)
        p["mlp_out"] = _dense_init(k5, cfg.mlp_ratio * d, d, dt, scale=1e-2)
    return p


def init_dit_params(key: jax.Array, cfg: DiTConfig = DiTConfig()) -> dict:
    dt = cfg.dtype
    keys = jax.random.split(key, cfg.depth + 4)
    blocks = [_block_init(k, cfg) for k in keys[: cfg.depth]]
    stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *blocks)
    return {
        "patch_embed": _dense_init(keys[-4], cfg.patch_dim, cfg.hidden, dt),
        "sigma_mlp": {
            "fc1": _dense_init(keys[-3], cfg.hidden, cfg.hidden, dt),
            "fc2": _dense_init(keys[-2], cfg.hidden, cfg.hidden, dt),
        },
        "blocks": stacked,
        "final": {
            "ada": _dense_init(keys[-1], cfg.hidden, 2 * cfg.hidden, dt,
                               scale=1e-2),
            # DiT zero-inits the output head; we use a small scale so the
            # untrained model still produces usable signal for tests
            "out": _dense_init(jax.random.fold_in(keys[-1], 1),
                               cfg.hidden, cfg.patch_dim, dt, scale=1e-2),
        },
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _dense(p, x):
    return x @ p["w"] + p["b"]


# one implementation of the f32-angles lesson, shared with the UNet
from .unet import _sigma_embedding  # noqa: E402


def _pos_embed(hp: int, wp: int, d: int, dtype):
    """2D sin-cos positional embedding, built in f32 at trace time (static
    shapes — XLA constant-folds it)."""
    q = d // 4
    omega = jnp.exp(jnp.arange(q, dtype=jnp.float32)
                    * (-math.log(10000.0) / max(q - 1, 1)))
    ys = jnp.arange(hp, dtype=jnp.float32)[:, None] * omega[None, :]
    xs = jnp.arange(wp, dtype=jnp.float32)[:, None] * omega[None, :]
    ye = jnp.concatenate([jnp.sin(ys), jnp.cos(ys)], -1)  # (hp, d/2)
    xe = jnp.concatenate([jnp.sin(xs), jnp.cos(xs)], -1)  # (wp, d/2)
    grid = jnp.concatenate(
        [jnp.broadcast_to(ye[:, None, :], (hp, wp, 2 * q)),
         jnp.broadcast_to(xe[None, :, :], (hp, wp, 2 * q))], -1)
    emb = grid.reshape(hp * wp, 4 * q)
    if 4 * q < d:  # hidden not divisible by 4: zero-pad the tail
        emb = jnp.pad(emb, ((0, 0), (0, d - 4 * q)))
    return emb.astype(dtype)


def _layer_norm(x):
    # affine-free LN: adaLN supplies shift/scale. Stats in f32 under bf16.
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)


def _modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def _attention(p, x, num_heads, tp_axis=None):
    b, n, d = x.shape
    dh = d // num_heads
    # the packed qkv kernel is laid out HEAD-MAJOR — feature index
    # h·3dh + {q,k,v}·dh + i — so a tp shard of the output axis is a
    # contiguous group of whole heads (tp must divide num_heads) and
    # GSPMD keeps attention sharded instead of all-gathering activations
    # (verified by HLO collective counts, tests/test_dit.py).
    #
    # ``tp_axis`` switches to MANUAL megatron collectives for shard_map
    # bodies (dit_pp_apply with tp): the qkv/attn_out leaves arrive
    # tp-LOCAL, the local head count comes off the array shape, and the
    # row-parallel attn_out partial sum is psum'd with the bias added
    # once after the reduce.
    qkv = x @ p["qkv"]["w"] + p["qkv"]["b"]  # bias tp-split like the feats
    heads = qkv.shape[-1] // (3 * dh)
    qkv = qkv.reshape(b, n, heads, 3, dh)
    q, k, v = (qkv[:, :, :, i].transpose(0, 2, 1, 3) for i in range(3))
    if _use_flash_attention(b, heads, n):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention)

        out = flash_attention(q, k, v, sm_scale=1.0 / math.sqrt(dh))
    else:
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        att = jax.nn.softmax(
            logits.astype(jnp.float32) / math.sqrt(dh), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att.astype(x.dtype), v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, heads * dh)
    y = out @ p["attn_out"]["w"]
    if tp_axis is not None:
        y = jax.lax.psum(y, tp_axis)
    return y + p["attn_out"]["b"]


def _moe_mlp(p, x, cfg: DiTConfig):
    """Switch-style top-1 mixture of experts via einsum dispatch/combine
    (the Mesh-TensorFlow formulation: static shapes, no gathers — the
    dispatch one-hots become MXU matmuls, and a leading-E sharding over
    the ``ep`` mesh axis makes GSPMD insert the token all-to-alls).

    Routing is per batch row: each sample's tokens compete for a static
    per-sample expert capacity ``C = ceil(cf·N/E)``, so microbatching and
    dp sharding reproduce the unsharded routing exactly. Returns
    ``(y, aux)`` where aux is the Switch load-balance loss
    ``E · Σ_e f_e·P_e`` (≥ 1, = 1 when perfectly balanced)."""
    b, n, d = x.shape
    e = cfg.num_experts
    c = cfg.expert_capacity(n)
    logits = _dense(p["router"], x).astype(jnp.float32)   # (B,N,E)
    probs = jax.nn.softmax(logits, axis=-1)
    gate = jnp.max(probs, axis=-1)                        # (B,N)
    idx = jnp.argmax(probs, axis=-1)                      # (B,N)
    onehot = jax.nn.one_hot(idx, e, dtype=jnp.float32)    # (B,N,E)
    aux = e * jnp.sum(jnp.mean(onehot, axis=(0, 1))
                      * jnp.mean(probs, axis=(0, 1)))
    # position of each token within its expert's buffer; beyond-capacity
    # tokens are dropped (contribute only their residual path)
    pos = jnp.cumsum(onehot, axis=1) * onehot - 1.0       # (B,N,E)
    keep = (pos >= 0.0) & (pos < c)
    slot = jax.nn.one_hot(jnp.clip(pos, 0, c - 1).astype(jnp.int32), c,
                          dtype=jnp.float32)              # (B,N,E,C)
    dispatch = (slot * keep[..., None]).astype(x.dtype)
    combine = dispatch * gate[..., None, None].astype(x.dtype)
    xin = jnp.einsum("bnec,bnd->ebcd", dispatch, x)       # (E,B,C,D)
    hmid = jax.nn.gelu(jnp.einsum("ebcd,edf->ebcf", xin, p["mlp_in"]["w"])
                       + p["mlp_in"]["b"][:, None, None, :])
    yout = (jnp.einsum("ebcf,efd->ebcd", hmid, p["mlp_out"]["w"])
            + p["mlp_out"]["b"][:, None, None, :])
    return jnp.einsum("bnec,ebcd->bnd", combine, yout), aux


def _block(p, h, emb, cfg: DiTConfig, tp_axis=None):
    """One adaLN DiT block. ``p`` leaves are UNSTACKED (no depth axis).
    Returns ``(h, aux)`` — aux is 0 for dense-MLP blocks.

    ``tp_axis`` (shard_map bodies only): qkv/mlp_in weights+biases are
    tp-local column-parallel, attn_out/mlp_out row-parallel with a manual
    psum — one reduce per sublayer, the megatron schedule."""
    mod = _dense(p["ada"], jax.nn.silu(emb))  # (B, 6D)
    sh_a, sc_a, g_a, sh_m, sc_m, g_m = jnp.split(mod, 6, axis=-1)
    h = h + g_a[:, None, :] * _attention(
        p, _modulate(_layer_norm(h), sh_a, sc_a), cfg.num_heads, tp_axis)
    y = _modulate(_layer_norm(h), sh_m, sc_m)
    if "router" in p:
        y, aux = _moe_mlp(p, y, cfg)
    else:
        y = jax.nn.gelu(y @ p["mlp_in"]["w"] + p["mlp_in"]["b"])
        y = y @ p["mlp_out"]["w"]
        if tp_axis is not None:
            y = jax.lax.psum(y, tp_axis)
        y = y + p["mlp_out"]["b"]
        aux = jnp.zeros((), jnp.float32)
    return h + g_m[:, None, :] * y, aux


def _patchify(x, patch):
    b, c, hh, ww = x.shape
    hp, wp = hh // patch, ww // patch
    x = x.reshape(b, c, hp, patch, wp, patch)
    return x.transpose(0, 2, 4, 3, 5, 1).reshape(b, hp * wp,
                                                 patch * patch * c), hp, wp


def _unpatchify(tok, hp, wp, patch, c):
    b = tok.shape[0]
    x = tok.reshape(b, hp, wp, patch, patch, c)
    return x.transpose(0, 5, 1, 3, 2, 4).reshape(b, c, hp * patch, wp * patch)


def _embed(params, x, sigma, cfg: DiTConfig):
    """Patchify + embed + conditioning. Shared by plain and pp forward."""
    dt = cfg.dtype
    tok, hp, wp = _patchify(x.astype(dt), cfg.patch_size)
    h = _dense(params["patch_embed"], tok) + _pos_embed(hp, wp, cfg.hidden, dt)
    emb = _dense(params["sigma_mlp"]["fc2"], jax.nn.silu(_dense(
        params["sigma_mlp"]["fc1"],
        _sigma_embedding(sigma, cfg.hidden, dt))))
    return h, emb, hp, wp


def _head(params, h, emb, hp, wp, cfg: DiTConfig, out_dtype):
    mod = _dense(params["final"]["ada"], jax.nn.silu(emb))
    shift, scale = jnp.split(mod, 2, axis=-1)
    tok = _dense(params["final"]["out"], _modulate(_layer_norm(h), shift, scale))
    return _unpatchify(tok, hp, wp, cfg.patch_size,
                       cfg.in_channels).astype(out_dtype)


def _scan_blocks(stacked, h, emb, cfg, tp_axis=None):
    def body(carry, bp):
        out, aux = _block(bp, carry, emb, cfg, tp_axis)
        return out, aux

    h, auxs = jax.lax.scan(body, h, stacked)
    return h, jnp.mean(auxs)


def dit_apply(params: dict, x: jax.Array, sigma: jax.Array,
              cfg: DiTConfig = DiTConfig(), *,
              return_aux: bool = False):
    """Predict epsilon for latent ``x`` (B,C,H,W) at noise level ``sigma``
    (B,). Single-program scan over the stacked block params.
    ``return_aux=True`` additionally returns the mean per-block MoE
    load-balance loss (0 for dense configs)."""
    h, emb, hp, wp = _embed(params, x, sigma, cfg)
    h, aux = _scan_blocks(params["blocks"], h, emb, cfg)
    eps = _head(params, h, emb, hp, wp, cfg, x.dtype)
    return (eps, aux) if return_aux else eps


def make_dit_denoiser(params: dict, cfg: DiTConfig = DiTConfig(), *,
                      params_kwarg: str = "params",
                      pp_mesh=None, microbatches: int = 1,
                      pp: str = "pp", dp: str | None = "dp",
                      tp: str | None = None,
                      prediction="eps",
                      timestep_fn: Callable | None = None) -> Callable:
    """Denoiser protocol ``model(x, sigma_batch) -> denoised``
    (same contract as models/unet.py:make_denoiser, weights as a call-time
    jit argument via ``extra_args={"params": p}``).

    ``prediction`` selects the output parametrization (models/prediction.py):
    ``"eps"`` default, ``"v"``, ``"x0"``, or ``"const"``/``"flow"`` for a
    rectified-flow DiT (SD3/Flux-style — pair with ``timestep_fn=
    cfg.Flow().timestep`` so the sinusoidal embedding sees sigma*1000, and
    sample with ``ancestral_mode="rf"``).

    ``pp_mesh`` switches the forward to the GPipe pipeline
    (:func:`dit_pp_apply`) so a model too large for one chip serves
    sampling too: ``params`` must then be staged with
    :func:`pp_stage_params` and pp-sharded. Inference-only pipelining —
    the whole sampling loop stays one compiled program, with the pipeline
    schedule nested inside each denoiser call."""
    from .prediction import get_prediction

    pred = get_prediction(prediction)

    def model(x, sigma, **kw):
        p = kw.get(params_kwarg)
        if p is None:
            p = params
        # f32 conditioning (see models/unet.py:make_denoiser — a bf16 cast
        # of sigma quantizes BEFORE the log the f32-angle embedding takes)
        sb32 = jnp.broadcast_to(
            jnp.asarray(sigma, jnp.float32).reshape(-1), (x.shape[0],))
        s4 = sb32.astype(x.dtype).reshape(-1, 1, 1, 1)
        cond = sb32 if timestep_fn is None else timestep_fn(sb32)
        xin = pred.calculate_input(s4, x)
        if pp_mesh is not None:
            out = dit_pp_apply(p, xin, cond, cfg, pp_mesh,
                               microbatches=microbatches, pp=pp, dp=dp,
                               tp=tp)
        else:
            out = dit_apply(p, xin, cond, cfg)
        return pred.calculate_denoised(s4, out, x)

    return model


# ---------------------------------------------------------------------------
# Pipeline parallelism: GPipe microbatch schedule over a ``pp`` mesh axis.
# ---------------------------------------------------------------------------


def pp_stage_params(params: dict, n_stages: int) -> dict:
    """Reshape the stacked block axis ``(depth, ...)`` into
    ``(n_stages, depth/n_stages, ...)`` — shard the new leading axis over
    the ``pp`` mesh axis (contiguous blocks per stage)."""
    depth = jax.tree_util.tree_leaves(params["blocks"])[0].shape[0]
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    blocks = jax.tree_util.tree_map(
        lambda l: l.reshape((n_stages, depth // n_stages) + l.shape[1:]),
        params["blocks"])
    return dict(params, blocks=blocks)


def dit_param_shardings(params: dict, mesh, *, tp: str | None = "tp",
                        pp: str | None = None,
                        ep: str | None = "ep") -> dict:
    """NamedShardings: megatron-style tensor parallelism (qkv/mlp_in split
    output features on ``tp``; attn_out/mlp_out split input features — the
    pair needs ONE psum per block, inserted by XLA from the shardings);
    for :func:`pp_stage_params` trees the stage axis rides ``pp``; MoE
    expert weights shard their leading E axis on ``ep`` (GSPMD turns the
    dispatch/combine einsums into the token all-to-alls)."""
    from jax.sharding import NamedSharding

    tp = tp if tp in mesh.axis_names else None
    pp = pp if pp and pp in mesh.axis_names else None
    ep = ep if ep and ep in mesh.axis_names else None

    def spec(path, leaf):
        names = tuple(getattr(k, "key", getattr(k, "name", None))
                      for k in path)
        # stacked block leaves: (depth, ...) unstaged, (stages, depth/S, ...)
        # after pp_stage_params — the stage axis rides pp
        lead: tuple = () if "blocks" not in names else (
            (pp, None) if pp else (None,))
        body_nd = leaf.ndim - len(lead)
        mlp = any(n in ("mlp_in", "mlp_out") for n in names)
        expert = mlp and (("w" in names and body_nd == 3)
                          or ("b" in names and body_nd == 2))
        body: tuple
        if expert:
            if "b" in names:
                body = (ep, None)
            elif "mlp_in" in names:
                body = (ep, None, tp)
            else:
                body = (ep, tp, None)
        elif body_nd != 2 or "b" in names:  # bias (adaLN stays replicated)
            body = (None,) * body_nd
        elif any(n in ("qkv", "mlp_in") for n in names):
            body = (None, tp)
        elif any(n in ("attn_out", "mlp_out") for n in names):
            body = (tp, None)
        else:
            body = (None, None)
        return NamedSharding(mesh, P(*(lead + body)))

    return jax.tree_util.tree_map_with_path(spec, params)


def _pp_block_specs(blocks, pp: str, tp: str | None):
    """Per-leaf shard_map in_specs for a STAGED block tree: stage axis on
    ``pp``; with ``tp``, the megatron layout (qkv/mlp_in column-parallel
    incl. their biases, attn_out/mlp_out row-parallel, adaLN replicated —
    mirrors dit_param_shardings' body logic)."""

    def spec(path, leaf):
        names = tuple(getattr(k, "key", getattr(k, "name", None))
                      for k in path)
        body_nd = leaf.ndim - 2  # (stages, depth/S, ...body)
        if tp is None:
            return P(*((pp, None) + (None,) * body_nd))
        if any(n in ("qkv", "mlp_in") for n in names):
            body = (None,) * (body_nd - 1) + (tp,)  # w: (d, out·tp); b: (out·tp,)
        elif any(n in ("attn_out", "mlp_out") for n in names) and body_nd == 2:
            body = (tp, None)  # row-parallel kernel; bias stays replicated
        else:
            body = (None,) * body_nd
        return P(*((pp, None) + body))

    return jax.tree_util.tree_map_with_path(spec, blocks)


def dit_pp_apply(params: dict, x: jax.Array, sigma: jax.Array,
                 cfg: DiTConfig, mesh, *, microbatches: int,
                 pp: str = "pp", dp: str | None = "dp",
                 tp: str | None = None,
                 return_aux: bool = False):
    """Pipeline-parallel forward: ``params["blocks"]`` must be staged
    (:func:`pp_stage_params`) with its stage axis sharded over the ``pp``
    mesh axis. Runs the classic GPipe schedule — ``microbatches + stages -
    1`` ticks, activations handed stage-to-stage with ``lax.ppermute``
    (ICI neighbour exchange) — inside ``shard_map``, composing with ``dp``
    batch sharding. Matches :func:`dit_apply` on the unstaged tree up to
    fusion-order ulps.

    ``tp`` composes megatron tensor parallelism INSIDE each stage
    (VERDICT r3 item 8): block kernels shard per _pp_block_specs and the
    blocks run with manual collectives (one psum per sublayer,
    _block(tp_axis=...)); activations stay full-width so the ppermute
    handoff is unchanged. Dense MLP only — MoE blocks keep their ep
    layout and are refused with tp.

    Differentiable: the transpose of ``ppermute`` is the reverse permute,
    so ``jax.grad`` through this function IS 1F1B-style pipeline-parallel
    backprop, with each stage's weight grads landing pp-sharded in place
    (and tp-sharded within a stage when ``tp`` is set).
    """
    s = mesh.shape[pp]
    dp_ok = dp if dp and dp in mesh.axis_names else None
    tp_ok = tp if tp and tp in mesh.axis_names and mesh.shape[tp] > 1 else None
    lead = jax.tree_util.tree_leaves(params["blocks"])[0]
    if lead.ndim < 2 or lead.shape[0] != s:
        raise ValueError(
            f"params['blocks'] stage axis is {lead.shape[0] if lead.ndim else 0}, "
            f"mesh '{pp}' has {s} devices — run pp_stage_params(params, {s}) "
            "first (a mismatched staging would silently drop blocks)")
    if tp_ok and "router" in params["blocks"]:
        raise NotImplementedError(
            "dit_pp_apply tp composes with dense-MLP blocks only; MoE "
            "expert weights use the ep layout (plain dit_apply)")
    if tp_ok and cfg.num_heads % mesh.shape[tp_ok]:
        raise ValueError(
            f"num_heads {cfg.num_heads} not divisible by tp size "
            f"{mesh.shape[tp_ok]} (the qkv shard must hold whole heads)")
    # the pipeline composes with dp (+tp when given): block weights enter
    # shard_map pinned to the _pp_block_specs layout, so a tree sharded on
    # any OTHER axis would be silently all-gathered — refuse loudly
    allowed = {pp} | ({tp_ok} if tp_ok else set())
    for leaf in jax.tree_util.tree_leaves(params["blocks"]):
        spec = getattr(getattr(leaf, "sharding", None), "spec", None)
        extra = {ax for part in (spec or ()) if part is not None
                 for ax in ((part,) if isinstance(part, str) else part)} - allowed
        if extra:
            raise NotImplementedError(
                f"dit_pp_apply composes with dp"
                + ("×tp" if tp_ok else "") + " only; block weights are "
                f"also sharded on {sorted(extra)} — use plain dit_apply "
                "for ep layouts, or replicate those axes before staging")
    h, emb, hp, wp = _embed(params, x, sigma, cfg)
    b = h.shape[0]
    b_loc = b // mesh.shape[dp_ok] if dp_ok else b
    if b_loc % microbatches:
        raise ValueError(
            f"per-shard batch {b_loc} (global {b}"
            + (f" over {mesh.shape[dp_ok]} '{dp_ok}' shards" if dp_ok else "")
            + f") not divisible into {microbatches} microbatches")

    lat = P(dp_ok) if dp_ok else P()

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(_pp_block_specs(params["blocks"], pp, tp_ok),
                       lat, lat),
             out_specs=(lat, P()),
             check_vma=False)
    def run_pipe(stage_blocks, h_loc, emb_loc):
        # stage_blocks leaves: (1, depth/S, ...) local view → drop stage axis
        blocks = jax.tree_util.tree_map(lambda l: l[0], stage_blocks)
        stage = jax.lax.axis_index(pp)
        bl = h_loc.shape[0]
        mb_loc = bl // microbatches
        h_mb = h_loc.reshape(microbatches, mb_loc, *h_loc.shape[1:])
        e_mb = emb_loc.reshape(microbatches, mb_loc, emb_loc.shape[-1])

        fwd = [(i, i + 1) for i in range(s - 1)]

        def tick(carry, t):
            buf, out, aux_acc = carry
            # stage 0 ingests microbatch t (clamped; extras are drain ticks)
            src = jnp.clip(t, 0, microbatches - 1)
            inp = jnp.where(stage == 0,
                            jax.lax.dynamic_index_in_dim(h_mb, src, 0,
                                                         keepdims=False),
                            buf)
            # every microbatch sees the SAME stage params but its OWN
            # conditioning rows: the emb microbatch index lags the input
            # by this stage's pipeline depth
            esrc = jnp.clip(t - stage, 0, microbatches - 1)
            emb_t = jax.lax.dynamic_index_in_dim(e_mb, esrc, 0,
                                                 keepdims=False)
            res, aux = _scan_blocks(blocks, inp, emb_t, cfg, tp_ok)
            # aux only counts ticks where this stage held a REAL microbatch
            # (warmup/drain ticks process placeholder data)
            valid = ((t - stage) >= 0) & ((t - stage) < microbatches)
            aux_acc = aux_acc + jnp.where(valid, aux, 0.0)
            # last stage banks finished microbatch t-(s-1)
            dst = jnp.clip(t - (s - 1), 0, microbatches - 1)
            bank = (stage == s - 1) & (t >= s - 1)
            cur = jax.lax.dynamic_index_in_dim(out, dst, 0, keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(bank, res, cur), dst, 0)
            nxt = jax.lax.ppermute(res, pp, fwd)
            return (nxt, out, aux_acc), None

        buf0 = jnp.zeros_like(h_mb[0])
        out0 = jnp.zeros_like(h_mb)
        (_, out, aux_acc), _ = jax.lax.scan(
            tick, (buf0, out0, jnp.zeros((), jnp.float32)),
            jnp.arange(microbatches + s - 1))
        # replicate the last stage's results across pp; aux averages over
        # stages (each stage contributed its blocks' mean × microbatches)
        out = jax.lax.psum(
            jnp.where(stage == s - 1, out, jnp.zeros_like(out)), pp)
        aux = jax.lax.psum(aux_acc, pp) / (s * microbatches)
        if dp_ok:
            aux = jax.lax.pmean(aux, dp_ok)
        return out.reshape(bl, *h_loc.shape[1:]), aux

    h, aux = run_pipe(params["blocks"], h, emb)
    eps = _head(params, h, emb, hp, wp, cfg, x.dtype)
    return (eps, aux) if return_aux else eps
