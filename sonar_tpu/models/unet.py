"""Flagship denoiser: a latent-diffusion UNet in pure functional JAX.

The reference treats the denoiser as an opaque callable
``model(x, sigma * s_in, **extra_args) -> denoised`` (py/sonar.py:436-449) and
relies on ComfyUI to supply it. A standalone framework needs its own: this
module provides an SD-style epsilon-prediction UNet (resblocks + self
attention + skip connections) with

- **pure pytree params** (`init_unet_params`) — jit/pjit/scan friendly;
- **k-diffusion preconditioning** baked into :func:`make_denoiser`, so the
  returned callable satisfies the sampler protocol exactly;
- **block-patch hooks** matching the surface FreeU-Extreme needs
  (py/nodes/freeu_extreme.py:294-326): ``input`` / ``middle`` patches get
  ``(h, ctx)``; ``output`` patches get ``(h, hsp, ctx)`` before the skip
  concat, where ``ctx`` carries sigma and transformer-options-like info;
- **TP/DP sharding hints**: attention heads and MLP/conv channel dims are
  annotated via logical axis names so :mod:`sonar_tpu.parallel` can lay the
  params over a ``Mesh`` and let GSPMD insert the collectives.

Latent layout is (B, C, H, W) to match the sampler/noise protocol; convs run
in NHWC internally (TPU-preferred layout).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 64
    channel_mult: tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 1
    attention_levels: tuple[int, ...] = (1, 2)
    num_heads: int = 4
    norm_groups: int = 8
    dtype: Any = jnp.float32

    @property
    def emb_channels(self) -> int:
        return self.model_channels * 4

    def level_channels(self, level: int) -> int:
        return self.model_channels * self.channel_mult[level]


# ---------------------------------------------------------------------------
# Param init. Every leaf is a plain jnp array; tree structure mirrors the
# forward pass. "logical axes" used by parallel.unet_param_spec:
#   conv kernels  (kh, kw, cin, cout)        → cout is the 'tp' axis
#   dense kernels (din, dout)                → dout (or din for out-proj) 'tp'
# ---------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin, cout, dtype, scale=1.0):
    fan_in = kh * kw * cin
    std = scale * math.sqrt(1.0 / fan_in)
    return {
        "w": jax.random.normal(key, (kh, kw, cin, cout), dtype) * std,
        "b": jnp.zeros((cout,), dtype),
    }


def _dense_init(key, din, dout, dtype, scale=1.0):
    std = scale * math.sqrt(1.0 / din)
    return {
        "w": jax.random.normal(key, (din, dout), dtype) * std,
        "b": jnp.zeros((dout,), dtype),
    }


def _norm_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _resblock_init(key, cin, cout, cemb, dtype):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "norm1": _norm_init(cin, dtype),
        "conv1": _conv_init(k1, 3, 3, cin, cout, dtype),
        "emb": _dense_init(k2, cemb, cout, dtype),
        "norm2": _norm_init(cout, dtype),
        "conv2": _conv_init(k3, 3, 3, cout, cout, dtype, scale=1e-2),
    }
    if cin != cout:
        p["skip"] = _conv_init(k4, 1, 1, cin, cout, dtype)
    return p


def _attn_init(key, c, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "norm": _norm_init(c, dtype),
        "qkv": _dense_init(k1, c, 3 * c, dtype),
        "proj": _dense_init(k2, c, c, dtype, scale=1e-2),
    }


def init_unet_params(key: jax.Array, cfg: UNetConfig = UNetConfig()) -> dict:
    keys = iter(jax.random.split(key, 256))
    dt = cfg.dtype
    ch = cfg.model_channels
    params: dict = {
        "time_mlp": {
            "fc1": _dense_init(next(keys), ch, cfg.emb_channels, dt),
            "fc2": _dense_init(next(keys), cfg.emb_channels, cfg.emb_channels, dt),
        },
        "conv_in": _conv_init(next(keys), 3, 3, cfg.in_channels, ch, dt),
        "down": [],
        "up": [],
    }
    skip_chs = [ch]
    cur = ch
    for level, _mult in enumerate(cfg.channel_mult):
        cout = cfg.level_channels(level)
        blocks = []
        for _ in range(cfg.num_res_blocks):
            blk = {"res": _resblock_init(next(keys), cur, cout, cfg.emb_channels, dt)}
            if level in cfg.attention_levels:
                blk["attn"] = _attn_init(next(keys), cout, dt)
            blocks.append(blk)
            cur = cout
            skip_chs.append(cur)
        entry = {"blocks": blocks}
        if level != len(cfg.channel_mult) - 1:
            entry["downsample"] = _conv_init(next(keys), 3, 3, cur, cur, dt)
            skip_chs.append(cur)
        params["down"].append(entry)
    params["mid"] = {
        "res1": _resblock_init(next(keys), cur, cur, cfg.emb_channels, dt),
        "attn": _attn_init(next(keys), cur, dt),
        "res2": _resblock_init(next(keys), cur, cur, cfg.emb_channels, dt),
    }
    for level in reversed(range(len(cfg.channel_mult))):
        cout = cfg.level_channels(level)
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            cskip = skip_chs.pop()
            blk = {"res": _resblock_init(next(keys), cur + cskip, cout, cfg.emb_channels, dt)}
            if level in cfg.attention_levels:
                blk["attn"] = _attn_init(next(keys), cout, dt)
            blocks.append(blk)
            cur = cout
        entry = {"blocks": blocks}
        if level != 0:
            entry["upsample"] = _conv_init(next(keys), 3, 3, cur, cur, dt)
        params["up"].append(entry)
    params["norm_out"] = _norm_init(cur, dt)
    params["conv_out"] = _conv_init(next(keys), 3, 3, cur, cfg.out_channels, dt, scale=1e-2)
    return params


# ---------------------------------------------------------------------------
# Forward pass (NHWC internally)
# ---------------------------------------------------------------------------


def _conv(p, x, stride=1):
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(x.dtype)


def _dense(p, x):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def _group_norm(p, x, groups):
    b, h, w, c = x.shape
    g = min(groups, c)
    while c % g:
        g -= 1
    # stats in f32 for bf16 activations (MXU runs the convs in bf16; norms
    # need the extra mantissa)
    xg = x.reshape(b, h, w, g, c // g).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + 1e-5)
    x = xg.reshape(b, h, w, c).astype(x.dtype)
    return x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _resblock(p, x, emb, groups):
    h = _conv(p["conv1"], _silu(_group_norm(p["norm1"], x, groups)))
    h = h + _dense(p["emb"], _silu(emb))[:, None, None, :]
    h = _conv(p["conv2"], _silu(_group_norm(p["norm2"], h, groups)))
    skip = _conv(p["skip"], x) if "skip" in p else x
    return h + skip


def _attention(p, x, num_heads, groups):
    b, h, w, c = x.shape
    y = _group_norm(p["norm"], x, groups).reshape(b, h * w, c)
    qkv = _dense(p["qkv"], y).reshape(b, h * w, 3, num_heads, c // num_heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    # (B, N, H, D) → scaled dot-product over N; heads dim is the TP axis.
    scale = 1.0 / math.sqrt(c // num_heads)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) * scale
    attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, h * w, c)
    return x + _dense(p["proj"], out).reshape(b, h, w, c)


def _sigma_embedding(sigma, ch, dtype):
    """Fourier features of log-sigma (continuous noise conditioning).

    The angles are computed in float32 REGARDLESS of the compute dtype:
    they reach ~2.7e3 rad at the high-frequency end, where bf16's ~8-16 rad
    quantization step would turn the top bands into noise uncorrelated with
    sigma (measured: 37/160 bands >0.5 rad error at model_channels=320).
    Standard mixed-precision recipe: timestep/noise embedding in f32, cast
    the bounded sin/cos output down."""
    half = ch // 2
    logs = jnp.log(jnp.maximum(sigma, 1e-10)) / 4.0
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32)
        * (-math.log(10000.0) / max(half - 1, 1)))
    ang = logs[:, None].astype(jnp.float32) * freqs[None, :] * 1000.0
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1).astype(dtype)


def _maybe_patch(patches, name, *args, ctx):
    if not patches:
        return args if len(args) > 1 else args[0]
    out = args
    for fn in patches.get(name, ()):
        res = fn(*out, ctx)
        out = res if isinstance(res, tuple) else (res,)
    return out if len(out) > 1 else out[0]


def unet_apply(
    params: dict,
    x: jax.Array,
    sigma: jax.Array,
    cfg: UNetConfig = UNetConfig(),
    *,
    block_patches: dict[str, list[Callable]] | None = None,
    patch_sigma: jax.Array | None = None,
) -> jax.Array:
    """Predict epsilon for latent ``x`` (B,C,H,W) at noise level ``sigma`` (B,).

    ``block_patches`` maps {"input","middle","output"} → list of patch fns,
    the hook surface FreeU-Extreme installs into
    (py/nodes/freeu_extreme.py:317-326).

    ``patch_sigma`` is what the patches see as ``ctx["sigma"]`` when the
    network conditioning is NOT the raw sigma (flow models condition on
    ``sigma * 1000`` via ``timestep_fn``, but FreeU/WCFG sigma windows are
    defined over the true noise level — feeding them the scaled timestep
    makes every window silently miss).
    """
    dt = cfg.dtype  # compute dtype (bf16 halves HBM traffic, doubles MXU)
    g = cfg.norm_groups
    ctx = {"sigma": sigma if patch_sigma is None else patch_sigma,
           "cfg": cfg}
    emb = _dense(
        params["time_mlp"]["fc2"],
        _silu(_dense(params["time_mlp"]["fc1"], _sigma_embedding(sigma, cfg.model_channels, dt))),
    )
    h = jnp.transpose(x, (0, 2, 3, 1)).astype(dt)  # NCHW → NHWC
    # ComfyUI applies input_block_patch after EVERY input_blocks entry —
    # including input_blocks[0] (conv_in) and each Downsample — and pushes
    # the PATCHED tensor onto the skip stack
    h = _conv(params["conv_in"], h)
    h = _maybe_patch(block_patches, "input", h, ctx=ctx)
    skips = [h]
    for level, entry in enumerate(params["down"]):
        for blk in entry["blocks"]:
            h = _resblock(blk["res"], h, emb, g)
            if "attn" in blk:
                h = _attention(blk["attn"], h, cfg.num_heads, g)
            h = _maybe_patch(block_patches, "input", h, ctx=ctx)
            skips.append(h)
        if "downsample" in entry:
            h = _conv(entry["downsample"], h, stride=2)
            h = _maybe_patch(block_patches, "input", h, ctx=ctx)
            skips.append(h)
    h = _resblock(params["mid"]["res1"], h, emb, g)
    h = _attention(params["mid"]["attn"], h, cfg.num_heads, g)
    h = _resblock(params["mid"]["res2"], h, emb, g)
    h = _maybe_patch(block_patches, "middle", h, ctx=ctx)
    for level, entry in enumerate(params["up"]):
        for blk in entry["blocks"]:
            hsp = skips.pop()
            h, hsp = _maybe_patch(block_patches, "output", h, hsp, ctx=ctx)
            h = jnp.concatenate([h, hsp], axis=-1)
            h = _resblock(blk["res"], h, emb, g)
            if "attn" in blk:
                h = _attention(blk["attn"], h, cfg.num_heads, g)
        if "upsample" in entry:
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
            h = _conv(entry["upsample"], h)
    h = _conv(params["conv_out"], _silu(_group_norm(params["norm_out"], h, g)))
    return jnp.transpose(h, (0, 3, 1, 2)).astype(x.dtype)  # NHWC → NCHW


def make_denoiser(
    params: dict,
    cfg: UNetConfig = UNetConfig(),
    *,
    block_patches: dict[str, list[Callable]] | None = None,
    params_kwarg: str = "params",
    prediction="eps",
    timestep_fn: Callable | None = None,
) -> Callable:
    """Wrap the UNet into the sampler's denoiser protocol
    ``model(x, sigma_batch) -> denoised``.

    ``prediction`` names what the raw network output means (see
    :mod:`sonar_tpu.models.prediction`): ``"eps"`` (default — EDM-style
    c_in = 1/sqrt(1+sigma^2), denoised = x - sigma * out), ``"v"``,
    ``"x0"``, or ``"const"``/``"flow"`` for rectified-flow models.

    ``timestep_fn`` maps the (B,)-shaped sigma batch to the value the
    network is conditioned on (default: sigma itself). Flow-family models
    are conventionally conditioned on ``sigma * 1000``
    (``cfg.Flow().timestep``) — training and inference must agree.

    ``params_kwarg`` names the call-time weight-override argument
    (``extra_args={"params": p}`` by default). CAUTION: extra_args reaches
    EVERY denoiser in a CFG pair, so two denoisers built from DIFFERENT
    weight trees must use distinct names (e.g. ``params_kwarg="uncond_params"``
    for the uncond side) — a shared "params" override would silently feed
    both sides the same weights and collapse CFG to a no-op."""
    from .prediction import get_prediction

    pred = get_prediction(prediction)

    def model(x, sigma, **kw):
        # accept params as a call-time argument (extra_args={"params": p})
        # so jit treats the tree as an input instead of baking multi-GB
        # constants — the SDXL remote-compile landmine (CLAUDE.md)
        p = kw.get(params_kwarg)
        if p is None:
            p = params
        # conditioning stays float32: casting sigma to bf16 loses ~0.4%
        # RELATIVE precision BEFORE the log inside _sigma_embedding — an
        # error the f32-angle computation cannot recover (~1 rad in the
        # top Fourier band). Latent arithmetic uses x.dtype as before.
        sb32 = jnp.broadcast_to(
            jnp.asarray(sigma, jnp.float32).reshape(-1), (x.shape[0],))
        s4 = sb32.astype(x.dtype).reshape(-1, 1, 1, 1)
        cond = sb32 if timestep_fn is None else timestep_fn(sb32)
        # patches always see the TRUE sigma, never the scaled timestep
        out = unet_apply(p, pred.calculate_input(s4, x), cond, cfg,
                         block_patches=block_patches, patch_sigma=sb32)
        return pred.calculate_denoised(s4, out, x)

    return model
