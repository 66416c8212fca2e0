"""Analytic FLOPs counters validated against XLA's own cost analysis.

The analytic counters (models/flops.py) include matmul/conv MACs only;
XLA's ``compiled.cost_analysis()['flops']`` additionally counts the
elementwise/norm/softmax traffic. So analytic <= XLA must hold, and for
matmul-dominated configs the two must agree closely — a structural error
(missed block, wrong spatial schedule, factor-of-two) lands far outside
the band.
"""

import jax
import jax.numpy as jnp
import pytest

from sonar_tpu.models import (
    DiTConfig,
    UNetConfig,
    dit_apply,
    dit_forward_flops,
    init_dit_params,
    init_unet_params,
    mfu_pct,
    unet_apply,
    unet_forward_flops,
)


def _xla_flops(fn, *args) -> float:
    cost = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns a 1-list
        cost = cost[0]
    return float(cost["flops"])


@pytest.mark.parametrize("cfg,shape", [
    (UNetConfig(), (1, 4, 32, 32)),
    (UNetConfig(model_channels=96, channel_mult=(1, 2, 4), num_res_blocks=2,
                attention_levels=(1, 2), num_heads=8, norm_groups=32),
     (2, 4, 64, 64)),
])
def test_unet_flops_vs_xla(cfg, shape):
    params = init_unet_params(jax.random.key(0), cfg)
    x = jnp.zeros(shape, jnp.float32)
    sb = jnp.ones((shape[0],), jnp.float32)
    xla = _xla_flops(lambda p, x, s: unet_apply(p, x, s, cfg), params, x, sb)
    analytic = unet_forward_flops(cfg, shape)
    # analytic counts SAME-padding convs at full H*W MACs while XLA
    # excludes the padding-border taps, so analytic sits a few percent
    # ABOVE at small resolutions (measured 1.074 at 32x32, 1.027 at
    # 64x64, shrinking ~1/W toward the bench latents)
    assert 0.95 * xla <= analytic <= 1.10 * xla, (analytic, xla)


@pytest.mark.parametrize("cfg,shape", [
    (DiTConfig(hidden=128, depth=4, num_heads=4), (1, 4, 32, 32)),
    (DiTConfig(hidden=192, depth=6, num_heads=6, num_experts=4),
     (2, 4, 32, 32)),
])
def test_dit_flops_vs_xla(cfg, shape):
    """XLA's cost model counts a lax.scan body ONCE (not x trip-count),
    so the stacked-block DiT must be validated piecewise: embed + head
    compiled whole, one block compiled alone and scaled by depth."""
    from sonar_tpu.models.dit import _block, _embed, _head

    params = init_dit_params(jax.random.key(0), cfg)
    x = jnp.zeros(shape, jnp.float32)
    sb = jnp.ones((shape[0],), jnp.float32)

    def shell(p, x, s):
        h, emb, hp, wp = _embed(p, x, s, cfg)
        return _head(p, h, emb, hp, wp, cfg, x.dtype)

    block0 = jax.tree_util.tree_map(lambda a: a[0], params["blocks"])
    n = (shape[2] // cfg.patch_size) * (shape[3] // cfg.patch_size)
    h = jnp.zeros((shape[0], n, cfg.hidden), jnp.float32)
    emb = jnp.zeros((shape[0], cfg.hidden), jnp.float32)
    xla = _xla_flops(shell, params, x, sb)
    xla += cfg.depth * _xla_flops(
        lambda p, h, e: _block(p, h, e, cfg)[0], block0, h, emb)
    analytic = dit_forward_flops(cfg, shape)
    assert 0.80 * xla <= analytic <= 1.05 * xla, (analytic, xla)


def test_flops_scale_with_batch_and_resolution():
    cfg = UNetConfig()
    base = unet_forward_flops(cfg, (1, 4, 32, 32))
    assert unet_forward_flops(cfg, (4, 4, 32, 32)) == 4 * base
    # doubling resolution: convs scale 4x, attention up to 16x
    big = unet_forward_flops(cfg, (1, 4, 64, 64))
    assert 4 * base < big < 16 * base


def test_mfu_pct():
    assert mfu_pct(197e12 / 2, 500.0) == pytest.approx(100.0)
    assert mfu_pct(1.0, None) is None


def test_bench_sdxl_flops_magnitude():
    """The bench SDXL-class UNet at 4x128x128 should cost O(1) TFLOPs per
    forward — pins the constant the driver-artifact MFU is derived from."""
    from bench import _sdxl_cfg, _SDXL_SHAPE

    f = unet_forward_flops(_sdxl_cfg(), _SDXL_SHAPE)
    assert 0.5e12 < f < 20e12, f
