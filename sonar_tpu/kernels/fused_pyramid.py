"""Fused Whitaker-pyramid noise kernel (CLAUDE.md round-3 item 2).

The ``pyramid`` generator (reference py/noise_generation.py:609-649) is
``randn(H,W) + Σ_i upsample(randn(h_i,w_i)) · discount^i`` with a
build-time random size ladder whose first entry is always full size.
Under XLA each upsampled level materializes a full (H,W) array in HBM,
the accumulation re-reads it, and each level costs separate op dispatches
inside the scan body. This kernel removes all intermediate arrays and
collapses the ladder into one program per draw (measured speedups:
profiles/ANALYSIS.md section 4 — pyramid 2.2-18x, and 12-327x for the
downscale ladders below):

- the two full-size gaussians (the base draw and ladder level 0, whose
  resize is the identity) are generated *in VMEM* by the TPU hardware
  PRNG as one Box-Muller pair (cos+sin — two independent N(0,1) fields
  per pair of bit draws), reusing the validated substrate of
  ``kernels/hwrng.py``;
- every small level is upsampled as two MXU matmuls against the exact
  separable interpolation matrices of ``ops/resample.py`` (bit-compatible
  weights with the XLA path) and accumulated in VMEM;
- the output tile is written to HBM exactly once.

HBM traffic ≈ 1 output write + the (tiny) small levels and weight
matrices → the kernel targets the write roofline.

Stream semantics: like ``SONAR_TPU_HW_RNG``, the hardware-PRNG base is a
*different* (deterministic per (seed, shape)) stream than threefry, so
the kernel is opt-in via ``SONAR_TPU_FUSED_PYRAMID=1``; CPU/TPU
bit-reproducibility of the default path is an architecture invariant.
The small-level draws reuse the default path's threefry keys, so the
deterministic matmul-accumulate part is bit-testable against the XLA
composition (tests/test_fused_pyramid.py runs it in interpret mode).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pallas TPU backend is optional on CPU
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from ..ops.resample import _resize_matrix
from .hwrng import seed_from_key

_SUBLANE = 8
_LANE = 128
_MAX_TILE_ROWS = 256


def use_fused_pyramid() -> bool:
    """Opt-in fused pyramid kernels (TPU only): SONAR_TPU_FUSED_PYRAMID=1.

    Single-chip path: under a sharded jit GSPMD treats the pallas_call as
    an opaque custom call (no automatic partitioning) — for dp-sharded
    multi-chip sampling keep the default XLA path, which partitions
    cleanly."""
    return (os.environ.get("SONAR_TPU_FUSED_PYRAMID", "0") != "0"
            and jax.default_backend() == "tpu")


def _up(n: int, m: int) -> int:
    return -(-n // m) * m


def fused_pyramid_supported(sizes, h: int, w: int, mode: str) -> bool:
    """The kernel covers the standard ladder: full-size level 0 (identity
    resize) + strictly-smaller levels, separable resize mode, tileable H."""
    return (
        pltpu is not None
        and len(sizes) >= 1
        and tuple(sizes[0]) == (h, w)
        and all(sh <= h and sw <= w for sh, sw in sizes)
        and mode in ("bilinear", "bicubic", "nearest", "nearest-exact", "area")
        and h % _SUBLANE == 0
        and w >= _SUBLANE
    )


def _box_muller_pair(shape):
    """Two independent N(0,1) fields from the hardware PRNG (one
    Box-Muller radius, cos+sin phases) — built on kernels/hwrng.py's
    shared 24-bit uniform construction."""
    from .hwrng import box_muller_uniforms

    u1, u2 = box_muller_uniforms(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = (2.0 * math.pi) * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def _make_kernel(discounts, gen_base: bool, level0_discount: float):
    n_levels = len(discounts)
    # DEFAULT (bf16-input MXU) precision: the fused path is an opt-in
    # distinct-stream mode, and at large latents the dense interpolation
    # matmuls are the bottleneck — HIGHEST (fp32 multi-pass) costs ~6x MXU
    # time for noise that tolerates 1e-3 relative interpolation error.
    # (The default XLA path keeps HIGHEST: ops/resample.py numerics define
    # reproducible streams.) Interpret-mode tests still see exact fp32.
    prec = jax.lax.Precision.DEFAULT

    def kernel(*refs):
        if gen_base:
            seed_ref = refs[0]
            level_refs = refs[1:1 + 3 * n_levels]
            out_ref = refs[1 + 3 * n_levels]
            # Mosaic caps prng_seed at 2 values: fold (bc, tile) into one id
            block = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
            pltpu.prng_seed(seed_ref[0], block)
            g1, g2 = _box_muller_pair(out_ref.shape[1:])
            acc = g1 + g2 * level0_discount
        else:
            base_ref = refs[0]
            level_refs = refs[1:1 + 3 * n_levels]
            out_ref = refs[1 + 3 * n_levels]
            acc = base_ref[0]
        for i in range(n_levels):
            wh_ref, small_ref, wwt_ref = level_refs[3 * i:3 * i + 3]
            up = jnp.dot(wh_ref[...], small_ref[0],
                         preferred_element_type=jnp.float32, precision=prec)
            up = jnp.dot(up, wwt_ref[...],
                         preferred_element_type=jnp.float32, precision=prec)
            acc = acc + up * discounts[i]
        out_ref[0] = acc.astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("bc", "h", "w", "small_shapes", "discounts", "mode",
                     "gen_base", "level0_discount", "out_dtype", "interpret"),
)
def _fused_pyramid_call(seed_or_base, smalls, *, bc, h, w, small_shapes,
                        discounts, mode, gen_base, level0_discount,
                        out_dtype=jnp.float32, interpret=False):
    """smalls: tuple of (BC, sh, sw) arrays (unpadded); seed_or_base is an
    int32 (1,) seed when gen_base else the combined full-size base (BC,H,W)."""
    tile = min(_up(h, _SUBLANE), _MAX_TILE_ROWS)
    while tile > _SUBLANE and h % tile:
        tile -= _SUBLANE
    if h % tile:
        raise ValueError(
            f"kernel requires height % {_SUBLANE} == 0, got {h}")
    grid = (bc, h // tile)

    in_specs = []
    args = []
    if gen_base:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(seed_or_base)
    else:
        in_specs.append(
            pl.BlockSpec((1, tile, w), lambda i, t: (i, t, 0)))
        args.append(seed_or_base)

    for small, (sh, sw) in zip(smalls, small_shapes):
        shp, swp = _up(sh, _SUBLANE), _up(sw, _LANE)
        wh = _resize_matrix(sh, h, mode)  # (h, sh)
        wh_p = np.zeros((h, shp), np.float32)
        wh_p[:, :sh] = wh
        ww = _resize_matrix(sw, w, mode)  # (w, sw)
        wwt_p = np.zeros((swp, w), np.float32)
        wwt_p[:sw, :] = ww.T
        small_p = jnp.pad(small, ((0, 0), (0, shp - sh), (0, swp - sw)))
        in_specs += [
            pl.BlockSpec((tile, shp), lambda i, t: (t, 0)),
            pl.BlockSpec((1, shp, swp), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((swp, w), lambda i, t: (0, 0)),
        ]
        args += [jnp.asarray(wh_p), small_p, jnp.asarray(wwt_p)]

    kernel = _make_kernel(discounts, gen_base, level0_discount)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bc, h, w), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, w), lambda i, t: (i, t, 0)),
        interpret=interpret,
    )(*args)
    return out


def fused_pyramid(key: jax.Array, shape, sizes, discount: float,
                  mode: str = "bilinear", dtype=jnp.float32) -> jax.Array:
    """Full fused pyramid draw on TPU (hardware-PRNG base).

    ``sizes`` is the build-time ladder (sizes[0] == (h, w)); small levels
    reuse the default path's threefry keys (fold_in(kdraw, i))."""
    b, c, h, w = shape
    kbase, kdraw = jax.random.split(key)
    smalls = tuple(
        jax.random.normal(jax.random.fold_in(kdraw, i), (b * c, sh, sw),
                          jnp.float32)
        for i, (sh, sw) in enumerate(sizes) if i >= 1
    )
    small_shapes = tuple((sh, sw) for i, (sh, sw) in enumerate(sizes)
                         if i >= 1)
    discounts = tuple(float(discount) ** i for i in range(1, len(sizes)))
    seed = seed_from_key(kbase).reshape(1)
    out = _fused_pyramid_call(
        seed, smalls, bc=b * c, h=h, w=w, small_shapes=small_shapes,
        discounts=discounts, mode=mode, gen_base=True,
        level0_discount=1.0, out_dtype=jnp.dtype(dtype))
    return out.reshape(b, c, h, w)


def fused_pyramid_accumulate(base: jax.Array, smalls, discounts,
                             mode: str = "bilinear",
                             interpret: bool = False) -> jax.Array:
    """Deterministic matmul-accumulate part (base passed in) — the
    bit-testable surface used by tests/test_fused_pyramid.py."""
    bc, h, w = base.shape
    return _fused_pyramid_call(
        base, tuple(smalls), bc=bc, h=h, w=w,
        small_shapes=tuple(s.shape[-2:] for s in smalls),
        discounts=tuple(float(d) for d in discounts), mode=mode,
        gen_base=False, level0_discount=1.0, interpret=interpret)


# ---------------------------------------------------------------------------
# Fused DOWNSCALE pyramids (highres_pyramid / pyramid_old).
#
# These ladders generate levels LARGER than the output (up to 15x per axis,
# reference py/noise_generation.py:517-606 — the docs call pyramid_old
# "~60x the latent size") and then downsample. At scale >= 2 the bilinear
# downscale reads only 2 taps per output row/column and the tap sets of
# distinct output pixels are DISJOINT (consecutive output rows map >= 2 src
# rows apart), so each used source sample is consumed by exactly one output
# pixel. The big iid-gaussian level therefore never needs to exist: per
# output pixel, its 4 tapped samples are just 4 fresh iid N(0,1) fields.
# The kernel generates those fields in VMEM (hardware PRNG) and applies the
# interpolation weights computed from iota — HBM traffic is one base read +
# one output write, vs the XLA path's materialization of every oversized
# level. (For nearest-exact the tap is single and the level collapses to
# ONE fresh field — pyramid_old's entire 60x ladder is, distributionally,
# white noise with std sqrt(sum_i (0.5^i * discount^i)^2).)
# ---------------------------------------------------------------------------


def _down_weights(out_len: int, in_len: int, tile: int, tile_idx, axis: int):
    """Per-output-position 2-tap interpolation weights (w0, w1) along one
    axis, computed in-kernel from iota with the exact _resize_matrix
    coordinate formula ((o + 0.5) * I / O - 0.5)."""
    shape = (tile, 1) if axis == 0 else (1, out_len)
    # Mosaic iota must be integer-typed; cast to f32 after
    o = jax.lax.broadcasted_iota(jnp.int32, shape, axis).astype(jnp.float32)
    if axis == 0:
        o = o + tile_idx.astype(jnp.float32) * tile
    x = (o + 0.5) * (in_len / out_len) - 0.5
    f = x - jnp.floor(x)
    return 1.0 - f, f


def _make_down_kernel(levels, mode: str, gen: bool, has_base: bool,
                      tile: int, h: int, w: int):
    """levels: tuple of (sh, sw, coef). sh == h means an identity level
    (single fresh field). gen=True draws fields from the hardware PRNG;
    gen=False reads them from per-level (1, 4, tile, w) inputs (plane
    order g00, g01, g10, g11)."""
    n = len(levels)

    def kernel(*refs):
        idx = 0
        if gen:
            seed_ref = refs[idx]
            idx += 1
        if has_base:
            base_ref = refs[idx]
            idx += 1
        g_refs = refs[idx:idx + (0 if gen else n)]
        out_ref = refs[-1]
        t = pl.program_id(1)
        if gen:
            block = pl.program_id(0) * pl.num_programs(1) + t
            pltpu.prng_seed(seed_ref[0], block)
        acc = base_ref[0] if has_base else jnp.zeros((tile, w), jnp.float32)

        def fields(li, count):
            if gen:
                out = []
                while len(out) < count:
                    g1, g2 = _box_muller_pair((tile, w))
                    out += [g1, g2]
                return out[:count]
            return [g_refs[li][0, p] for p in range(count)]

        for li, (sh, sw, coef) in enumerate(levels):
            if (sh == h and sw == w) or mode in ("nearest", "nearest-exact"):
                # identity level, or nearest taps: a single fresh field
                acc = acc + fields(li, 1)[0] * coef
                continue
            if mode == "area":
                acc = acc + fields(li, 1)[0] * (coef * _area_std(sh, sw, h, w))
                continue
            wr0, wr1 = _down_weights(h, sh, tile, t, 0)
            wc0, wc1 = _down_weights(w, sw, tile, t, 1)
            g00, g01, g10, g11 = fields(li, 4)
            lvl = wr0 * (wc0 * g00 + wc1 * g01) + wr1 * (wc0 * g10 + wc1 * g11)
            acc = acc + lvl * coef
        out_ref[0] = acc.astype(out_ref.dtype)

    return kernel


def fused_downscale_supported(sizes, h: int, w: int, mode: str) -> bool:
    """Every level must be the identity or a >=2x downscale per axis (the
    tap-injectivity condition) in a supported separable mode. ``area``
    additionally needs integer scales: its blocks then partition the
    source, so the level collapses to a fresh field scaled by
    1/sqrt(block size) — see _area_std."""
    if (pltpu is None or len(sizes) < 1 or h % _SUBLANE or w < _SUBLANE
            or mode not in ("bilinear", "nearest", "nearest-exact", "area")):
        return False
    for sh, sw in sizes:
        if sh == h and sw == w:
            continue
        if sh < 2 * h or sw < 2 * w:
            return False
        if mode == "area" and (sh % h or sw % w):
            return False
    return True


def _area_std(sh: int, sw: int, h: int, w: int) -> float:
    """Area-downscale of iid N(0,1) at integer scale: each output pixel
    averages an exclusive (sh/h)x(sw/w) block -> fresh iid field with std
    1/sqrt(block size) (blocks partition the source; outputs independent)."""
    return 1.0 / math.sqrt((sh // h) * (sw // w))


@functools.partial(
    jax.jit,
    static_argnames=("bc", "h", "w", "levels", "mode", "gen", "out_dtype",
                     "interpret"),
)
def _fused_down_call(seed, base, g_fields, *, bc, h, w, levels, mode, gen,
                     out_dtype=jnp.float32, interpret=False):
    tile = min(_up(h, _SUBLANE), _MAX_TILE_ROWS)
    while tile > _SUBLANE and h % tile:
        tile -= _SUBLANE
    if h % tile:
        raise ValueError(
            f"kernel requires height % {_SUBLANE} == 0, got {h}")
    grid = (bc, h // tile)
    has_base = base is not None

    in_specs, args = [], []
    if gen:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(seed)
    if has_base:
        in_specs.append(pl.BlockSpec((1, tile, w), lambda i, t: (i, t, 0)))
        args.append(base)
    if not gen:
        for gfield in g_fields:
            in_specs.append(
                pl.BlockSpec((1, 4, tile, w), lambda i, t: (i, 0, t, 0)))
            args.append(gfield)

    kernel = _make_down_kernel(levels, mode, gen, has_base, tile, h, w)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bc, h, w), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, w), lambda i, t: (i, t, 0)),
        interpret=interpret,
    )(*args)


def fused_downscale_pyramid(key: jax.Array, shape, sizes, coefs,
                            mode: str = "bilinear", base=None,
                            dtype=jnp.float32) -> jax.Array:
    """Fused highres_pyramid / pyramid_old draw on TPU: oversized levels
    are never materialized — their tapped samples are generated in VMEM.

    ``sizes``/``coefs`` describe the ladder ((sh, sw), coef per level);
    ``base`` is an optional (b, c, h, w) array added in (highres_pyramid's
    inner/uniform base, which may be any injected generator)."""
    b, c, h, w = shape
    levels = tuple((int(sh), int(sw), float(cf))
                   for (sh, sw), cf in zip(sizes, coefs))
    seed = seed_from_key(key).reshape(1)
    base_bc = None if base is None else base.reshape(b * c, h, w)
    out = _fused_down_call(
        seed, base_bc, (), bc=b * c, h=h, w=w, levels=levels, mode=mode,
        gen=True, out_dtype=jnp.dtype(dtype))
    return out.reshape(b, c, h, w)


def fused_downscale_accumulate(g_fields, shape_hw, sizes, coefs,
                               mode: str = "bilinear", base=None,
                               interpret: bool = False) -> jax.Array:
    """Deterministic weight-combination surface (fields passed in as
    (BC, 4, H, W) arrays) — bit-testable against the XLA composition by
    scattering the fields into the oversized levels."""
    h, w = shape_hw
    bc = g_fields[0].shape[0] if g_fields else base.shape[0]
    levels = tuple((int(sh), int(sw), float(cf))
                   for (sh, sw), cf in zip(sizes, coefs))
    return _fused_down_call(
        None, base, tuple(g_fields), bc=bc, h=h, w=w, levels=levels,
        mode=mode, gen=False, interpret=interpret)
