"""Fused Voronoi k-smallest-distance kernel (SURVEY §2.9 item 7).

The Voronoi generator's hot loop (reference VoronoiNoiseGenerator,
py/noise_generation.py:1847-1904) computes, per output pixel, toroidal 3D
distances to N feature points and consumes a small ordered prefix of them
(f1/f2/diff/... result modes). Under XLA the (B, C, H, W, N) distance
tensor — ~67MB at 128²/256 points — is materialized in HBM before the
top-k, so the path is bound by that round trip, not by the ~20 VPU ops
per (pixel, point) pair.

This kernel never materializes the distance tensor: the N feature points
live in SMEM (a few KB), each grid step streams one (tile, W) pixel block
held in VMEM, and a ``fori_loop`` over points maintains the k smallest
distances per pixel as an in-register sorted insertion chain
(min/max compare-swap — exact, ties included). HBM traffic is one
(BC, k, H, W) output write; arithmetic is ~N·(dist + 2k) VPU ops per
pixel vector.

The kernel is deterministic — it computes the same mathematical values as
the XLA path from the same traced feature points (no RNG inside), so
unlike the hw-PRNG kernels it does not change the noise stream. Bit-level
agreement with the XLA composition is validated in interpret mode
(tests/test_voronoi_kernel.py); enable on TPU with
``SONAR_TPU_VORONOI_KERNEL=1`` (default on — see use_voronoi_kernel).

Supported surface: single simple distance mode (euclidean / the
``manhatten``-is-euclidean quirk / quadratic / chebyshev / minkowski,
optionally wrapped in ``weight``), any ``+``-composition of result modes
that only consume the sorted prefix with k <= 8 (f/f1..f4, inv_f*,
diff/diff2, ridge/fuzz/gradient_magnitude over those). Everything else
falls back to the XLA path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is optional on CPU
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

_SUBLANE = 8
_MAX_TILE_ROWS = 256

_DISTS = ("euclidean", "quadratic", "chebyshev", "minkowski")


def use_voronoi_kernel() -> bool:
    """Default-on on TPU (SONAR_TPU_VORONOI_KERNEL=0 opts out): the kernel
    is a deterministic re-expression of the same math, not a new stream."""
    return (os.environ.get("SONAR_TPU_VORONOI_KERNEL", "1") != "0"
            and jax.default_backend() == "tpu")


# bytes for the three whole-array point tables; Mosaic accepted 384KB on
# the real chip (bc=32, n=1024 probe, 2026-08-17) — 256KB keeps margin
_SMEM_BUDGET = 256 * 1024


def voronoi_kernel_supported(h: int, w: int, k: int, dist: str,
                             bc: int, n: int) -> bool:
    # the feature-point tables are whole-array SMEM (Mosaic only allows
    # blocked SMEM in 8x128 tiles, so per-bc blocks are out) — gate on a
    # conservative SMEM footprint. k <= n: with fewer points than the
    # sorted prefix the kernel's inf-initialized slots would leak +inf
    # into the output where the XLA path's clamped indexing stays finite.
    return (pltpu is not None and dist in _DISTS and 0 < k <= 8 and k <= n
            and h % _SUBLANE == 0 and w >= _SUBLANE
            and 3 * bc * n * 4 <= _SMEM_BUDGET)


def _make_kernel(n_points: int, h: int, w: int, tile: int, k: int,
                 dist: str, p: float, wy: float, wx: float):
    # the toroidal grid coordinates arrive precomputed ((grid*scale) % 1,
    # exact XLA op sequence — computing them in-kernel from iota lets the
    # compiler fold /L*scale into *(scale/L) and shifts rounding by an ulp
    # vs the XLA path)
    inf = float("inf")

    def kernel(gy_ref, gx_ref, fy_ref, fx_ref, dz_ref, out_ref):
        gy = gy_ref[...]  # (tile, 1)
        gx = gx_ref[...]  # (1, w)
        i = pl.program_id(0)  # the point tables are whole-array SMEM

        def body(n, mins):
            # rank-1 broadcasts: dy is (tile, 1), dx is (1, w) — the
            # expensive per-(pixel, point) work only happens at the
            # combine, and values match the XLA broadcast exactly. The
            # z term has no pixel dependence, so its squared/abs/power
            # form arrives precomputed per point (dz_ref).
            #
            # NOTE (measured, ANALYSIS §6 addendum): ranking by the
            # squared/p-power PRE-distance and applying sqrt / ^(1/p) to
            # just the k winners outside the kernel is 12-15% faster —
            # but it surfaces cross-compiler (Mosaic FMA vs XLA) ulp
            # differences in the sums as rank-boundary flips (~5 per
            # million pixels, 1 ulp). The in-kernel sqrt COMPRESSES
            # those ulp sum differences to equal floats, which is what
            # makes the kernel bit-exact vs the XLA path on hardware —
            # the property that justifies default-on. Exactness wins.
            dy = ((gy - fy_ref[i, n] + 0.5) % 1.0 - 0.5) * wy
            dx = ((gx - fx_ref[i, n] + 0.5) % 1.0 - 0.5) * wx
            dz = dz_ref[i, n]
            if dist == "euclidean":
                d = jnp.sqrt(dy * dy + dx * dx + dz)
            elif dist == "quadratic":
                d = dy * dy + dx * dx + dz
            elif dist == "chebyshev":
                d = jnp.maximum(jnp.maximum(jnp.abs(dy), jnp.abs(dx)), dz)
            else:  # minkowski
                d = (jnp.abs(dy) ** p + jnp.abs(dx) ** p + dz) ** (1.0 / p)
            # sorted-insert: mins stays ascending; ties preserved exactly
            out = []
            for j in range(k):
                lo = jnp.minimum(mins[j], d)
                d = jnp.maximum(mins[j], d)
                out.append(lo)
            return tuple(out)

        mins = jax.lax.fori_loop(
            0, n_points, body,
            tuple(jnp.full((tile, w), inf) for _ in range(k)))
        for j in range(k):
            out_ref[0, j] = mins[j].astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("bc", "n", "h", "w", "k", "dist", "p",
                     "wy", "wx", "interpret"),
)
def _voronoi_call(gy, gx, fy, fx, dz, *, bc, n, h, w, k, dist, p, wy, wx,
                  interpret=False):
    tile = min(-(-h // _SUBLANE) * _SUBLANE, _MAX_TILE_ROWS)
    while tile > _SUBLANE and h % tile:
        tile -= _SUBLANE
    if h % tile:
        raise ValueError(
            f"kernel requires height % {_SUBLANE} == 0, got {h}")
    grid = (bc, h // tile)
    # whole-array SMEM for the point tables (blocked SMEM must tile
    # 8x128, which (1, n) rows do not) — the kernel indexes row
    # program_id(0) itself
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    kernel = _make_kernel(n, h, w, tile, k, dist, p, wy, wx)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bc, k, h, w), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i, t: (t, 0)),
            pl.BlockSpec((1, w), lambda i, t: (0, 0)),
            smem(), smem(), smem(),
        ],
        out_specs=pl.BlockSpec((1, k, tile, w), lambda i, t: (i, 0, t, 0)),
        interpret=interpret,
    )(gy, gx, fy, fx, dz)


def voronoi_ksmallest(fp, ys, xs, z_norm, *, scale: float, k: int,
                      dist: str = "euclidean", p: float = 3.0,
                      weights=(1.0, 1.0, 1.0),
                      interpret: bool = False) -> jax.Array:
    """k smallest toroidal distances per pixel, ascending.

    ``fp``: (B, C, N, 3) feature points in [0, 1); ``ys``/``xs``: the
    (H,)/(W,) grid coordinate vectors (VoronoiGenerator's
    ``linspace(0, L-1, L) / L``); ``z_norm``: traced scalar grid z.
    Returns (B, C, H, W, k) float32.

    Everything with no (pixel × point) dependence is precomputed here in
    XLA with the exact default-path op sequence — the scaled/wrapped grid
    vectors and the per-point z diff (in the pre-distance form the kernel
    ranks by: squared for euclidean/quadratic, |.| for chebyshev, |.|^p
    for minkowski) — so kernel values match the XLA composition
    bit-for-bit. The weight mode's per-axis weights multiply the
    *wrapped* diffs (reference weight semantics)."""
    b, c, n, _ = fp.shape
    h, w = ys.shape[0], xs.shape[0]
    wy, wx, wz = (float(v) for v in weights)
    fm = (fp.astype(jnp.float32) * scale) % 1.0
    fy = fm[..., 0].reshape(b * c, n)
    fx = fm[..., 1].reshape(b * c, n)
    gy = ((ys.astype(jnp.float32) * scale) % 1.0).reshape(h, 1)
    gx = ((xs.astype(jnp.float32) * scale) % 1.0).reshape(1, w)
    gz = (jnp.float32(z_norm) * scale) % 1.0
    dzw = ((gz - fm[..., 2] + 0.5) % 1.0 - 0.5) * wz
    if dist in ("euclidean", "quadratic"):
        dz = dzw * dzw
    elif dist == "chebyshev":
        dz = jnp.abs(dzw)
    else:  # minkowski
        dz = jnp.abs(dzw) ** p
    out = _voronoi_call(gy, gx, fy, fx, dz.reshape(b * c, n),
                        bc=b * c, n=n, h=h, w=w, k=k,
                        dist=dist, p=float(p),
                        wy=wy, wx=wx, interpret=interpret)
    return jnp.moveaxis(out.reshape(b, c, k, h, w), 2, -1)
