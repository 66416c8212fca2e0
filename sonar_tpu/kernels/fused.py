"""Pallas TPU kernels for the hot elementwise chains (SURVEY §2.9).

Two fusions that otherwise cost multiple HBM passes per sampler step:

1. :func:`fused_momentum_step` — the NEW-mode momentum chain
   ``d = (x − denoised)/σ → momentum_mix → history update → x + m·dt``
   plus optional ancestral noise injection ``+ noise·(s_noise·σ_up)``
   (py/sonar.py:238-320 + 561-566): 5 input tensors, 2 outputs, one pass.
2. :func:`fused_scale_noise` — the scale_noise normalizer (mean/std with
   the 2.5/√N dead-band + affine, py/utils.py:85-106) as a single-program
   kernel: latents up to a few MB fit VMEM whole, so the reduction and the
   affine share one HBM round trip.

Both have pure-jnp references (used in tests and as the non-TPU fallback);
``use_pallas()`` auto-detects the backend. Latents are reshaped to
(rows, 128)-aligned 2D blocks; padding rows are masked out of reductions.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend params are optional on CPU
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def use_pallas() -> bool:
    """Opt-in via SONAR_TPU_PALLAS=1 (TPU only).

    Measured on v5e (21-step sonar_euler_ancestral, 4x128x128, stub
    denoiser): the XLA-fused composed path ran 6.11 ms vs 6.37 ms through
    the Pallas kernel — XLA already fuses this elementwise chain optimally,
    and the kernel's flatten/pad plumbing costs more than it saves. The
    kernels stay (bit-exact on TPU, tested) as the substrate for future
    fusions XLA can't do (e.g. cross-step batching), but default off.
    """
    import os

    flag = os.environ.get("SONAR_TPU_PALLAS", "0")
    if flag == "0":
        return False
    return jax.default_backend() == "tpu"


def _as_rows(x: jax.Array, lane: int = 128):
    """Flatten to (rows, lane) with zero padding; returns (2d, n_valid)."""
    n = x.size
    rows = -(-n // lane)
    flat = x.reshape(-1)
    pad = rows * lane - n
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), x.dtype)])
    return flat.reshape(rows, lane), n


# ---------------------------------------------------------------------------
# 1. fused momentum step
# ---------------------------------------------------------------------------


def _momentum_kernel(scal_ref, x_ref, den_ref, hd_ref, noise_ref,
                     out_x_ref, out_hd_ref):
    """scal: [sigma, dt, momentum, hd_ratio, hd_scale, md_scale, has,
    noise_scale, in_window, hist_window]."""
    sigma = scal_ref[0]
    dt = scal_ref[1]
    momentum = scal_ref[2]
    hd_ratio = scal_ref[3]
    hd_scale = scal_ref[4]
    md_scale = scal_ref[5]
    has = scal_ref[6]
    noise_scale = scal_ref[7]
    in_window = scal_ref[8]
    hist_window = scal_ref[9]
    x = x_ref[:]
    denoised = den_ref[:]
    hd = hd_ref[:]
    # 1. get_momentum_denoised (NEW mode: mix is identity; history gets
    #    denoised/sigma — py/sonar.py:262-283)
    dn_s = denoised / sigma
    hd1_blend = (dn_s * md_scale) + (hd * hd_scale - dn_s * md_scale) * hd_ratio
    hd1_cand = jnp.where(has > 0, hd1_blend, dn_s)
    hd1 = jnp.where(hist_window > 0, hd1_cand, hd)
    has1 = jnp.maximum(has, hist_window)
    # 2. get_momentum_d (py/sonar.py:285-307)
    d = (x - denoised) / sigma
    mixed = hd1 + (d - hd1) * momentum
    momentum_d = jnp.where(has1 > 0, mixed, d)
    momentum_d = jnp.where(in_window > 0, momentum_d, d)
    hd2_blend = (d * md_scale) + (hd1 * hd_scale - d * md_scale) * hd_ratio
    hd2_cand = jnp.where(has1 > 0, hd2_blend, d)
    out_hd_ref[:] = jnp.where(hist_window > 0, hd2_cand, hd1)
    # 3. Euler step + ancestral noise (py/sonar.py:309-320 + 561-566)
    out_x_ref[:] = momentum_d * dt + x + noise_ref[:] * noise_scale


def fused_momentum_step_reference(x, denoised, hd, noise, scal):
    (sigma, dt, momentum, hd_ratio, hd_scale, md_scale, has, noise_scale,
     in_window, hist_window) = tuple(scal)
    dn_s = denoised / sigma
    hd1_blend = dn_s * md_scale + (hd * hd_scale - dn_s * md_scale) * hd_ratio
    hd1 = jnp.where(hist_window > 0, jnp.where(has > 0, hd1_blend, dn_s), hd)
    has1 = jnp.maximum(has, hist_window)
    d = (x - denoised) / sigma
    mixed = hd1 + (d - hd1) * momentum
    momentum_d = jnp.where(has1 > 0, mixed, d)
    momentum_d = jnp.where(in_window > 0, momentum_d, d)
    hd2_blend = d * md_scale + (hd1 * hd_scale - d * md_scale) * hd_ratio
    new_hd = jnp.where(hist_window > 0, jnp.where(has1 > 0, hd2_blend, d), hd1)
    return momentum_d * dt + x + noise * noise_scale, new_hd


def fused_momentum_step(x, denoised, hd, noise, scal, *, force_pallas=None):
    """One-pass NEW-mode momentum + Euler + noise injection.

    ``scal`` is a (10,) float32 vector — see :func:`_momentum_kernel`.
    Falls back to the jnp reference off-TPU.
    """
    enable = use_pallas() if force_pallas is None else force_pallas
    if not enable:
        return fused_momentum_step_reference(x, denoised, hd, noise, scal)
    shape = x.shape
    x2, _ = _as_rows(x)
    d2, _ = _as_rows(denoised)
    h2, _ = _as_rows(hd)
    n2, _ = _as_rows(noise)
    kwargs = {}
    if pltpu is not None:
        smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        vmem_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    else:  # pragma: no cover
        smem_spec = vmem_spec = pl.BlockSpec()
    out_x, out_hd = pl.pallas_call(
        _momentum_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x2.shape, x.dtype),
            jax.ShapeDtypeStruct(x2.shape, x.dtype),
        ),
        in_specs=[smem_spec, vmem_spec, vmem_spec, vmem_spec, vmem_spec],
        out_specs=(vmem_spec, vmem_spec),
        **kwargs,
    )(scal.astype(jnp.float32), x2, d2, h2, n2)
    n = math.prod(shape)
    return (out_x.reshape(-1)[:n].reshape(shape),
            out_hd.reshape(-1)[:n].reshape(shape))


def pack_momentum_scalars(*, sigma, dt, momentum, hd_ratio, hd_scale, md_scale,
                          has, noise_scale, in_window=True, hist_window=True):
    return jnp.stack([
        jnp.asarray(v, jnp.float32) for v in (
            sigma, dt, momentum, hd_ratio, hd_scale, md_scale,
            jnp.asarray(has, jnp.float32),
            noise_scale,
            jnp.asarray(in_window, jnp.float32),
            jnp.asarray(hist_window, jnp.float32),
        )
    ])


# ---------------------------------------------------------------------------
# 2. fused scale_noise
# ---------------------------------------------------------------------------


def _make_scale_noise_kernel(n: int):
    """scal: [threshold, factor]. Single program: the whole latent is one
    VMEM block; padded tail elements are masked from the stats. ``n`` (the
    valid element count) is shape-derived and static, so the mask compares
    exact int32 indices — an f32 comparison loses integer exactness above
    2^24 elements, which IS reachable within the VMEM size bound."""
    nf = float(n)

    def _scale_noise_kernel(scal_ref, x_ref, out_ref):
        threshold = scal_ref[0]
        factor = scal_ref[1]
        x = x_ref[:]
        rows, lane = x.shape
        idx = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, lane), 0) * lane
            + jax.lax.broadcasted_iota(jnp.int32, (rows, lane), 1)
        )
        valid = idx < n
        xm = jnp.where(valid, x, 0.0)
        mean = jnp.sum(xm) / nf
        var = jnp.sum(jnp.where(valid, (x - mean) ** 2, 0.0)) / (nf - 1.0)
        std = jnp.sqrt(var)
        y = jnp.where(jnp.abs(mean) > threshold, x - mean, x)
        y = jnp.where((jnp.abs(1.0 - std) > threshold) & (std != 0),
                      y / jnp.where(std == 0, 1.0, std), y)
        out_ref[:] = y * factor

    return _scale_noise_kernel


def fused_scale_noise(noise, factor=1.0, *, threshold_std_devs: float = 2.5,
                      force_pallas=None):
    """scale_noise's global mode as one kernel (py/utils.py:85-106)."""
    enable = use_pallas() if force_pallas is None else force_pallas
    if not enable:
        from ..core.normalize import scale_noise

        return scale_noise(noise, factor, normalized=True,
                           threshold_std_devs=threshold_std_devs)
    shape = noise.shape
    x2, n = _as_rows(noise)
    scal = jnp.asarray(
        [threshold_std_devs / math.sqrt(n), 1.0], jnp.float32
    ).at[1].set(jnp.asarray(factor, jnp.float32))
    if pltpu is not None:
        smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        vmem_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    else:  # pragma: no cover
        smem_spec = vmem_spec = pl.BlockSpec()
    out = pl.pallas_call(
        _make_scale_noise_kernel(n),
        out_shape=jax.ShapeDtypeStruct(x2.shape, noise.dtype),
        in_specs=[smem_spec, vmem_spec],
        out_specs=vmem_spec,
    )(scal, x2)
    return out.reshape(-1)[: math.prod(shape)].reshape(shape)
