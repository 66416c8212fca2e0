"""Mesh + sharding layer (SURVEY §2.8 build obligations).

The reference has no parallelism at all (py/ grep: zero torch.distributed);
its closest analog is batch-dim vectorization (py/sonar.py:496). Here the
framework is SPMD-first:

- one ``jax.sharding.Mesh`` with axes ``("dp", "tp")`` (and optionally
  ``"sp"`` for the frame axis of 5D video latents, SURVEY §5.7);
- latents are sharded batch-first on ``dp`` (and frames on ``sp``);
- UNet params are sharded on ``tp`` along attention-head / channel-out dims;
- everything else (noise generation, momentum state, normalization) is
  shard-local elementwise/FFT work, so the only collectives in a sampling
  step are the denoiser's own matmul collectives plus the implicit ``pmean``
  GSPMD inserts for global normalization stats when a sample spans devices
  (py/utils.py:100 → SURVEY §5.8).
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    *,
    axis_names: Sequence[str] = ("dp", "tp"),
    mesh_shape: Sequence[int] | None = None,
    devices=None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    Without an explicit ``mesh_shape``, factor devices as dp × tp with tp as
    large a power of two ≤ 4 as divides the device count (attention heads
    default to 4, so tp ≤ 4 keeps head sharding even).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if mesh_shape is None:
        if len(axis_names) == 1:
            mesh_shape = (n,)
        else:
            tp = 1
            while tp < 4 and n % (tp * 2) == 0:
                tp *= 2
            rest = n // tp
            mesh_shape = (rest, tp) + (1,) * (len(axis_names) - 2)
    arr = np.array(devices).reshape(tuple(mesh_shape))
    return Mesh(arr, tuple(axis_names))


def latent_spec(ndim: int, *, dp: str = "dp", sp: str | None = None) -> P:
    """PartitionSpec for a latent: batch on dp; frames on sp for 5D."""
    if ndim == 5 and sp is not None:
        return P(dp, None, sp, None, None)
    return P(*((dp,) + (None,) * (ndim - 1)))


def shard_latent(x: jax.Array, mesh: Mesh, *, sp: str | None = None) -> jax.Array:
    return jax.device_put(x, NamedSharding(mesh, latent_spec(x.ndim, sp=sp)))


# -- UNet param shardings ----------------------------------------------------


def _param_spec(path: tuple, leaf) -> P:
    """Tensor-parallel layout for sonar_tpu.models.unet params.

    Column-parallel: qkv / fc1 / emb / conv kernels shard the output-channel
    (last) dim. Row-parallel: attention proj and fc2 shard the input (first)
    dim so the following add is a psum GSPMD inserts automatically.
    Norm scales/biases and 1-dim biases stay replicated.
    """
    names = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    if leaf.ndim <= 1:
        return P()
    in_row_parallel = any(n in ("proj", "fc2") for n in names)
    if not any(n == "w" for n in names):
        return P()
    if leaf.ndim == 2:
        return P("tp", None) if in_row_parallel else P(None, "tp")
    if leaf.ndim == 4:  # (kh, kw, cin, cout)
        return P(None, None, None, "tp")
    return P()


def _fsdp_spec(spec: P, leaf, dp_size: int, fsdp_axis: str) -> P:
    """Layer FSDP on top of a tensor-parallel spec: shard the largest
    still-replicated dim of ``leaf`` across ``fsdp_axis``. GSPMD then
    all-gathers the shard before each use and reduce-scatters the grad —
    the standard ZeRO-3/FSDP memory story, no hand-written collectives.

    Only dims divisible by the axis size are eligible, and 1-D leaves
    (norm scales/biases — a few hundred bytes each) stay replicated:
    sharding them saves nothing and costs a GSPMD all-gather per use,
    the standard FSDP small-param exemption."""
    if leaf.ndim <= 1:
        return spec
    base = tuple(spec) + (None,) * (leaf.ndim - len(tuple(spec)))
    cands = [d for d in range(leaf.ndim)
             if base[d] is None and leaf.shape[d] % dp_size == 0
             and leaf.shape[d] >= dp_size]
    if not cands:
        return spec
    d = max(cands, key=lambda i: leaf.shape[i])
    return P(*(fsdp_axis if i == d else base[i] for i in range(leaf.ndim)))


def unet_param_shardings(params, mesh: Mesh, *, fsdp: bool = False,
                         fsdp_axis: str = "dp"):
    """NamedSharding tree for a UNet param pytree over ``mesh``'s tp axis.

    ``fsdp=True`` additionally shards each weight's largest replicated dim
    over ``fsdp_axis`` (default the dp axis) — per-device param + optimizer
    memory drops ~dp×, paid with GSPMD-inserted all-gathers per use."""
    dp_size = mesh.shape.get(fsdp_axis, 0)
    if fsdp and dp_size == 0:
        # a silent no-op here means the expected ~dp× memory reduction
        # quietly doesn't happen and the job OOMs with no diagnostic
        raise ValueError(
            f"fsdp=True but mesh has no {fsdp_axis!r} axis "
            f"(axes: {tuple(mesh.axis_names)}) — pass fsdp_axis=")

    def spec(path, leaf):
        s = _param_spec(path, leaf)
        if fsdp and dp_size > 1:
            s = _fsdp_spec(s, leaf, dp_size, fsdp_axis)
        return NamedSharding(mesh, s)

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_unet_params(params, mesh: Mesh, *, fsdp: bool = False,
                      fsdp_axis: str = "dp"):
    return jax.device_put(
        params, unet_param_shardings(params, mesh, fsdp=fsdp,
                                     fsdp_axis=fsdp_axis))
