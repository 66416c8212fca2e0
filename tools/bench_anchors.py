"""Per-noise-type torch-CPU anchors vs TPU throughput (VERDICT r2 item 3).

The reference generates noise on CPU by default (py/sonar.py:163), so the
honest ≥10× BASELINE criterion needs a torch-CPU anchor *per type*, not
just pyramid. Where possible the anchor is the LIVE reference generator
itself (tests/_reference_loader.py — zero copying, maximal fidelity):
pyramid, pyramid_old, highres_pyramid, voronoi (rows: ``voronoi32`` = the
reference default 32 points / 1 octave; ``voronoi`` = 256 points / 1
octave; ``voronoi256`` = the bench's 256-point / 2-octave configuration —
each row uses the SAME config on both sides), collatz. The reference's wavelet /
scatternet types require pytorch_wavelets (not installed), so their
anchors are minimal faithful torch reimplementations of the dominant cost
(a 3-level 2D Haar DWT round trip; a DWT-mode scattering layer — a lower
bound, the reference's DTCWT ScatLayer costs more).

Usage:
  python tools/bench_anchors.py anchors          # torch-CPU side (safe)
  python tools/bench_anchors.py tpu              # TPU side, one proc/type
  python tools/bench_anchors.py table            # both + ratio table
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

_ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))

SHAPE = (1, 4, 128, 128)
NPIX = SHAPE[0] * SHAPE[1] * SHAPE[2] * SHAPE[3]

REF_TYPES = ["pyramid", "pyramid_old", "highres_pyramid", "voronoi",
             "collatz", "perlin", "onef_pinkish", "studentt", "distro"]
ALL_TYPES = REF_TYPES + ["voronoi32", "voronoi256", "wavelet", "scatternet"]
# VERDICT r3 item 9: studentt/distro sit near the 10x bar at (1,4,128,128)
# because that shape is bound by per-program tunnel overhead, not compute.
# The bulk rows draw ONE (64,4,128,128) batch per program on both sides —
# the serving-shaped measurement of real generator capability.
BULK_TYPES = ["studentt", "distro"]
BULK_BATCH = 64


def _ref_sampler(name, shape=SHAPE):
    import torch

    from _reference_loader import load_reference

    pkg = load_reference()
    assert pkg is not None, "reference tree unavailable"
    ref_noise = sys.modules["sonar_reference.py.noise"]
    torch.manual_seed(1234)
    x = torch.zeros(shape)
    if name.startswith("voronoi"):
        # plain voronoi is not in the reference's NoiseType registry (only
        # voronoi_mix/_fuzz are); instantiate the generator directly with
        # the row's configuration (see module docstring)
        gen_mod = sys.modules["sonar_reference.py.noise_generation"]
        n_points = (32,) if name == "voronoi32" else (256,)
        gen = gen_mod.VoronoiNoiseGenerator(
            x, sigma_min=0.03, sigma_max=14.6, normalized=True,
            n_points=n_points, octaves=2 if name == "voronoi256" else 1)
        return lambda: gen(torch.tensor(1.0), torch.tensor(0.9))
    if name == "distro":
        # distro is a parameterized node, not a NoiseType registry entry —
        # instantiate the generator directly with its defaults (normal +
        # quantile_norm 0.85 machinery, py/noise_generation.py:805-1256)
        gen_mod = sys.modules["sonar_reference.py.noise_generation"]
        gen = gen_mod.DistroNoiseGenerator(
            x, sigma_min=0.03, sigma_max=14.6, normalized=True)
        return lambda: gen(torch.tensor(1.0), torch.tensor(0.9))
    ns = ref_noise.get_noise_sampler(name, x, 0.03, 14.6, seed=1234,
                                     cpu=True, normalized=True)
    return lambda: ns(torch.tensor(1.0), torch.tensor(0.9))


def _haar_dwt_anchor():
    """3-level 2D Haar DWT analysis+synthesis of a gaussian draw — the
    dominant cost of the reference's waveletfilter type on CPU."""
    import torch
    import torch.nn.functional as F

    lo = torch.tensor([1.0, 1.0]) / 2.0 ** 0.5
    hi = torch.tensor([1.0, -1.0]) / 2.0 ** 0.5
    filts = torch.stack([
        torch.outer(a, b) for a in (lo, hi) for b in (lo, hi)
    ])[:, None]  # (4,1,2,2)

    def run():
        x = torch.randn(SHAPE)
        b, c, h, w = x.shape
        pyr = []
        y = x.reshape(b * c, 1, h, w)
        for _ in range(3):
            y4 = F.conv2d(y, filts, stride=2)
            pyr.append(y4[:, 1:])
            y = y4[:, :1]
        for bands in reversed(pyr):
            y = F.conv_transpose2d(torch.cat([y, bands], 1), filts, stride=2)
            y = y.reshape(y.shape[0], 1, *y.shape[-2:])
        return y

    return run


def _scat_anchor():
    """One level-1 DTCWT scattering layer over a gaussian draw — the
    reference ScatLayer's cost shape (pytorch_wavelets, DTCWT mode): 4
    (row-tree x col-tree) separable DWT combos with the near_sym_a bank
    (tree b = one-sample-rolled input), combined into 6 oriented complex
    magnitudes plus the averaged lowpass."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    from sonar_tpu.wavelets.kingsbury import biort_level1_bank

    bank = biort_level1_bank("near_sym_a")
    lo = torch.tensor(np.asarray(bank.dec_lo), dtype=torch.float32)
    hi = torch.tensor(np.asarray(bank.dec_hi), dtype=torch.float32)
    filts = torch.stack([
        torch.outer(a, b) for a in (lo, hi) for b in (lo, hi)
    ])[:, None]  # (4, 1, L, L)
    L = lo.shape[0]

    def tree(x, roll_r, roll_c):
        xr = torch.roll(x, (roll_r, roll_c), dims=(-2, -1))
        xp = F.pad(xr, (L - 1, L - 1, L - 1, L - 1), mode="circular")
        return F.conv2d(xp, filts, stride=2)

    def run():
        x = torch.randn(SHAPE)
        b, c, h, w = x.shape
        xf = x.reshape(b * c, 1, h, w)
        combos = {(rt, ct): tree(xf, rt, ct)
                  for rt in (0, 1) for ct in (0, 1)}
        ll = sum(v[:, :1] for v in combos.values()) / 4.0
        baa, bab = combos[(0, 0)][:, 1:], combos[(0, 1)][:, 1:]
        bba, bbb = combos[(1, 0)][:, 1:], combos[(1, 1)][:, 1:]
        s2 = 2.0 ** 0.5
        z1r, z1i = (baa - bbb) / s2, (bab + bba) / s2
        z2r, z2i = (baa + bbb) / s2, (bab - bba) / s2
        mags = torch.sqrt(
            torch.cat([z1r, z2r], 1) ** 2
            + torch.cat([z1i, z2i], 1) ** 2 + 1e-4) - 1e-2
        return torch.cat([ll, mags], 1)

    return run


def measure_anchor(name: str, iters: int = 5) -> float:
    if name.endswith("@bulk"):
        import torch

        base = name[: -len("@bulk")]
        fn = _ref_sampler(base, shape=(BULK_BATCH,) + SHAPE[1:])
        fn()
        t0 = time.perf_counter()
        for _ in range(max(2, iters // 2)):
            out = fn()
        dt = (time.perf_counter() - t0) / max(2, iters // 2)
        del out
        return BULK_BATCH * NPIX / SHAPE[0] / dt / 1e6
    if name == "wavelet":
        fn = _haar_dwt_anchor()
    elif name == "scatternet":
        fn = _scat_anchor()
    else:
        fn = _ref_sampler(name)
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    dt = (time.perf_counter() - t0) / iters
    del out
    return NPIX / dt / 1e6


def _register_tpu_item(bst, name: str) -> None:
    if name == "voronoi256":
        from sonar_tpu.noise.voronoi import VoronoiGenerator

        bst.ITEMS["voronoi256"] = lambda: VoronoiGenerator(
            n_points=(256,), octaves=2)
    if name == "voronoi32":
        from sonar_tpu.noise.voronoi import VoronoiGenerator

        bst.ITEMS["voronoi32"] = lambda: VoronoiGenerator(n_points=(32,))
    if name in ("pyramid", "highres_pyramid", "perlin", "onef_pinkish",
                "studentt"):
        from sonar_tpu.noise.presets import get_noise_item

        bst.ITEMS[name] = lambda: get_noise_item(name)
    if name == "distro":
        from sonar_tpu.noise.distro import DistroGenerator

        bst.ITEMS["distro"] = lambda: DistroGenerator()


def measure_tpu(name: str) -> float:
    """TPU side via tools/bench_slow_types.measure (slope-timed)."""
    import bench_slow_types as bst

    if name.endswith("@bulk"):
        base = name[: -len("@bulk")]
        _register_tpu_item(bst, base)
        return bst.measure(base, iters=1, shape=(BULK_BATCH,) + SHAPE[1:])
    _register_tpu_item(bst, name)
    return bst.measure(name, iters=20)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "table"
    if mode == "anchor-single":
        print(measure_anchor(sys.argv[2]))
        return
    if mode == "tpu-single":
        print(measure_tpu(sys.argv[2]))
        return

    from bench import subprocess_float

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sonar_jax_cache")
    out = {}
    types = ALL_TYPES + [f"{t}@bulk" for t in BULK_TYPES]
    if mode == "bulk":
        types, mode = [f"{t}@bulk" for t in BULK_TYPES], "table"
    for name in types:
        row = {}
        if mode in ("anchors", "table"):
            row["anchor"] = subprocess_float(
                [sys.executable, __file__, "anchor-single", name],
                env=env, label=f"{name} anchor")
        if mode in ("tpu", "table"):
            row["tpu"] = subprocess_float(
                [sys.executable, __file__, "tpu-single", name],
                env=env, label=f"{name} tpu")
        if row.get("anchor") and row.get("tpu"):
            row["ratio"] = round(row["tpu"] / row["anchor"], 1)
        out[name] = row
        print(f"# {name}: {row}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
