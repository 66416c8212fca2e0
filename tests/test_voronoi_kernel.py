"""Fused Voronoi k-smallest kernel (kernels/voronoi.py, SURVEY §2.9
item 7): interpret-mode bit-parity with the XLA composition, plan
detection, and end-to-end generator integration."""

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.kernels import voronoi as KV
from sonar_tpu.noise import voronoi as V
from sonar_tpu.noise.base import make_noise_sampler

B, C, N, H, W = 1, 2, 37, 16, 24


def _grid():
    ys = jnp.linspace(0, H - 1, H) / H
    xs = jnp.linspace(0, W - 1, W) / W
    return ys, xs


def _xla_sorted(fp, z, scale, dist, p, weights, k):
    ys, xs = _grid()
    grid = jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1)
    grid3d = jnp.concatenate([grid, jnp.full((H, W, 1), z)], axis=-1)
    g = (grid3d[None, None, :, :, None, :] * scale) % 1.0
    f = (fp[:, :, None, None, :, :] * scale) % 1.0
    d = (g - f + 0.5) % 1.0 - 0.5
    if weights is not None:
        d = d * jnp.asarray(weights)
    if dist == "euclidean":
        dd = jnp.sqrt(jnp.sum(d * d, axis=-1))
    elif dist == "quadratic":
        dd = jnp.sum(d * d, axis=-1)
    elif dist == "chebyshev":
        dd = jnp.max(jnp.abs(d), axis=-1)
    else:
        dd = jnp.sum(jnp.abs(d) ** p, axis=-1) ** (1.0 / p)
    return jnp.sort(dd, axis=-1)[..., :k]


def test_kernel_bitparity_interpret():
    """The kernel must reproduce the XLA composition bit-for-bit: it is a
    deterministic re-expression of the same math (no RNG), which is what
    justifies default-on."""
    fp = jax.random.uniform(jax.random.key(0), (B, C, N, 3))
    z = jnp.float32(0.37)
    ys, xs = _grid()
    for dist, p, weights, scale, k in [
        ("euclidean", 3.0, None, 1.0, 3),
        ("euclidean", 3.0, None, 2.0, 1),
        ("quadratic", 3.0, None, 1.0, 4),
        ("chebyshev", 3.0, None, 4.0, 2),
        ("minkowski", 2.5, None, 1.0, 3),
        ("euclidean", 3.0, (2.0, 1.0, 0.25), 2.0, 3),
        ("euclidean", 3.0, None, 8.0, 8),
    ]:
        got = KV.voronoi_ksmallest(
            fp, ys, xs, z, scale=scale, k=k, dist=dist, p=p,
            weights=weights or (1.0, 1.0, 1.0), interpret=True)
        want = _xla_sorted(fp, z, scale, dist, p, weights, k)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want),
            err_msg=f"{dist} p={p} w={weights} s={scale} k={k}")


def test_kernel_plan_detection(monkeypatch):
    monkeypatch.setattr(KV, "use_voronoi_kernel", lambda: True)

    class Ctx:
        dtype = jnp.float32
        batch = 1
        channels = 4

    def plan(**kw):
        gen = V.VoronoiGenerator(n_points=(16,), **kw)
        return gen._kernel_plan(Ctx(), 0, 64, 64)

    assert plan(result_mode=("f2",)) == ("euclidean", 3.0, None, 1.0, 2)
    assert plan(result_mode=("f2",),
                distance_mode=("manhatten",))[0] == "euclidean"  # quirk
    assert plan(result_mode=("diff2",))[-1] == 2
    assert plan(result_mode=("f1+f:idx=3",))[-1] == 4
    assert plan(result_mode=("ridge:name=diff:idx2=2",))[-1] == 3
    assert plan(result_mode=("f2",),
                distance_mode=("weight:name=chebyshev:h=2",)) == (
        "chebyshev", 3.0, (2.0, 1.0, 0.25), 1.0, 2)
    assert plan(result_mode=("f2",),
                distance_mode=("minkowski:p=2.5",))[1] == 2.5
    # ineligible specs fall back to XLA
    assert plan() is None  # k=1: a single fused XLA min-reduce wins
    assert plan(result_mode=("softmin",)) is None
    assert plan(result_mode=("median_distance",)) is None  # full sort
    assert plan(result_mode=("cellid",)) is None  # needs argmin of d
    assert plan(result_mode=("f:idx=-1",)) is None  # negative idx
    assert plan(result_mode=("f2",), distance_mode=("angle",)) is None
    assert plan(result_mode=("f2",),
                distance_mode=("euclidean+chebyshev",)) is None  # composed
    assert plan(result_mode=("f2",),
                distance_mode=("euclidean:dscale=-1",)) is None  # sign flip
    assert plan(result_mode=("fractal_norm",)) is None  # consumes d


def test_generator_kernel_path_matches_default(monkeypatch):
    """End-to-end: VoronoiGenerator with the kernel forced on (interpret
    mode) must produce bit-identical draws to the default XLA path."""
    monkeypatch.setattr(KV, "use_voronoi_kernel", lambda: True)
    real = KV.voronoi_ksmallest
    monkeypatch.setattr(
        KV, "voronoi_ksmallest",
        lambda *a, **kw: real(*a, **{**kw, "interpret": True}))

    for kw in [dict(), dict(result_mode=("diff2",), octaves=2),
               dict(distance_mode=("weight:name=euclidean:h=2",)),
               dict(n_points=(24,), result_mode=("ridge",))]:
        kw = {"n_points": (16,), **kw}
        gen = V.VoronoiGenerator(**kw)
        fn, st = make_noise_sampler(gen, (1, 2, 16, 16), seed=5)
        with_kernel, _ = fn(st, None, None)

        monkeypatch.setattr(KV, "use_voronoi_kernel", lambda: False)
        gen2 = V.VoronoiGenerator(**kw)
        fn2, st2 = make_noise_sampler(gen2, (1, 2, 16, 16), seed=5)
        without, _ = fn2(st2, None, None)
        monkeypatch.setattr(KV, "use_voronoi_kernel", lambda: True)

        np.testing.assert_array_equal(
            np.asarray(with_kernel), np.asarray(without), err_msg=str(kw))


def test_axis_fast_path_matches_generic():
    """Per-axis accumulated distances (no (...,3) tensor) must be
    bit-identical to the generic 6D path for every simple mode."""
    def draw(kw, force_generic):
        gen = V.VoronoiGenerator(n_points=(16,), **kw)
        if force_generic:
            orig = V._simple_distance
            V._simple_distance = lambda parsed: None
            try:
                fn, st = make_noise_sampler(gen, (1, 2, 16, 16), seed=5)
                return np.asarray(fn(st, None, None)[0])
            finally:
                V._simple_distance = orig
        fn, st = make_noise_sampler(gen, (1, 2, 16, 16), seed=5)
        return np.asarray(fn(st, None, None)[0])

    for kw in [dict(), dict(distance_mode=("chebyshev",)),
               dict(distance_mode=("quadratic",)),
               dict(distance_mode=("minkowski:p=2.5",)),
               dict(distance_mode=("weight:name=euclidean:h=2:z=0.5",)),
               dict(result_mode=("median_distance",)),
               dict(result_mode=("softmin",)), dict(octaves=3)]:
        np.testing.assert_array_equal(draw(kw, False), draw(kw, True),
                                      err_msg=str(kw))


def test_itermin_matches_topk():
    d = jax.random.uniform(jax.random.key(3), (2, 3, 8, 8, 64))
    full = jnp.sort(d, axis=-1)
    for k in (1, 2, 4, 6):
        got = V._ksmallest_iter(d, k)
        np.testing.assert_array_equal(np.asarray(got),
                                      np.asarray(full[..., :k]))
    # duplicate values survive extraction with equal values
    dup = jnp.asarray([[3.0, 1.0, 1.0, 2.0]])
    np.testing.assert_array_equal(np.asarray(V._ksmallest_iter(dup, 3)),
                                  [[1.0, 1.0, 2.0]])


def test_kernel_gate_requires_k_le_n():
    from sonar_tpu.kernels.voronoi import voronoi_kernel_supported

    assert not voronoi_kernel_supported(64, 64, 4, "euclidean", 4, 2)
    # and the clean tile error replaces the ZeroDivisionError crash
    import pytest as _pytest

    from sonar_tpu.kernels.voronoi import _voronoi_call

    with _pytest.raises(ValueError, match="height"):
        _voronoi_call(jnp.zeros((12, 1)), jnp.zeros((1, 64)),
                      jnp.zeros((1, 4)), jnp.zeros((1, 4)),
                      jnp.zeros((1, 4)), bc=1, n=4, h=12, w=64, k=2,
                      dist="euclidean", p=3.0, wy=1.0, wx=1.0,
                      interpret=True)
