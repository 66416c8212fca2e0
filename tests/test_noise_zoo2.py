"""Tier-2 noise zoo: distro, collatz, voronoi, wavelet generators
(SURVEY §2.3 parity for the heavy generators)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.core.normalize import tstd
from sonar_tpu.noise import get_noise_item, make_noise_sampler
from sonar_tpu.noise.distro import DISTRO_PARAMS, DistroGenerator, build_params
from sonar_tpu.noise.voronoi import VoronoiGenerator
from sonar_tpu.noise.wavelet import WaveletFilteredNoise

SHAPE = (1, 4, 16, 16)


def draw(item, shape=SHAPE, seed=0, n=1, sigma=1.0, sigma_next=0.9):
    fn, st = make_noise_sampler(item, shape, seed=seed)
    outs = []
    for _ in range(n):
        noise, st = fn(st, jnp.asarray(sigma), jnp.asarray(sigma_next))
        outs.append(noise)
    return outs if n > 1 else outs[0]


# A representative cross-section: simple in-place, gamma-family, event-dim
# (vector) distros, rejection-sampled, and matrix-valued.
@pytest.mark.parametrize(
    "distro", ["normal", "cauchy", "geometric", "beta", "dirichlet",
               "studentt", "vonmises", "relaxed_onehotcategorical", "wishart",
               "lkjcholesky", "poisson"]
)
def test_distro_sample(distro):
    noise = draw(DistroGenerator(distro=distro))
    assert noise.shape == SHAPE
    assert np.isfinite(np.asarray(noise)).all()
    # post quantile-normalize output should be roughly standardized
    assert abs(float(tstd(noise)) - 1.0) < 0.35


def test_distro_full_registry_coverage():
    assert len(DISTRO_PARAMS) == 26
    assert "normal_mean" in build_params()
    with pytest.raises(ValueError, match="Bad distro"):
        draw(DistroGenerator(distro="nope"))


def test_distro_result_index_cycling():
    noise = draw(DistroGenerator(distro="dirichlet",
                                 dirichlet_concentration="0.4 0.4 0.4",
                                 result_index="0 1"))
    assert noise.shape == SHAPE


def test_collatz_basic_and_output_modes():
    for omode in ("values", "ratios", "mults", "adds", "noise_x_ratios",
                  "seed_x_mults"):
        item = get_noise_item("collatz", output_mode=omode, iterations=4)
        noise = draw(item)
        assert noise.shape == SHAPE, omode
        assert np.isfinite(np.asarray(noise)).all(), omode


def test_collatz_seed_and_mix_samplers():
    item = get_noise_item(
        "collatz", iterations=2,
        seed_noise_sampler=get_noise_item("uniform"),
        mix_noise_sampler=get_noise_item("gaussian"),
        output_mode="noise_x_ratios",
    )
    noise = draw(item)
    assert np.isfinite(np.asarray(noise)).all()


def test_voronoi_distance_modes():
    for dmode in ("euclidean", "manhatten", "chebyshev", "minkowski:p=3",
                  "quadratic", "angle", "angle_tanh", "angle_sigmoid",
                  "weight:h=2:w=1:z=0.5", "fuzz:name=euclidean:fuzz=0.1",
                  "fractal_norm:name=euclidean",
                  "euclidean+chebyshev:dscale=0.5"):
        item = VoronoiGenerator(n_points=(8,), distance_mode=(dmode,))
        noise = draw(item)
        assert np.isfinite(np.asarray(noise)).all(), dmode


def test_voronoi_result_modes():
    for rmode in ("f1", "f2", "inv_f1", "diff", "diff2", "cellid", "ridge",
                  "median_distance", "softmin", "gradient_magnitude",
                  "fractal_norm", "fuzz", "f1+diff2:rscale=2"):
        item = VoronoiGenerator(n_points=(8,), result_mode=(rmode,))
        noise = draw(item)
        assert np.isfinite(np.asarray(noise)).all(), rmode


def test_voronoi_manhatten_quirk_is_euclidean():
    # py/noise_generation.py:1483-1485: manhatten == euclidean (preserved)
    a = draw(VoronoiGenerator(n_points=(8,), distance_mode=("euclidean",)), seed=7)
    b = draw(VoronoiGenerator(n_points=(8,), distance_mode=("manhatten",)), seed=7)
    assert np.allclose(np.asarray(a), np.asarray(b))


def test_voronoi_z_walk_changes_over_steps():
    item = VoronoiGenerator(n_points=(8,), z_increment=5.0, z_range=10.0)
    outs = draw(item, n=3)
    assert not np.allclose(np.asarray(outs[0]), np.asarray(outs[1]))


def test_voronoi_octave_modes():
    for omode in ("same_features", "new_features", "same_invert_odd",
                  "same_roll_chan_up", "same_roll_dir_down"):
        item = VoronoiGenerator(n_points=(8,), octaves=2, octave_mode=omode)
        assert np.isfinite(np.asarray(draw(item))).all(), omode


def test_wavelet_noise_type():
    noise = draw(get_noise_item("wavelet"), shape=(1, 4, 32, 32))
    assert abs(float(tstd(noise)) - 1.0) < 0.1
    # negative octaves reverse the ladder
    noise_rev = draw(get_noise_item("wavelet", octaves=-3), shape=(1, 4, 32, 32))
    assert np.isfinite(np.asarray(noise_rev)).all()


def test_wavelet_noise_with_inner_sampler():
    item = get_noise_item("wavelet", noise_sampler=get_noise_item("uniform"))
    assert np.isfinite(np.asarray(draw(item, shape=(1, 4, 32, 32)))).all()


def test_wavelet_filtered_noise_combinator():
    item = WaveletFilteredNoise(
        noise=get_noise_item("pyramid"),
        noise_high=get_noise_item("gaussian"),
        wave="db4", level=2, yl_scale=0.5,
        yh_scales=(1.0, [0.5, 0.5, 1.0]),
        two_step_inverse=True,
    )
    noise = draw(item, shape=(1, 4, 32, 32))
    assert abs(float(tstd(noise)) - 1.0) < 0.1


def test_wavelet_filtered_5d_frames():
    item = WaveletFilteredNoise(wave="haar", level=1)
    noise = draw(item, shape=(1, 4, 2, 16, 16))
    assert noise.shape == (1, 4, 2, 16, 16)


def test_heavy_generators_under_jit_scan():
    item = VoronoiGenerator(n_points=(8,), octaves=2, z_max=3.0,
                            z_max_mode="bounce")
    fn, st = make_noise_sampler(item, SHAPE, seed=2)

    @jax.jit
    def run(st):
        def body(s, _):
            n, s = fn(s, jnp.asarray(1.0), jnp.asarray(0.9))
            return s, jnp.std(n)
        return jax.lax.scan(body, st, None, length=4)[1]

    stds = np.asarray(run(st))
    assert np.isfinite(stds).all()


def test_voronoi_topk_prefix_matches_full_sort():
    """The lax.top_k sorted-prefix fast path must agree with the full
    sort for every prefix-eligible result mode (voronoi.py _mode_prefix)."""
    import jax

    from sonar_tpu.noise import voronoi as V

    d = jax.random.uniform(jax.random.key(3), (2, 3, 8, 8, 64))
    full = jnp.sort(d, axis=-1)
    for k in (1, 2, 4):
        got = V._sorted_small(d, k)
        assert got.shape[-1] == k
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(full[..., :k]), rtol=0, atol=0)
    # full-sort cases unchanged
    np.testing.assert_array_equal(np.asarray(V._sorted_small(d, None)),
                                  np.asarray(full))

    # static prefix analysis over the mode mini-language
    assert V._sorted_prefix(V._parse_modes("f1", "rscale")) == 1
    assert V._sorted_prefix(V._parse_modes("f:idx=3", "rscale")) == 4
    assert V._sorted_prefix(V._parse_modes("diff2+f2", "rscale")) == 2
    assert V._sorted_prefix(V._parse_modes("median_distance", "rscale")) is None
    assert V._sorted_prefix(
        V._parse_modes("ridge:name=diff:idx2=3", "rscale")) == 4
    # ADVICE r2: negative idx is legal reference syntax (Python indexing
    # from the end) — must force the full sort, never a clamped prefix
    assert V._sorted_prefix(V._parse_modes("f:idx=-1", "rscale")) is None
    assert V._sorted_prefix(V._parse_modes("f1+f:idx=-1", "rscale")) is None
    assert V._sorted_prefix(
        V._parse_modes("diff:idx1=-2:idx2=1", "rscale")) is None


def test_voronoi_negative_idx_reads_largest_distance():
    """'f:idx=-1' must return the LARGEST sorted distance; before the
    ADVICE-r2 fix the prefix path silently returned the smallest via
    JAX's clamped out-of-bounds indexing."""
    from sonar_tpu.noise import voronoi as V
    from sonar_tpu.noise.base import make_noise_sampler

    def draw(mode):
        gen = V.VoronoiGenerator(n_points=(16,), result_mode=(mode,))
        fn, st = make_noise_sampler(gen, (1, 2, 16, 16), seed=5)
        return np.asarray(fn(st, None, None)[0])

    largest, smallest, explicit = draw("f:idx=-1"), draw("f1"), draw("f:idx=15")
    # idx=-1 must be the idx=15 field (bit-identical), NOT the clamped
    # f1 field the broken prefix path returned
    np.testing.assert_array_equal(largest, explicit)
    assert not np.allclose(largest, smallest)


def test_voronoi_results_identical_with_prefix_path():
    """End-to-end voronoi draws for prefix-eligible modes must be
    bit-identical to a forced full-sort (the prefix holds the same
    values)."""
    from sonar_tpu.noise import voronoi as V
    from sonar_tpu.noise.base import make_noise_sampler

    for mode in ("f1", "diff2", "f:idx=2"):
        gen = V.VoronoiGenerator(n_points=(16,), result_mode=(mode,))
        fn, st = make_noise_sampler(gen, (1, 2, 16, 16), seed=5)
        fast, _ = fn(st, None, None)

        orig = V._sorted_prefix
        try:
            V._sorted_prefix = lambda parsed: None  # force full sort
            gen2 = V.VoronoiGenerator(n_points=(16,), result_mode=(mode,))
            fn2, st2 = make_noise_sampler(gen2, (1, 2, 16, 16), seed=5)
            slow, _ = fn2(st2, None, None)
        finally:
            V._sorted_prefix = orig
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))
