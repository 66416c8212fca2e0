"""RandomNoise lax.switch fast path: with homogeneous child states and
mix_count=1, only the chosen child is evaluated; the drawn noise matches
the masked-sum general path bit-for-bit (same per-child key derivation)."""

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.noise import (
    NoiseChain,
    RandomNoise,
    RepeatedNoise,
    get_noise_item,
    make_noise_sampler,
)

SHAPE = (1, 4, 8, 8)


def _draw_n(item, n=4, seed=0):
    fn, state = make_noise_sampler(item, SHAPE, seed=seed, sigma_min=0.03,
                                   sigma_max=14.6)
    outs = []
    for _ in range(n):
        noise, state = fn(state, jnp.asarray(1.0), jnp.asarray(0.5))
        outs.append(np.asarray(noise))
    return outs


def test_fast_path_matches_masked_choice():
    children = [get_noise_item("gaussian"), get_noise_item("uniform"),
                get_noise_item("pink_old")]
    item = RandomNoise(noise=NoiseChain([c.clone() for c in children]))
    assert item._states_homogeneous(
        tuple(c.init_state(None, jax.random.key(0)) for c in children))
    fast = _draw_n(item)

    # force the general path by monkeypatching the homogeneity check
    item2 = RandomNoise(noise=NoiseChain([c.clone() for c in children]))
    item2._states_homogeneous = lambda s: False
    masked = _draw_n(item2)
    # The first draw is identical (same chosen index, same child key).
    np.testing.assert_array_equal(fast[0], masked[0])


def test_fast_path_only_advances_chosen_child():
    """Under the fast path, only the selected child's stream advances (the
    reference's semantics: uncalled samplers never draw). The masked path
    advances all children, so later draws may diverge between the paths —
    the fast path is the faithful one."""
    children = [get_noise_item("gaussian"), get_noise_item("uniform")]
    item = RandomNoise(noise=NoiseChain(children))
    outs = _draw_n(item, n=6)
    # distinct consecutive draws, all finite
    for a, b in zip(outs, outs[1:]):
        assert not np.array_equal(a, b)
        assert np.isfinite(b).all()


def test_heterogeneous_states_fall_back():
    children = [get_noise_item("gaussian"),
                RepeatedNoise(noise=NoiseChain([get_noise_item("uniform")]),
                              repeat_length=2)]
    item = RandomNoise(noise=NoiseChain(children))
    outs = _draw_n(item, n=3)
    assert all(np.isfinite(o).all() for o in outs)


def test_fast_path_under_jit_scan():
    children = [get_noise_item("gaussian"), get_noise_item("uniform"),
                get_noise_item("grey")]
    item = RandomNoise(noise=NoiseChain(children))
    fn, state = make_noise_sampler(item, SHAPE, seed=3, sigma_min=0.03,
                                   sigma_max=14.6)

    @jax.jit
    def run(state):
        def body(st, _):
            noise, st = fn(st, jnp.asarray(1.0), jnp.asarray(0.5))
            return st, noise

        return jax.lax.scan(body, state, None, length=5)[1]

    out = run(state)
    assert out.shape == (5,) + SHAPE
    assert np.isfinite(np.asarray(out)).all()
