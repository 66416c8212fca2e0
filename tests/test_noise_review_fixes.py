"""Regressions for the round-3 noise-subsystem review findings:
rng_offset_mode="override" stream advance, scatternet flat+per-channel
torch-squeeze semantics, PerDimNoise state purity and exemplar-slice
offsets, RandomNoise general-path masking/state isolation, and the
power-noise channel-mixer/time-brownian guards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.noise import make_noise_sampler
from sonar_tpu.noise.base import NoiseItem
from sonar_tpu.noise.combinators import (
    CustomNoiseParametersNoise,
    ModulatedNoise,
    PerDimNoise,
    RandomNoise,
)
from sonar_tpu.noise.items import TypedNoiseItem

SHAPE = (1, 4, 16, 16)


def _gauss():
    return TypedNoiseItem(noise_type="gaussian")


def test_rng_override_stream_advances_and_ignores_base_seed():
    item = CustomNoiseParametersNoise(noise=_gauss(), rng_offset_mode="override",
                                      rng_state_offset=42)
    fn, st = make_noise_sampler(item, SHAPE, seed=0)
    n1, st = fn(st, jnp.asarray(1.0), jnp.asarray(0.9))
    n2, st = fn(st, jnp.asarray(1.0), jnp.asarray(0.9))
    assert not np.allclose(np.asarray(n1), np.asarray(n2)), \
        "override stream must advance per draw"
    # the override stream is seeded from rng_state_offset alone: a
    # different BASE seed yields the identical stream (reference:
    # a separate torch RNG seeded once, py/noise.py:2139-2170)
    fn_b, st_b = make_noise_sampler(item.clone(), SHAPE, seed=999)
    m1, _ = fn_b(st_b, jnp.asarray(1.0), jnp.asarray(0.9))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(m1))
    # and a different offset yields a different stream
    other = CustomNoiseParametersNoise(noise=_gauss(),
                                       rng_offset_mode="override",
                                       rng_state_offset=43)
    fn_c, st_c = make_noise_sampler(other, SHAPE, seed=0)
    o1, _ = fn_c(st_c, jnp.asarray(1.0), jnp.asarray(0.9))
    assert not np.allclose(np.asarray(n1), np.asarray(o1))


def test_scatternet_flat_per_channel():
    """torch's squeeze(dim) is a no-op on non-unit axes; flat output modes
    with per_channel_scatternet hit exactly that case."""
    from sonar_tpu.api import build

    chain = build("SonarCustomNoise", factor=1.0, noise_type="gaussian")
    for mode in ("flat", "flat_adjusted", "flat_scaled"):
        item = build("SonarScatternetFilteredNoise", custom_noise=chain,
                     output_mode=mode, per_channel_scatternet=True)
        fn, st = make_noise_sampler(item, SHAPE, seed=2)
        out, _ = fn(st, jnp.asarray(1.0), jnp.asarray(0.9))
        assert out.shape == SHAPE
        assert bool(jnp.isfinite(out).all()), mode


def test_perdim_does_not_mutate_caller_state():
    item = PerDimNoise(noise=_gauss(), dim=1, chunk_size=1)
    fn, st0 = make_noise_sampler(item, SHAPE, seed=3)
    a, _ = fn(st0, jnp.asarray(1.0), jnp.asarray(0.9))
    b, _ = fn(st0, jnp.asarray(1.0), jnp.asarray(0.9))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_perdim_offset_reaches_ref_consuming_children():
    """The reference slices the exemplar x[offset:offset+chunk] along dim
    for the child sampler (py/noise.py:1857-1864); a ref-consuming child
    must see the window, so different offsets give different draws."""
    rng = np.random.default_rng(0)
    ref = jnp.asarray(np.concatenate(
        [np.full((1, 1, 16, 16), float(c) * 2.0)
         * rng.standard_normal((1, 1, 16, 16))
         for c in range(1, 5)], axis=1).astype(np.float32))

    def out_for(offset):
        child = ModulatedNoise(noise=_gauss(), modulation_type="intensity",
                               modulation_strength=2.0, modulation_dims=2)
        item = PerDimNoise(noise=child, dim=1, chunk_size=2, offset=offset)
        fn, st = make_noise_sampler(item, SHAPE, seed=4, ref_latent=ref)
        out, _ = fn(st, jnp.asarray(1.0), jnp.asarray(0.9))
        return np.asarray(out)

    assert not np.allclose(out_for(0), out_for(2))


class _NaNItem(NoiseItem):
    """Heterogeneous-state child (unique structure forces the general
    RandomNoise path) that always emits NaN."""

    def init_state(self, ctx, key):
        return {"weird": (jnp.zeros((2,)), jnp.asarray(0, jnp.int32))}

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        nxt = {"weird": (state["weird"][0], state["weird"][1] + 1)}
        return jnp.full(ctx.shape, jnp.nan, ctx.dtype), nxt


def test_random_noise_masks_out_unchosen_nan_and_state():
    item = RandomNoise(noise=[_gauss(), _NaNItem()], mix_count=1)
    fn, st = make_noise_sampler(item, SHAPE, seed=5)
    gaussian_seen = nan_state_frozen_seen = False
    for _ in range(12):
        out, st2 = fn(st, jnp.asarray(1.0), jnp.asarray(0.9))
        finite = bool(jnp.isfinite(out).all())
        counter_before = int(st["node"][1]["weird"][1])
        counter_after = int(st2["node"][1]["weird"][1])
        if finite:
            gaussian_seen = True
            # gaussian chosen -> the NaN child neither poisons the sum
            # nor advances its state
            assert counter_after == counter_before
            nan_state_frozen_seen = True
        st = st2
    assert gaussian_seen and nan_state_frozen_seen


def test_channel_mixer_identity_skipped_and_cached():
    from sonar_tpu.noise.power import build_channel_mixer

    assert build_channel_mixer(4, None, "1,1,1,1,1,1") is None
    assert build_channel_mixer(4, 0.0, "1,1,1,1,1,1") is None  # identity
    m = build_channel_mixer(4, 0.5, "1,1,1,1,1,1")
    assert m is not None and m.shape == (4, 4)
    assert build_channel_mixer(4, 0.5, [1, 1, 1, 1, 1, 1]) is m  # cached


def test_time_brownian_requires_both_sigmas():
    from sonar_tpu.noise.power import PowerNoiseItem

    item = PowerNoiseItem(time_brownian=True)
    with pytest.raises(ValueError, match="stochastic"):
        make_noise_sampler(item, SHAPE, seed=0, sigma_min=0.03,
                           sigma_max=None)
