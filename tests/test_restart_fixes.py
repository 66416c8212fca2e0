"""Restart-sampler correctness: per-call seed derivation, strictly
descending restart schedules (no degenerate duplicated t_min step)."""

import jax
import jax.numpy as jnp
import numpy as np

from sonar_tpu.samplers.restart import (
    RestartSegment,
    restart_schedule,
    sample_restart,
)


def test_restart_schedule_strictly_descending():
    for n in (1, 2, 4, 8):
        sched = restart_schedule(n, 0.5, 3.0)
        assert sched.shape == (n + 1,)
        assert np.all(np.diff(sched) < 0), sched
        assert sched[0] == np.float32(3.0)
        assert np.isclose(sched[-1], 0.5)


def test_restart_inner_seeds_distinct():
    seen = []

    def fake_inner(model, x, sigmas, *, seed=None, **kw):
        seen.append(np.asarray(jax.random.key_data(seed)).tobytes())
        return x

    def model(x, sigma, **kw):
        return x * 0.9

    x = jnp.zeros((1, 4, 8, 8))
    sigmas = jnp.asarray([10.0, 5.0, 2.0, 1.0, 0.5, 0.0], jnp.float32)
    segs = (RestartSegment(t_min=1.0, t_max=4.0, n=2, k=2),)
    sample_restart(model, x, sigmas, segments=segs, inner_sampler=fake_inner,
                   seed=13)
    # base segment + 2 repeats + tail = 4 inner calls, all distinct seeds
    assert len(seen) == 4
    assert len(set(seen)) == 4


def test_restart_runs_end_to_end():
    def model(x, sigma, **kw):
        return x * 0.9

    x = jax.random.normal(jax.random.key(0), (1, 4, 8, 8)) * 10.0
    sigmas = jnp.asarray([10.0, 5.0, 2.0, 1.0, 0.5, 0.0], jnp.float32)
    out = sample_restart(model, x, sigmas, seed=3)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
