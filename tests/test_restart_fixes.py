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


def _model(x, sigma_b, **kw):
    s = sigma_b.reshape((-1,) + (1,) * (x.ndim - 1))
    return x / (1.0 + s**2)


def _recording_inner(runs, seeds=None):
    from sonar_tpu.samplers.sonar import sample_sonar_euler

    def inner(model, x, sigmas, *, seed=None, **kw):
        runs.append(np.asarray(sigmas))
        if seeds is not None:
            seeds.append(np.asarray(jax.random.key_data(seed)).tobytes())
        return sample_sonar_euler(model, x, sigmas, seed=seed, **kw)

    return inner


def test_crossed_segments_execute_in_schedule_order():
    """Segments must be walked by descending t_min: with crossed windows
    [(5,6), (2,7)] the 6-top restart fires at the 5-crossing BEFORE the
    base pass descends past 2."""
    sigmas = np.asarray([14.6, 10.0, 7.0, 4.5, 3.0, 1.5, 0.7, 0.3, 0.0],
                        np.float32)
    runs = []
    x = jnp.zeros((1, 4, 8, 8))
    sample_restart(_model, x, sigmas, inner_sampler=_recording_inner(runs),
                   segments=[RestartSegment(t_min=5.0, t_max=6.0, n=2, k=1),
                             RestartSegment(t_min=2.0, t_max=7.0, n=2, k=1)],
                   seed=0)
    # expected walk: base down to the first sigma <= 5 (4.5), one restart
    # 6 -> 4.5, base down to the first sigma <= 2 (1.5), one restart
    # 7 -> 1.5, tail to 0
    tops = [float(r[0]) for r in runs]
    ends = [float(r[-1]) for r in runs]
    assert np.isclose(tops[1], 6.0) and np.isclose(ends[1], 4.5), runs
    assert np.isclose(tops[3], 7.0) and np.isclose(ends[3], 1.5), runs
    assert ends[-1] == 0.0


def test_extra_args_seed_does_not_collapse_repeat_streams():
    """A user seed in extra_args must become the base seed, not override
    the derived per-inner-call seeds."""
    sigmas = np.asarray([14.6, 7.0, 3.0, 1.0, 0.3, 0.0], np.float32)
    x = jnp.zeros((1, 4, 8, 8))
    runs, seeds = [], []
    out_a = sample_restart(
        _model, x, sigmas, inner_sampler=_recording_inner(runs, seeds),
        segments=[RestartSegment(t_min=2.0, t_max=5.0, n=2, k=3)],
        extra_args={"seed": 42})
    assert len(set(seeds)) == len(seeds), "inner seeds must be distinct"
    out_b = sample_restart(
        _model, x, sigmas, inner_sampler=_recording_inner([], []),
        segments=[RestartSegment(t_min=2.0, t_max=5.0, n=2, k=3)],
        extra_args={"seed": 43})
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b)), \
        "the user seed must still steer the run"


def test_t_min_on_trailing_zero_keeps_final_step():
    """A segment whose t_min only crosses at the trailing 0.0 must not
    consume the final denoise step."""
    sigmas = np.asarray([14.6, 7.0, 3.0, 1.0, 0.3, 0.03, 0.0], np.float32)
    runs = []
    x = jnp.zeros((1, 4, 8, 8))
    sample_restart(_model, x, sigmas, inner_sampler=_recording_inner(runs),
                   segments=[RestartSegment(t_min=0.01, t_max=2.0, n=2, k=2)],
                   seed=0)
    # no sigma (other than the trailing 0.0) is <= 0.01 -> segment skipped,
    # one uninterrupted run ending at 0
    assert len(runs) == 1
    assert float(runs[0][-1]) == 0.0


def test_never_firing_segment_warns():
    """A user-configured segment that never fires must WARN, not silently
    behave like a plain run (review r3: silent no-op of an explicit
    feature)."""
    import warnings

    sigmas = np.asarray([14.6, 7.0, 3.0, 1.0, 0.3, 0.03, 0.0], np.float32)
    runs = []
    x = jnp.zeros((1, 4, 8, 8))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        sample_restart(_model, x, sigmas,
                       inner_sampler=_recording_inner(runs),
                       segments=[RestartSegment(t_min=0.01, t_max=2.0,
                                                n=2, k=2)],
                       seed=0)
    assert any("never" in str(w.message) and "restart segment" in
               str(w.message) for w in rec), [str(w.message) for w in rec]
