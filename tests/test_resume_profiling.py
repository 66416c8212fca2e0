"""Checkpoint/resume + observability tests (SURVEY §5.1, §5.3-5.4)."""

import jax.numpy as jnp
import numpy as np

from sonar_tpu.samplers.sonar import (
    sample_sonar_dpmpp_sde,
    sample_sonar_euler_ancestral,
)
from sonar_tpu.utils.profiling import StepTimer, set_verbose_sink, verbose_writer


def _model(x, sigma, **kw):
    return x * 0.9


SIGMAS = jnp.asarray([14.6, 7.0, 2.0, 0.5, 0.0], jnp.float32)


def test_checkpoint_resume_bitwise_identical():
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 8, 8)),
                     jnp.float32) * 14.6
    full = sample_sonar_euler_ancestral(_model, x0, SIGMAS, seed=5)
    # checkpoint after 2 steps, resume for the rest
    _, carry = sample_sonar_euler_ancestral(
        _model, x0, SIGMAS, seed=5, stop_step=2, return_state=True)
    resumed = sample_sonar_euler_ancestral(
        _model, x0, SIGMAS, seed=5, resume_from=carry, start_step=2)
    assert float(jnp.abs(resumed - full).max()) == 0.0


def test_checkpoint_resume_dpmpp():
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal((1, 4, 8, 8)),
                     jnp.float32) * 14.6
    full = sample_sonar_dpmpp_sde(_model, x0, SIGMAS, seed=3)
    _, carry = sample_sonar_dpmpp_sde(_model, x0, SIGMAS, seed=3, stop_step=1,
                                      return_state=True)
    resumed = sample_sonar_dpmpp_sde(_model, x0, SIGMAS, seed=3,
                                     resume_from=carry, start_step=1)
    # different scan lengths compile to different fusions → tiny float drift
    assert float(jnp.abs(resumed - full).max()) < 1e-4


def test_step_timer_and_verbose_sink():
    x0 = jnp.zeros((1, 4, 8, 8))
    timer = StepTimer()
    timer.start()
    sample_sonar_euler_ancestral(_model, x0, SIGMAS, seed=0, callback=timer,
                                 method="python")
    s = timer.summary()
    assert s["steps"] == 4 and s["p50_ms"] > 0
    msgs = []
    set_verbose_sink(msgs.append)
    verbose_writer("hello")
    set_verbose_sink(print)
    assert msgs == ["hello"]
