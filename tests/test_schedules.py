"""Sigma schedules (samplers/schedules.py) — the ComfyUI scheduler family
every ported workflow depends on for its BasicScheduler node."""

import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.cfg import DiscreteSampling
from sonar_tpu.samplers import SCHEDULERS, get_sigmas
from sonar_tpu.samplers.schedules import karras_ramp

MS = DiscreteSampling()


@pytest.mark.parametrize("name", sorted(SCHEDULERS))
def test_schedule_shape_and_monotonicity(name):
    sig = np.asarray(get_sigmas(name, 20, MS))
    assert sig.shape == (21,)
    assert sig[-1] == 0.0
    assert np.all(np.diff(sig[:-1]) < 0), f"{name} not strictly descending"
    assert sig[0] <= MS.sigma_max * 1.0001
    assert sig[-2] >= MS.sigma_min * 0.999


def test_karras_shares_the_ramp_core():
    # restart.py's sub-schedules and the karras scheduler now share one
    # karras_ramp helper; the scheduler is ramp + trailing 0.0
    ours = np.asarray(get_sigmas("karras", 15, MS))[:-1]
    np.testing.assert_allclose(ours, karras_ramp(15, MS.sigma_min,
                                                 MS.sigma_max), rtol=1e-5)


def test_normal_endpoints_hit_table_bounds():
    sig = np.asarray(get_sigmas("normal", 10, MS))
    assert abs(sig[0] - MS.sigma_max) / MS.sigma_max < 1e-4
    assert abs(sig[-2] - MS.sigma_min) / MS.sigma_min < 1e-3


def test_sgm_uniform_skips_final_timestep():
    normal = np.asarray(get_sigmas("normal", 10, MS))
    sgm = np.asarray(get_sigmas("sgm_uniform", 10, MS))
    assert sgm[-2] > normal[-2]  # last kept sigma is one step earlier


def test_denoise_truncates_to_schedule_tail():
    full = np.asarray(get_sigmas("karras", 40, MS))
    part = np.asarray(get_sigmas("karras", 20, MS, denoise=0.5))
    assert part.shape == (21,)
    np.testing.assert_allclose(part, full[-21:], rtol=1e-6)
    assert get_sigmas("karras", 20, MS, denoise=0.0).shape == (0,)


def test_unknown_scheduler_is_actionable():
    with pytest.raises(ValueError, match="valid:"):
        get_sigmas("nope", 10, MS)


def test_continuous_model_sampling_supported():
    from sonar_tpu.cfg import ContinuousEDM

    ms = ContinuousEDM()
    for name in ("normal", "simple", "beta"):
        sig = np.asarray(get_sigmas(name, 12, ms))
        assert sig.shape == (13,)
        assert np.all(np.diff(sig[:-1]) < 0)


def test_basic_scheduler_node_and_workflow_port():
    from sonar_tpu.api import build, port_workflow

    sig = build("BasicScheduler", scheduler="karras", steps=12, denoise=1.0)
    assert np.asarray(sig).shape == (13,)

    g = {
        "1": {"class_type": "BasicScheduler",
              "inputs": {"scheduler": "karras", "steps": 8, "denoise": 1.0,
                         "model": ["9", 0]}},
        "9": {"class_type": "CheckpointLoaderSimple", "inputs": {}},
    }
    res = port_workflow(g)
    assert not res.failed, res.summary()
    assert res.sigmas is not None
    assert np.asarray(res.sigmas).shape == (9,)


def test_custom_sampling_scheduler_nodes():
    from sonar_tpu.api import build

    for node, kw in (("KarrasScheduler", {"rho": 7.0}),
                     ("ExponentialScheduler", {}),
                     ("PolyexponentialScheduler", {"rho": 0.7})):
        sig = np.asarray(build(node, steps=10, sigma_max=10.0,
                               sigma_min=0.1, **kw))
        assert sig.shape == (11,)
        assert sig[-1] == 0.0 and np.all(np.diff(sig[:-1]) < 0)
        assert abs(sig[0] - 10.0) < 1e-4 and abs(sig[-2] - 0.1) < 1e-5


def test_kl_optimal_and_linear_quadratic():
    sig = np.asarray(get_sigmas("kl_optimal", 16, MS))
    assert sig.shape == (17,)
    assert abs(sig[0] - MS.sigma_max) < 1e-3 and sig[-1] == 0.0
    assert np.all(np.diff(sig[:-1]) < 0)

    lq = np.asarray(get_sigmas("linear_quadratic", 16, MS))
    assert lq.shape == (17,)
    assert lq[0] == 1.0 and lq[-1] == 0.0
    assert np.all(np.diff(lq) < 0)
    # linear segment has constant decrements
    d = np.diff(lq[:8])
    np.testing.assert_allclose(d, d[0], rtol=1e-3)  # fp32 rounding


def test_linear_quadratic_matches_upstream_formula():
    """ADVICE r2: the quadratic tail must be the C1-continuous upstream
    (ComfyUI/genmo linear_quadratic_schedule) polynomial, not an ad-hoc
    one — slope continuity at the linear->quadratic junction included."""
    for steps, tn, lin in [(16, 0.025, None), (30, 0.025, None),
                           (10, 0.1, 3), (7, 0.05, None)]:
        ls = steps // 2 if lin is None else lin
        schedule = [i * tn / ls for i in range(ls)]
        tnsd = ls - tn * steps
        qs = steps - ls
        qc = tnsd / (ls * qs**2)
        lc = tn / ls - 2 * tnsd / qs**2
        const = qc * ls**2
        schedule += [qc * i**2 + lc * i + const for i in range(ls, steps)]
        expect = np.asarray([1.0 - x for x in schedule] + [0.0])
        got = np.asarray(get_sigmas("linear_quadratic", steps,
                                    MS, threshold_noise=tn,
                                    linear_steps=lin))
        np.testing.assert_allclose(got, expect, atol=1e-6)


def test_beta_skips_duplicate_timesteps():
    """ADVICE r2: colliding beta.ppf indices must be deduplicated like
    upstream's ``last_t != t`` filter — no sigma_next == sigma steps."""
    for steps in (50, 100, 200):
        s = np.asarray(get_sigmas("beta", steps, MS))
        assert np.all(np.diff(s[:-1]) < 0), steps


def test_explicit_zero_sigma_min_is_honored():
    """kw.get(...) or default would silently replace a legal 0.0."""
    from sonar_tpu.cfg.model_sampling import DiscreteSampling
    from sonar_tpu.samplers.schedules import get_sigmas

    sig = np.asarray(get_sigmas("karras", 8, DiscreteSampling(),
                                sigma_min=0.0))
    # the ramp must end at the requested 0.0, not the model's ~0.029
    assert sig[-2] == 0.0
