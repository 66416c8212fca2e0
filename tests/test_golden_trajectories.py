"""Pinned golden trajectories (SURVEY §4c): fixed-seed runs of each sampler
with a deterministic stub denoiser, pinned to committed fixtures so numeric
refactors can't silently change results.

Regenerate (only when an intentional numeric change lands):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python tests/test_golden_trajectories.py --regen
"""

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.samplers import (
    SonarConfig,
    sample_sonar_dpmpp_sde,
    sample_sonar_euler,
    sample_sonar_euler_ancestral,
)

DATA = pathlib.Path(__file__).parent / "data" / "golden_trajectories.npz"
SHAPE = (1, 4, 8, 8)


def _model(x, sigma_batch, **_kw):
    s = jnp.reshape(sigma_batch, (-1,) + (1,) * (x.ndim - 1))
    target = jnp.arange(np.prod(SHAPE), dtype=jnp.float32).reshape(SHAPE) / 100.0
    return (x * 0.9 + target) / (1.0 + s * 0.05)


def _sigmas():
    ramp = np.linspace(0, 1, 8)
    s = (10.0 ** (1 / 7.0) + ramp * (0.1 ** (1 / 7.0) - 10.0 ** (1 / 7.0))) ** 7.0
    return jnp.asarray(np.concatenate([s, [0.0]]), jnp.float32)


def _x0():
    rng = np.random.default_rng(123)
    return jnp.asarray(rng.standard_normal(SHAPE) * 10.0, jnp.float32)


def _run_all() -> dict:
    sigmas, x0 = _sigmas(), _x0()
    cfg = SonarConfig(momentum=0.85, momentum_hist=0.7, direction=1.0)
    return {
        "euler": np.asarray(
            sample_sonar_euler(_model, x0, sigmas, sonar_config=cfg)),
        "euler_ancestral": np.asarray(
            sample_sonar_euler_ancestral(_model, x0, sigmas, sonar_config=cfg,
                                         seed=77)),
        "dpmpp_sde": np.asarray(
            sample_sonar_dpmpp_sde(_model, x0, sigmas, sonar_config=cfg, seed=77)),
    }


@pytest.mark.skipif(not DATA.exists(), reason="golden fixtures not generated")
@pytest.mark.parametrize("name", ["euler", "euler_ancestral", "dpmpp_sde"])
def test_golden_trajectory(name):
    got = _run_all()[name]
    want = np.load(DATA)[name]
    assert np.abs(got - want).max() < 5e-4, (
        f"{name} trajectory drifted from the pinned golden — if intentional, "
        f"regenerate with --regen and note it in the commit message"
    )


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        DATA.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(DATA, **_run_all())
        print(f"wrote {DATA}")
