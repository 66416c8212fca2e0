"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests run the standard JAX way without a TPU pod (SURVEY §4e)."""

import os

# Force CPU: the harness environment pre-sets JAX_PLATFORMS to the TPU
# tunnel platform (and a sitecustomize force-registers it before conftest
# runs), so both the env var AND the jax config must be overridden — tests
# run on the virtual 8-device CPU mesh, never on the (serialized,
# single-chip) tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


# ---------------------------------------------------------------------------
# fast/slow lanes (VERDICT r3 item 6). The full suite takes ~40 min on this
# 1-vCPU box; anything budgeting by the old "~6 min" note kills it mid-run.
# Default lane: `pytest tests/ -q` — correctness/unit/oracle-light tests.
# Full lane:    `pytest tests/ -q --runslow` — adds the live-torch reference
# oracles, subprocess-heavy harness tests, doc execution, and the heavy
# statistics suites. Both lanes must stay green.
# ---------------------------------------------------------------------------

# Module-level classification from a measured full run (--durations=40,
# 2026-08-19): the slow lane is dominated by live-reference torch oracles,
# subprocess children, executed docs, and compile-heavy sweeps.
SLOW_MODULES = {
    "test_bench_harness",        # bench subprocess children
    "test_dit",                  # pp/tp shard_map compiles (~4 min)
    "test_dtcwt",                # multi-level transforms
    "test_kingsbury",            # bank PR sweeps
    "test_noise_generators",     # statistics sweeps
    "test_sharding",             # 8-device mesh compiles
    "test_distro_stats",         # statistics sweeps
    "test_doc_snippets",         # executes every doc code block
    "test_golden_trajectories",
    "test_flow_models",
    "test_flops",                # XLA cost_analysis compiles
    "test_noise_zoo2",
    "test_resume_profiling",
    "test_train",                # remat/mixed-precision/orbax
    "test_video_5d",             # every node at 5D
    "test_workflow_port",        # 102-workflow corpus
    # live-torch reference oracle suites
    "test_momentum_oracle",
    "test_reference_cfg_oracle",
    "test_reference_combinator_oracle",
    "test_reference_combinator_oracle2",
    "test_reference_comfynoise_oracle",
    "test_reference_freeu_oracle",
    "test_reference_latentop_cfg_oracle",
    "test_reference_noise_stats_oracle",
    "test_reference_noiseimage_oracle",
    "test_reference_noisylatent_oracle",
    "test_reference_oracle",
    "test_reference_sampler_oracle",
    "test_reference_scatternet_oracle",
    "test_reference_tree_fuzz_oracle",
    "test_reference_waveletfilter_oracle",
    "test_reference_wcfg_oracle",
}


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run the slow lane (full suite)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow lane: pass --runslow")
    for item in items:
        mod = item.fspath.purebasename
        if mod in SLOW_MODULES or item.get_closest_marker("slow"):
            item.add_marker(skip)
