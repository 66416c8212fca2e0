"""Extension registry + discovery (sonar_tpu.api.extensions) — the native
counterpart of the reference's integration layer (py/external.py): newly
registered blend modes / filter presets / enhance modes / noise types are
immediately usable AND immediately valid in node-parameter validation."""

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

from sonar_tpu.api import extensions
from sonar_tpu.api.nodes import build
from sonar_tpu.noise import NoiseChain, get_noise_item, make_noise_sampler


@pytest.fixture(autouse=True)
def _clean_registries():
    """Registrations are process-global; remove test entries afterwards so
    registry-parity oracles elsewhere in the suite stay exact."""
    yield
    from sonar_tpu.core.blend import BLENDING_MODES
    from sonar_tpu.core.normalize import QUANTILE_HANDLERS
    from sonar_tpu.noise import blendfilter, presets

    for reg in (BLENDING_MODES, QUANTILE_HANDLERS, blendfilter.FILTER_PRESETS,
                blendfilter.ENHANCE_HANDLERS, presets.NOISE_TYPES):
        for k in [k for k in reg if str(k).startswith("testext_")]:
            del reg[k]
    blendfilter._ENHANCE_MODES = ("none", *blendfilter.ENHANCE_HANDLERS)


def _draw(item, shape=(1, 4, 8, 8)):
    fn, st = make_noise_sampler(item, shape, seed=0, sigma_min=0.03,
                                sigma_max=14.6)
    out, _ = fn(st, jnp.asarray(1.0), jnp.asarray(0.5))
    return np.asarray(out)


def test_register_blend_mode_flows_into_validation():
    extensions.register_blend_mode("testext_half", lambda a, b, t: (a + b) * t)
    chain = build("SonarBlendedNoise",
                  custom_noise_1=NoiseChain([get_noise_item("gaussian")]),
                  custom_noise_2=NoiseChain([get_noise_item("uniform")]),
                  noise_2_percent=0.5, blend_mode="testext_half")
    assert np.isfinite(_draw(chain)).all()


def test_register_ffilter_preset():
    extensions.register_ffilter_preset("testext_band", (0.0, 1.0, 0.0))
    chain = build("SonarBlendFilterNoise",
                  sonar_custom_noise=NoiseChain([get_noise_item("gaussian")]),
                  ffilter="testext_band", ffilter_strength=1.0)
    assert np.isfinite(_draw(chain)).all()


def test_register_enhance_mode():
    extensions.register_enhance_mode(
        "testext_negate", lambda t, scale, **kw: -t * scale)
    chain = build("SonarBlendFilterNoise",
                  sonar_custom_noise=NoiseChain([get_noise_item("gaussian")]),
                  enhance_mode="testext_negate", enhance_strength=1.0)
    assert np.isfinite(_draw(chain)).all()


def test_register_quantile_strategy():
    extensions.register_quantile_strategy(
        "testext_zero", lambda noise, nq, **kw: noise * 0.0)
    chain = build("SonarQuantileFilteredNoise",
                  custom_noise=NoiseChain([get_noise_item("gaussian")]),
                  quantile=0.9, strategy="testext_zero", normalize="disabled")
    out = _draw(chain)
    assert np.allclose(out, 0.0)


def test_register_noise_type_flows_into_validation():
    from sonar_tpu.noise.generators import GaussianGenerator

    extensions.register_noise_type(
        "testext_gauss2",
        lambda factor=1.0, normalize=None, **kw: GaussianGenerator(
            factor, normalize=normalize, **kw))
    chain = build("SonarCustomNoise", noise_type="testext_gauss2")
    assert np.isfinite(_draw(chain)).all()


def test_discover_runs_init_hook_and_isolates_failures():
    calls = []
    good = types.ModuleType("testext_good_module")
    good.sonar_tpu_init = lambda ext: calls.append(ext)
    sys.modules["testext_good_module"] = good
    try:
        loaded = extensions.discover(
            ["testext_good_module", "definitely_not_installed_xyz"])
    finally:
        del sys.modules["testext_good_module"]
    assert loaded == ["testext_good_module"]
    assert calls and calls[0] is extensions
