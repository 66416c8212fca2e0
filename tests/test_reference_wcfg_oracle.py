"""Wavelet-CFG rule machinery vs the LIVE reference (VERDICT r2 weak-3).

The reference's WCFG needs pytorch_wavelets, which is uninstallable here;
what was never cross-checked is the RULE machinery — scale expansion
(per-level / per-orientation / "fill"), scheduling curves and modes,
target modes, difference/result blending, rule selection. This suite
closes that gap: the loader's `pytorch_wavelets` stub is upgraded to
faithful DWTForward/DWTInverse classes backed by THIS repo's dwt2d /
idwt2d (whose numerics are independently validated — published pywt
coefficient tables in test_kingsbury.py plus perfect reconstruction), so
both sides transform identically and any output difference isolates a
rule-machinery divergence.
"""

import math
import sys

import numpy as np
import pytest

from tests._reference_loader import load_reference

ref_pkg = load_reference()
pytestmark = pytest.mark.skipif(
    ref_pkg is None, reason="reference tree not available")

if ref_pkg is not None:
    import torch

    ref_wcfg = sys.modules["sonar_reference.py.wavelet_cfg"]

import jax.numpy as jnp

from sonar_tpu.cfg import DiscreteSampling, WaveletCFG, WCFGRules
from sonar_tpu.wavelets.dwt import dwt2d, idwt2d

SHAPE = (1, 4, 64, 64)
SIGMAS = np.asarray([14.6, 10.0, 7.0, 4.0, 2.0, 1.0, 0.5, 0.2, 0.0],
                    np.float32)


def _install_faithful_ptwav():
    import torch

    ptwav = sys.modules.get("pytorch_wavelets")
    if ptwav is None:  # pragma: no cover
        pytest.skip("loader did not stub pytorch_wavelets")

    def _t(a):
        return torch.from_numpy(np.asarray(a))

    class _DWTForward:
        def __init__(self, J=1, wave="db1", mode="zero", **_kw):
            self.J, self.wave, self.mode = J, wave, mode

        def to(self, *a, **k):
            return self

        def __call__(self, x):
            yl, yh = dwt2d(jnp.asarray(x.detach().cpu().float().numpy()),
                           self.wave, self.J, self.mode)
            return _t(yl), [_t(h) for h in yh]

    class _DWTInverse:
        def __init__(self, wave="db1", mode="zero", **_kw):
            self.wave, self.mode = wave, mode

        def to(self, *a, **k):
            return self

        def __call__(self, pair):
            yl, yh = pair
            out = idwt2d(jnp.asarray(yl.detach().cpu().float().numpy()),
                         [jnp.asarray(h.detach().cpu().float().numpy())
                          for h in yh], self.wave, self.mode)
            return _t(out)

    ptwav.DWTForward = _DWTForward
    ptwav.DWTInverse = _DWTInverse
    # the reference Wavelet class was imported before HAVE_WAVELETS could
    # matter; it resolves ptwav attributes at call time, so patching the
    # stub module is sufficient
    wf = sys.modules["sonar_reference.py.wavelet_functions"]
    wf.HAVE_WAVELETS = True


class _TorchMS:
    """Torch adapter exposing our DiscreteSampling to the reference."""

    def __init__(self, ms):
        self._ms = ms
        self.sigma_max = torch.tensor(float(ms.sigma_max))
        self.sigma_min = torch.tensor(float(ms.sigma_min))

    def timestep(self, s):
        return torch.tensor(float(self._ms.timestep(jnp.asarray(float(s)))))


class _Model:
    def __init__(self, ms):
        self.model_sampling = _TorchMS(ms)


def _tensors(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(SHAPE).astype(np.float32) * 3.0
    cond_d = x * 0.9 + rng.standard_normal(SHAPE).astype(np.float32) * 0.1
    uncond_d = x * 0.8 + rng.standard_normal(SHAPE).astype(np.float32) * 0.1
    return x, cond_d, uncond_d


def _run_reference(rule_params, sigma, seed=0):
    _install_faithful_ptwav()
    x, cond_d, uncond_d = _tensors(seed)
    ms = DiscreteSampling()
    rules = ref_wcfg.WCFGRules.build(**rule_params)
    wcfg = ref_wcfg.WaveletCFG(existing_cfg=None, rules=rules)
    args = {
        "input": torch.from_numpy(x),
        "sigma": torch.tensor([sigma]),
        "cond": torch.from_numpy(x - cond_d),
        "uncond": torch.from_numpy(x - uncond_d),
        "cond_denoised": torch.from_numpy(cond_d),
        "uncond_denoised": torch.from_numpy(uncond_d),
        "cond_scale": 7.5,
        "model": _Model(ms),
        "model_options": {"transformer_options": {
            "sample_sigmas": torch.from_numpy(SIGMAS)}},
    }
    return wcfg(args).numpy()


def _run_ours(rule_params, sigma, seed=0):
    x, cond_d, uncond_d = _tensors(seed)
    ms = DiscreteSampling()
    wcfg = WaveletCFG(rules=WCFGRules.build(**rule_params))
    out = wcfg(dict(
        input=jnp.asarray(x), sigma=jnp.asarray([sigma]),
        cond=jnp.asarray(x - cond_d), uncond=jnp.asarray(x - uncond_d),
        cond_denoised=jnp.asarray(cond_d),
        uncond_denoised=jnp.asarray(uncond_d),
        cond_scale=7.5, model_sampling=ms, sample_sigmas=SIGMAS,
    ))
    return np.asarray(out)


CONFIGS = {
    "flat": dict(wave="db4", level=3, padding_mode="periodization",
                 high_precision_mode=False,
                 diff=dict(yl_scale=8.0, yh_scales=3.0)),
    "per_level_fill": dict(
        wave="db4", level=4, padding_mode="periodization",
        high_precision_mode=False,
        diff=dict(yl_scale=8.0, yh_scales=[7.0, [6.0, 6.0, 7.0], "fill"])),
    "scheduled_half_cosine": dict(
        wave="db4", level=3, padding_mode="periodization",
        high_precision_mode=False,
        diff=dict(yl_scale=8.0, yh_scales=7.0,
                  scales_end=dict(yl_scale=6.0, yh_scales=6.0),
                  schedule="half_cosine", schedule_mode="sampling")),
    "scheduled_sigmas_mode": dict(
        wave="haar", level=3, padding_mode="periodization",
        high_precision_mode=False,
        diff=dict(yl_scale=9.0, yh_scales=2.0,
                  scales_end=dict(yl_scale=5.0, yh_scales=5.0),
                  schedule="linear", schedule_mode="sigmas")),
    "target_noise": dict(
        wave="db2", level=2, padding_mode="periodization",
        high_precision_mode=False, target_mode="noise",
        diff=dict(yl_scale=7.0, yh_scales=4.0)),
    "target_noise_norm": dict(
        wave="db2", level=2, padding_mode="periodization",
        high_precision_mode=False, target_mode="noise_norm",
        diff=dict(yl_scale=7.0, yh_scales=4.0)),
    "cond_uncond_final": dict(
        wave="db4", level=3, padding_mode="periodization",
        high_precision_mode=False,
        cond=dict(yl_scale=1.1, yh_scales=0.9),
        uncond=dict(yl_scale=0.95, yh_scales=1.05),
        diff=dict(yl_scale=7.5, yh_scales=7.5),
        final=dict(yl_scale=1.02, yh_scales=0.98)),
    "blend_with_fallback": dict(
        wave="db4", level=3, padding_mode="periodization",
        high_precision_mode=False, blend_strength=0.6,
        diff=dict(yl_scale=8.0, yh_scales=3.0)),
    "symmetric_padding": dict(
        wave="db4", level=3, padding_mode="symmetric",
        high_precision_mode=False,
        diff=dict(yl_scale=8.0, yh_scales=3.0)),
    "second_rule": dict(
        wave="db4", level=3, padding_mode="periodization",
        high_precision_mode=False, start_sigma=math.inf, end_sigma=2.0,
        diff=dict(yl_scale=8.0, yh_scales=3.0),
        rules=[dict(start_sigma=2.0, end_sigma=0.0, wave="haar", level=2,
                    padding_mode="periodization", high_precision_mode=False,
                    diff=dict(yl_scale=5.0, yh_scales=1.5))]),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_wcfg_rule_machinery_matches_reference(name):
    params = CONFIGS[name]
    for sigma in (7.0, 1.0):
        want = _run_reference(params, sigma, seed=hash(name) % 1000)
        got = _run_ours(params, sigma, seed=hash(name) % 1000)
        assert got.shape == want.shape
        scale = max(np.abs(want).max(), 1.0)
        np.testing.assert_allclose(
            got, want, atol=5e-5 * scale, rtol=2e-5,
            err_msg=f"{name} sigma={sigma}")


def test_wcfg_rule_selection_matches_reference():
    """First matching rule wins; below every window → fallback CFG."""
    params = CONFIGS["second_rule"]
    # sigma 0.1 is inside the second rule's [0, 2] window
    want = _run_reference(params, 0.1)
    got = _run_ours(params, 0.1)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=2e-5)


def test_wcfg_node_construction_matches_reference():
    """Node-level construction (SonarWaveletCFGNode.go, py/nodes/misc.py:
    846-896): YAML-over-field merge, the start_sigma=-1 -> model-max
    sentinel (converted BEFORE the YAML merge), fallback_mode wiring, and
    installation — compared functionally by driving both constructed CFG
    functions on identical args."""
    import importlib

    _install_faithful_ptwav()
    ref_misc = importlib.import_module("sonar_reference.py.nodes.misc")
    from sonar_tpu.api import build

    yaml_str = (
        "difference:\n"
        "    yl_scale: 8.0\n"
        "    yh_scales: 3.0\n"
        "wave: db4\n"
        "level: 3\n"
        "padding_mode: periodization\n"
        "high_precision_mode: false\n"
    )
    node_kw = dict(start_sigma=-1.0, end_sigma=0.0, fallback_mode="own",
                   blend_mode="lerp", blend_strength=1.0,
                   yaml_parameters=yaml_str)

    class _Patcher:
        model_options = {}

        def __init__(self):
            self.captured = {}

        def clone(self):
            return self

        def set_model_sampler_cfg_function(self, f):
            self.captured["cfg"] = f

    patcher = _Patcher()
    ref_misc.SonarWaveletCFGNode.go(model=patcher, **node_kw)
    ref_cfg = patcher.captured["cfg"]
    ours = build("SonarWaveletCFG", **node_kw)

    ms = DiscreteSampling()
    for sigma in (14.6, 7.0, 0.5):  # 14.6 exercises the -1 -> inf sentinel
        x, cond_d, uncond_d = _tensors(31)
        args = {
            "input": torch.from_numpy(x),
            "sigma": torch.tensor([sigma]),
            "cond": torch.from_numpy(x - cond_d),
            "uncond": torch.from_numpy(x - uncond_d),
            "cond_denoised": torch.from_numpy(cond_d),
            "uncond_denoised": torch.from_numpy(uncond_d),
            "cond_scale": 7.5,
            "model": _Model(ms),
            "model_options": {"transformer_options": {
                "sample_sigmas": torch.from_numpy(SIGMAS)}},
        }
        want = ref_cfg(args).numpy()
        got = np.asarray(ours(dict(
            input=jnp.asarray(x), sigma=jnp.asarray([sigma]),
            cond=jnp.asarray(x - cond_d), uncond=jnp.asarray(x - uncond_d),
            cond_denoised=jnp.asarray(cond_d),
            uncond_denoised=jnp.asarray(uncond_d),
            cond_scale=7.5, model_sampling=ms, sample_sigmas=SIGMAS,
        )))
        scale = max(np.abs(want).max(), 1.0)
        np.testing.assert_allclose(got, want, atol=5e-5 * scale, rtol=2e-5,
                                   err_msg=f"sigma={sigma}")
        # the wavelet rule must actually fire at high sigma (sentinel bug
        # regression): a live rule differs from plain CFG
        if sigma == 14.6:
            plain = x + 7.5 * (cond_d - uncond_d)
            assert np.abs(want - plain).max() > 1e-3
            assert np.abs(got - plain).max() > 1e-3


@pytest.mark.parametrize("seed", range(4))
def test_wcfg_randomized_rule_fuzz(seed):
    """Seeded random sweep over rule dimensions (wave, level, scale
    shapes, schedules, modes, targets, blends)."""
    rng = np.random.default_rng(700 + seed)
    waves = ["haar", "db2", "db4", "sym4"]
    scheds = [None, "linear", "half_cosine", "sine", "logarithmic"]
    smodes = ["sampling", "sigmas", "step"]
    yh = [
        float(rng.uniform(1.0, 8.0)),
        [float(rng.uniform(1.0, 8.0)), "fill"],
        [[float(rng.uniform(1, 8)) for _ in range(3)], "fill"],
    ][rng.integers(3)]
    diff = dict(yl_scale=float(rng.uniform(2.0, 9.0)), yh_scales=yh)
    sched = scheds[rng.integers(len(scheds))]
    if sched is not None:
        diff |= dict(
            scales_end=dict(yl_scale=float(rng.uniform(1.0, 6.0)),
                            yh_scales=float(rng.uniform(1.0, 6.0))),
            schedule=sched, schedule_mode=smodes[rng.integers(len(smodes))],
            reverse_schedule=bool(rng.integers(2)),
            schedule_offset=float(rng.uniform(-0.2, 0.2)),
            schedule_multiplier=float(rng.uniform(0.7, 1.3)))
    padding_mode = ["periodization", "symmetric"][rng.integers(2)]
    # REFERENCE BUG (not ours): with a non-size-preserving padding mode
    # and blend_strength != 1, the reference blends the still-oversized
    # wavelet result against the input-sized fallback BEFORE cropping
    # (wavelet_cfg.py:836 runs before process_output's crop at :742) and
    # crashes on the shape mismatch — with real pytorch_wavelets too.
    # Keep the fuzz inside the combinations the reference survives.
    blend_strength = (1.0 if padding_mode != "periodization"
                      else float(rng.choice([1.0, 0.7])))
    params = dict(
        wave=waves[rng.integers(len(waves))],
        level=int(rng.integers(1, 4)),
        padding_mode=padding_mode,
        high_precision_mode=False,
        target_mode=["denoised", "noise", "noise_norm"][rng.integers(3)],
        blend_strength=blend_strength,
        diff=diff)
    sigma = float(rng.uniform(0.3, 12.0))
    want = _run_reference(params, sigma, seed=seed)
    got = _run_ours(params, sigma, seed=seed)
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=5e-5 * scale, rtol=2e-5)


def test_symmetric_padding_partial_blend_works_here():
    """The reference crashes on non-size-preserving padding + partial
    blend (see the fuzz comment above); we crop the wavelet result to
    the input size before the fallback blend, so the combination works."""
    rules = WCFGRules.build(wave="db4", level=2, padding_mode="symmetric",
                            high_precision_mode=False, blend_strength=0.7,
                            diff=dict(yl_scale=8.0, yh_scales=3.0))
    w = WaveletCFG(rules=rules)
    x, cond_d, uncond_d = _tensors(41)
    out = np.asarray(w(dict(
        input=jnp.asarray(x), sigma=jnp.asarray([2.0]),
        cond=jnp.asarray(x - cond_d), uncond=jnp.asarray(x - uncond_d),
        cond_denoised=jnp.asarray(cond_d),
        uncond_denoised=jnp.asarray(uncond_d),
        cond_scale=7.5, model_sampling=DiscreteSampling(),
        sample_sigmas=SIGMAS)))
    assert out.shape == x.shape and np.isfinite(out).all()
