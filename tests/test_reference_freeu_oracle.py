"""Live-reference oracle for the FreeU-Extreme *node machinery*
(reference: py/nodes/freeu_extreme.py:170-334) — config-chain collection
and degenerate filtering, stage resolution from channel counts, pct
window matching with `final` short-circuit semantics (incl. the subtle
case: an out-of-window `final` config must NOT stop the scan), config
stacking, hidden-mean (v2) scaling, channel slicing, blend modes, and
backbone/skip targeting on output blocks.

The reference node's go() runs against a faithful ModelPatcher stub; the
captured input/middle/output patches are driven with synthetic
activations and compared against our make_freeu_patches block patches on
identical inputs (NHWC<->NCHW transposed). Both sides share model
sampling numerics (our DiscreteSampling behind a torch adapter).
"""

import sys
import types

import numpy as np
import pytest

from tests._reference_loader import load_reference

ref_pkg = load_reference()
pytestmark = pytest.mark.skipif(
    ref_pkg is None, reason="reference tree not available")

if ref_pkg is not None:
    import importlib

    import torch

    ref_frux = importlib.import_module("sonar_reference.py.nodes.freeu_extreme")
    ref_pn = sys.modules["sonar_reference.py.nodes.powernoise"]

import jax.numpy as jnp

from sonar_tpu.cfg import DiscreteSampling, FreeUExtremeConfig, make_freeu_patches
from sonar_tpu.noise.power import PowerFilter

MC = 4  # model_channels: stage1=16ch, stage2=8ch, stage3=4ch


class _TorchMS:
    def __init__(self, ms):
        self._ms = ms
        self.sigma_max = torch.tensor(float(ms.sigma_max))
        self.sigma_min = torch.tensor(float(ms.sigma_min))

    def timestep(self, s):
        return torch.tensor(float(self._ms.timestep(jnp.asarray(float(s)))))


class _RefModelPatcher:
    def __init__(self, ms):
        self.model = types.SimpleNamespace(
            model_config=types.SimpleNamespace(
                unet_config={"model_channels": MC}))
        self._ms = _TorchMS(ms)
        self.hooks = {}

    def clone(self):
        return self

    def get_model_object(self, name):
        assert name == "model_sampling"
        return self._ms

    def set_model_input_block_patch(self, f):
        self.hooks["input"] = f

    def set_model_patch(self, f, kind):
        assert kind == "middle_block_patch"
        self.hooks["middle"] = f

    def set_model_output_block_patch(self, f):
        self.hooks["output"] = f


def _cfg_pair(specs):
    """Build matched (reference, ours) config chains from spec dicts;
    specs[0] is the head, later entries chain via frux_config."""
    ref_chain = our_chain = None
    for spec in reversed(specs):
        spec = dict(spec)
        filt = spec.pop("with_filter", False)
        fkw = dict(alpha=0.35, min_freq=0.05, max_freq=0.45)
        ref_chain = ref_frux.FreeUExtremeConfig(
            sonar_power_filter_opt=ref_pn.PowerFilter(**fkw) if filt else None,
            frux_config_opt=ref_chain, **spec)
        our_chain = FreeUExtremeConfig(
            sonar_power_filter=PowerFilter(**fkw) if filt else None,
            frux_config=our_chain, **spec)
    return ref_chain, our_chain


_BASE = dict(target="backbone", stage_1=True, stage_2=False, stage_3=False,
             start=0.0, end=1.0, slice=1.0, slice_offset=0.0,
             filter_norm=0.8, scale=1.2, blend=1.0, blend_mode="lerp",
             hidden_mean=True, final=True)


def _run_pair(block, specs, channels, sigma=2.0, skip_channels=None):
    """Install both sides' patches and drive the `block` patch once.
    ``skip_channels`` gives hsp a different channel count than h (the
    channel-transition output-block case)."""
    ms = DiscreteSampling()
    rng = np.random.default_rng(21)
    h = rng.standard_normal((2, channels, 8, 8)).astype(np.float32)
    hsp = rng.standard_normal(
        (2, skip_channels or channels, 8, 8)).astype(np.float32)

    ref_cfg, our_cfg = _cfg_pair(specs)
    patcher = _RefModelPatcher(ms)
    (out_model,) = ref_frux.FreeUExtremeNode.go(
        model=patcher, cpu_fft=False, **{f"{block}_config": ref_cfg})
    ref_patch = patcher.hooks[block]
    toptions = {"sigmas": torch.tensor([sigma, sigma * 0.9])}
    if block == "output":
        want_h, want_hsp = ref_patch(torch.from_numpy(h.copy()),
                                     torch.from_numpy(hsp.copy()), toptions)
        want = (want_h.numpy(), want_hsp.numpy())
    else:
        want = ref_patch(torch.from_numpy(h.copy()), toptions).numpy()

    patches = make_freeu_patches(model_sampling=ms, model_channels=MC,
                                 **{f"{block}_config": our_cfg})
    ctx = {"sigma": jnp.asarray([sigma, sigma * 0.9])}
    to_nhwc = lambda a: jnp.transpose(jnp.asarray(a), (0, 2, 3, 1))
    to_nchw = lambda a: np.asarray(jnp.transpose(a, (0, 3, 1, 2)))
    if block == "output":
        got_h, got_hsp = patches["output"][0](to_nhwc(h), to_nhwc(hsp), ctx)
        got = (to_nchw(got_h), to_nchw(got_hsp))
    else:
        got = to_nchw(patches[block][0](to_nhwc(h), ctx))
    return got, want


def _pct(sigma=2.0):
    ms = DiscreteSampling()
    return float(1.0 - ms.timestep(jnp.asarray(sigma)) / 999.0)


@pytest.mark.parametrize("block,channels", [("input", MC * 4),
                                            ("middle", MC * 4),
                                            ("output", MC * 4)])
def test_basic_filtered_v2(block, channels):
    got, want = _run_pair(block, [_BASE | dict(with_filter=True)], channels)
    np.testing.assert_allclose(
        *((got[0], want[0]) if block == "output" else (got, want)),
        rtol=2e-4, atol=2e-5)
    if block == "output":
        # backbone-only config must leave the skip tensor untouched
        np.testing.assert_allclose(got[1], want[1], rtol=2e-4, atol=2e-5)


def test_final_out_of_window_does_not_shadow():
    """An out-of-pct-window `final` config earlier in the scan must not
    stop later configs (reference: check_match fails -> continue)."""
    pct = _pct()
    head = _BASE | dict(scale=1.5, final=True)
    deep_out = _BASE | dict(start=min(pct + 0.2, 0.99), end=1.0,
                            scale=3.0, final=True)
    got, want = _run_pair("input", [head, deep_out], MC * 4)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    # sanity: the head really applied — same as running the head alone
    base, _ = _run_pair("input", [head], MC * 4)
    np.testing.assert_allclose(got, base, rtol=2e-4, atol=2e-5)


def test_stacking_non_final_configs():
    a = _BASE | dict(scale=1.3, final=False, slice=0.5, hidden_mean=False)
    b = _BASE | dict(scale=0.8, final=False, slice=0.5, slice_offset=0.5,
                     with_filter=True)
    got, want = _run_pair("input", [a, b], MC * 4)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_matched_final_shadows_later_configs():
    deep_in = _BASE | dict(scale=2.0, final=True)
    head = _BASE | dict(scale=0.5, final=False)
    # iteration order is deepest-first: deep_in matches + final -> head
    # must not apply
    got, want = _run_pair("input", [head, deep_in], MC * 4)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    only_deep, _ = _run_pair("input", [_BASE | dict(scale=2.0, final=True)],
                             MC * 4)
    np.testing.assert_allclose(got, only_deep, rtol=2e-4, atol=2e-5)


def test_skip_target_on_output_block():
    skip_cfg = _BASE | dict(target="skip", scale=1.4)
    got, want = _run_pair("output", [skip_cfg], MC * 4)
    np.testing.assert_allclose(got[0], want[0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got[1], want[1], rtol=2e-4, atol=2e-5)


def test_both_target_blend_mode():
    cfg = _BASE | dict(target="both", blend=0.4, blend_mode="inject",
                       hidden_mean=False, with_filter=True)
    got, want = _run_pair("output", [cfg], MC * 4)
    np.testing.assert_allclose(got[0], want[0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got[1], want[1], rtol=2e-4, atol=2e-5)


def test_skip_stage_comes_from_backbone_channels():
    """At channel-transition output blocks the popped skip tensor has a
    different channel count than h; the reference derives the stage for
    BOTH from h's channels (freeu_extreme.py:311-313), so a stage-1
    skip-target config must apply to an hsp whose own channel count would
    resolve to stage 2."""
    skip_cfg = _BASE | dict(target="skip", scale=1.6, hidden_mean=False,
                            slice=0.5, with_filter=True)
    got, want = _run_pair("output", [skip_cfg], MC * 4, skip_channels=MC * 2)
    # the skip tensor must actually have been modified
    rng = np.random.default_rng(21)
    rng.standard_normal((2, MC * 4, 8, 8))
    hsp_orig = rng.standard_normal((2, MC * 2, 8, 8)).astype(np.float32)
    assert np.abs(want[1] - hsp_orig).max() > 1e-3
    np.testing.assert_allclose(got[0], want[0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got[1], want[1], rtol=2e-4, atol=2e-5)


def test_stage_mismatch_untouched():
    got, want = _run_pair("input", [_BASE], MC * 3)  # not a stage channel
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


@pytest.mark.parametrize("stage,channels", [(2, MC * 2), (3, MC)])
def test_other_stages(stage, channels):
    cfg = _BASE | {"stage_1": False, f"stage_{stage}": True,
                   "slice": 0.75, "with_filter": True}
    got, want = _run_pair("input", [cfg], channels)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_degenerate_chain_configs_filtered():
    head = _BASE | dict(scale=1.25)
    dead1 = _BASE | dict(blend=0.0, scale=9.0)
    dead2 = _BASE | dict(start=1.0, scale=9.0)
    got, want = _run_pair("input", [head, dead1, dead2], MC * 4)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("seed", range(6))
def test_randomized_config_fuzz(seed):
    """Seeded random configuration sweep — chains of 1-3 configs with
    randomized windows, slices, scales, blends, targets, and stages,
    driven through the output patch with mismatched h/hsp channels."""
    rng = np.random.default_rng(100 + seed)

    def rand_spec():
        return _BASE | dict(
            target=["backbone", "skip", "both"][rng.integers(3)],
            stage_1=bool(rng.integers(2)), stage_2=bool(rng.integers(2)),
            stage_3=True,  # keep at least one stage live
            start=float(rng.uniform(0.0, 0.6)),
            end=float(rng.uniform(0.6, 1.0)),
            slice=float(rng.choice([0.25, 0.5, 0.75, 1.0])),
            slice_offset=float(rng.choice([0.0, 0.25])),
            scale=float(rng.uniform(0.6, 1.6)),
            blend=float(rng.choice([0.3, 0.7, 1.0])),
            hidden_mean=bool(rng.integers(2)),
            final=bool(rng.integers(2)),
            with_filter=bool(rng.integers(2)),
        )

    specs = [rand_spec() for _ in range(int(rng.integers(1, 4)))]
    sigma = float(rng.uniform(0.1, 12.0))
    channels = int(rng.choice([MC, MC * 2, MC * 4]))
    got, want = _run_pair("output", specs, channels, sigma=sigma,
                          skip_channels=int(rng.choice([MC, MC * 2, MC * 4])))
    np.testing.assert_allclose(got[0], want[0], rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(got[1], want[1], rtol=3e-4, atol=3e-5)
