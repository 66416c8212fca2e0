"""Live-reference oracle for the SonarApplyLatentOperationCFG *machinery*
(reference: py/nodes/latent_operations.py:120-313) — the seven application
modes, pred_flip round trip, blend_scale_mode time curves, immediate vs
final blending, uncond-missing degradation, and the sigma enable window.

Technique (CLAUDE.md round-3): drive the reference node's ``go()`` with a
faithful ComfyUI ModelPatcher stub, capture the patch it installs, call it
with synthetic torch args, and compare against our
``api.guider.make_latent_op_cfg_function`` patch on identical jnp args.
Both sides share the same model_sampling numerics (our DiscreteSampling
behind a torch adapter), so the comparison isolates the node machinery.
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

    ref_lonodes = importlib.import_module(
        "sonar_reference.py.nodes.latent_operations")
    ref_lo = sys.modules["sonar_reference.py.latent_ops"]

import jax.numpy as jnp

from sonar_tpu.api.guider import make_latent_op_cfg_function
from sonar_tpu.cfg import DiscreteSampling
from sonar_tpu.cfg.latent_ops import SonarLatentOperationAdvanced

SHAPE = (2, 4, 8, 8)


class _TorchMS:
    """Torch adapter over our DiscreteSampling (shared numerics)."""

    def __init__(self, ms):
        self._ms = ms
        self.sigma_max = torch.tensor(float(ms.sigma_max))
        self.sigma_min = torch.tensor(float(ms.sigma_min))

    def timestep(self, s):
        return torch.tensor(float(self._ms.timestep(jnp.asarray(float(s)))))


class _RefModelPatcher:
    """Just enough ComfyUI ModelPatcher for go(): clone + model_sampling +
    the three patch installers (latent_operations.py:186-313)."""

    def __init__(self, ms):
        self.model = types.SimpleNamespace(model_sampling=_TorchMS(ms))
        self.hooks = {}

    def clone(self):
        return self

    def get_model_object(self, name):
        assert name == "model_sampling"
        return self.model.model_sampling

    def set_model_sampler_post_cfg_function(self, f):
        self.hooks["post_cfg"] = f

    def set_model_sampler_pre_cfg_function(self, f):
        self.hooks["pre_cfg"] = f

    def set_model_unet_function_wrapper(self, f):
        self.hooks["model_input"] = f


def _tensors(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(SHAPE).astype(np.float32) * 3.0
    cond_d = (x * 0.9 + rng.standard_normal(SHAPE).astype(np.float32) * 0.1)
    uncond_d = (x * 0.8 + rng.standard_normal(SHAPE).astype(np.float32) * 0.1)
    return x, cond_d, uncond_d


def _plain_op(scale, shift=0.0):
    return lambda latent=None, **kw: latent * scale + shift


_ADV_KW = dict(blend_mode="lerp", blend_strength=0.6, input_multiplier=1.2,
               output_multiplier=1.5, difference_multiplier=0.8)


def _ops_pair(kind):
    """(reference_ops, our_ops) matched operation lists."""
    if kind == "plain":
        return (_plain_op(2.0, -0.5),), (_plain_op(2.0, -0.5),)
    if kind == "two":
        ops = (_plain_op(2.0), _plain_op(0.5, 1.0))
        return ops, ops
    if kind == "advanced":
        ref = ref_lo.SonarLatentOperationAdvanced(
            ops=(_plain_op(2.0),), op_alt=None, **_ADV_KW)
        ours = SonarLatentOperationAdvanced(ops=(_plain_op(2.0),), **_ADV_KW)
        return (ref,), (ours,)
    raise ValueError(kind)


CASES = {
    # mode machinery across the hook spectrum
    "post_denoised_revsamp": dict(
        mode="denoised", blend_scale_mode="reverse_sampling", sigma=2.0),
    "post_sub_uncond_predflip_range": dict(
        mode="denoised_sub_uncond", pred_flip_mode=True,
        blend_scale_mode="enabled_range", sigma=1.5),
    "post_sub_uncond_sin_immediate_two_ops": dict(
        mode="denoised_sub_uncond", blend_scale_mode="sampling_sin",
        immediate_blend=True, ops_kind="two", sigma=3.0),
    "post_out_of_window": dict(
        mode="denoised", sigma=12.0, start_sigma=5.0, end_sigma=0.5),
    "post_sub_uncond_no_uncond_disabled": dict(
        mode="denoised_sub_uncond", sigma=2.0, drop_uncond=True),
    "post_offset_clamp": dict(
        mode="denoised", blend_scale_mode="sampling",
        blend_scale_offset=0.4, blend_scale_min=0.2, blend_scale_max=0.7,
        sigma=2.0),
    "post_batch_sigma_predflip": dict(
        mode="denoised", pred_flip_mode=True, batch_sigma=True, sigma=2.0),
    "post_advanced_op": dict(
        mode="denoised_sub_uncond", ops_kind="advanced", sigma=2.0),
    "pre_cond_sub_uncond_revrange": dict(
        mode="cond_sub_uncond", blend_scale_mode="reverse_enabled_range",
        sigma=2.5),
    "pre_uncond_sub_cond": dict(mode="uncond_sub_cond", sigma=2.0),
    "pre_cond_sub_uncond_degrades": dict(
        mode="cond_sub_uncond", sigma=2.0, drop_uncond=True),
    "pre_uncond_require": dict(
        mode="uncond", require_uncond=True, sigma=2.0),
    "pre_cond_require_missing_uncond": dict(
        mode="cond", require_uncond=True, sigma=2.0, drop_uncond=True),
    "pre_range_sin": dict(
        mode="cond_sub_uncond", blend_scale_mode="enabled_range_sin",
        sigma=1.0),
    "model_input_wrapper": dict(mode="model_input", sigma=2.0),
}

_DEFAULTS = dict(pred_flip_mode=False, require_uncond=False,
                 start_sigma=8.0, end_sigma=0.2, blend_mode="lerp",
                 blend_strength=0.7, blend_scale_mode="none",
                 blend_scale_offset=0.0, blend_scale_min=0.0,
                 blend_scale_max=1.0, immediate_blend=False)


@pytest.mark.parametrize("case", sorted(CASES), ids=sorted(CASES))
def test_apply_latent_op_cfg_oracle(case):
    cfg = CASES[case]
    sigma = cfg["sigma"]
    drop_uncond = cfg.get("drop_uncond", False)
    batch_sigma = cfg.get("batch_sigma", False)
    ops_kind = cfg.get("ops_kind", "plain")
    kw = _DEFAULTS | {k: v for k, v in cfg.items()
                      if k not in {"sigma", "drop_uncond", "batch_sigma",
                                   "ops_kind"}}
    ms = DiscreteSampling()
    x, cond_d, uncond_d = _tensors(seed=3)
    ref_ops, our_ops = _ops_pair(ops_kind)
    sig_vals = [sigma, sigma * 0.75] if batch_sigma else [sigma]

    # --- reference side: go() installs the patch on the stubbed patcher
    patcher = _RefModelPatcher(ms)
    op_slots = {f"operation_{i + 1}": op for i, op in enumerate(ref_ops)}
    (out_model,) = ref_lonodes.SonarApplyLatentOperationCFG.go(
        model=patcher, **kw, **op_slots)
    assert len(patcher.hooks) == 1
    (hook_kind, ref_patch), = patcher.hooks.items()
    sigma_t = torch.tensor(sig_vals, dtype=torch.float32)
    targs = {
        "input": torch.from_numpy(x.copy()),
        "sigma": sigma_t,
        "model": patcher.model,
        "cond_scale": 7.5,
    }
    if hook_kind == "post_cfg":
        targs["denoised"] = torch.from_numpy(cond_d.copy())
        targs["uncond_denoised"] = (
            None if drop_uncond else torch.from_numpy(uncond_d.copy()))
        want = ref_patch(targs).numpy()
    elif hook_kind == "pre_cfg":
        conds = [torch.from_numpy(cond_d.copy())]
        if not drop_uncond:
            conds.append(torch.from_numpy(uncond_d.copy()))
        targs["conds_out"] = conds
        want = np.stack([t.numpy() for t in ref_patch(targs)])
    else:  # model_input unet wrapper: patch(x) feeds apply_model
        seen = {}

        def apply_model(xin, timestep, **c):
            seen["x"] = xin
            return xin

        ref_patch(apply_model,
                  {"input": targs["input"], "timestep": sigma_t, "c": {}})
        want = seen["x"].numpy()

    # --- our side: identical args as jnp
    our_patch, our_hook = make_latent_op_cfg_function(
        operations=our_ops, model_sampling=ms, **kw)
    assert our_hook == hook_kind
    jargs = {
        "input": jnp.asarray(x),
        "sigma": jnp.asarray(sig_vals, jnp.float32),
        "model_sampling": ms,
        "cond_scale": 7.5,
    }
    if hook_kind == "post_cfg":
        jargs["denoised"] = jnp.asarray(cond_d)
        jargs["uncond_denoised"] = None if drop_uncond else jnp.asarray(uncond_d)
        got = np.asarray(our_patch(jargs))
    elif hook_kind == "pre_cfg":
        jconds = [jnp.asarray(cond_d)]
        if not drop_uncond:
            jconds.append(jnp.asarray(uncond_d))
        jargs["conds_out"] = jconds
        got = np.stack([np.asarray(t) for t in our_patch(jargs)])
    else:
        got = np.asarray(our_patch(jargs))

    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-6,
                               err_msg=f"{case} ({hook_kind})")


def test_model_input_mode_rejects_bad_flags():
    for bad in (dict(require_uncond=True), dict(pred_flip_mode=True)):
        kw = _DEFAULTS | dict(mode="model_input") | bad
        with pytest.raises(ValueError):
            make_latent_op_cfg_function(operations=(_plain_op(2.0),),
                                        model_sampling=DiscreteSampling(),
                                        **kw)
        with pytest.raises(ValueError):
            ref_lonodes.SonarApplyLatentOperationCFG.go(
                model=_RefModelPatcher(DiscreteSampling()),
                operation_1=_plain_op(2.0), **kw)


@pytest.mark.parametrize("seed", range(6))
def test_randomized_config_fuzz(seed):
    """Seeded random sweep over modes, curves, clamps, flags."""
    rng = np.random.default_rng(400 + seed)
    modes = ["cond_sub_uncond", "denoised_sub_uncond", "denoised", "cond",
             "uncond", "uncond_sub_cond"]
    curves = ["none", "sampling", "reverse_sampling", "enabled_range",
              "reverse_enabled_range", "sampling_sin", "enabled_range_sin"]
    mode = modes[rng.integers(len(modes))]
    kw = _DEFAULTS | dict(
        mode=mode,
        pred_flip_mode=bool(rng.integers(2)) and mode.endswith("_sub_uncond"),
        blend_scale_mode=curves[rng.integers(len(curves))],
        blend_strength=float(rng.uniform(0.1, 1.0)),
        blend_scale_offset=float(rng.uniform(-0.3, 0.3)),
        blend_scale_min=float(rng.uniform(0.0, 0.3)),
        blend_scale_max=float(rng.uniform(0.5, 1.0)),
        immediate_blend=bool(rng.integers(2)),
        start_sigma=float(rng.uniform(3.0, 15.0)),
        end_sigma=float(rng.uniform(0.0, 1.0)),
    )
    case_key = f"fuzz{seed}"
    CASES[case_key] = kw | dict(
        sigma=float(rng.uniform(0.1, 14.0)),
        ops_kind=["plain", "two", "advanced"][rng.integers(3)])
    try:
        test_apply_latent_op_cfg_oracle(case_key)
    finally:
        del CASES[case_key]
