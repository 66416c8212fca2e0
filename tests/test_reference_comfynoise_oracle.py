"""Live-reference oracle for the CustomNOISE adapter machinery (reference:
py/nodes/misc.py:360-419) — the ComfyUI NOISE-protocol bridge: batch_index
remapping with per-unique-index seeds (seed+idx), latent-slice wrapping
(idx % batch_size), skipped indices that still advance the seed sequence,
inverse-order gathering, the multiplier==0 zeros shortcut, and the
normalize flag reaching the noise-sampler build.

Both sides draw noise as a pure function of (shape, seed) via stubs —
reference: a custom-noise chain stub; ours: a monkeypatched
make_noise_sampler — so the comparison isolates the adapter machinery.
"""

import sys

import numpy as np
import pytest

from tests._reference_loader import load_reference

ref_pkg = load_reference()
pytestmark = pytest.mark.skipif(
    ref_pkg is None, reason="reference tree not available")

if ref_pkg is not None:
    import importlib

    import torch

    ref_misc = importlib.import_module("sonar_reference.py.nodes.misc")

import jax.numpy as jnp

import sonar_tpu.noise.base as noise_base
from sonar_tpu.api.nodes import build

SHAPE = (2, 4, 8, 8)


def _noise_for(shape, seed):
    return (np.random.default_rng(1000 + seed)
            .standard_normal(shape).astype(np.float32))


class _RefSeedNoise:
    """Reference-side custom_noise chain stub: noise = f(shape, seed)."""

    def __init__(self, log):
        self.log = log

    def make_noise_sampler(self, x, sigma_min, sigma_max, *, seed, cpu,
                           normalized):
        self.log.append((tuple(x.shape), seed, normalized))
        arr = _noise_for(tuple(x.shape), seed)
        return lambda s, sn: torch.from_numpy(arr)


def _patch_ours(monkeypatch, log):
    def fake_mns(item, shape, *, dtype=jnp.float32, sigma_min=None,
                 sigma_max=None, seed=None, normalized=True, ref_latent=None):
        log.append((tuple(shape), seed, normalized))
        arr = jnp.asarray(_noise_for(tuple(shape), seed))
        return (lambda state, s, sn: (arr, state)), ()

    monkeypatch.setattr(noise_base, "make_noise_sampler", fake_mns)


CASES = {
    "no_batch_index": dict(batch_index=None),
    "simple_batch_index": dict(batch_index=[0, 0, 1]),
    "skipped_index_advances_seed": dict(batch_index=[2, 0, 2]),
    "wrapping_slices": dict(batch_index=[3, 1]),
    "multiplier": dict(batch_index=[0, 1], multiplier=2.5),
    "multiplier_zero": dict(batch_index=None, multiplier=0.0),
    "no_normalize": dict(batch_index=None, normalize=False),
}


@pytest.mark.parametrize("case", sorted(CASES), ids=sorted(CASES))
def test_comfy_noise_adapter_oracle(case, monkeypatch):
    cfg = CASES[case]
    batch_index = cfg.get("batch_index")
    kw = dict(seed=17, multiplier=cfg.get("multiplier", 1.0),
              normalize=cfg.get("normalize", True))
    latent = np.random.default_rng(5).standard_normal(SHAPE).astype(np.float32)

    ref_log, our_log = [], []
    ref_noise = ref_misc.CustomNOISE(_RefSeedNoise(ref_log), kw["seed"],
                                     normalize=kw["normalize"],
                                     multiplier=kw["multiplier"])
    ref_in = {"samples": torch.from_numpy(latent.copy())}
    if batch_index is not None:
        ref_in["batch_index"] = batch_index
    want = ref_noise.generate_noise(ref_in).numpy()

    _patch_ours(monkeypatch, our_log)
    # the chain input only gets cloned; a trivial gaussian item suffices
    chain = build("SonarCustomNoise", factor=1.0, noise_type="gaussian")
    ours = build("SonarToComfyNOISE", sonar_custom_noise=chain, **kw)
    our_in = {"samples": jnp.asarray(latent)}
    if batch_index is not None:
        our_in["batch_index"] = batch_index
    got = np.asarray(ours.generate_noise(our_in))

    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-7, err_msg=case)
    # the reference generates-and-discards absent indices (its draws
    # advance torch's global RNG); our explicit seed+idx draws let us skip
    # them bit-identically, so our call sequence must equal the reference's
    # restricted to the kept (unique) indices
    if batch_index is None:
        expected = ref_log
    else:
        kept_seeds = {kw["seed"] + int(i) for i in np.unique(batch_index)}
        expected = [e for e in ref_log if e[1] in kept_seeds]
    assert our_log == expected, case
