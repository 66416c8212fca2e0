"""Round-3 combinator-oracle extension: the wrappers round 2 left
without a live-reference cross-check — BlendedNoise (scalar + mask
blends), GuidedNoise (linear and euler guidance toward a reference
latent), ModulatedNoise (all three modulation types), and ResizedNoise
(crop anchors, offsets, up/downscale strategies). Same technique as
test_reference_combinator_oracle: identical injected child streams on
both sides, so outputs must match numerically."""

import numpy as np
import pytest

from tests._reference_loader import load_reference
from tests.test_reference_combinator_oracle import (
    SHAPE,
    _check,
    _pair,
    _stream,
)

ref_pkg = load_reference()
pytestmark = pytest.mark.skipif(
    ref_pkg is None, reason="reference tree not available")

if ref_pkg is not None:
    import sys

    import torch

    ref_noise = sys.modules["sonar_reference.py.noise"]
    ref_utils = sys.modules["sonar_reference.py.utils"]

    from tests.test_reference_combinator_oracle import (
        OurStreamItem,
        RefStreamItem,
    )

import jax.numpy as jnp

from sonar_tpu.noise import (
    BlendedNoise,
    GuidedNoise,
    ModulatedNoise,
    NoiseChain,
    ResizedNoise,
)


def test_blended_scalar_oracle():
    (r1, o1), (r2, o2) = _pair(20), _pair(21)
    ref = ref_noise.BlendedNoise(
        1.0, blend_function=torch.lerp, normalize=None,
        custom_noise_1=ref_noise.CustomNoiseChain([r1]),
        custom_noise_2=ref_noise.CustomNoiseChain([r2]),
        noise_2_percent=0.3)
    ours = BlendedNoise(
        1.0, blend_function="lerp",
        custom_noise_1=NoiseChain([o1]), custom_noise_2=NoiseChain([o2]),
        noise_2_percent=0.3)
    _check(ref, ours)


def test_blended_mask_oracle():
    (r1, o1), (r2, o2), (rm, om) = _pair(22), _pair(23), _pair(24)
    ref = ref_noise.BlendedNoise(
        1.0, blend_function=torch.lerp, normalize=None,
        custom_noise_1=ref_noise.CustomNoiseChain([r1]),
        custom_noise_2=ref_noise.CustomNoiseChain([r2]),
        custom_noise_mask=ref_noise.CustomNoiseChain([rm]),
        noise_2_percent=0.2)
    ours = BlendedNoise(
        1.0, blend_function="lerp",
        custom_noise_1=NoiseChain([o1]), custom_noise_2=NoiseChain([o2]),
        custom_noise_mask=NoiseChain([om]), noise_2_percent=0.2)
    _check(ref, ours)


@pytest.mark.parametrize("method", ["linear", "euler"])
def test_guided_oracle(method):
    ra, oa = _pair(25)
    ref_latent = _stream(1, 26)[0]
    ref = ref_noise.GuidedNoise(
        1.0, guidance_factor=0.4, method=method,
        ref_latent=torch.from_numpy(ref_latent.copy()),
        noise=ref_noise.CustomNoiseChain([ra]),
        normalize_noise=None, normalize_result=None)
    ours = GuidedNoise(
        1.0, guidance_factor=0.4, method=method,
        ref_latent=jnp.asarray(ref_latent), noise=NoiseChain([oa]))
    _check(ref, ours)


@pytest.mark.parametrize("mtype", ["intensity", "frequency",
                                   "spectral_signum"])
def test_modulated_oracle(mtype):
    # the reference's frequency/spectral paths hit a torch expand error
    # for batch > 1 latents (flatten(1)-quantile reshaped (B,1,1) cannot
    # expand to (B,C,H,W)) — oracle those at batch 1
    shape = SHAPE if mtype == "intensity" else (1,) + SHAPE[1:]
    dims = 3 if mtype == "intensity" else 2
    s = _stream(7, 30, shape=shape)
    ra, oa = (RefStreamItem(1.0, stream=s), OurStreamItem(1.0, stream=s))
    ref_latent = _stream(1, 31, shape=shape)[0]
    kw = dict(modulation_type=mtype, modulation_strength=1.5,
              modulation_dims=dims)
    ref = ref_noise.ModulatedNoise(
        1.0, noise=ref_noise.CustomNoiseChain([ra]),
        ref_latent_opt=torch.from_numpy(ref_latent.copy()),
        normalize_result=None, normalize_noise=None, normalize_ref=True,
        **kw)
    ours = ModulatedNoise(
        1.0, noise=NoiseChain([oa]),
        ref_latent_opt=jnp.asarray(ref_latent), **kw)

    from sonar_tpu.noise import make_noise_sampler

    ns = ref.make_noise_sampler(torch.zeros(shape), 0.03, 14.6, seed=0,
                                cpu=True, normalized=True)
    want = np.stack([ns(torch.tensor(1.0), torch.tensor(0.9)).numpy()
                     for _ in range(3)])
    fn, state = make_noise_sampler(ours, shape, seed=0, sigma_min=0.03,
                                   sigma_max=14.6,
                                   ref_latent=jnp.zeros(shape))
    outs = []
    for _ in range(3):
        o, state = fn(state, jnp.asarray(1.0), jnp.asarray(0.9))
        outs.append(np.asarray(o))
    np.testing.assert_allclose(np.stack(outs), want, rtol=2e-4, atol=2e-4)


# the reference item stores only the kwargs it is given (the node always
# supplies the full widget set) — mirror our defaults explicitly
_RESIZED_DEFAULTS = dict(
    width=32, height=32, spatial_mode="absolute", spatial_compression=8,
    upscale_mode="bilinear", downscale_mode="bilinear", crop_mode="center",
    crop_offset_horizontal=0, crop_offset_vertical=0,
    downscale_strategy="scale", initial_reference="prefer_crop")


def _resized_pair(seed, inner_hw, **kw):
    inner_shape = SHAPE[:2] + inner_hw
    s = _stream(7, seed, shape=inner_shape)
    full = {**_RESIZED_DEFAULTS, **kw}
    ref = ref_noise.ResizedNoise(
        1.0, custom_noise=ref_noise.CustomNoiseChain(
            [RefStreamItem(1.0, stream=s)]),
        normalize=None, **full)
    ours = ResizedNoise(
        1.0, custom_noise=NoiseChain([OurStreamItem(1.0, stream=s)]), **full)
    return ref, ours


# SHAPE is (2,3,8,8); width/height are pixel-space (divided by
# spatial_compression=8): 128x96 px -> (12, 16) generation, downscale;
# 32x32 px -> (4, 4) generation, upscale
RESIZED_CASES = [
    dict(width=128, height=96, spatial_mode="absolute",
         downscale_strategy="crop", crop_mode="center"),
    dict(width=128, height=96, spatial_mode="absolute",
         downscale_strategy="crop", crop_mode="top_left"),
    dict(width=128, height=96, spatial_mode="absolute",
         downscale_strategy="crop", crop_mode="bottom_right",
         crop_offset_horizontal=-8, crop_offset_vertical=8),
    dict(width=128, height=96, spatial_mode="absolute",
         downscale_strategy="scale", downscale_mode="bilinear"),
    dict(width=32, height=32, spatial_mode="absolute",
         upscale_mode="nearest-exact"),
    dict(width=64, height=32, spatial_mode="relative",
         spatial_compression=8),
]


@pytest.mark.parametrize("case", range(len(RESIZED_CASES)))
def test_resized_oracle(case):
    kw = dict(RESIZED_CASES[case])
    xh, xw = SHAPE[-2:]
    comp = kw.get("spatial_compression", 8)
    h, w = kw["height"] // comp, kw["width"] // comp
    if kw.get("spatial_mode") == "relative":
        h, w = xh + h, xw + w
    ref, ours = _resized_pair(40 + case, (h, w), **kw)
    _check(ref, ours, tol=1e-4)


def _run_shape_pair(ref, ours, shape, draws=3):
    from sonar_tpu.noise import make_noise_sampler

    ns = ref.make_noise_sampler(torch.zeros(shape), 0.03, 14.6, seed=0,
                                cpu=True, normalized=True)
    want = np.stack([ns(torch.tensor(1.0), torch.tensor(0.9)).numpy()
                     for _ in range(draws)])
    fn, state = make_noise_sampler(ours, shape, seed=0, sigma_min=0.03,
                                   sigma_max=14.6,
                                   ref_latent=jnp.zeros(shape))
    outs = []
    for _ in range(draws):
        o, state = fn(state, jnp.asarray(1.0), jnp.asarray(0.9))
        outs.append(np.asarray(o))
    np.testing.assert_allclose(np.stack(outs), want, rtol=3e-5, atol=3e-5)


def test_parameters_fix_invalid_oracle():
    from sonar_tpu.noise import CustomNoiseParametersNoise

    s = _stream(7, 50)
    s[:, 0, 0, 0, 0] = np.nan
    s[:, 1, 1, 1, 1] = np.inf
    s[:, 1, 2, 2, 2] = -np.inf
    ra, oa = (RefStreamItem(1.0, stream=s), OurStreamItem(1.0, stream=s))
    ref = ref_noise.CustomNoiseParametersNoise(
        1.0, noise=ref_noise.CustomNoiseChain([ra]), normalize=None,
        fix_invalid=True, override_dtype=None, override_device=None,
        frames_to_channels=False, ensure_square_aspect_ratio=False,
        rng_mode="default", rng_offset_mode="disabled", rng_state_offset=0)
    ours = CustomNoiseParametersNoise(
        1.0, noise=NoiseChain([oa]), fix_invalid=True)
    _run_shape_pair(ref, ours, SHAPE)


def test_parameters_square_aspect_oracle():
    from sonar_tpu.noise import CustomNoiseParametersNoise

    latent_shape = (2, 3, 6, 10)  # hw = sqrt(60) -> padded to 8x8
    inner_shape = (2, 3, 8, 8)
    s = _stream(7, 51, shape=inner_shape)
    ra, oa = (RefStreamItem(1.0, stream=s), OurStreamItem(1.0, stream=s))
    ref = ref_noise.CustomNoiseParametersNoise(
        1.0, noise=ref_noise.CustomNoiseChain([ra]), normalize=None,
        fix_invalid=False, override_dtype=None, override_device=None,
        frames_to_channels=False, ensure_square_aspect_ratio=True,
        rng_mode="default", rng_offset_mode="disabled", rng_state_offset=0)
    ours = CustomNoiseParametersNoise(
        1.0, noise=NoiseChain([oa]), ensure_square_aspect_ratio=True)
    _run_shape_pair(ref, ours, latent_shape)
