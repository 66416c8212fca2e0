"""Array-based inspection tooling — PIL/ComfyUI-free replacements for the
reference's preview pipelines (py/nodes/powernoise.py:33-53, 217-294,
410-554; SURVEY §5.5)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..noise.power import PowerFilter, PowerNoiseItem, rfft2_to_fft2


def preview_power_filter(pfilter: PowerFilter, *, size=(128, 128), mix: float = 1.0,
                         normalization_factor: float = 1.0,
                         kernel_gain: float = 1 / 3,
                         filter_gain: float = 1 / 3) -> np.ndarray:
    """Render (H, 2W) uint8: the filter's Fourier gain surface next to its
    spatial kernel (PowerFilter.preview, powernoise.py:217-266)."""
    shape = (1, 1, *size)
    filt = PowerFilter.normalize(pfilter.build(size), shape, mix=mix,
                                 normalization_factor=normalization_factor)
    filt_rfft = jnp.asarray(filt)[None, None]
    filter_fft = rfft2_to_fft2(filt_rfft.astype(jnp.complex64)).real
    kernel = jnp.fft.irfft2(filt_rfft.astype(jnp.complex64), s=size, norm="ortho")
    kernel = jnp.roll(kernel, (size[0] // 2, size[1] // 2), axis=(-2, -1))
    img_f = jnp.tanh(filter_fft * filter_gain) * 256.0
    img_k = (jnp.tanh(kernel * kernel_gain) + 1.0) * 128.0
    img = jnp.concatenate([img_f, img_k], axis=-1)
    return np.asarray(jnp.clip(img, 0, 255).astype(jnp.uint8)[0, 0])


def preview_power_noise(item: PowerNoiseItem, *, size=(128, 128),
                        seed: int = 0) -> np.ndarray:
    """Filter surface + kernel + one noise draw, side by side
    (PowerNoiseItem.preview, powernoise.py:410-454)."""
    from ..noise.base import make_noise_sampler

    base = preview_power_filter(item.power_filter, size=size,
                                mix=item.mix,
                                normalization_factor=item.filter_norm_factor)
    fn, state = make_noise_sampler(item, (1, 1, *size), seed=seed,
                                   sigma_min=0.01, sigma_max=14.6)
    noise, _ = fn(state, jnp.asarray(14.0), jnp.asarray(10.0))
    img_n = np.asarray(
        jnp.clip((jnp.tanh(noise * (1 / 3)) + 1.0) * 128.0, 0, 255)
        .astype(jnp.uint8)[0, 0]
    )
    return np.concatenate([base, img_n], axis=-1)


def noise_to_rgb(noise, *, gain: float = 1 / 3) -> np.ndarray:
    """Any (B, C, H, W) noise → (H, W, 3) uint8 for quick inspection
    (SonarNoiseImage's spirit without the image pipeline)."""
    x = jnp.asarray(noise)[0]
    c = x.shape[0]
    if c >= 3:
        rgb = x[:3]
    else:
        rgb = jnp.broadcast_to(x[:1], (3,) + x.shape[1:])
    img = (jnp.tanh(rgb * gain) + 1.0) * 127.5
    return np.asarray(jnp.clip(img, 0, 255).astype(jnp.uint8).transpose(1, 2, 0))
