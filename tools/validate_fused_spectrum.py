"""On-chip statistical equivalence of the fused pyramid kernels vs XLA.

The fused paths use a different PRNG stream, so bit-equality is out of
scope; what must match is the *distribution*, including the spatial
correlation structure the ladder creates. Compares radially-binned power
spectra and moments over many draws for each pyramid variant.
"""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def draws(noise_type, shape, n, flag):
    os.environ["SONAR_TPU_FUSED_PYRAMID"] = flag
    from sonar_tpu.noise.base import make_noise_sampler
    from sonar_tpu.noise.presets import get_noise_item

    fn, st = make_noise_sampler(get_noise_item(noise_type), shape, seed=17,
                                sigma_min=0.03, sigma_max=14.6)

    @jax.jit
    def many(state):
        def body(s, _):
            noise, s = fn(s, jnp.asarray(1.0), jnp.asarray(0.9))
            return s, noise

        return jax.lax.scan(body, state, None, length=n)[1]

    return np.asarray(jax.block_until_ready(many(st)))


def radial_spectrum(x):
    # x: (N, B, C, H, W) -> mean power per radial frequency bin
    f = np.fft.fft2(x)
    p = (f * np.conj(f)).real.mean(axis=(0, 1, 2))
    h, w = p.shape
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    r = np.sqrt(fy * fy + fx * fx)
    bins = np.linspace(0, 0.5, 17)
    idx = np.digitize(r.ravel(), bins)
    out = np.array([p.ravel()[idx == i].mean() for i in range(1, len(bins))])
    return out / out.mean()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    shape = (1, 4, 128, 128)
    worst = 0.0
    for nt in ("pyramid", "pyramid_old", "pyramid_old_area",
               "highres_pyramid"):
        a = draws(nt, shape, n, "0")
        b = draws(nt, shape, n, "1")
        sa, sb = radial_spectrum(a), radial_spectrum(b)
        rel = np.abs(sa - sb) / np.maximum(sa, sb)
        m = [
            ("mean", a.mean(), b.mean()),
            ("std", a.std(), b.std()),
            ("kurt", ((a - a.mean()) ** 4).mean() / a.std() ** 4,
             ((b - b.mean()) ** 4).mean() / b.std() ** 4),
        ]
        print(f"{nt}: spectrum max rel dev {rel.max():.4f} "
              + " ".join(f"{k} {x:.4f}/{y:.4f}" for k, x, y in m), flush=True)
        worst = max(worst, rel.max())
    print(f"worst spectral deviation: {worst:.4f} "
          f"({'OK' if worst < 0.05 else 'CHECK'} at N={n} draws)")


if __name__ == "__main__":
    main()
