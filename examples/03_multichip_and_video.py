"""Multi-chip dp-sharded sampling + 5D video noise with temporal correlation.

Run on 8 virtual CPU devices:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/03_multichip_and_video.py
On a real pod the same code shards over ICI.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding

from sonar_tpu.noise import (
    CustomNoiseParametersNoise,
    PerDimNoise,
    get_noise_item,
    make_noise_sampler,
)
from sonar_tpu.noise.voronoi import VoronoiGenerator
from sonar_tpu.parallel import latent_spec, make_mesh, shard_latent
from sonar_tpu.samplers import sample_sonar_euler_ancestral


def main():
    mesh = make_mesh(axis_names=("dp", "tp"))
    dp = mesh.shape["dp"]
    print("mesh:", dict(mesh.shape))

    # --- dp-sharded batched sampling --------------------------------------
    def model(x, sigma, **kw):
        return x * 0.9

    sigmas = jnp.asarray([14.6, 7.0, 2.0, 0.5, 0.0], jnp.float32)
    x = shard_latent(
        jax.random.normal(jax.random.key(0), (dp * 2, 4, 32, 32)) * 14.6, mesh)
    with mesh:
        out = jax.jit(lambda v: sample_sonar_euler_ancestral(
            model, v, sigmas, noise_item=get_noise_item("pyramid"), seed=0))(x)
    jax.block_until_ready(out)
    print("dp-sharded sample:", out.shape, out.sharding)

    # --- 16-frame video noise with a per-frame Voronoi z-walk -------------
    sp_mesh = make_mesh(axis_names=("dp", "sp"),
                        mesh_shape=(1, len(jax.devices())))
    vshape = (1, 4, 16, 32, 32)
    item = PerDimNoise(
        noise=CustomNoiseParametersNoise(
            noise=VoronoiGenerator(n_points=(32,), z_increment=0.3, z_range=8.0),
            frames_to_channels=True, normalize=False),
        dim=2, chunk_size=1, normalize=False)
    fn, st = make_noise_sampler(item, vshape, seed=1)
    with sp_mesh:
        vnoise = jax.jit(
            lambda s: fn(s, None, None)[0],
            out_shardings=NamedSharding(sp_mesh, latent_spec(5, sp="sp")))(st)
    jax.block_until_ready(vnoise)
    frames = np.asarray(vnoise)[0, 0]
    c01 = np.corrcoef(frames[0].ravel(), frames[1].ravel())[0, 1]
    print("video noise:", vnoise.shape, "adjacent-frame corr:", round(float(c01), 3))


if __name__ == "__main__":
    main()
