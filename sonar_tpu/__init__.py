"""sonar_tpu — TPU-native momentum diffusion sampling + procedural noise synthesis.

A standalone JAX/XLA/Pallas framework providing the full capability surface of
the ComfyUI-sonar reference (momentum samplers, a ~24-generator noise zoo, a
~25-combinator noise algebra, power-spectrum filtering, wavelet CFG,
FreeU-Extreme, latent operations) re-designed TPU-first:

- noise "samplers" are pure functions over explicit state pytrees, so whole
  sampling loops compile into a single ``jax.lax.scan``;
- all randomness is counter-based ``jax.random`` (identical streams on any
  backend — fixes the reference's CPU-RNG-for-determinism crutch);
- hot elementwise chains are fused Pallas TPU kernels;
- multi-chip scaling is expressed with ``jax.sharding.Mesh`` + NamedSharding.

Reference behavior citations use ``<file>:<line>`` paths into
blepping/ComfyUI-sonar (e.g. ``py/sonar.py:309-320``).
"""

__version__ = "0.1.0"

from . import api, cfg, core, models, noise, ops, parallel, samplers, utils, wavelets  # noqa: F401
