"""SonarPipeline — the everything-wired convenience surface.

The reference's user surface is a ComfyUI graph: KSampler + custom-noise
chain + WaveletCFG model patch + FreeU patches. This class is that graph as
one object: give it cond/uncond denoiser callables (or let it build the
bundled UNet), a sampler name, a noise tree, and optional WCFG rules /
FreeU configs / CFG-time latent ops — call it with (x0, sigmas) and the
whole run compiles into one XLA program.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..cfg import DiscreteSampling, WaveletCFG, basic_cfg
from ..noise.base import NoiseItem
from ..samplers.momentum import SonarConfig
from .functions import get_sampler
from .guider import make_latent_op_cfg_function


class SonarPipeline:
    def __init__(
        self,
        *,
        model: Callable | None = None,
        model_uncond: Callable | None = None,
        model_batched: Callable | None = None,
        sampler: str | Callable = "sonar_euler_ancestral",
        sonar_config: SonarConfig | None = None,
        noise: NoiseItem | None = None,
        cfg_scale: float = 7.5,
        wavelet_cfg: WaveletCFG | None = None,
        latent_op_cfg: tuple | None = None,  # (patch_fn, hook) from api.guider
        model_sampling=None,
        eta: float | None = None,
        s_noise: float | None = None,
        seed: int | None = None,
        fused_noise: bool | None = None,
    ):
        """``model(x, sigma_batch) -> denoised`` is the cond denoiser;
        ``model_uncond`` enables CFG (basic or wavelet). Without it the
        pipeline samples unguided, exactly the reference's KSampler path.

        ``model_batched(x2, sigma2, **kw) -> denoised2`` is the TPU-native
        alternative to the (model, model_uncond) pair: ONE denoiser call on
        the doubled batch — rows ``[:B]`` conditional, rows ``[B:]``
        unconditional (the caller bakes the two conditionings in, exactly
        how ComfyUI batches cond+uncond into one UNet forward). The
        sampling program then contains a single UNet instance instead of
        two, which roughly halves XLA compile time at SDXL scale (the
        tunnel's remote compiles are uncacheable — CLAUDE.md) and feeds
        the MXU a 2B batch. All CFG machinery (wavelet CFG, latent-op
        hooks, cfg_scale) is unchanged. Mutually exclusive with
        ``model_uncond``; ``model`` may be omitted when given.

        ``fused_noise=True`` enables the fused-pyramid Pallas kernels
        (kernels/fused_pyramid.py) for this pipeline's noise draws —
        measured 2.70x end-to-end on 20-step sampling with pyramid_old
        noise (tools/bench_e2e_fused_sampling.py). CAVEAT: the fused
        kernels draw their full-size gaussian base from the TPU hardware
        PRNG, a *different deterministic stream* than the default threefry
        path — samples are equally valid but not bit-identical to the
        default (or to CPU). ``None`` defers to the
        ``SONAR_TPU_FUSED_PYRAMID`` env var; ``False`` forces it off."""
        if model_batched is not None and model_uncond is not None:
            raise ValueError(
                "model_batched and model_uncond are mutually exclusive: "
                "the batched callable already produces both halves")
        if model_batched is not None and model is not None:
            raise ValueError(
                "model_batched and model are mutually exclusive: the "
                "batched callable already produces the conditional half "
                "(rows [:B]) — passing both would silently ignore model")
        self.model = model
        self.model_uncond = model_uncond
        self.model_batched = model_batched
        self.sampler = get_sampler(sampler) if isinstance(sampler, str) else sampler
        self.sonar_config = sonar_config
        self.noise = noise
        self.cfg_scale = cfg_scale
        self.wavelet_cfg = wavelet_cfg
        self.latent_op_cfg = latent_op_cfg
        self.model_sampling = model_sampling or DiscreteSampling()
        self.eta = eta
        self.s_noise = s_noise
        self.seed = seed
        self.fused_noise = fused_noise

    # -- guided denoiser assembly (replaces ComfyUI's CFGGuider) ---------------
    def _denoiser(self, sample_sigmas) -> Callable:
        model = self.model
        batched = self.model_batched
        if model is None and batched is None:
            raise ValueError("SonarPipeline requires a model callable")
        if self.model_uncond is None and batched is None:
            return model

        uncond = self.model_uncond
        cfg_fn = self.wavelet_cfg if self.wavelet_cfg is not None else basic_cfg
        lo_patch, lo_hook = self.latent_op_cfg or (None, None)
        ms = self.model_sampling

        def guided(x, sigma_batch, **kw):
            if lo_hook == "model_input":
                x = lo_patch(dict(input=x, sigma=sigma_batch,
                                  model_sampling=ms))
            if batched is not None:
                # one denoiser call on the doubled batch: [cond | uncond].
                # A scalar sigma broadcasts over both halves unchanged.
                b = x.shape[0]
                sig = jnp.asarray(sigma_batch)
                s2 = sig if sig.ndim == 0 else jnp.concatenate([sig, sig], 0)
                d2 = batched(jnp.concatenate([x, x], axis=0), s2, **kw)
                cond_d, uncond_d = d2[:b], d2[b:]
            else:
                cond_d = model(x, sigma_batch, **kw)
                uncond_d = uncond(x, sigma_batch, **kw)
            if lo_hook == "pre_cfg":
                conds = lo_patch(dict(input=x, sigma=sigma_batch,
                                      conds_out=[cond_d, uncond_d],
                                      model_sampling=ms))
                cond_d, uncond_d = conds[0], conds[1]
            args = dict(
                input=x, sigma=sigma_batch,
                cond=x - cond_d, uncond=x - uncond_d,
                cond_denoised=cond_d, uncond_denoised=uncond_d,
                cond_scale=self.cfg_scale, model_sampling=ms,
                sample_sigmas=sample_sigmas,
            )
            out = x - cfg_fn(args)
            if lo_hook == "post_cfg":
                out = lo_patch(dict(input=x, sigma=sigma_batch, denoised=out,
                                    uncond_denoised=uncond_d,
                                    model_sampling=ms))
            return out

        return guided

    def _sampler_params(self) -> frozenset | None:
        """Keyword names the sampler accepts, or None for "everything"
        (a ``**kwargs`` signature or an uninspectable callable)."""
        import inspect

        try:
            sig = inspect.signature(self.sampler)
        except (TypeError, ValueError):
            return None
        if any(p.kind is inspect.Parameter.VAR_KEYWORD
               for p in sig.parameters.values()):
            return None
        return frozenset(sig.parameters)

    def __call__(self, x0: jax.Array, sigmas, **kwargs) -> jax.Array:
        # the schedule stays float32 regardless of latent dtype: a bf16
        # latent would otherwise degrade the sigmas and break WCFG's
        # sigma/step-table matching
        # host view FIRST, from the RAW input: jnp.asarray inside an
        # active trace lifts even a concrete schedule to a tracer, so
        # converting first silently dropped WCFG step windows (and broke
        # host-table samplers) under pipe.jit(), whose whole point is a
        # static schedule per compile
        try:
            host_sigmas = np.asarray(sigmas, np.float32)
        except (jax.errors.TracerArrayConversionError,
                jax.errors.ConcretizationTypeError):
            # traced sigmas (caller's own jit): WCFG's host-side step
            # windows are unavailable — sigma/sampling schedule modes
            # still work; prefer pipe.jit(), which keeps them concrete.
            # Only tracer errors are caught: a real device-readback
            # failure must stay loud, not silently drop WCFG windows
            host_sigmas = None
        sigmas = jnp.asarray(sigmas, jnp.float32)
        denoiser = self._denoiser(host_sigmas)
        call_kwargs: dict[str, Any] = dict(kwargs)
        # pipeline-level defaults are forwarded only when the sampler
        # accepts them: the non-ancestral samplers (sonar_euler) take no
        # noise_item/eta/s_noise — in the reference those inputs simply
        # don't exist on the node (sonar.py SamplerNodeSonarEuler), so a
        # pipeline configured with noise + a non-ancestral sampler ignores
        # the noise rather than TypeError-ing deep inside the sampler.
        # Caller-passed kwargs stay strict (an explicit bad kwarg is loud).
        accepts = self._sampler_params()
        for name, value in (("sonar_config", self.sonar_config),
                            ("noise_item", self.noise),
                            ("eta", self.eta),
                            ("s_noise", self.s_noise),
                            ("seed", self.seed)):
            if value is not None and (accepts is None or name in accepts):
                call_kwargs.setdefault(name, value)
        # flow models (model_sampling=Flow) default ancestral samplers to
        # the rectified-flow noise split — the host does the same routing
        # for CONST models. Only for samplers that declare the knob (an
        # opaque **kwargs sampler may not understand it).
        from ..cfg.model_sampling import Flow

        if isinstance(self.model_sampling, Flow) and accepts is not None:
            if "ancestral_mode" in accepts:
                call_kwargs.setdefault("ancestral_mode", "rf")
            elif {"eta", "s_noise"} & set(accepts):
                # noise-injecting sampler with no RF knob (sonar_dpmpp_sde,
                # restart): its VP-style noise magnitudes over-noise flow
                # latents off the (1-sigma)*x0 + sigma*noise marginal —
                # exactly what ancestral_mode='rf' exists to fix. Don't
                # fail (the schedule may still be usable at low eta), but
                # never do it silently.
                import warnings

                warnings.warn(
                    f"Flow model_sampling with sampler "
                    f"{getattr(self.sampler, '__name__', self.sampler)!r}: "
                    "this sampler injects VP-style noise and has no "
                    "ancestral_mode='rf' support — flow latents will be "
                    "over-noised. Prefer sonar_euler_ancestral, or eta=0.",
                    stacklevel=3)
        # host-table samplers (uni_pc/deis/lms/ipndm/dpm_fast/adaptive)
        # derive solver coefficients on the host — hand them the concrete
        # schedule when we have one so they work under pipe.jit(), where
        # the jnp view above is a (constant-lifted) tracer
        if host_sigmas is not None and getattr(
                self.sampler, "_needs_host_sigmas", False):
            sigmas = host_sigmas
        if self.fused_noise is None:
            return self.sampler(denoiser, x0, sigmas, **call_kwargs)
        # the fused-kernel flag is read at TRACE time by the pyramid
        # generators, and this frame runs during tracing whether the
        # caller jits the pipeline or runs it eagerly — scoping the env
        # override here makes the knob per-pipeline
        import os

        old = os.environ.get("SONAR_TPU_FUSED_PYRAMID")
        os.environ["SONAR_TPU_FUSED_PYRAMID"] = "1" if self.fused_noise else "0"
        try:
            return self.sampler(denoiser, x0, sigmas, **call_kwargs)
        finally:
            if old is None:
                os.environ.pop("SONAR_TPU_FUSED_PYRAMID", None)
            else:
                os.environ["SONAR_TPU_FUSED_PYRAMID"] = old

    # -- host-side latent contract (ComfyUI applies these around sampling) ----
    def _prediction(self, prediction=None):
        from ..cfg.model_sampling import Flow
        from ..models.prediction import CONST, EPS, get_prediction

        if prediction is not None:
            return get_prediction(prediction)
        return CONST() if isinstance(self.model_sampling, Flow) else EPS()

    def prepare_latent(self, latent, noise, sigmas, *, prediction=None):
        """Noise a clean latent to ``sigmas[0]`` — the img2img entry
        contract the host normally applies before the sampler runs
        (``model_sampling.noise_scaling`` in ComfyUI's CFGGuider.sample).
        EPS models add ``sigma0 * noise`` (or ``sqrt(1+sigma0^2)`` when
        sigma0 reaches sigma_max — the max-denoise rule, reference
        misc.py:99-106); flow models interpolate
        ``sigma0*noise + (1-sigma0)*latent``. ``prediction`` overrides the
        default (CONST for Flow model_sampling, EPS otherwise)."""
        from ..cfg.model_sampling import max_denoise

        pred = self._prediction(prediction)
        sigmas = np.asarray(sigmas, np.float32)
        s0 = float(sigmas[0])
        return pred.noise_scaling(
            jnp.float32(s0), noise, latent,
            max_denoise=max_denoise(self.model_sampling, s0))

    def finalize_latent(self, samples, sigmas, *, prediction=None):
        """Undo latent-side scaling at the END sigma — identity for EPS
        and for any schedule ending at 0; ``latent / (1 - sigma_end)`` for
        flow models stopped early (ComfyUI's inverse_noise_scaling call
        after sampling)."""
        from ..models.prediction import CONST

        pred = self._prediction(prediction)
        sigmas = np.asarray(sigmas, np.float32)
        s_end = float(sigmas[-1])
        if isinstance(pred, CONST) and s_end >= 1.0 - 1e-6:
            raise ValueError(
                f"finalize_latent: flow inverse scaling divides by "
                f"(1 - sigma_end) but the schedule ends at {s_end} — "
                "the latent is still (nearly) pure noise; sample further "
                "before finalizing")
        return pred.inverse_noise_scaling(jnp.float32(s_end), samples)

    def jit(self) -> Callable:
        """A jitted ``fn(x0, sigmas, *, extra_args=None, **static_kwargs) ->
        samples`` runner. The schedule is treated as STATIC (it feeds
        host-side WCFG step windows), so the runner compiles once per unique
        (schedule, static kwargs, x0 shape) and reuses the compiled program.

        ``extra_args`` (a pytree of arrays, e.g. ``{"params": params}``) is a
        jit ARGUMENT: model weights passed this way are donated per call
        instead of baked into the program as constants — at SDXL scale a
        closed-over 2.66GB params tree breaks the remote-compile transport
        (CLAUDE.md) and forces a recompile per weight update. Any other
        keyword arguments must be hashable and are treated as static.

        The compiled-program cache lives on the PIPELINE instance, so both
        ``run = pipe.jit(); run(x0, s)`` and the one-liner
        ``pipe.jit()(x0, s)`` reuse programs across calls."""
        cache = getattr(self, "_jit_cache", None)
        if cache is None:
            cache = self._jit_cache = {}

        def _compiled(sig_key, static_items):
            entry = cache.get((sig_key, static_items))
            if entry is None:
                sig = np.asarray(sig_key, np.float32)
                static = dict(static_items)
                entry = cache[(sig_key, static_items)] = jax.jit(
                    lambda x0, ea: self(x0, sig, extra_args=ea, **static))
            return entry

        def run(x0, sigmas, *, extra_args=None, **static_kwargs):
            sig_key = tuple(float(s) for s in np.asarray(sigmas).ravel())
            return _compiled(sig_key, tuple(sorted(static_kwargs.items())))(
                x0, {} if extra_args is None else extra_args)

        return run
