"""Load the read-only reference implementation (/root/reference) for oracle
tests, stubbing the ComfyUI-only modules it imports. Returns None when the
reference tree isn't present (the oracle tests skip then).

Only the reference's *math* is exercised (utils, powernoise filter
construction); nothing is copied — the reference runs live as the oracle.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

_REF_ROOT = "/root/reference"
_cache = {}


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


class _Anything:
    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return _Anything()

    def __getattr__(self, k):
        return _Anything()


def load_reference():
    if "pkg" in _cache:
        return _cache["pkg"]
    if not os.path.isdir(_REF_ROOT):
        _cache["pkg"] = None
        return None
    import torch

    if "comfy" not in sys.modules:
        comfy = _stub("comfy")
        _stub("comfy.model_management",
              device_supports_non_blocking=lambda *a: False,
              get_torch_device=lambda: torch.device("cpu"),
              throw_exception_if_processing_interrupted=lambda: None)

        def _common_upscale(samples, width, height, upscale_method, crop):
            import torch.nn.functional as F

            mode = {"bilinear": "bilinear", "bicubic": "bicubic",
                    "nearest-exact": "nearest-exact",
                    "nearest": "nearest", "area": "area"}.get(
                        upscale_method, "bilinear")
            kwargs = {}
            if mode in ("bilinear", "bicubic"):
                kwargs["antialias"] = False
            return F.interpolate(samples, size=(height, width), mode=mode,
                                 **kwargs)

        def _repeat_to_batch_size(t, batch_size):
            if t.shape[0] >= batch_size:
                return t[:batch_size]
            reps = -(-batch_size // t.shape[0])
            return t.repeat((reps,) + (1,) * (t.ndim - 1))[:batch_size]

        _stub("comfy.utils", common_upscale=_common_upscale,
              repeat_to_batch_size=_repeat_to_batch_size)

        class _KSampler:
            SAMPLERS = ["euler", "euler_ancestral", "dpmpp_sde"]
            SCHEDULERS = ["normal", "karras"]

        # real k-diffusion math so the reference's deterministic sampler
        # helpers (guidance, modulation) can run as oracles
        def _to_d(x, sigma, denoised):
            dims = (...,) + (None,) * (x.ndim - sigma.ndim)
            return (x - denoised) / sigma[dims] if sigma.ndim else \
                (x - denoised) / sigma

        def _get_ancestral_step(sigma_from, sigma_to, eta=1.0):
            if not eta:
                return sigma_to, sigma_to * 0.0
            sigma_up = (
                eta * (sigma_to**2 * (sigma_from**2 - sigma_to**2)
                       / sigma_from**2) ** 0.5
            )
            sigma_up = min(sigma_to, sigma_up) if not hasattr(
                sigma_up, "clamp") else torch.minimum(sigma_to, sigma_up)
            sigma_down = (sigma_to**2 - sigma_up**2) ** 0.5
            return sigma_down, sigma_up

        kds = _stub("comfy.samplers.k_diffusion_sampling",
                    get_ancestral_step=_get_ancestral_step,
                    to_d=_to_d,
                    BrownianTreeNoiseSampler=_Anything)
        _stub("comfy.samplers", KSAMPLER=_Anything, KSampler=_KSampler,
              CFGGuider=_Anything, k_diffusion_sampling=kds)
        _stub("comfy.latent_formats", SD15=_Anything, SDXL=_Anything)
        kd = _stub("comfy.k_diffusion")
        kd.sampling = kds
        sys.modules["comfy.k_diffusion.sampling"] = kds
        comfy.model_management = sys.modules["comfy.model_management"]
        comfy.utils = sys.modules["comfy.utils"]
        comfy.samplers = sys.modules["comfy.samplers"]
        comfy.latent_formats = sys.modules["comfy.latent_formats"]
        comfy.k_diffusion = kd
        cn = _stub("custom_nodes")
        cn.__path__ = []
        _stub("comfy_execution")
        _stub("comfy_execution.validation",
              validate_node_input=lambda *a, **k: True)
        _stub("folder_paths", get_output_directory=lambda: "/tmp",
              get_temp_directory=lambda: "/tmp",
              get_save_image_path=lambda *a, **k: ("/tmp", "x", 0, "", ""))
        _stub("latent_preview", get_previewer=lambda *a, **k: None)
        _stub("pytorch_wavelets", DWTForward=_Anything, DWTInverse=_Anything,
              DTCWTForward=_Anything, DTCWTInverse=_Anything,
              ScatLayer=_Anything)

        class _FakeWavelet:
            def __init__(self, name):
                self.name = name
                self.dec_lo = [0.0]
                self.dec_hi = [0.0]
                self.rec_lo = [0.0]
                self.rec_hi = [0.0]

        _stub("pywt", wavelist=lambda *a, **k: ["haar", "db4"],
              Wavelet=_FakeWavelet, ContinuousWavelet=_FakeWavelet)

    spec = importlib.util.spec_from_file_location(
        "sonar_reference", os.path.join(_REF_ROOT, "__init__.py"),
        submodule_search_locations=[_REF_ROOT])
    pkg = importlib.util.module_from_spec(spec)
    sys.modules["sonar_reference"] = pkg
    try:
        spec.loader.exec_module(pkg)
    except Exception:
        pass  # top-level node registration may fail; submodules still import
    try:
        import sonar_reference.py.utils  # noqa: F401
        import sonar_reference.py.noise  # noqa: F401
        import sonar_reference.py.sonar  # noqa: F401
        import sonar_reference.py.nodes.powernoise  # noqa: F401
    except Exception:
        _cache["pkg"] = None
        return None
    _cache["pkg"] = pkg
    return pkg
