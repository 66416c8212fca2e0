"""Extract every reference node's INPUT_TYPES schema to JSON.

Stubs out ComfyUI-only modules so the reference package imports; then walks
NODE_CLASS_MAPPINGS and serializes required/optional field specs
(type, default, min, max, options) for the parity/validation tables.
Tooltips and other prose are deliberately NOT captured — only the machine
parameter surface (names, types, defaults, ranges, enum options).

Usage:  python tools/extract_ref_schemas.py   (writes tools/ref_schemas.json)
Then:   python tools/gen_schemas.py           (writes sonar_tpu/api/schemas.py)
"""
import json
import sys
import types


def stub(name, **attrs):
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


# --- comfy stubs -------------------------------------------------------------
comfy = stub("comfy")
import torch as _torch

stub("comfy.model_management", device_supports_non_blocking=lambda *a: False,
     get_torch_device=lambda: _torch.device("cpu"),
     throw_exception_if_processing_interrupted=lambda: None)
class _KSampler:
    SAMPLERS = ["euler", "euler_ancestral", "dpmpp_sde", "dpmpp_2m"]
    SCHEDULERS = ["normal", "karras"]


stub("comfy.samplers", KSAMPLER=_Anything, KSampler=_KSampler, CFGGuider=_Anything,
     k_diffusion_sampling=stub("comfy.samplers.k_diffusion_sampling",
                               get_ancestral_step=lambda *a, **k: (0, 0),
                               to_d=lambda *a, **k: None,
                               BrownianTreeNoiseSampler=_Anything))
stub("comfy.utils", common_upscale=lambda *a, **k: a[0])
kd = stub("comfy.k_diffusion")
stub("comfy.k_diffusion.sampling",
     get_ancestral_step=lambda *a, **k: (0, 0),
     to_d=lambda *a, **k: None,
     BrownianTreeNoiseSampler=_Anything)
stub("comfy.latent_formats", SD15=_Anything, SDXL=_Anything)
comfy.latent_formats = sys.modules["comfy.latent_formats"]
comfy.model_management = sys.modules["comfy.model_management"]
comfy.samplers = sys.modules["comfy.samplers"]
comfy.utils = sys.modules["comfy.utils"]
comfy.k_diffusion = kd
kd.sampling = sys.modules["comfy.k_diffusion.sampling"]
cn = stub("custom_nodes")
cn.__path__ = []
stub("comfy_execution")
stub("comfy_execution.validation", validate_node_input=lambda *a, **k: True)
stub("folder_paths", get_output_directory=lambda: "/tmp", get_temp_directory=lambda: "/tmp",
     get_save_image_path=lambda *a, **k: ("/tmp", "x", 0, "", ""))
stub("latent_preview", get_previewer=lambda *a, **k: None)
stub("pytorch_wavelets", DWTForward=_Anything, DWTInverse=_Anything,
     DTCWTForward=_Anything, DTCWTInverse=_Anything, ScatLayer=_Anything)


class _FakeWavelet:
    def __init__(self, name):
        self.name = name
        self.dec_lo = [0.0]
        self.dec_hi = [0.0]
        self.rec_lo = [0.0]
        self.rec_hi = [0.0]


stub("pywt", wavelist=lambda *a, **k: ["haar", "db4"], Wavelet=_FakeWavelet,
     ContinuousWavelet=_FakeWavelet)

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root")

import importlib.util

spec = importlib.util.spec_from_file_location(
    "sonar_ref", "/root/reference/__init__.py",
    submodule_search_locations=["/root/reference"])
pkg = importlib.util.module_from_spec(spec)
sys.modules["sonar_ref"] = pkg
try:
    spec.loader.exec_module(pkg)
except Exception as e:
    print("package exec failed:", e, file=sys.stderr)

import sonar_ref.py.nodes as nodes_mod


def ser(v):
    try:
        json.dumps(v)
        return v
    except Exception:
        return repr(v)


out = {}
for name, cls in sorted(nodes_mod.NODE_CLASS_MAPPINGS.items()):
    it = cls.INPUT_TYPES
    try:
        d = it() if callable(it) else it
    except Exception as e:
        out[name] = {"error": repr(e)}
        continue
    node = {}
    for section in ("required", "optional"):
        fields = {}
        for fname, fspec in d.get(section, {}).items():
            ftype = fspec[0]
            meta = fspec[1] if len(fspec) > 1 else {}
            entry = {}
            if isinstance(ftype, (list, tuple)):
                entry["type"] = "ENUM"
                entry["options"] = [ser(o) for o in ftype]
            else:
                entry["type"] = ser(ftype)
            for k in ("default", "min", "max", "step", "round"):
                if k in meta:
                    entry[k] = ser(meta[k])
            fields[fname] = entry
        node[section] = fields
    out[name] = node

import os

_here = os.path.dirname(os.path.abspath(__file__))
json.dump(out, open(os.path.join(_here, "ref_schemas.json"), "w"), indent=1,
          sort_keys=True)
print(f"extracted {len(out)} nodes")
errs = {k: v for k, v in out.items() if "error" in v}
print("errors:", json.dumps(errs, indent=1) if errs else "none")
