"""Generate sonar_tpu/api/schemas.py from tools/ref_schemas.json.

The generated module is the validation + parity table for the node builder
API: every reference node's parameter names, types, defaults, ranges and
enum options. Enum fields whose domain is framework-defined (noise types,
blend modes, resample modes, distributions, quantile strategies, frequency
filters, enhance modes) are emitted as *dynamic* domains resolved against
the live registries at validation time, so framework extensions stay valid.
"""

from __future__ import annotations

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "sonar_tpu", "api", "schemas.py")

TRI = {"default", "forced", "disabled"}

SCALE_FIELDS = {
    "upscale_mode", "downscale_mode", "octave_scale_mode",
    "octave_rescale_mode", "post_octave_rescale_mode",
}
ANY_STR_FIELDS = {"scheduler", "restart_scheduler"}


def domain_for(field: str, opts: list) -> str | None:
    if field in ("noise_type", "rand_init_noise_type"):
        return "noise_type"
    if field == "blend_mode" or field.endswith("_blend_mode"):
        return "blend"
    if field in SCALE_FIELDS:
        return "scale"
    if field == "distribution":
        return "distro"
    if field in ("quantile_strategy", "strategy"):
        return "quantile_strategy"
    if field == "ffilter":
        return "ffilter"
    if field == "enhance_mode":
        return "enhance"
    if field in ANY_STR_FIELDS or opts == []:
        return "any_str"
    return None


def convert_field(name: str, entry: dict, required: bool) -> dict:
    t = entry.get("type")
    out: dict = {}
    if required:
        out["r"] = 1
    if t == "ENUM":
        opts = entry.get("options", [])
        if set(map(str, opts)) == TRI:
            out |= {"t": "tri", "d": entry.get("default", "default")}
            return out
        dom = domain_for(name, opts)
        if dom is not None:
            extras = sorted(set(map(str, opts)) & {"DEFAULT", "default", "none"})
            out |= {"t": "dyn", "d": entry.get("default"), "dom": dom}
            if extras:
                out["extras"] = extras
            return out
        out |= {"t": "enum", "d": entry.get("default"),
                "opts": [str(o) for o in opts]}
        return out
    if t == "FLOAT":
        out |= {"t": "f", "d": entry.get("default")}
        if "min" in entry:
            out["lo"] = entry["min"]
        if "max" in entry:
            out["hi"] = entry["max"]
        return out
    if t == "INT":
        out |= {"t": "i", "d": entry.get("default")}
        if "min" in entry:
            out["lo"] = entry["min"]
        if "max" in entry:
            out["hi"] = entry["max"]
        return out
    if t == "BOOLEAN":
        out |= {"t": "b", "d": entry.get("default", False)}
        return out
    if t == "STRING":
        out |= {"t": "s"}
        if "default" in entry:
            out["d"] = entry["default"]
        return out
    # link/object inputs (MODEL, LATENT, SAMPLER, SONAR_CUSTOM_NOISE, ...)
    out |= {"t": "x", "ty": str(t)}
    return out


def py_literal(obj, indent: int = 0) -> str:
    """Emit ``obj`` as a Python literal in json.dumps(indent=1) layout.

    A blind ``.replace(": true", ": True")`` on a JSON dump corrupts
    string *values* that happen to contain YAML booleans (the WaveletCFG
    yaml_parameters template has five such lines), so booleans/None are
    converted structurally here and strings are emitted via json.dumps
    (JSON string escapes are valid Python string literals)."""
    pad, pad_in = " " * indent, " " * (indent + 1)
    if obj is True:
        return "True"
    if obj is False:
        return "False"
    if obj is None:
        return "None"
    if isinstance(obj, dict):
        if not obj:
            return "{}"
        items = (f"{pad_in}{json.dumps(str(k))}: {py_literal(v, indent + 1)}"
                 for k, v in sorted(obj.items()))
        return "{\n" + ",\n".join(items) + "\n" + pad + "}"
    if isinstance(obj, list):
        if not obj:
            return "[]"
        items = (f"{pad_in}{py_literal(v, indent + 1)}" for v in obj)
        return "[\n" + ",\n".join(items) + "\n" + pad + "]"
    return json.dumps(obj)


def main() -> None:
    src = json.load(open(os.path.join(HERE, "ref_schemas.json")))
    schemas: dict[str, dict] = {}
    for node, spec in sorted(src.items()):
        fields: dict[str, dict] = {}
        for section, required in (("required", True), ("optional", False)):
            for fname, entry in spec.get(section, {}).items():
                fields[fname] = convert_field(fname, entry, required)
        schemas[node] = fields

    with open(OUT, "w") as fp:
        fp.write(''.join([
            '"""Reference node parameter schemas — GENERATED, do not edit.\n',
            "\n",
            "Regenerate with:\n",
            "    python tools/extract_ref_schemas.py && python tools/gen_schemas.py\n",
            "\n",
            "One entry per reference node (py/nodes/* NODE_CLASS_MAPPINGS), one\n",
            "field spec per widget/input. Field spec keys:\n",
            "    t   - kind: f(float) i(int) b(bool) s(string) enum tri dyn x(link)\n",
            "    d   - widget default\n",
            "    lo/hi - numeric range\n",
            "    opts  - static enum options\n",
            "    dom   - dynamic domain name resolved against live registries\n",
            "            (see sonar_tpu.api.validate.DOMAINS); extras are\n",
            "            additionally-allowed literals (e.g. 'DEFAULT')\n",
            "    ty  - declared link type for object inputs\n",
            "    r   - 1 if the reference declares the field required\n",
            '"""\n\n',
            "SCHEMAS = ",
            py_literal(schemas),
            "\n",
        ]))
    print(f"wrote {OUT}: {len(schemas)} nodes, "
          f"{sum(len(v) for v in schemas.values())} fields")


if __name__ == "__main__":
    main()
