"""Schema-validation sweep: every registered node is audited against the
reference node schemas (sonar_tpu/api/schemas.py, generated from
py/nodes/base_inputtypes.py surfaces).

Per node this asserts:
- building with only its link inputs (all widgets at defaults) succeeds;
- building with EVERY widget explicitly set to its reference default
  succeeds — i.e. the builder accepts every reference parameter name;
- an unknown parameter name raises with the valid-name list;
- a numeric range violation raises;
- a static-enum violation raises.
"""

import jax.numpy as jnp
import pytest

from sonar_tpu.api.nodes import NODES, build
from sonar_tpu.api.schemas import SCHEMAS
from sonar_tpu.api.validate import ADAPT, ALIASES
from sonar_tpu.cfg.latent_ops import SonarLatentOperation
from sonar_tpu.cfg.model_sampling import ContinuousEDM
from sonar_tpu.noise import NoiseChain, get_noise_item


def _noise_chain():
    return NoiseChain([get_noise_item("gaussian")])


def _power_filter():
    from sonar_tpu.noise.power import PowerFilter

    return PowerFilter()


_LINK_FACTORIES = {
    "OCS_NOISE,SONAR_CUSTOM_NOISE": _noise_chain,
    "SONAR_POWER_FILTER": _power_filter,
    "LATENT": lambda: jnp.zeros((1, 4, 8, 8)),
    "MASK": lambda: jnp.ones((8, 8)),
    "IMAGE": lambda: jnp.zeros((8, 8, 3)),
    "SIGMAS": lambda: jnp.asarray([14.6, 7.0, 0.0]),
    "LATENT_OPERATION": lambda: SonarLatentOperation(),
    "SAMPLER": lambda: "sonar_euler",
    "MODEL": lambda: None,
    "CONDITIONING": lambda: None,
    "FRUX_CONFIG": lambda: None,
    "SONAR_GUIDANCE_CFG": lambda: None,
}

# node-specific link/extra overrides where the framework surface adapts the
# reference (model → model_sampling etc.)
_NODE_OVERRIDES = {
    "SonarScheduledNoise": {"model": ..., "model_sampling": ContinuousEDM()},
    "SonarWaveletCFG": {"model": ...},
    "FreeUExtreme": {"model": ..., "model_sampling": ContinuousEDM(),
                     "model_channels": 320},
    # passing the SIGMAS input requires a sampling object, as in the reference
    "NoisyLatentLike": {"model_sampling": ContinuousEDM()},
}
_SKIP = ...  # sentinel: drop this link entirely


def _links_for(node_name: str) -> dict:
    schema = SCHEMAS[ALIASES.get(node_name, node_name)]
    overrides = _NODE_OVERRIDES.get(node_name, {})
    links = {}
    for fname, spec in schema.items():
        if fname in overrides:
            continue
        if spec["t"] == "x":
            made = _LINK_FACTORIES[spec["ty"]]()
            if made is not None:
                links[fname] = made
    for fname, val in overrides.items():
        if val is not _SKIP:
            links[fname] = val
    return links


def _scalar_defaults(node_name: str) -> dict:
    schema = SCHEMAS[ALIASES.get(node_name, node_name)]
    out = {}
    for fname, spec in schema.items():
        if fname in _NODE_OVERRIDES.get(node_name, {}):
            continue
        if spec["t"] in ("f", "i", "b", "s", "enum", "tri", "dyn"):
            if spec.get("d") is not None:
                out[fname] = spec["d"]
    return out


_ALL_NODES = sorted(n for n in SCHEMAS if n in NODES or n in ALIASES.values())


def test_every_schema_node_is_registered():
    missing = [n for n in SCHEMAS if n not in NODES]
    assert not missing, f"schema nodes without builders: {missing}"


@pytest.mark.parametrize("node_name", _ALL_NODES)
def test_build_with_defaults(node_name):
    build(node_name, **_links_for(node_name))


@pytest.mark.parametrize("node_name", _ALL_NODES)
def test_build_accepts_every_reference_parameter(node_name):
    build(node_name, **_links_for(node_name), **_scalar_defaults(node_name))


@pytest.mark.parametrize("node_name", _ALL_NODES)
def test_unknown_parameter_raises(node_name):
    adapt = ADAPT.get(ALIASES.get(node_name, node_name), {})
    if adapt.get("extra") == "*":
        pytest.skip("free-form node (yaml rule parameters)")
    with pytest.raises(ValueError, match="unknown"):
        build(node_name, definitely_not_a_param_9000=1,
              **_links_for(node_name))


@pytest.mark.parametrize("node_name", _ALL_NODES)
def test_range_violation_raises(node_name):
    schema = SCHEMAS[ALIASES.get(node_name, node_name)]
    overrides = _NODE_OVERRIDES.get(node_name, {})
    for fname, spec in schema.items():
        if fname in overrides:
            continue
        if spec["t"] in ("f", "i") and spec.get("hi") is not None:
            bad = spec["hi"] + (1 if spec["t"] == "i" else 1e6)
            with pytest.raises(ValueError, match="out of range"):
                build(node_name, **_links_for(node_name), **{fname: bad})
            return
    pytest.skip("no bounded numeric field")


@pytest.mark.parametrize("node_name", _ALL_NODES)
def test_enum_violation_raises(node_name):
    schema = SCHEMAS[ALIASES.get(node_name, node_name)]
    overrides = _NODE_OVERRIDES.get(node_name, {})
    for fname, spec in schema.items():
        if fname in overrides:
            continue
        if spec["t"] in ("enum", "dyn", "tri"):
            if spec["t"] == "dyn" and spec["dom"] == "any_str":
                continue
            with pytest.raises(ValueError, match="invalid"):
                build(node_name, **_links_for(node_name),
                      **{fname: "__not_a_real_option__"})
            return
    pytest.skip("no enum field")


def test_typo_example_from_review():
    """build("SamplerSonarEulerA", momemtum=2) must raise (the reference's
    typed schemas reject typos; the round-1 builder silently dropped them)."""
    with pytest.raises(ValueError, match="momemtum"):
        build("SamplerSonarEulerA", momemtum=2)


def test_validate_false_escape_hatch():
    chain = build("SonarCustomNoise", _validate=False, factor=1.0,
                  noise_type="gaussian")
    assert len(chain.items) == 1


def test_string_defaults_byte_exact_vs_ref_json():
    """Regression for the gen_schemas.py blind `.replace(": true", ...)`:
    it corrupted YAML booleans INSIDE string-typed defaults (five lines of
    the WaveletCFG yaml_parameters template). Every string default in the
    generated table must match tools/ref_schemas.json byte-for-byte."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "ref_schemas.json")
    ref = json.load(open(path))
    checked = 0
    for node, spec in ref.items():
        for section in ("required", "optional"):
            for fname, entry in spec.get(section, {}).items():
                if entry.get("type") != "STRING" or "default" not in entry:
                    continue
                got = SCHEMAS[node][fname].get("d")
                assert got == entry["default"], (
                    f"{node}.{fname} string default diverges from the "
                    f"reference schema")
                checked += 1
    assert checked >= 10  # the sweep actually covered string defaults
