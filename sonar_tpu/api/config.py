"""YAML configuration surface — the reference's three escape hatches with
identical key names so existing snippets port verbatim (SURVEY §5.6):

1. ``sonar_params`` blocks overriding SonarConfig fields incl.
   enums-by-name (py/sonar.py:98-131, README.md:71-106);
2. ``yaml_parameters`` → generator ``ns_kwargs`` (py/noise.py:31-41);
3. Wavelet-CFG rule documents (py/nodes/misc.py:670-796).
"""

from __future__ import annotations

from typing import Any

import yaml

from ..cfg import WaveletCFG, WCFGRules
from ..samplers.momentum import SonarConfig


def load_yaml_params(text: str | None) -> dict:
    """Parse a ``yaml_parameters`` block into kwargs (must be a mapping)."""
    if not text or not text.strip():
        return {}
    parsed = yaml.safe_load(text)
    if parsed is None:
        return {}
    if not isinstance(parsed, dict):
        raise ValueError("YAML parameters must parse to a mapping")
    return parsed


def sonar_config_from_yaml(text: str | None,
                           base: SonarConfig | None = None) -> SonarConfig:
    """Apply a ``sonar_params`` YAML override block (py/sonar.py:104-131)."""
    params = load_yaml_params(text)
    return (base or SonarConfig()).updated(params)


def wcfg_rules_from_yaml(text: str | None, **node_fields) -> WCFGRules:
    """Build WCFG rules from a YAML document merged over node fields
    (py/nodes/misc.py:846-896)."""
    params = dict(node_fields)
    params |= load_yaml_params(text)
    return WCFGRules.build(**params)


def wavelet_cfg_from_yaml(text: str | None, *, existing_cfg=None,
                          **node_fields) -> WaveletCFG:
    return WaveletCFG(rules=wcfg_rules_from_yaml(text, **node_fields),
                      existing_cfg=existing_cfg)
