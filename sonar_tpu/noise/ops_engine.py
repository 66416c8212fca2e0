"""Native ops rule engine + BlehOpsNoise (reference: py/noise.py:2190-2241 +
py/nodes/integrations.py:103-182).

The reference pipes noise through the external bleh pack's block-ops "rule
programs" (YAML rule lists with conditions + op pipelines). This is a native
reinterpretation with documented semantics:

```yaml
- when:                      # all listed conditions must hold (traced)
    sigma_min: 0.0
    sigma_max: 14.6
  ops:                       # applied in order to the target tensor
    - [multiply, 1.5]
    - [add, 0.1]
    - [blend, {mode: lerp, strength: 0.5, source: hsp}]   # blend with x
    - [ffilter, {filter: highpass, threshold: 0.0, scale: 1.0, strength: 1.0}]
    - [enhance, {mode: sharpen, scale: 0.3}]
    - [roll, {dim: -1, amount: 4}]
    - [flip, {dim: -1}]
    - [normalize, {factor: 1.0}]
    - [quantile, {quantile: 0.9, strategy: clamp}]
```

Conditions on traced values (sigma) are evaluated as traced booleans: the
rule's output is selected with `jnp.where`, so programs compile into the
sampling scan.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from ..core.blend import BLENDING_MODES
from ..core.normalize import quantile_normalize, scale_noise
from .base import NoiseItem
from .blendfilter import enhance_tensor, ffilter


def _op_multiply(t, state, arg):
    return t * float(arg)


def _op_add(t, state, arg):
    return t + float(arg)


def _op_blend(t, state, arg):
    arg = arg or {}
    mode = arg.get("mode", "lerp")
    strength = float(arg.get("strength", 0.5))
    source = arg.get("source", "hsp")
    other = state.get(source)
    if other is None:
        raise ValueError(f"blend op: unknown source {source!r}")
    return BLENDING_MODES[mode](t, other, strength)


def _op_ffilter(t, state, arg):
    arg = arg or {}
    return ffilter(t, float(arg.get("threshold", 0.0)),
                   float(arg.get("scale", 1.0)), arg.get("filter", "none"),
                   float(arg.get("strength", 1.0)))


def _op_enhance(t, state, arg):
    arg = arg or {}
    return enhance_tensor(t, arg.get("mode", "none"),
                          float(arg.get("scale", 1.0)),
                          sigma=state.get("sigma"))


def _op_roll(t, state, arg):
    arg = arg or {}
    return jnp.roll(t, int(arg.get("amount", 1)), axis=int(arg.get("dim", -1)))


def _op_flip(t, state, arg):
    arg = arg or {}
    return jnp.flip(t, axis=int(arg.get("dim", -1)))


def _op_normalize(t, state, arg):
    arg = arg or {}
    return scale_noise(t, float(arg.get("factor", 1.0)), normalized=True)


def _op_quantile(t, state, arg):
    arg = arg or {}
    return quantile_normalize(t, quantile=float(arg.get("quantile", 0.85)),
                              dim=arg.get("dim", 1),
                              flatten=bool(arg.get("flatten", True)),
                              strategy=arg.get("strategy", "clamp"))


def _op_abs(t, state, arg):
    return jnp.abs(t)


def _op_neg(t, state, arg):
    return -t


OPS_TABLE = {
    "multiply": _op_multiply,
    "add": _op_add,
    "blend": _op_blend,
    "ffilter": _op_ffilter,
    "enhance": _op_enhance,
    "roll": _op_roll,
    "flip": _op_flip,
    "normalize": _op_normalize,
    "quantile": _op_quantile,
    "abs": _op_abs,
    "neg": _op_neg,
}


@dataclasses.dataclass(frozen=True)
class OpsRule:
    ops: tuple = ()
    sigma_min: float | None = None
    sigma_max: float | None = None

    @classmethod
    def build(cls, spec: dict) -> "OpsRule":
        when = spec.get("when", {}) or {}
        ops = []
        for op in spec.get("ops", ()):
            if isinstance(op, str):
                name, arg = op, None
            else:
                name, *rest = op
                arg = rest[0] if rest else None
            if name not in OPS_TABLE:
                valid = ", ".join(sorted(OPS_TABLE))
                raise ValueError(f"Unknown op {name!r}; valid: {valid}")
            ops.append((name, arg))
        return cls(ops=tuple(ops),
                   sigma_min=when.get("sigma_min"),
                   sigma_max=when.get("sigma_max"))

    def matches(self, state):
        cond = jnp.asarray(True)
        sigma = state.get("sigma")
        if sigma is not None:
            s = jnp.max(jnp.asarray(sigma))
            if self.sigma_min is not None:
                cond = cond & (s >= self.sigma_min)
            if self.sigma_max is not None:
                cond = cond & (s <= self.sigma_max)
        return cond

    def apply(self, state) -> dict:
        t = state["h"]
        out = t
        for name, arg in self.ops:
            out = OPS_TABLE[name](out, state, arg)
        cond = self.matches(state)
        return {**state, "h": jnp.where(cond, out, t)}


@dataclasses.dataclass(frozen=True)
class OpsRuleGroup:
    rules: tuple = ()

    @classmethod
    def build(cls, specs) -> "OpsRuleGroup":
        if isinstance(specs, str):
            import yaml

            specs = yaml.safe_load(specs) or ()
        if isinstance(specs, dict):
            specs = (specs,)
        return cls(rules=tuple(OpsRule.build(s) for s in specs))

    def eval(self, state: dict) -> dict:
        for rule in self.rules:
            state = rule.apply(state)
        return state


class BlehOpsNoise(NoiseItem):
    """Run an ops rule program on generated noise (py/noise.py:2190-2241).
    ``hsp`` in the program state is a zeros reference by default (the
    reference uses the exemplar latent, which the TPU build does not carry;
    pass ``reference`` to supply one)."""

    def __init__(self, factor=1.0, *, noise, rules, normalize=None,
                 reference=None):
        if hasattr(noise, "items") and not noise.items:
            raise ValueError("BlehOpsNoise requires at least one noise item")
        super().__init__(factor, normalize=normalize, noise=noise,
                         rules=rules if isinstance(rules, OpsRuleGroup)
                         else OpsRuleGroup.build(rules),
                         reference=None if reference is None
                         else jnp.asarray(reference))

    def check_dims(self, ctx):
        super().check_dims(ctx)
        self.noise.check_dims(ctx)

    def init_state(self, ctx, key):
        return {"inner": self.noise.init_state(ctx, key)}

    def sample(self, ctx, state, key, sigma, sigma_next, *, normalized=True):
        normalize = self.get_normalize("normalize", normalized)
        noise, st = self.noise.sample(ctx, state["inner"], key, sigma, sigma_next,
                                      normalized=False)
        if self.rules.rules:
            ref = (jnp.zeros(ctx.shape, ctx.dtype) if self.reference is None
                   else self.reference.astype(ctx.dtype))
            prog_state = {"h": noise, "hsp": ref, "sigma": sigma}
            noise = self.rules.eval(prog_state)["h"]
        return (scale_noise(noise, self.factor, normalized=bool(normalize)),
                {**state, "inner": st})
