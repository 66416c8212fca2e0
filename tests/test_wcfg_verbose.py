"""WCFG verbose rule-dump channel (reference py/wavelet_cfg.py:225,364-401):
``verbose: true`` on a rule emits resolved percentages, blend strengths, and
per-part yl/yh scales through the pluggable verbose sink — including under
jit (the dump rides jax.debug.callback)."""

import jax
import jax.numpy as jnp

from sonar_tpu.cfg import WaveletCFG, WCFGRules
from sonar_tpu.utils.profiling import set_verbose_sink, verbose_writer


def _args(x):
    return dict(input=x, sigma=jnp.asarray([3.0]), cond=x * 0.5, uncond=x * 0.4,
                cond_denoised=x * 0.5, uncond_denoised=x * 0.4, cond_scale=7.0)


def _run(rules_kwargs):
    x = jax.random.normal(jax.random.key(0), (1, 4, 16, 16))
    msgs = []
    set_verbose_sink(msgs.append)
    try:
        wcfg = WaveletCFG(rules=WCFGRules.build(**rules_kwargs))
        out = jax.jit(wcfg)(_args(x))
        jax.block_until_ready(out)
    finally:
        set_verbose_sink(print)
    return out, msgs


def test_verbose_emits_structured_dump():
    out, msgs = _run(dict(
        verbose=True, yl_scale=1.0, yh_scales=1.0,
        diff={"yl_scale": 1.25, "yh_scales": [0.9, 1.1]},
    ))
    assert out.shape == (1, 4, 16, 16)
    header = [m for m in msgs if m.startswith("WCFG: rule")]
    scales = [m for m in msgs if "diff: yl_scale=" in m]
    assert header, msgs
    assert "pct_sampling=" in header[0] and "blend=" in header[0]
    assert scales, msgs
    assert "1.25" in scales[0]


def test_verbose_off_emits_nothing():
    _, msgs = _run(dict(yl_scale=1.1, yh_scales=0.9))
    assert msgs == []


def test_verbose_writer_default_sink_restored():
    # sanity: the module-level writer is callable after the tests above
    verbose_writer("")
