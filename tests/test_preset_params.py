"""Preset-parameter exactness vs the reference registry partials
(py/noise.py:2244-2457) — config-level parity proof for every preset that
carries non-default parameters."""

import pytest

from sonar_tpu.noise import get_noise_item
from sonar_tpu.noise.generators import MixedGenerator


def _params(name, **kw):
    return get_noise_item(name, **kw).params()


def test_onef_presets():
    assert _params("onef_pinkish")["alpha"] == -0.5
    assert _params("onef_greenish")["alpha"] == 0.5


def test_powerlaw_presets():
    w = _params("white")
    assert w["alpha"] == 0.0 and w["use_sign"] is True
    g = _params("grey")
    assert g["alpha"] == 0.0 and g["use_sign"] is False
    v = _params("velvet")
    assert v["alpha"] == 1.0 and v["use_sign"] is True
    assert tuple(v["div_max_dims"]) == (-3, -2, -1)
    vi = _params("violet")
    assert vi["alpha"] == 0.5 and vi["use_sign"] is True
    assert tuple(vi["div_max_dims"]) == (-3, -2, -1)


def _mix_members(name):
    item = get_noise_item(name)
    assert isinstance(item, MixedGenerator)
    return item


def test_onef_mix_presets():
    # pinkishgreenish: alphas (0.5, -0.5), output x0.5 (py/noise.py:2253-2262)
    m = _mix_members("onef_pinkishgreenish")
    alphas = [gen.alpha for gen, _t in m._members()]
    assert alphas == [0.5, -0.5]
    assert m.output_fun == 0.5
    # pinkish_mix: (-0.5 x -1, -0.5), output x0.5
    m = _mix_members("onef_pinkish_mix")
    members = m._members()
    assert [g.alpha for g, _ in members] == [-0.5, -0.5]
    assert members[0][1] == -1.0 and members[1][1] is None
    # greenish_mix mirrors with +0.5
    m = _mix_members("onef_greenish_mix")
    assert [g.alpha for g, _ in m._members()] == [0.5, 0.5]


def test_rainbow_presets():
    # rainbow_mild: green_test x(0.55, 0.7), output x1.15 (py/noise.py:2324-2339)
    m = _mix_members("rainbow_mild")
    assert [t for _g, t in m._members()] == [0.55, 0.7]
    assert m.output_fun == 1.15
    m = _mix_members("rainbow_intense")
    assert [t for _g, t in m._members()] == [0.75, 0.5]
    assert m.output_fun == 1.15


def test_pyramid_presets():
    # variants: upscale modes + discount5 (py/noise.py:2344-2400)
    assert _params("pyramid_bislerp")["upscale_mode"] == "bislerp"
    assert _params("highres_pyramid_bislerp")["upscale_mode"] == "bislerp"
    assert _params("pyramid_area")["upscale_mode"] == "area"
    assert _params("pyramid_old_bislerp")["upscale_mode"] == "bislerp"
    assert _params("pyramid_discount5")["discount"] == 0.5
    # pyramid_mix: discount 0.6 pair with transforms (0.2, -0.8)
    m = _mix_members("pyramid_mix")
    members = m._members()
    assert [g.discount for g, _ in members] == [0.6, 0.6]
    assert [t for _g, t in members] == [0.2, -0.8]
    # area/bislerp mixes use discount 0.5
    m = _mix_members("pyramid_mix_area")
    assert [g.discount for g, _ in m._members()] == [0.5, 0.5]
    assert [g.upscale_mode for g, _ in m._members()] == ["area", "area"]


def test_generator_algorithm_defaults():
    """Spot-check the transcribed algorithm constants (SURVEY §2.3)."""
    assert _params("uniform")["mul_fac"] == 3.46
    st = _params("studentt")
    assert st["scale"] == 0.2 and st["df"] == 1.0 and st["quantile_fac"] == 0.75
    hp = _params("highres_pyramid")
    assert hp["discount"] == 0.7 and hp["iterations"] == 4
    po = _params("pyramid_old")
    assert po["discount"] == 0.8 and po["iterations"] == 5
    assert po["upscale_mode"] == "nearest-exact"
    py = _params("pyramid")
    assert py["discount"] == 0.7 and py["iterations"] == 10
    assert _params("laplacian")["div_fac"] == 4.0
    pl = _params("perlin")
    assert pl["div_fac"] == 2.0 and pl["iterations"] == 2
    dn = _params("distro")
    assert dn["distro"] == "normal" and dn["quantile_norm"] == 0.85
    assert dn["quantile_norm_pow"] == 0.5 and dn["quantile_norm_dim"] == 1
    co = _params("collatz")
    assert co["chain_length"] == (1, 1, 2, 2, 3, 3)
    assert co["dims"] == (-1, -1, -2, -2)
    assert co["even_multiplier"] == 0.5 and co["odd_multiplier"] == 3.0
    assert co["chain_offset"] == 5 and co["rmin"] == -8000.0


def test_voronoi_presets():
    vf = _params("voronoi_fuzz")
    assert vf["n_points"] == (256,) and vf["octaves"] == 1
    assert vf["distance_mode"] == ("fuzz:name=angle_tanh:fuzz=0.1",)
    assert vf["result_mode"] == ("diff2",) and vf["z_max"] == 0.0
    m = _mix_members("voronoi_mix")
    members = m._members()
    v = members[0][0]
    assert v.octaves == 3 and v.octave_mode == "new_features" and v.gain == 0.75
    assert members[0][1] == 0.6 and members[1][1] == 0.4
