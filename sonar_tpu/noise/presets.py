"""The 37-member noise-type registry (py/noise.py:2244-2489).

Every ``NoiseType`` enum member of the reference maps here to a factory
producing a configured :class:`Generator` spec. Preset parameters are exact
transcriptions of the registry partials (onef ±0.5 alphas, powerlaw
white/grey/velvet/violet, the green_test rainbow mixes ×1.15, pyramid mixes
0.2/−0.8, voronoi fuzz/mix presets, ...).
"""

from __future__ import annotations

from typing import Callable

from .generators import (
    BrownianGenerator,
    GaussianGenerator,
    Generator,
    GreenTestGenerator,
    HighresPyramidGenerator,
    LaplacianGenerator,
    MixedGenerator,
    OneFGenerator,
    PerlinOldGenerator,
    PinkOldGenerator,
    PowerOldGenerator,
    PowerLawGenerator,
    PyramidGenerator,
    PyramidOldGenerator,
    StudentTGenerator,
    UniformGenerator,
)

NOISE_TYPES: dict[str, Callable[..., Generator]] = {}


def register_noise_type(name: str, factory: Callable[..., Generator]) -> None:
    NOISE_TYPES[name] = factory


def _simple(cls, **preset):
    def factory(factor=1.0, normalize=None, **kwargs):
        return cls(factor, normalize=normalize, **(preset | kwargs))

    return factory


def _mixed(mix_name, members, output_fun=None):
    """members: tuple of (cls, preset_kwargs, transform)."""

    def factory(factor=1.0, normalize=None, **kwargs):
        mix = tuple((cls(**mkw), transform) for cls, mkw, transform in members)
        return MixedGenerator(
            factor,
            normalize=normalize,
            mix_name=mix_name,
            noise_mix=mix,
            output_fun=output_fun,
            **kwargs,
        )

    return factory


register_noise_type("gaussian", _simple(GaussianGenerator))
register_noise_type("uniform", _simple(UniformGenerator))
register_noise_type("brownian", _simple(BrownianGenerator))
register_noise_type("perlin", _simple(PerlinOldGenerator))
register_noise_type("studentt", _simple(StudentTGenerator))
register_noise_type("pink_old", _simple(PinkOldGenerator))
register_noise_type("power_old", _simple(PowerOldGenerator))
register_noise_type("laplacian", _simple(LaplacianGenerator))
register_noise_type("green_test", _simple(GreenTestGenerator))
register_noise_type("pyramid_old", _simple(PyramidOldGenerator))
register_noise_type("pyramid", _simple(PyramidGenerator))
register_noise_type("highres_pyramid", _simple(HighresPyramidGenerator))
register_noise_type("onef_pinkish", _simple(OneFGenerator, alpha=-0.5))
register_noise_type("onef_greenish", _simple(OneFGenerator, alpha=0.5))
register_noise_type(
    "onef_pinkishgreenish",
    _mixed(
        "onef_pinkishgreenish",
        ((OneFGenerator, {"alpha": 0.5}, None), (OneFGenerator, {"alpha": -0.5}, None)),
        output_fun=0.5,
    ),
)
register_noise_type(
    "onef_pinkish_mix",
    _mixed(
        "onef_pinkish_mix",
        ((OneFGenerator, {"alpha": -0.5}, -1.0), (OneFGenerator, {"alpha": -0.5}, None)),
        output_fun=0.5,
    ),
)
register_noise_type(
    "onef_greenish_mix",
    _mixed(
        "onef_greenish_mix",
        ((OneFGenerator, {"alpha": 0.5}, -1.0), (OneFGenerator, {"alpha": 0.5}, None)),
        output_fun=0.5,
    ),
)
register_noise_type("white", _simple(PowerLawGenerator, alpha=0.0, use_sign=True))
register_noise_type("grey", _simple(PowerLawGenerator, alpha=0.0, use_sign=False))
register_noise_type(
    "velvet",
    _simple(PowerLawGenerator, alpha=1.0, use_sign=True, div_max_dims=(-3, -2, -1)),
)
register_noise_type(
    "violet",
    _simple(PowerLawGenerator, alpha=0.5, use_sign=True, div_max_dims=(-3, -2, -1)),
)
register_noise_type(
    "rainbow_mild",
    _mixed(
        "rainbow_mild",
        ((GreenTestGenerator, {}, 0.55), (GreenTestGenerator, {}, 0.7)),
        output_fun=1.15,
    ),
)
register_noise_type(
    "rainbow_intense",
    _mixed(
        "rainbow_intense",
        ((GreenTestGenerator, {}, 0.75), (GreenTestGenerator, {}, 0.5)),
        output_fun=1.15,
    ),
)
register_noise_type(
    "pyramid_bislerp", _simple(PyramidGenerator, upscale_mode="bislerp")
)
register_noise_type(
    "highres_pyramid_bislerp", _simple(HighresPyramidGenerator, upscale_mode="bislerp")
)
register_noise_type("pyramid_area", _simple(PyramidGenerator, upscale_mode="area"))
register_noise_type(
    "highres_pyramid_area", _simple(HighresPyramidGenerator, upscale_mode="area")
)
register_noise_type(
    "pyramid_old_bislerp", _simple(PyramidOldGenerator, upscale_mode="bislerp")
)
register_noise_type(
    "pyramid_old_area", _simple(PyramidOldGenerator, upscale_mode="area")
)
register_noise_type("pyramid_discount5", _simple(PyramidGenerator, discount=0.5))
register_noise_type(
    "pyramid_mix",
    _mixed(
        "pyramid_mix",
        (
            (PyramidGenerator, {"discount": 0.6}, 0.2),
            (PyramidGenerator, {"discount": 0.6}, -0.8),
        ),
    ),
)
register_noise_type(
    "pyramid_mix_area",
    _mixed(
        "pyramid_mix_area",
        (
            (PyramidGenerator, {"discount": 0.5, "upscale_mode": "area"}, 0.2),
            (PyramidGenerator, {"discount": 0.5, "upscale_mode": "area"}, -0.8),
        ),
    ),
)
register_noise_type(
    "pyramid_mix_bislerp",
    _mixed(
        "pyramid_mix_bislerp",
        (
            (PyramidGenerator, {"discount": 0.5, "upscale_mode": "bislerp"}, 0.2),
            (PyramidGenerator, {"discount": 0.5, "upscale_mode": "bislerp"}, -0.8),
        ),
    ),
)


def _register_late() -> None:
    """Registry entries whose generators live in separate modules (imported
    lazily to keep import costs down and avoid cycles)."""
    from .collatz import CollatzGenerator
    from .distro import DistroGenerator
    from .voronoi import VoronoiGenerator
    from .wavelet import WaveletGenerator

    register_noise_type("distro", _simple(DistroGenerator))
    register_noise_type("collatz", _simple(CollatzGenerator))
    register_noise_type("wavelet", _simple(WaveletGenerator))
    register_noise_type(
        "voronoi_fuzz",
        _simple(
            VoronoiGenerator,
            n_points=(256,),
            octaves=1,
            distance_mode=("fuzz:name=angle_tanh:fuzz=0.1",),
            result_mode=("diff2",),
            z_max=0.0,
        ),
    )
    register_noise_type(
        "voronoi_mix",
        _mixed(
            "voronoi_mix",
            (
                (
                    VoronoiGenerator,
                    {
                        "n_points": (256,),
                        "octaves": 3,
                        "distance_mode": ("euclidean",),
                        "result_mode": ("diff2",),
                        "octave_mode": "new_features",
                        "lacunarity": 2.0,
                        "gain": 0.75,
                        "z_max": 0.0,
                    },
                    0.6,
                ),
                (GaussianGenerator, {}, 0.4),
            ),
        ),
    )


def get_noise_item(
    noise_type: str | None, factor: float = 1.0, normalize: bool | None = None, **kwargs
) -> Generator:
    """String dispatch (py/noise.py:2460-2489). Brownian sigma requirements
    are validated at init_state time when the ctx is known."""
    if noise_type is None:
        noise_type = "gaussian"
    name = noise_type.lower()
    if name not in NOISE_TYPES:
        _register_late()
    factory = NOISE_TYPES.get(name)
    if factory is None:
        valid = ", ".join(sorted(NOISE_TYPES))
        raise ValueError(f"Unknown noise type {noise_type!r}; valid: {valid}")
    return factory(factor=factor, normalize=normalize, **kwargs)


def noise_type_names(default: str | None = "gaussian", skip=None):
    """Default-first name iteration (py/noise_generation.py:71-80)."""
    _register_late()
    names = sorted(NOISE_TYPES)
    if default is not None:
        yield default
    for n in names:
        if n == default or (skip and n in skip):
            continue
        yield n
