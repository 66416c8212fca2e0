from .base import (
    NoiseCtx,
    NoiseItem,
    NoiseSamplerHandle,
    make_noise_sampler,
)
from .blendfilter import BlendFilterNoise, enhance_tensor, ffilter
from .chain import NoiseChain
from .combinators import (
    BlendedNoise,
    ChannelNoise,
    CompositeNoise,
    CustomNoiseParametersNoise,
    GuidedNoise,
    LatentOperationFilteredNoise,
    ModulatedNoise,
    NormalizeToScaleNoise,
    PatternBreakNoise,
    PerDimNoise,
    QuantileFilteredNoise,
    RandomNoise,
    RepeatedNoise,
    ResizedNoise,
    RippleFilteredNoise,
    ScheduledNoise,
    ShuffledNoise,
)
from .generators import GENERATOR_CLASSES
from .items import TypedNoiseItem
from .presets import NOISE_TYPES, get_noise_item, noise_type_names

__all__ = [
    "GENERATOR_CLASSES",
    "NOISE_TYPES",
    "BlendFilterNoise",
    "BlendedNoise",
    "ChannelNoise",
    "CompositeNoise",
    "CustomNoiseParametersNoise",
    "GuidedNoise",
    "LatentOperationFilteredNoise",
    "ModulatedNoise",
    "NoiseChain",
    "NormalizeToScaleNoise",
    "PatternBreakNoise",
    "PerDimNoise",
    "QuantileFilteredNoise",
    "RandomNoise",
    "RepeatedNoise",
    "ResizedNoise",
    "RippleFilteredNoise",
    "ScheduledNoise",
    "ShuffledNoise",
    "NoiseCtx",
    "NoiseItem",
    "NoiseSamplerHandle",
    "TypedNoiseItem",
    "get_noise_item",
    "make_noise_sampler",
    "noise_type_names",
]
