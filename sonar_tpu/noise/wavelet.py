"""Placeholder for the wavelet noise generator (implemented later this round)."""

from .generators import Generator


class WaveletGenerator(Generator):
    name = "wavelet"

    def generate(self, ctx, state, key, sigma, sigma_next):
        raise NotImplementedError("wavelet noise generator not yet implemented")
