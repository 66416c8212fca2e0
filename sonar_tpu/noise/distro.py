"""Placeholder for the distro noise generator (implemented later this round)."""

from .generators import Generator


class DistroGenerator(Generator):
    name = "distro"

    def generate(self, ctx, state, key, sigma, sigma_next):
        raise NotImplementedError("distro noise generator not yet implemented")
