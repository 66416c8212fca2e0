"""Placeholder for the voronoi noise generator (implemented later this round)."""

from .generators import Generator


class VoronoiGenerator(Generator):
    name = "voronoi"

    def generate(self, ctx, state, key, sigma, sigma_next):
        raise NotImplementedError("voronoi noise generator not yet implemented")
