"""Placeholder for the collatz noise generator (implemented later this round)."""

from .generators import Generator


class CollatzGenerator(Generator):
    name = "collatz"

    def generate(self, ctx, state, key, sigma, sigma_next):
        raise NotImplementedError("collatz noise generator not yet implemented")
