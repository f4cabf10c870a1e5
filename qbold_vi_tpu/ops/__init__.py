from . import bessel, physics

__all__ = ["bessel", "physics"]
