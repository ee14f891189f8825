from .math import fract, r2_sequence, degrees_to_radians

__all__ = ["fract", "r2_sequence", "degrees_to_radians"]
