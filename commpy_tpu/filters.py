"""Reference-compatible filters module (commpy.filters API)."""
from .ops.filters import gaussianfilter, rcosfilter, rectfilter, rrcosfilter

__all__ = ["rcosfilter", "rrcosfilter", "gaussianfilter", "rectfilter"]
