"""Reference-compatible sequences module (commpy.sequences API)."""
from .ops.sequences import pnsequence, zcsequence

__all__ = ["pnsequence", "zcsequence"]
