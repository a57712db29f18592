"""Reference-compatible impairments module (commpy.impairments API)."""
from __future__ import annotations

import numpy as np

from .ops.impairments import add_frequency_offset as _afo_device

__all__ = ["add_frequency_offset"]


def add_frequency_offset(waveform, Fs, delta_f):
    """Apply CFO; NumPy-in/NumPy-out shim over the device kernel."""
    return np.asarray(_afo_device(np.asarray(waveform), Fs, delta_f))
