"""RF impairment models (reference commpy/impairments.py:20-42).

Batched: the waveform may carry arbitrary leading batch axes; the offset is
applied along the trailing (time) axis.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["add_frequency_offset"]


def add_frequency_offset(waveform, Fs: float, delta_f: float):
    """Apply carrier frequency offset exp(j*2*pi*(delta_f/Fs)*n)."""
    w = jnp.asarray(waveform)
    n = jnp.arange(w.shape[-1])
    rot = jnp.exp(1j * 2 * jnp.pi * (delta_f / Fs) * n)
    return w * rot
