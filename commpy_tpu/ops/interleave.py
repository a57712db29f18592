"""Interleavers as permutation gathers.

Reference semantics (commpy/channelcoding/interleavers.py:13-77):
``interlv`` is a gather ``x[p]``; ``deinterlv`` is the inverse scatter.
On device both directions are gathers (the inverse permutation is
precomputed on host).  ``RandInterlv`` keeps the reference's
Mersenne-Twister permutation so interleaver patterns are bit-identical.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from numpy.random import mtrand

__all__ = ["RandInterlv", "interleave", "deinterleave", "inverse_permutation"]


def inverse_permutation(p_array) -> np.ndarray:
    p = np.asarray(p_array)
    inv = np.empty_like(p)
    inv[p] = np.arange(p.size)
    return inv


def interleave(x, p_array):
    """Gather along the last axis: out[..., i] = x[..., p[i]]."""
    return jnp.take(jnp.asarray(x), jnp.asarray(p_array), axis=-1)


def deinterleave(x, p_array):
    """Inverse of :func:`interleave` (gather by the inverse permutation)."""
    return jnp.take(
        jnp.asarray(x), jnp.asarray(inverse_permutation(p_array)), axis=-1
    )


class _Interleaver:
    def interlv(self, in_array):
        in_array = np.asarray(in_array)
        return in_array[self.p_array]

    def deinterlv(self, in_array):
        in_array = np.asarray(in_array)
        out = np.zeros(len(in_array), in_array.dtype)
        out[self.p_array] = in_array
        return out


class RandInterlv(_Interleaver):
    """Random interleaver seeded exactly like the reference (MT19937)."""

    def __init__(self, length, seed):
        rand_gen = mtrand.RandomState(seed)
        self.p_array = rand_gen.permutation(np.arange(length))
