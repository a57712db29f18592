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

__all__ = [
    "RandInterlv",
    "interleave",
    "deinterleave",
    "inverse_permutation",
    "block_interleaver",
    "conv_interleave",
    "conv_deinterleave",
    "conv_interleaver_delay",
]


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


# ---------------------------------------------------------------------------
# Block and convolutional (Forney) interleavers — beyond the reference
# (CommPy ships only RandInterlv); classic burst-spreading partners of the
# algebraic codecs (ops/rs.py): DVB-T runs RS(204,188) behind a Forney
# interleaver with I=12, M=17.
# ---------------------------------------------------------------------------

def block_interleaver(rows: int, cols: int) -> np.ndarray:
    """Permutation writing row-wise and reading column-wise.

    Use with :func:`interleave` / :func:`deinterleave`; a burst of b
    consecutive interleaved symbols lands at least ``cols`` apart after
    deinterleaving (for b <= rows) — size ``rows`` to the burst length
    and ``cols`` to the required separation.
    """
    return np.arange(rows * cols).reshape(rows, cols).T.reshape(-1)


def conv_interleaver_delay(I: int, M: int) -> int:
    """End-to-end delay of the (I, M) Forney interleaver pair."""
    return I * (I - 1) * M


def _conv_indices(n: int, I: int, M: int, deinter: bool):
    if I < 1 or M < 0:
        raise ValueError(f"need I >= 1 branches and M >= 0, got ({I}, {M})")
    i = np.arange(n)
    branch = i % I
    delay = (I - 1 - branch if deinter else branch) * M * I
    src = i - delay
    valid = src >= 0
    return np.where(valid, src, 0), valid


def conv_interleave(x, I: int, M: int, fill=0):
    """Forney convolutional interleaver along the last axis.

    Branch ``i mod I`` delays by ``(i mod I) * M`` branch symbols
    (``* I`` absolute).  Stream semantics on a finite frame: positions
    reading before the frame start yield ``fill``.  The pair
    ``conv_deinterleave(conv_interleave(x))`` reproduces ``x`` delayed
    by :func:`conv_interleaver_delay`.
    """
    x = jnp.asarray(x)
    src, valid = _conv_indices(x.shape[-1], I, M, deinter=False)
    out = jnp.take(x, jnp.asarray(src), axis=-1)
    return jnp.where(jnp.asarray(valid), out,
                     jnp.asarray(fill, x.dtype))


def conv_deinterleave(x, I: int, M: int, fill=0):
    """Inverse branch delays of :func:`conv_interleave` (same I, M)."""
    x = jnp.asarray(x)
    src, valid = _conv_indices(x.shape[-1], I, M, deinter=True)
    out = jnp.take(x, jnp.asarray(src), axis=-1)
    return jnp.where(jnp.asarray(valid), out,
                     jnp.asarray(fill, x.dtype))
