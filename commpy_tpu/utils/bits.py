"""Bit packing / unpacking primitives.

TPU-native counterpart of the reference's scalar bit helpers
(reference: commpy/utilities.py:30-109).  The device path works on whole
batches at once: ``unpack_bits`` produces a trailing bit axis via vectorized
shifts (MSB first, matching ``dec2bitarray``), ``pack_bits`` contracts the
trailing bit axis against a powers-of-two vector.

Host (NumPy) variants are provided for table construction at trace time.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "unpack_bits",
    "pack_bits",
    "np_unpack_bits",
    "np_pack_bits",
]


def unpack_bits(x, bit_width: int):
    """Unpack integers into bits, MSB first.

    Parameters
    ----------
    x : int array, any shape ``[...]``
    bit_width : static int

    Returns
    -------
    bits : int8 array of shape ``[..., bit_width]``

    Matches ``dec2bitarray`` ordering (reference commpy/utilities.py:58-86):
    bit ``j`` of the output is ``(x >> (bit_width-1-j)) & 1``.
    """
    x = jnp.asarray(x)
    shifts = jnp.arange(bit_width - 1, -1, -1, dtype=x.dtype)
    return ((x[..., None] >> shifts) & 1).astype(jnp.int8)


def pack_bits(bits):
    """Pack the trailing bit axis into integers, MSB first.

    Inverse of :func:`unpack_bits`; matches ``bitarray2dec``
    (reference commpy/utilities.py:89-109).

    Parameters
    ----------
    bits : int array ``[..., w]`` of 0/1

    Returns
    -------
    ints : int32 array ``[...]``
    """
    bits = jnp.asarray(bits)
    w = bits.shape[-1]
    weights = (1 << jnp.arange(w - 1, -1, -1)).astype(jnp.int32)
    return jnp.sum(bits.astype(jnp.int32) * weights, axis=-1)


def np_unpack_bits(x, bit_width: int) -> np.ndarray:
    """Host-side :func:`unpack_bits` (NumPy, for table construction)."""
    x = np.asarray(x, dtype=np.int64)
    shifts = np.arange(bit_width - 1, -1, -1)
    return ((x[..., None] >> shifts) & 1).astype(np.int8)


def np_pack_bits(bits) -> np.ndarray:
    """Host-side :func:`pack_bits` (NumPy, for table construction)."""
    bits = np.asarray(bits, dtype=np.int64)
    w = bits.shape[-1]
    weights = 1 << np.arange(w - 1, -1, -1, dtype=np.int64)
    return (bits * weights).sum(axis=-1)
