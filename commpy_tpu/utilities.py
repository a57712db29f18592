"""Reference-compatible utilities module (commpy.utilities API).

NumPy-in / NumPy-out shims over :mod:`commpy_tpu.utils` so CommPy users
can switch imports unchanged (reference commpy/utilities.py:30-205).
"""
from __future__ import annotations

import numpy as np

from .utils.bits import np_pack_bits, np_unpack_bits

__all__ = [
    "dec2bitarray",
    "decimal2bitarray",
    "bitarray2dec",
    "hamming_dist",
    "euclid_dist",
    "upsample",
    "signal_power",
]


def dec2bitarray(in_number, bit_width):
    """Integer or array-like of integers to MSB-first bit array (int8)."""
    if isinstance(in_number, (np.integer, int)):
        return np_unpack_bits(int(in_number), bit_width).astype(np.int8)
    arr = np.asarray(list(in_number))
    return np_unpack_bits(arr, bit_width).reshape(-1).astype(np.int8)


def decimal2bitarray(number, bit_width):
    """Single-integer variant of :func:`dec2bitarray`."""
    return np_unpack_bits(int(number), bit_width).astype(np.int8)


def bitarray2dec(in_bitarray):
    """MSB-first bit array to integer."""
    arr = np.asarray(in_bitarray)
    if arr.size == 0:
        return 0
    return int(np_pack_bits(arr))


def hamming_dist(in_bitarray_1, in_bitarray_2):
    return int(np.bitwise_xor(in_bitarray_1, in_bitarray_2).sum())


def euclid_dist(in_array1, in_array2):
    d = np.asarray(in_array1) - np.asarray(in_array2)
    return float((d * d).sum())


def upsample(x, n):
    """Zero-insertion upsample; always complex (utilities.py:157-181)."""
    x = np.asarray(x)
    y = np.zeros(len(x) * n, dtype=complex)
    y[0::n] = x
    return y


def signal_power(signal):
    return float(np.mean(np.abs(np.asarray(signal)) ** 2))
