"""PN (LFSR) and Zadoff-Chu sequence generation.

Parity with reference commpy/sequences.py:21-110.  Sequence generation is a
configuration-time operation (run once per link setup), so the LFSR is
computed on the host; a `lax.scan` device variant is provided for cases
where sequences must be generated inside a jitted program (e.g. per-frame
scrambling on device).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pnsequence", "zcsequence", "pnsequence_device"]


def pnsequence(pn_order: int, pn_seed, pn_mask, seq_length: int) -> np.ndarray:
    """LFSR PN sequence, host path.

    Output convention matches reference sequences.py:68-72: ``sr[-1]`` is
    emitted first; feedback bit ``sum(sr & mask) % 2`` enters ``sr[0]``.
    """
    if len(pn_seed) != pn_order:
        raise ValueError("pn_seed has not the same length as pn_order")
    if len(pn_mask) != pn_order:
        raise ValueError("pn_mask has not the same length as pn_order")

    sr = np.fromiter(pn_seed, np.int8, pn_order)
    mask = np.fromiter(pn_mask, np.int8, pn_order)
    pnseq = np.empty(seq_length, np.int8)
    for i in range(seq_length):
        pnseq[i] = sr[-1]
        new_bit = np.sum(sr & mask) % 2
        sr[1:] = sr[:-1]
        sr[0] = new_bit
    return pnseq


def pnsequence_device(pn_order: int, pn_seed, pn_mask, seq_length: int):
    """LFSR PN sequence as a `lax.scan` (jit-compatible device path)."""
    sr0 = jnp.asarray(np.fromiter(pn_seed, np.int8, pn_order), jnp.int8)
    mask = jnp.asarray(np.fromiter(pn_mask, np.int8, pn_order), jnp.int8)

    def step(sr, _):
        out = sr[-1]
        new_bit = (jnp.sum(sr & mask) % 2).astype(jnp.int8)
        sr = jnp.roll(sr, 1).at[0].set(new_bit)
        return sr, out

    _, seq = jax.lax.scan(step, sr0, None, length=seq_length)
    return seq


def zcsequence(u: int, seq_length: int, q: int = 0) -> np.ndarray:
    """Zadoff-Chu sequence (reference sequences.py:76-110), vectorized."""
    for el in (u, seq_length, q):
        if not float(el).is_integer():
            raise ValueError("{} is not an integer".format(el))
    if u <= 0:
        raise ValueError("u is not stricly positive")
    if u >= seq_length:
        raise ValueError("u is not stricly smaller than seq_length")
    if np.gcd(int(u), int(seq_length)) != 1:
        raise ValueError(
            "the greatest common denominator of u and seq_length is not 1"
        )
    cf = seq_length % 2
    n = np.arange(seq_length)
    return np.exp(-1j * np.pi * u * n * (n + cf + 2.0 * q) / seq_length)
