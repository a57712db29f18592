"""Scramblers: 802.11 frame-synchronous + self-synchronizing LFSR pair.

Beyond-reference subsystem (CommPy's wifi80211 application, reference
commpy/wifi80211.py, models the 802.11 PHY without the §17.3.5.5 data
scrambler; its sequences module stops at raw PN generation).  Completes the
802.11 transmit chain story next to `commpy_tpu.wifi80211`.

The 802.11 scrambler is the degree-7 LFSR ``S(x) = x^7 + x^4 + 1``.  Two
usage modes exist and both are provided:

- **Frame-synchronous** (what 802.11 OFDM PHYs actually use): the LFSR
  free-runs from a per-frame seed and its output sequence is XORed onto the
  data at both ends.  On device this is a broadcast XOR with a precomputed
  127-periodic sequence — fully parallel, batch-shardable, zero scan.
- **Self-synchronizing** (multiplicative): the scrambler feeds its own
  OUTPUT back through the register, so the descrambler needs no seed
  agreement.  The scrambler is an IIR bit recurrence (`lax.scan` on
  device); the descrambler is the FIR ``y[i] = x[i] ^ x[i-4] ^ x[i-7]`` —
  fully parallel shifts/XORs, and the direction a receiver actually runs.

Bit/state convention: the register is ``x1..x7`` with ``x7`` the oldest
bit; the output/feedback bit is ``x4 ^ x7``; integer seeds pack ``x1`` as
the MSB (all-ones = 0x7F).  With the all-ones seed the first 16 output bits
are ``00001110 11110010`` — the published start of the 127-bit sequence in
IEEE 802.11-2016 §17.3.5.5 (tested).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "wifi_scrambler_sequence",
    "scramble",
    "descramble",
    "selfsync_scramble",
    "selfsync_descramble",
    "selfsync_descramble_host",
]


def wifi_scrambler_sequence(seed: int = 0x7F, length: int = 127) -> np.ndarray:
    """Frame-synchronous scrambling sequence from a 7-bit seed (host).

    ``seed`` packs the initial register MSB-first (bit 6 = x1 ... bit 0 =
    x7); it must be non-zero (the all-zero state is the LFSR's fixed point
    and would scramble nothing).
    """
    if not 0 < seed < 128:
        raise ValueError("seed must be a non-zero 7-bit integer")
    x = np.array([(seed >> (6 - i)) & 1 for i in range(7)], np.int8)
    out = np.empty(length, np.int8)
    for i in range(length):
        fb = x[3] ^ x[6]  # x4 ^ x7
        out[i] = fb
        x[1:] = x[:-1]
        x[0] = fb
    return out


def scramble(bits, seed: int = 0x7F):
    """Frame-synchronous scramble of a ``[..., L]`` bit batch (device).

    One broadcast XOR with the 127-periodic sequence tiled to L; its own
    inverse (`descramble` is an alias).  ``seed`` and the trailing length
    are static (trace-time) — the sequence is baked as a constant, so the
    op fuses into whatever produces or consumes the bits.
    """
    bits = jnp.asarray(bits)
    length = bits.shape[-1]
    seq = wifi_scrambler_sequence(seed, 127)
    reps = -(-length // 127)
    tiled = jnp.asarray(np.tile(seq, reps)[:length], bits.dtype)
    return bits ^ tiled


descramble = scramble  # XOR with the same sequence is an involution


def _seed_state(seed: int):
    if not 0 < seed < 128:
        raise ValueError("seed must be a non-zero 7-bit integer")
    return np.array([(seed >> (6 - i)) & 1 for i in range(7)], np.int8)


def selfsync_scramble(bits, seed: int = 0x7F):
    """Self-synchronizing (multiplicative) scramble of ``[..., L]`` bits.

    ``out[i] = in[i] ^ s4 ^ s7`` where the register holds previous OUTPUT
    bits — an inherently sequential recurrence, run as a `lax.scan` over
    the trailing axis (leading axes ride along vectorized).  The matching
    receiver direction (`selfsync_descramble`) is parallel.
    """
    bits = jnp.asarray(bits)
    x0 = jnp.broadcast_to(
        jnp.asarray(_seed_state(seed), bits.dtype), bits.shape[:-1] + (7,)
    )

    def step(x, b):
        out = b ^ x[..., 3] ^ x[..., 6]
        x = jnp.concatenate([out[..., None], x[..., :-1]], axis=-1)
        return x, out

    _, out = jax.lax.scan(step, x0, jnp.moveaxis(bits, -1, 0))
    return jnp.moveaxis(out, 0, -1)


def selfsync_descramble(bits, seed: int = 0x7F):
    """Inverse of `selfsync_scramble`: the FIR ``y = x ^ x>>4 ^ x>>7``.

    Feedforward in the RECEIVED stream, so it is a pair of shifts and two
    XORs — fully parallel on device, and self-recovering: after any 7
    correct bits the seed no longer matters, and a channel bit error
    corrupts at most 3 output bits (the classic multiplicative-scrambler
    error multiplication; tested).
    """
    bits = jnp.asarray(bits)
    pre = jnp.broadcast_to(
        jnp.asarray(_seed_state(seed)[::-1], bits.dtype),
        bits.shape[:-1] + (7,),
    )
    ext = jnp.concatenate([pre, bits], axis=-1)  # ext[..., 7+i] = bits[..., i]
    return bits ^ ext[..., 3:-4] ^ ext[..., :-7]


def selfsync_descramble_host(bits, seed: int = 0x7F) -> np.ndarray:
    """NumPy golden for `selfsync_descramble` (explicit register walk)."""
    bits = np.asarray(bits, np.int8)
    x = _seed_state(seed).copy()
    out = np.empty_like(bits)
    flat_in = bits.reshape(-1, bits.shape[-1])
    flat_out = out.reshape(-1, bits.shape[-1])
    for r in range(flat_in.shape[0]):
        xr = x.copy()
        for i in range(flat_in.shape[1]):
            b = flat_in[r, i]
            flat_out[r, i] = b ^ xr[3] ^ xr[6]
            xr[1:] = xr[:-1]
            xr[0] = b  # register holds received (scrambled) bits
    return out
