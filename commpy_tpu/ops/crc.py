"""Cyclic redundancy checks: batched GF(2) matmul attach/check on device.

Beyond-reference subsystem (CommPy has no CRC utilities at all; its closest
machinery is the cyclic-code genpoly helper, reference
commpy/channelcoding/algcode.py:12-50).  CRCs appear all over modern links —
3GPP TS 38.212 §5.1 attaches CRC24A/B/C + CRC16/11/6 to transport blocks and
polar payloads, and 802.11 frames end in the 32-bit FCS — so the framework
ships them as first-class batched device ops.

TPU-native design
-----------------
A CRC with a zero-initialised shift register is GF(2)-LINEAR in the message:
``crc(m) = m @ T mod 2`` for a constant ``[k, r]`` bit matrix ``T`` whose
rows are the CRCs of the unit vectors.  With a non-zero register preset
(``init``) and output inversion (``xorout``) it is AFFINE:
``crc(m) = (m @ T  ^  c0) mod 2`` where ``c0 = crc(0**k)``.  Attaching or
checking a CRC over a ``[B, k]`` bit batch is therefore ONE int8/f32 matmul
on the MXU — no per-bit scan, no dynamic control flow, trivially shardable
over the batch axis.  The bitwise LFSR lives on the host only, as the
table-construction golden (`crc_remainder`).

The polar CA-SCL decoder (ops/polar.py) builds its path-selection syndrome
from these same tables.

Bit conventions: messages are MSB-first bit arrays; parity is appended
MSB-first (the 3GPP convention).  Reflected byte-oriented CRCs (the
ISO-HDLC/zlib CRC-32 used by the 802.11 FCS) are exposed through
`crc32_bytes`, which maps the reflection onto the same bit machinery and is
tested against ``binascii.crc32``.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

__all__ = [
    "CrcSpec",
    "CRC_POLYNOMIALS",
    "crc_remainder",
    "crc_encode_table",
    "crc_check_table",
    "crc_tables",
    "crc_attach",
    "crc_check",
    "make_crc_attach",
    "make_crc_check",
    "crc32_bytes",
]

#: Generator polynomials, MSB-first including the leading term.
#: crc6/crc11/crc16/crc24a/crc24b/crc24c are the 3GPP TS 38.212 §5.1 set
#: (polys 0x21, 0x621, 0x1021, 0x864CFB, 0x800063, 0x8F6E37, all zero-init,
#: parity appended MSB-first).  crc32 is the IEEE 802.3 polynomial
#: 0x04C11DB7 in its non-reflected form; see `crc32_bytes` for the
#: reflected ISO-HDLC variant actually used by the 802.11 FCS.
CRC_POLYNOMIALS = {
    "crc6": (1, 1, 0, 0, 0, 0, 1),                    # x^6+x^5+1
    "crc11": (1, 1, 1, 0, 0, 0, 1, 0, 0, 0, 0, 1),    # x^11+x^10+x^9+x^5+1
    # CCITT/XMODEM: x^16 + x^12 + x^5 + 1
    "crc16": (1, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1),
}


def _poly_bits(value: int, width: int) -> tuple:
    """MSB-first coefficient tuple (incl. leading 1) from a hex poly."""
    return (1,) + tuple((value >> (width - 1 - i)) & 1 for i in range(width))


CRC_POLYNOMIALS["crc24a"] = _poly_bits(0x864CFB, 24)
CRC_POLYNOMIALS["crc24b"] = _poly_bits(0x800063, 24)
CRC_POLYNOMIALS["crc24c"] = _poly_bits(0x8F6E37, 24)
CRC_POLYNOMIALS["crc32"] = _poly_bits(0x04C11DB7, 32)


@dataclass(frozen=True)
class CrcSpec:
    """A cyclic redundancy check: ``poly`` is MSB-first incl. leading 1.

    ``init`` presets the shift register (MSB-first integer, e.g. 0xFFFF for
    CRC-16/CCITT-FALSE); ``xorout`` is XORed into the final remainder.
    Zero/zero (the 3GPP convention) keeps the check purely linear.
    """

    poly: tuple
    init: int = 0
    xorout: int = 0

    @classmethod
    def named(cls, name):
        return cls(poly=CRC_POLYNOMIALS[name])

    @property
    def length(self):
        return len(self.poly) - 1


def _spec(crc) -> CrcSpec:
    if isinstance(crc, str):
        return CrcSpec.named(crc)
    if isinstance(crc, (tuple, list)):  # raw MSB-first poly (legacy polar API)
        return CrcSpec(poly=tuple(crc))
    return crc


def crc_remainder(bits, crc) -> np.ndarray:
    """Bitwise shift-register CRC (host golden). Returns r bits MSB-first."""
    crc = _spec(crc)
    r = np.array(
        [(crc.init >> (crc.length - 1 - i)) & 1 for i in range(crc.length)],
        np.int64,
    )
    taps = np.asarray(crc.poly[1:], np.int64)
    for b in np.asarray(bits, np.int64).ravel():
        fb = (b & 1) ^ r[0]
        r = np.concatenate([r[1:], [0]])
        if fb:
            r ^= taps
    xorout = np.array(
        [(crc.xorout >> (crc.length - 1 - i)) & 1 for i in range(crc.length)],
        np.int64,
    )
    return r ^ xorout


# Back-compat alias used by the polar module's original internal name.
_crc_remainder = crc_remainder


def crc_tables(crc, k):
    """Affine device form: ``crc(m) = (m @ T ^ c0) mod 2``.

    Returns ``(T, c0)`` with ``T`` ``[k, r]`` and ``c0`` ``[r]`` (int64).
    ``c0`` folds both ``init`` and ``xorout``; it is the CRC of the all-zero
    message, and each row of ``T`` is ``crc(e_i) ^ c0`` (affine-to-linear
    correction).
    """
    crc = _spec(crc)
    c0 = crc_remainder(np.zeros(k, np.int64), crc)
    rows = [crc_remainder(np.eye(k, dtype=np.int64)[i], crc) ^ c0
            for i in range(k)]
    return np.stack(rows).astype(np.int64), c0.astype(np.int64)


def crc_encode_table(crc, k):
    """[k, r] GF(2) matrix T with crc(m) = m @ T mod 2 (linearity).

    Zero-init/zero-xorout specs only (the polar CA-SCL path); affine specs
    must use `crc_tables`.
    """
    crc = _spec(crc)
    if crc.init or crc.xorout:
        raise ValueError(
            "crc_encode_table is linear-only (init=0, xorout=0); use "
            "crc_tables for affine specs"
        )
    return crc_tables(crc, k)[0]


def crc_check_table(crc, k_total):
    """[k_total, r] matrix H with (payload||crc) @ H mod 2 == 0 iff valid.

    Linear specs only, as `crc_encode_table`.
    """
    crc = _spec(crc)
    k = k_total - crc.length
    return np.concatenate(
        [crc_encode_table(crc, k), np.eye(crc.length, dtype=np.int64)], axis=0
    )


def crc_attach(bits, crc):
    """Append CRC parity to a ``[..., k]`` bit batch (one MXU matmul).

    Traceable; the tables are baked at trace time from the static trailing
    length.
    """
    crc = _spec(crc)
    bits = jnp.asarray(bits)
    t, c0 = crc_tables(crc, bits.shape[-1])
    parity = (bits.astype(jnp.int32) @ jnp.asarray(t, jnp.int32)
              + jnp.asarray(c0, jnp.int32)) % 2
    return jnp.concatenate([bits, parity.astype(bits.dtype)], axis=-1)


def crc_check(bits, crc):
    """Validity of ``[..., k+r]`` (payload||parity) batches -> bool[...]."""
    crc = _spec(crc)
    bits = jnp.asarray(bits)
    k = bits.shape[-1] - crc.length
    t, c0 = crc_tables(crc, k)
    h = np.concatenate([t, np.eye(crc.length, dtype=np.int64)], axis=0)
    syn = (bits.astype(jnp.int32) @ jnp.asarray(h, jnp.int32)
           + jnp.asarray(c0, jnp.int32)) % 2
    return jnp.all(syn == 0, axis=-1)


def make_crc_attach(crc, k):
    """Closure form of `crc_attach` with tables hoisted once for shape k."""
    crc = _spec(crc)
    t, c0 = crc_tables(crc, k)
    tj, cj = jnp.asarray(t, jnp.int32), jnp.asarray(c0, jnp.int32)

    def attach(bits):
        bits = jnp.asarray(bits)
        parity = (bits.astype(jnp.int32) @ tj + cj) % 2
        return jnp.concatenate([bits, parity.astype(bits.dtype)], axis=-1)

    return attach


def make_crc_check(crc, k_total):
    """Closure form of `crc_check` with tables hoisted once."""
    crc = _spec(crc)
    t, c0 = crc_tables(crc, k_total - crc.length)
    h = np.concatenate([t, np.eye(crc.length, dtype=np.int64)], axis=0)
    hj, cj = jnp.asarray(h, jnp.int32), jnp.asarray(c0, jnp.int32)

    def check(bits):
        syn = (jnp.asarray(bits).astype(jnp.int32) @ hj + cj) % 2
        return jnp.all(syn == 0, axis=-1)

    return check


def crc32_bytes(data: bytes) -> int:
    """Reflected ISO-HDLC CRC-32 (zlib/802.11-FCS semantics) over bytes.

    Maps the reflection convention onto the bit machinery: feed each input
    byte LSB-first, run the non-reflected 0x04C11DB7 register with
    init=xorout=0xFFFFFFFF, then bit-reverse the remainder.  Equals
    ``binascii.crc32(data)`` (tested); exists to pin the framework's bit
    conventions against an independent external implementation.
    """
    bits = np.unpackbits(
        np.frombuffer(data, np.uint8).reshape(-1, 1), axis=1, bitorder="little"
    ).ravel()
    spec = CrcSpec(
        poly=CRC_POLYNOMIALS["crc32"], init=0xFFFFFFFF, xorout=0xFFFFFFFF
    )
    rem = crc_remainder(bits, spec)
    return int("".join(str(b) for b in rem[::-1]), 2)
