"""Batched TPU-native compute kernels (the framework's device layer)."""

from . import (
    algebraic,
    bch,
    channel,
    convcode,
    crc,
    dvbs2,
    equalize,
    filters,
    fir,
    galois,
    impairments,
    interleave,
    ldpc,
    mimo,
    modem,
    ofdm,
    polar,
    rs,
    scramble,
    sequences,
    stream,
    sync,
    tpc,
    turbo,
)
from .trellis import Trellis
from .viterbi import viterbi_decode, viterbi_decode_device

__all__ = [
    "algebraic", "bch", "channel", "convcode", "crc", "dvbs2", "equalize",
    "filters", "fir", "galois",
    "impairments", "interleave", "ldpc", "mimo", "modem", "ofdm", "polar",
    "rs", "scramble", "sequences", "stream", "sync", "tpc", "turbo", "Trellis",
    "viterbi_decode", "viterbi_decode_device",
]
