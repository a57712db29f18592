"""Batched TPU-native compute kernels (the framework's device layer)."""

from . import channel, convcode, filters, impairments, modem, ofdm, sequences
from .trellis import Trellis
from .viterbi import viterbi_decode, viterbi_decode_device

__all__ = [
    "channel",
    "convcode",
    "filters",
    "impairments",
    "modem",
    "ofdm",
    "sequences",
    "Trellis",
    "viterbi_decode",
    "viterbi_decode_device",
]
