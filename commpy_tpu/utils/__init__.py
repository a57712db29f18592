from .bits import unpack_bits, pack_bits, np_unpack_bits, np_pack_bits
from .measures import hamming_dist, euclid_dist, upsample, signal_power

__all__ = [
    "unpack_bits",
    "pack_bits",
    "np_unpack_bits",
    "np_pack_bits",
    "hamming_dist",
    "euclid_dist",
    "upsample",
    "signal_power",
]
