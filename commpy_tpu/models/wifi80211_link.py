"""Batched 802.11 link model (device path).

Flagship pipeline: K=7 (133,171) convolutional code, standard puncturing,
Gray PSK/QAM by MCS, complex AWGN, exact-LLR soft demap, soft Viterbi —
the device-batched equivalent of :class:`commpy_tpu.wifi80211.Wifi80211`
(reference commpy/wifi80211.py:29-216).
"""
from __future__ import annotations

import numpy as np

from ..ops.trellis import Trellis
from .device_links import DeviceLink, make_conv_awgn_link

__all__ = ["wifi80211_device_link", "wifi80211n_ldpc_link",
           "WIFI_MCS_TABLE"]

# mcs -> (constellation size, use_psk, (rate_num, rate_den))
WIFI_MCS_TABLE = {
    0: (2, True, (1, 2)),
    1: (4, True, (1, 2)),
    2: (4, True, (3, 4)),
    3: (16, False, (1, 2)),
    4: (16, False, (3, 4)),
    5: (64, False, (2, 3)),
    6: (64, False, (3, 4)),
    7: (64, False, (5, 6)),
    8: (256, False, (3, 4)),
    9: (256, False, (5, 6)),
}

_PUNCTURES = {
    (1, 2): None,
    (2, 3): [1, 1, 1, 0],
    (3, 4): [1, 1, 1, 0, 0, 1],
    (5, 6): [1, 1, 1, 0, 0, 1, 1, 0, 0, 1],
}


def wifi80211_device_link(mcs: int, frame_bits: int = 1200,
                          scramble_seed=None) -> DeviceLink:
    """Build the batched 802.11 link for an MCS index.

    frame_bits must make the punctured codeword fill whole modulation
    symbols (1200 works for every MCS).  ``scramble_seed`` (non-zero
    7-bit int) enables the §17.3.5.5 frame-synchronous data scrambler —
    the one PHY stage the reference's wifi80211.py omits entirely.
    """
    m, use_psk, coding = WIFI_MCS_TABLE[mcs]
    # (133,171) are OCTAL in the standard: 0o133 = 91, 0o171 = 121.
    # Passing them as decimal (reference wifi80211.py:49 does) silently
    # builds a CATASTROPHIC code — the low-7-bit parse leaves both
    # generators with even tap weight, so (1+D) divides both and a
    # single decision error can invert the entire rest of the frame
    # (measured: whole-frame BER ~0.5 at 4% hard flips).
    trellis = Trellis(np.array([6]), np.array([[0o133, 0o171]]))
    return make_conv_awgn_link(
        trellis=trellis,
        modulation_m=m,
        frame_bits=frame_bits,
        decoding_type="soft",
        puncture=_PUNCTURES[coding],
        use_psk=use_psk,
        scramble_seed=scramble_seed,
        name=f"wifi80211-mcs{mcs}",
    )


def wifi80211n_ldpc_link(n: int = 1944, modulation_m: int = 4,
                         n_iterations: int = 15,
                         msa_scale: float = 1.0,
                         msa_offset: float = 0.0) -> DeviceLink:
    """802.11n LDPC PHY link: Annex R rate-1/2 code + Gray QAM/QPSK.

    The 11n standard's optional LDPC coding replaces the K=7
    convolutional code; one frame is one codeword (n in {648, 1944}).
    The reference has no LDPC application layer at all — its
    wifi80211.py:29-216 wires only the convolutional path.
    """
    from ..ops.qcldpc import ieee80211n_params
    from .device_links import make_qcldpc_awgn_link

    return make_qcldpc_awgn_link(
        qc_params=ieee80211n_params(n, "1/2"),
        modulation_m=modulation_m,
        algorithm="MSA",
        n_iterations=n_iterations,
        msa_scale=msa_scale,
        msa_offset=msa_offset,
        use_psk=(modulation_m == 2),
        name=f"wifi80211n-ldpc{n}-qam{modulation_m}",
    )
