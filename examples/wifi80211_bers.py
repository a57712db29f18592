"""802.11 MCS BER comparison (device-batched).

Counterpart of commpy/examples/wifi80211_conv_encode_decode.py: BER of
MCS 2 (QPSK 3/4) vs MCS 3 (16-QAM 1/2) over AWGN.

Run:  python examples/wifi80211_bers.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax

import _cpu_env  # noqa: F401  (honor JAX_PLATFORMS=cpu; shared preamble)

from commpy_tpu.models.wifi80211_link import wifi80211_device_link
from commpy_tpu.parallel import make_mesh, montecarlo_ber


def main():
    mesh = make_mesh()
    snrs = np.arange(6, 21, 3.0)
    for mcs in (2, 3):
        link = wifi80211_device_link(mcs, frame_bits=1200)
        res = montecarlo_ber(
            link.link_step, snrs, link.noise_std_fn, link.frame_bits,
            jax.random.PRNGKey(1), frames_per_round=64, max_rounds=20,
            err_min=300, mesh=mesh,
        )
        bers = "  ".join(f"{b:.2e}" for b in res.bers)
        print(f"MCS {mcs}: BER @ {list(snrs)} dB: {bers}")


if __name__ == "__main__":
    main()
