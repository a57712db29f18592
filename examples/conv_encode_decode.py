"""BER of convolutional codes, hard vs soft vs unquantized decoding.

Device-batched counterpart of the reference example
(commpy/examples/conv_encode_decode.py): three codes (rate-1/2 K=3,
RSC variant, and rate-1/2 K=7), swept over Eb/N0 with the mesh-sharded
Monte-Carlo engine.

Run:  python examples/conv_encode_decode.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax

import _cpu_env  # noqa: F401  (honor JAX_PLATFORMS=cpu; shared preamble)

from commpy_tpu.ops.trellis import Trellis
from commpy_tpu.models import make_conv_awgn_link
from commpy_tpu.parallel import make_mesh, montecarlo_ber


def main():
    codes = {
        "K=3 (5,7)": Trellis(np.array([2]), np.array([[5, 7]])),
        "K=3 RSC": Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc"),
        "K=7 (133,171)o": Trellis(np.array([6]), np.array([[0o133, 0o171]])),
    }
    snrs = np.arange(0, 7, 1.5)
    mesh = make_mesh()
    print(f"devices: {mesh.devices.size}")
    for name, trellis in codes.items():
        for decoding in ("hard", "soft"):
            link = make_conv_awgn_link(
                trellis=trellis, modulation_m=2, frame_bits=1000,
                decoding_type=decoding,
            )
            res = montecarlo_ber(
                link.link_step, snrs, link.noise_std_fn, link.frame_bits,
                jax.random.PRNGKey(0), frames_per_round=64, max_rounds=30,
                err_min=400, mesh=mesh,
            )
            bers = "  ".join(f"{b:.2e}" for b in res.bers)
            print(f"{name:16s} {decoding:5s}  BER @ {list(snrs)} dB: {bers}")


if __name__ == "__main__":
    main()
