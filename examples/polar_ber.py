"""Polar-coded BER curves: SC vs CRC-aided SCL over AWGN.

Builds an (N=256, K=128) polar code two ways — plain and with a CRC-11
outer code — and sweeps Eb/N0 through the sharded Monte-Carlo engine.
The CRC-aided list decoder buys ~1 dB at FER 1e-2 over SC, the classic
5G-polar result.

Run:  python examples/polar_ber.py           (TPU if attached)
      JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python examples/polar_ber.py       (8-device CPU mesh)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import _cpu_env  # noqa: F401  (drop the remote-TPU plugin for CPU runs)

import jax

from commpy_tpu.models import make_polar_awgn_link
from commpy_tpu.ops.polar import polar_construct
from commpy_tpu.parallel import make_mesh, montecarlo_ber


def main():
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    snrs = np.arange(0.0, 4.5, 1.0)

    code_sc = polar_construct(256, 128, design_snr_db=2.0)
    code_crc = polar_construct(256, 128, crc="crc11", design_snr_db=2.0)
    links = [
        ("SC", make_polar_awgn_link(code=code_sc, decoder="sc")),
        ("SCL-8+CRC11",
         make_polar_awgn_link(code=code_crc, decoder="scl", list_size=8)),
    ]

    print(f"(N, K) = (256, 128), BPSK/AWGN, {n_dev}-device mesh")
    print("Eb/N0 dB | " + " | ".join(f"{name:>12}" for name, _ in links))
    results = []
    for name, link in links:
        res = montecarlo_ber(
            link.link_step, snrs, link.noise_std_fn, link.frame_bits,
            jax.random.PRNGKey(0), frames_per_round=16 * n_dev,
            max_rounds=40, err_min=200, mesh=mesh,
        )
        results.append(res.bers)
    for i, s in enumerate(snrs):
        row = " | ".join(f"{bers[i]:12.3e}" for bers in results)
        print(f"{s:8.1f} | {row}")


if __name__ == "__main__":
    main()
