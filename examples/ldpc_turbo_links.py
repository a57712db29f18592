"""Coded-link showcase: turbo over AWGN and LDPC over Rayleigh fading.

Run:  python examples/ldpc_turbo_links.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax

import _cpu_env  # noqa: F401  (honor JAX_PLATFORMS=cpu; shared preamble)

from commpy_tpu.channelcoding import RandInterlv
from commpy_tpu.models import make_ldpc_rayleigh_link, make_turbo_awgn_link
from commpy_tpu.ops.ldpc import get_ldpc_code_params
from commpy_tpu.ops.trellis import Trellis
from commpy_tpu.parallel import make_mesh, montecarlo_ber

DESIGNS = os.path.join(
    os.path.dirname(__file__), "..", "commpy_tpu", "designs", "ldpc"
)


def main():
    mesh = make_mesh()

    # rate-1/3 turbo, BPSK/AWGN
    trellis = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
    L = 512
    interlv = RandInterlv(L, 0)
    link = make_turbo_awgn_link(
        trellis=trellis, frame_bits=L, p_array=interlv.p_array,
        n_iterations=8,
    )
    snrs = np.arange(-2, 4, 1.0)
    res = montecarlo_ber(
        link.link_step, snrs, link.noise_std_fn, link.frame_bits,
        jax.random.PRNGKey(0), frames_per_round=32, max_rounds=15,
        err_min=200, mesh=mesh,
    )
    print("turbo r=1/3 8it :", dict(zip(snrs, np.round(res.bers, 6))))

    # WiMAX LDPC(1440,720) + QPSK over Rayleigh fading
    params = get_ldpc_code_params(
        os.path.join(DESIGNS, "wimax", "1440.720.txt"), True
    )
    link = make_ldpc_rayleigh_link(
        ldpc_params=params, modulation_m=4, algorithm="MSA",
        n_iterations=25,
    )
    snrs = np.arange(6, 14, 2.0)
    res = montecarlo_ber(
        link.link_step, snrs, link.noise_std_fn, link.frame_bits,
        jax.random.PRNGKey(1), frames_per_round=16, max_rounds=15,
        err_min=200, mesh=mesh,
    )
    print("ldpc wimax MSA25:", dict(zip(snrs, np.round(res.bers, 6))))


if __name__ == "__main__":
    main()
