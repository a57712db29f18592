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

    # 802.11n LDPC PHY (Annex R rate-1/2, n=648) + QPSK, with the
    # normalized min-sum correction (msa_scale=0.75)
    from commpy_tpu.models import wifi80211n_ldpc_link

    link = wifi80211n_ldpc_link(n=648, modulation_m=4, msa_scale=0.75)
    snrs = np.arange(2.0, 7.0, 1.0)
    res = montecarlo_ber(
        link.link_step, snrs, link.noise_std_fn, link.frame_bits,
        jax.random.PRNGKey(2), frames_per_round=16, max_rounds=10,
        err_min=100, mesh=mesh,
    )
    print("80211n ldpc648  :", dict(zip(snrs, np.round(res.bers, 6))))

    # DVB-S2-class synthesized QC code (n=16200, rate 4/9) — a size the
    # reference cannot construct or decode (its largest design is 1440)
    from commpy_tpu.models import make_qcldpc_awgn_link
    from commpy_tpu.ops.qcldpc import random_qc_params

    link = make_qcldpc_awgn_link(
        qc_params=random_qc_params(25, 45, 360), modulation_m=4,
        n_iterations=20, msa_scale=0.75,
    )
    snrs = np.array([3.0, 5.0])
    res = montecarlo_ber(
        link.link_step, snrs, link.noise_std_fn, link.frame_bits,
        jax.random.PRNGKey(3), frames_per_round=8, max_rounds=3,
        err_min=50, mesh=mesh,
    )
    print("dvbs2-16200 NMS :", dict(zip(snrs, np.round(res.bers, 6))))


if __name__ == "__main__":
    main()
