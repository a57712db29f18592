"""Compat LinkModel -> sharded device engine bridge (VERDICT r4 #9).

`LinkModel.link_performance_device` runs the drop-in API's chain
through the mesh Monte-Carlo engine when the user's
modulate/receive/decoder are jax-traceable.
"""
import numpy as np
import pytest
from numpy.testing import assert_allclose
from scipy.special import erfc

import jax
import jax.numpy as jnp

from commpy_tpu.channels import MIMOFlatChannel, SISOFlatChannel
from commpy_tpu.links import LinkModel
from commpy_tpu.ops import modem as M
from commpy_tpu.ops.mimo import kbest_device
from commpy_tpu.parallel import make_mesh


def test_device_bridge_qpsk_awgn_matches_theory():
    const = M.qam_constellation(4).astype(np.complex64)

    def modulate(bits):
        return M.modulate(bits, const, 2)

    def receive(y, g, c, nv):
        return M.demodulate_hard(y, const, 2)

    ch = SISOFlatChannel(None, (1 + 0j, 0))  # pure AWGN
    link = LinkModel(modulate, ch, receive, 2, const, Es=2)
    snrs = np.arange(0, 9, 2.0)
    bers = link.link_performance_device(
        snrs, 3_000_000, 600, 1000, 1,
        frames_per_round=64, mesh=make_mesh(8))
    theory = erfc(np.sqrt(10 ** (snrs / 10) / 2)) / 2
    assert_allclose(bers, theory, rtol=0.3)


def test_device_bridge_mimo_kbest_reference_anchor():
    """4x4 16-QAM K-best hard through the BRIDGE, at the reference
    anchor SNR 10+10log10(4) dB -> BER ~3e-2 (test_links.py:55-56
    anchors, rtol 1.25 as in the reference's own assertion)."""
    m, bps, nt = 16, 4, 4
    const = M.qam_constellation(m).astype(np.complex64)

    def modulate(bits):
        return M.modulate(bits, const, bps)

    def receive(y, h, c, nv):
        return kbest_device(y[None], h[None], const, 16)[0]

    def decoder(symbs):
        return M.demodulate_hard(jnp.asarray(symbs), const, bps)

    ch = MIMOFlatChannel(nt, nt)
    ch.uncorr_rayleigh_fading(complex)
    link = LinkModel(modulate, ch, receive, bps, const,
                     Es=float(np.mean(np.abs(const) ** 2)),
                     decoder=decoder)
    snr = 10 + 10 * np.log10(4)
    bers = link.link_performance_device(
        np.array([snr]), 1_000_000, 300, 480, 1,
        frames_per_round=32, mesh=make_mesh(8))
    assert_allclose(bers[0], 3e-2, rtol=1.25)


def test_device_bridge_matches_host_loop_statistically():
    """Same chain through the host loop and the bridge -> same BER
    within Monte-Carlo tolerance (different RNGs, same statistics)."""
    const = M.qam_constellation(4).astype(np.complex64)

    def modulate(bits):
        return M.modulate(jnp.asarray(bits), const, 2)

    def receive(y, g, c, nv):
        return M.demodulate_hard(jnp.asarray(y), const, 2)

    ch = SISOFlatChannel(None, (1 + 0j, 0))
    link = LinkModel(lambda b: np.asarray(modulate(b)), ch,
                     lambda y, g, c, nv: np.asarray(receive(y, g, c, nv)),
                     2, const, Es=2)
    np.random.seed(8071996)
    host = link.link_performance(np.array([4.0]), 600_000, 500, 1000, 1)
    link_dev = LinkModel(modulate, ch, receive, 2, const, Es=2)
    dev = link_dev.link_performance_device(
        np.array([4.0]), 600_000, 500, 1000, 1,
        frames_per_round=64, mesh=make_mesh(8))
    assert_allclose(dev[0], host[0], rtol=0.3)
