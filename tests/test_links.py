"""Link-level tests: theory BER anchors + sharded Monte-Carlo engine
(reference commpy/tests/test_links.py tiers, run on the device engine)."""
import numpy as np
import pytest
from numpy.testing import assert_allclose
from scipy.special import erfc

import jax

from commpy_tpu.channels import SISOFlatChannel
from commpy_tpu.links import LinkModel, link_performance
from commpy_tpu.modulation import QAMModem
from commpy_tpu.models import make_conv_awgn_link, make_kbest_mimo_link
from commpy_tpu.models.device_links import DeviceLink, _frame_crandn, _gen_bits
from commpy_tpu.ops import modem as M
from commpy_tpu.ops.channel import snr_to_noise_std
from commpy_tpu.ops.trellis import Trellis
from commpy_tpu.parallel import make_mesh, montecarlo_ber

import jax.numpy as jnp


def _uncoded_qpsk_link(frame_bits=1000):
    const = jnp.asarray(M.qam_constellation(4), jnp.complex64)
    Es = 2.0

    def link_step(keys, noise_std):
        bits = _gen_bits(keys, frame_bits)
        sym = M.modulate(bits, const, 2)
        y = sym + _frame_crandn(keys, sym.shape[1:], 1) * (noise_std * 0.5)
        dec = M.demodulate_hard(y, const, 2)
        return jnp.sum(jnp.bitwise_xor(dec, bits).astype(jnp.int32))

    return DeviceLink(
        link_step, frame_bits,
        lambda s: snr_to_noise_std(s, code_rate=1.0, Es=Es), "qpsk-uncoded",
    )


def test_qpsk_awgn_theory_sharded():
    """BASELINE row 1: QPSK/AWGN BER == erfc(sqrt(snr/2))/2, rtol 0.25,
    via the mesh-sharded Monte-Carlo engine on 8 virtual devices."""
    link = _uncoded_qpsk_link()
    snrs = np.arange(0, 9, 2)
    mesh = make_mesh(8)
    res = montecarlo_ber(
        link.link_step, snrs, link.noise_std_fn, link.frame_bits,
        jax.random.PRNGKey(42), frames_per_round=64, max_rounds=40,
        err_min=300, send_max=int(5e5), mesh=mesh,
    )
    expected = erfc(np.sqrt(10 ** (snrs / 10) / 2)) / 2
    assert_allclose(res.bers, expected, rtol=0.25)


def test_mesh_and_single_device_rounds_agree():
    """The sharded round must produce the same tallies as unsharded."""
    from commpy_tpu.parallel import make_round_fn

    link = _uncoded_qpsk_link(frame_bits=200)
    stds = [float(link.noise_std_fn(s)) for s in [0.0, 4.0]]
    rf_mesh = make_round_fn(link.link_step, stds, 16, make_mesh(8))
    rf_solo = make_round_fn(link.link_step, stds, 16, None)
    key = jax.random.PRNGKey(7)
    a = np.asarray(rf_mesh(key))
    b = np.asarray(rf_solo(key))
    np.testing.assert_array_equal(a, b)


def test_conv_coded_slice_beats_uncoded():
    tr = Trellis(np.array([2]), np.array([[5, 7]]))
    link = make_conv_awgn_link(
        trellis=tr, modulation_m=2, frame_bits=400, decoding_type="hard"
    )
    res = montecarlo_ber(
        link.link_step, [4.0, 6.0], link.noise_std_fn, link.frame_bits,
        jax.random.PRNGKey(0), frames_per_round=64, max_rounds=10,
        err_min=100, mesh=make_mesh(8),
    )
    uncoded = erfc(np.sqrt(10 ** (np.array([4.0, 6.0]) / 10)))/ 2
    assert res.bers[1] < uncoded[1]


def test_kbest_mimo_reference_curve():
    """Tier-3 anchor: 4x4 16-QAM K-best(16) hard BER ~= 3e-2 at
    SNR 10+10log10(4) dB (reference test_links.py:55-58, rtol 1.25)."""
    link = make_kbest_mimo_link(vectors_per_frame=16)
    snr = np.array([10.0]) + 10 * np.log10(4)
    res = montecarlo_ber(
        link.link_step, snr, link.noise_std_fn, link.frame_bits,
        jax.random.PRNGKey(3), frames_per_round=16, max_rounds=10,
        err_min=150, mesh=make_mesh(8),
    )
    assert_allclose(res.bers, [3e-2], rtol=1.0)


def test_kbest_ldpc_mimo_link_decodes():
    """The kbest-detector variant of the coded MIMO link (VERDICT r3
    item 8): K-best max-log soft LLRs feed the WiMAX LDPC decoder with
    the right sign convention — BER at 21 dB must sit well under the
    raw-channel error rate (if signs were flipped the decoder would
    emit ~50% errors)."""
    from commpy_tpu.models.device_links import make_bestfirst_ldpc_mimo_link
    from commpy_tpu.ops.ldpc import get_ldpc_code_params
    import os

    design = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "commpy_tpu", "designs", "ldpc", "wimax", "1440.720.txt",
    )
    params = get_ldpc_code_params(design, True)
    link = make_bestfirst_ldpc_mimo_link(
        ldpc_params=params, detector="kbest", beam=16
    )
    res = montecarlo_ber(
        link.link_step, np.array([21.0]), link.noise_std_fn,
        link.frame_bits, jax.random.PRNGKey(7), frames_per_round=16,
        max_rounds=4, err_min=10_000, mesh=make_mesh(8),
    )
    assert res.bers[0] < 2e-2, res.bers


@pytest.mark.slow
def test_bestfirst_ldpc_mimo_reference_curve():
    """Tier-3 acceptance (reference test_links.py:60-86): 4x4 16-QAM soft
    best-first detection + WiMAX LDPC(1440,720) MSA-15, BER at SNR
    {17,18,19} dB within the reference's rtol=2 of (1.7e-1, 1e-1, 2.5e-3).
    The batched fixed-budget detector beats the reference's dynamic-stack
    search outright, so it sits well inside the band from below."""
    from commpy_tpu.models.device_links import make_bestfirst_ldpc_mimo_link
    from commpy_tpu.ops.ldpc import get_ldpc_code_params
    import os

    design = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "commpy_tpu", "designs", "ldpc", "wimax", "1440.720.txt",
    )
    params = get_ldpc_code_params(design, True)
    link = make_bestfirst_ldpc_mimo_link(ldpc_params=params)
    snrs = np.arange(17, 20, 1.0)
    res = montecarlo_ber(
        link.link_step, snrs, link.noise_std_fn, link.frame_bits,
        jax.random.PRNGKey(5), frames_per_round=16, max_rounds=40,
        err_min=200, mesh=make_mesh(8),
    )
    desired = (1.7e-1, 1e-1, 2.5e-3)
    assert_allclose(res.bers, desired, rtol=2)
    # and never WORSE than the reference curve itself
    assert np.all(res.bers <= np.asarray(desired) * 1.5)


def test_compat_linkmodel_qpsk():
    """The reference-compatible LinkModel API end-to-end."""
    np.random.seed(8071996)
    QPSK = QAMModem(4)

    def receiver(y, h, constellation, noise_var):
        return QPSK.demodulate(y, "hard")

    model = LinkModel(
        QPSK.modulate,
        SISOFlatChannel(fading_param=(1 + 0j, 0)),
        receiver,
        QPSK.num_bits_symbol,
        QPSK.constellation,
        QPSK.Es,
    )
    snrs = np.arange(0, 9, 4)
    bers = link_performance(model, snrs, 3e4, 150, 720)
    expected = erfc(np.sqrt(10 ** (snrs / 10) / 2)) / 2
    assert_allclose(bers, expected, rtol=0.35, atol=1e-4)


def test_full_metrics_api():
    np.random.seed(1)
    QPSK = QAMModem(4)
    model = LinkModel(
        QPSK.modulate,
        SISOFlatChannel(fading_param=(1 + 0j, 0)),
        lambda y, h, c, nv: QPSK.demodulate(y, "hard"),
        QPSK.num_bits_symbol,
        QPSK.constellation,
        QPSK.Es,
    )
    BERs, BEs, CEs, NCs = model.link_performance_full_metrics(
        np.array([0.0]), 10, err_min=50, send_chunk=600
    )
    assert BEs.shape == (1, 10) and CEs.shape == (1, 10)
    assert model.full_simulation_results is not None
