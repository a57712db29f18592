"""Device link-model smoke + correctness tests (the 5 BASELINE configs)."""
import os

import numpy as np
import jax
import pytest

from commpy_tpu.channelcoding import RandInterlv
from commpy_tpu.models import (
    make_conv_awgn_link,
    make_kbest_mimo_link,
    make_ldpc_rayleigh_link,
    make_ofdm_mimo_conv_link,
    make_turbo_awgn_link,
)
from commpy_tpu.models.wifi80211_link import wifi80211_device_link
from commpy_tpu.ops.ldpc import get_ldpc_code_params
from commpy_tpu.ops.trellis import Trellis

DESIGNS = os.path.join(
    os.path.dirname(__file__), "..", "commpy_tpu", "designs", "ldpc"
)


def _run(link, snr_db, F=8):
    keys = jax.random.split(jax.random.PRNGKey(0), F)
    errs = link.link_step(keys, link.noise_std_fn(snr_db))
    return int(errs), F * link.frame_bits


def test_config1_conv_bpsk_hard():
    tr = Trellis(np.array([2]), np.array([[5, 7]]))
    link = make_conv_awgn_link(
        trellis=tr, modulation_m=2, frame_bits=300, decoding_type="hard"
    )
    errs, bits = _run(link, 12.0)
    assert errs == 0
    errs, _ = _run(link, 0.0)
    assert errs > 0


def test_config2_conv_qam16_soft():
    tr = Trellis(np.array([2]), np.array([[5, 7]]))
    link = make_conv_awgn_link(
        trellis=tr, modulation_m=16, frame_bits=400, decoding_type="soft",
        use_psk=False,
    )
    errs, _ = _run(link, 18.0)
    assert errs == 0


def test_config3_turbo():
    tr = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
    L = 128
    interlv = RandInterlv(L, 0)
    link = make_turbo_awgn_link(
        trellis=tr, frame_bits=L, p_array=interlv.p_array, n_iterations=6
    )
    errs, _ = _run(link, 6.0)
    assert errs == 0


def test_config4_ldpc_rayleigh():
    params = get_ldpc_code_params(
        os.path.join(DESIGNS, "wimax", "960.720.a.txt"), True
    )
    link = make_ldpc_rayleigh_link(
        ldpc_params=params, modulation_m=4, algorithm="MSA", n_iterations=30
    )
    errs, _ = _run(link, 30.0, F=4)
    assert errs == 0
    # AWGN-only variant decodes at moderate SNR
    link2 = make_ldpc_rayleigh_link(
        ldpc_params=params, modulation_m=4, algorithm="SPA",
        n_iterations=30, fading=False,
    )
    errs, _ = _run(link2, 8.0, F=4)
    assert errs == 0


def test_config5_ofdm_mimo_conv():
    tr = Trellis(np.array([6]), np.array([[0o133, 0o171]]))
    link = make_ofdm_mimo_conv_link(trellis=tr, n_ofdm_symbols=2, nsc=48)
    errs, total = _run(link, 35.0, F=4)
    assert errs / total < 0.01
    errs_low, _ = _run(link, 5.0, F=4)
    assert errs_low > errs


@pytest.mark.parametrize("mcs", [0, 2, 4, 7])
def test_wifi_mcs_links(mcs):
    link = wifi80211_device_link(mcs, frame_bits=240)
    errs, _ = _run(link, 35.0)
    assert errs == 0


def test_wifi_link_with_scrambler():
    """§17.3.5.5 data scrambler in the loop: clean at high SNR (exact
    scramble->encode->decode->descramble round trip) and statistically a
    no-op on i.i.d. bits at the waterfall."""
    plain = wifi80211_device_link(1, frame_bits=240)
    scr = wifi80211_device_link(1, frame_bits=240, scramble_seed=0x5D)
    errs, _ = _run(scr, 35.0)
    assert errs == 0
    e_plain, tot = _run(plain, 4.0, F=32)
    e_scr, _ = _run(scr, 4.0, F=32)
    assert e_scr > 0  # the waterfall is exercised, not trivially clean
    # same channel noise, whitened payload: BER within 2x of unscrambled
    assert 0.5 < (e_scr + 1) / (e_plain + 1) < 2.0


def test_kbest_mimo_noiseless():
    link = make_kbest_mimo_link(vectors_per_frame=8)
    errs, _ = _run(link, 60.0)
    assert errs == 0


def test_config2_rrc_waveform_link():
    """RRC pulse-shaped waveform link: ISI-free cascade, BER matches the
    symbol-rate link (BASELINE config 2 full chain)."""
    from commpy_tpu.models import make_rrc_conv_awgn_link

    tr = Trellis(np.array([2]), np.array([[5, 7]]))
    link = make_rrc_conv_awgn_link(
        trellis=tr, modulation_m=16, frame_bits=400
    )
    errs, _ = _run(link, 25.0)
    assert errs == 0
    errs_low, total = _run(link, 8.0)
    assert errs_low > 0


def test_wifi80211n_ldpc_link():
    # 802.11n LDPC PHY (Annex R rate-1/2 + QPSK): clean at high SNR,
    # errorful at low SNR; min-sum correction must not hurt
    from commpy_tpu.models.wifi80211_link import wifi80211n_ldpc_link

    link = wifi80211n_ldpc_link(n=648, modulation_m=4)
    errs_hi, _ = _run(link, 12.0)
    assert errs_hi == 0
    errs_lo, bits = _run(link, 0.0)
    assert errs_lo > 0

    nms = wifi80211n_ldpc_link(n=648, modulation_m=4, msa_scale=0.75)
    errs_mid = _run(link, 2.5)[0]
    errs_mid_nms = _run(nms, 2.5)[0]
    assert errs_mid_nms <= errs_mid


def test_qcldpc_awgn_link_dvbs2_scale():
    # the link factory handles synthesized DVB-S2-class codes too
    from commpy_tpu.models.device_links import make_qcldpc_awgn_link
    from commpy_tpu.ops.qcldpc import random_qc_params

    link = make_qcldpc_awgn_link(
        qc_params=random_qc_params(12, 24, 54, seed=4),
        modulation_m=16, n_iterations=10,
    )
    errs, _ = _run(link, 14.0, F=4)
    assert errs == 0


def test_ofdm_qcldpc_multipath_link():
    # 802.11n-style OFDM + LDPC over a 4-tap selective channel: clean
    # at high SNR (per-subcarrier equalization + LLR weighting works),
    # errorful at low SNR
    from commpy_tpu.models.device_links import make_ofdm_qcldpc_link
    from commpy_tpu.ops.qcldpc import ieee80211n_params

    link = make_ofdm_qcldpc_link(
        qc_params=ieee80211n_params(648, "1/2"), modulation_m=4,
    )
    errs_hi, _ = _run(link, 20.0)
    assert errs_hi == 0
    errs_lo, _ = _run(link, 2.0)
    assert errs_lo > 0
    # grid bookkeeping: 324 QPSK symbols = 6 OFDM symbols of 54 carriers
    assert link.extras["n_ofdm_symbols"] == 6


def test_ofdm_qcldpc_ls_channel_estimation():
    # blind receiver: LS estimate from one pilot OFDM symbol must still
    # decode cleanly at high SNR, and estimation noise must cost
    # something vs perfect CSI at mid SNR
    from commpy_tpu.models.device_links import make_ofdm_qcldpc_link
    from commpy_tpu.ops.qcldpc import ieee80211n_params

    params = ieee80211n_params(648, "1/2")
    ls = make_ofdm_qcldpc_link(qc_params=params, modulation_m=4, csi="ls")
    errs_hi, _ = _run(ls, 22.0)
    assert errs_hi == 0
    perfect = make_ofdm_qcldpc_link(qc_params=params, modulation_m=4)
    mid = 9.0
    e_ls = _run(ls, mid, F=16)[0]
    e_pf = _run(perfect, mid, F=16)[0]
    assert e_pf <= e_ls  # same noise draws; estimation can only hurt

    import pytest as _pytest
    with _pytest.raises(ValueError):
        make_ofdm_qcldpc_link(qc_params=params, csi="mmse")
