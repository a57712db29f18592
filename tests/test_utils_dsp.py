"""Bit utils, filters, sequences, impairments — tier-1 goldens."""
import numpy as np
import pytest

from commpy_tpu.utils import bits as B
from commpy_tpu.ops import filters as F
from commpy_tpu.ops import sequences as SQ
from commpy_tpu.ops.impairments import add_frequency_offset


def test_unpack_pack_roundtrip():
    x = np.arange(64)
    bits = B.np_unpack_bits(x, 6)
    np.testing.assert_array_equal(B.np_pack_bits(bits), x)
    bits_d = np.asarray(B.unpack_bits(x, 6))
    np.testing.assert_array_equal(bits_d, bits)
    np.testing.assert_array_equal(np.asarray(B.pack_bits(bits_d)), x)


def test_dec2bitarray_golden():
    # reference commpy/tests/test_utilities.py golden: MSB first
    np.testing.assert_array_equal(
        B.np_unpack_bits(10, 4), np.array([1, 0, 1, 0])
    )
    np.testing.assert_array_equal(
        B.np_unpack_bits(np.array([3, 8]), 4).reshape(-1),
        np.array([0, 0, 1, 1, 1, 0, 0, 0]),
    )


def test_filters_match_reference():
    ref_f = pytest.importorskip("commpy.filters")
    for N in (31, 32, 64):
        for alpha in (0.0, 0.22, 0.35, 1.0):
            for name in ("rcosfilter", "rrcosfilter"):
                t_r, h_r = getattr(ref_f, name)(N, alpha, 1.0, 8.0)
                t_m, h_m = getattr(F, name)(N, alpha, 1.0, 8.0)
                np.testing.assert_allclose(t_r, t_m, rtol=0, atol=0)
                np.testing.assert_allclose(h_r, h_m, rtol=1e-12)
        t_r, h_r = ref_f.gaussianfilter(N, 0.5, 1.0, 8.0)
        t_m, h_m = F.gaussianfilter(N, 0.5, 1.0, 8.0)
        np.testing.assert_allclose(h_r, h_m, rtol=1e-12)
        t_r, h_r = ref_f.rectfilter(N, 1.0, 8.0)
        t_m, h_m = F.rectfilter(N, 1.0, 8.0)
        np.testing.assert_allclose(h_r, h_m)


def test_rrc_singularity_exact_hit():
    # N, Ts, Fs chosen so t == Ts/(4*alpha) lands exactly on a sample
    N, alpha, Ts, Fs = 32, 0.25, 1.0, 8.0  # Ts/(4a) = 1.0 -> sample index 24
    t, h = F.rrcosfilter(N, alpha, Ts, Fs)
    expected = (alpha / np.sqrt(2)) * (
        (1 + 2 / np.pi) * np.sin(np.pi / (4 * alpha))
        + (1 - 2 / np.pi) * np.cos(np.pi / (4 * alpha))
    )
    hit = np.isclose(t, Ts / (4 * alpha))
    assert hit.any()
    np.testing.assert_allclose(h[hit], expected)
    assert np.isfinite(h).all()


def test_pnsequence_golden():
    # reference commpy/tests/test_sequences.py:18-21 golden
    seq = SQ.pnsequence(4, "0011", [1, 1, 0, 1], 7)
    np.testing.assert_array_equal(seq, np.array([1, 1, 0, 0, 1, 0, 1]))
    dev = np.asarray(SQ.pnsequence_device(4, "0011", "1101", 7))
    np.testing.assert_array_equal(seq, dev)
    with pytest.raises(ValueError):
        SQ.pnsequence(4, "001", "1101", 15)
    with pytest.raises(ValueError):
        SQ.pnsequence(4, "0011", "110", 15)


def test_pnsequence_matches_reference():
    ref_s = pytest.importorskip("commpy.sequences")
    a = ref_s.pnsequence(5, "01011", "01001", 31)
    b = SQ.pnsequence(5, "01011", "01001", 31)
    np.testing.assert_array_equal(a, b)


def test_zcsequence_autocorr():
    zc = SQ.zcsequence(1, 31)
    # delta-like periodic autocorrelation
    ac = np.fft.ifft(np.abs(np.fft.fft(zc)) ** 2) / 31
    assert abs(ac[0]) > 0.99
    assert np.all(np.abs(ac[1:]) < 1e-6)
    with pytest.raises(ValueError):
        SQ.zcsequence(0, 31)
    with pytest.raises(ValueError):
        SQ.zcsequence(3, 9)


def test_frequency_offset():
    ref_i = pytest.importorskip("commpy.impairments")
    x = np.exp(1j * np.linspace(0, 3, 64))
    a = ref_i.add_frequency_offset(x, 8.0, 0.5)
    b = np.asarray(add_frequency_offset(x, 8.0, 0.5))
    np.testing.assert_allclose(a, b, rtol=2e-5)
