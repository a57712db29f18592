"""Randomized cross-checks against the reference implementation.

The fixed tier-1 goldens (test_convcode.py CASES) pin five known codes;
these fuzz tests sweep RANDOM code constructions through both stacks and
require identical outputs — broadening the bit-exactness guarantee from
"the shipped configurations" to "the construction space" (reference
convcode.py:117-255, 475-749; turbo.py:14-59; modulation.py:93-137).
Seeds are fixed, so failures are reproducible.
"""
import numpy as np
import pytest

from commpy_tpu.ops.convcode import conv_encode
from commpy_tpu.ops.trellis import Trellis
from commpy_tpu.ops.viterbi import viterbi_decode


def _random_code(rng, memory):
    # two distinct feedforward polynomials with the current-input tap
    # set (bit 2^memory), octal-free integer form
    hi = 1 << (memory + 1)
    while True:
        g1, g2 = rng.randint(hi // 2, hi, 2)
        if g1 != g2:
            return np.array([memory]), np.array([[g1, g2]])


def test_trellis_tables_fuzz_vs_reference():
    ref_cc = pytest.importorskip("commpy.channelcoding.convcode")
    rng = np.random.RandomState(42)
    for _ in range(12):
        memory = int(rng.randint(2, 7))
        mem, g = _random_code(rng, memory)
        t = Trellis(mem, g)
        rt = ref_cc.Trellis(mem.copy(), g.copy())
        np.testing.assert_array_equal(t.next_state_table,
                                      rt.next_state_table)
        np.testing.assert_array_equal(t.output_table, rt.output_table)


def test_conv_encode_fuzz_vs_reference():
    ref_cc = pytest.importorskip("commpy.channelcoding.convcode")
    rng = np.random.RandomState(43)
    for _ in range(8):
        memory = int(rng.randint(2, 7))
        mem, g = _random_code(rng, memory)
        t = Trellis(mem, g)
        rt = ref_cc.Trellis(mem.copy(), g.copy())
        msg = rng.randint(0, 2, int(rng.randint(40, 200)))
        for term in ("term", "cont"):
            a = ref_cc.conv_encode(msg, rt, term)
            b = conv_encode(msg, t, term)
            np.testing.assert_array_equal(a, b, err_msg=f"g={g} {term}")


def test_viterbi_fuzz_vs_reference():
    ref_cc = pytest.importorskip("commpy.channelcoding.convcode")
    rng = np.random.RandomState(44)
    for _ in range(5):
        memory = int(rng.randint(2, 6))  # reference ACS is scalar-slow
        mem, g = _random_code(rng, memory)
        t = Trellis(mem, g)
        rt = ref_cc.Trellis(mem.copy(), g.copy())
        msg = rng.randint(0, 2, 96)
        coded = conv_encode(msg, t)
        # hard, with bit flips: wrong bits must be wrong identically
        noisy = coded.copy()
        flips = rng.choice(coded.size, coded.size // 7, replace=False)
        noisy[flips] ^= 1
        a = ref_cc.viterbi_decode(noisy.astype(float), rt, 15)
        b = viterbi_decode(noisy.astype(float), t, 15)
        np.testing.assert_array_equal(a, b, err_msg=f"g={g} hard")
        # soft LLRs under heavy noise
        soft = 2.5 * (2 * coded - 1) + rng.randn(coded.size) * 2.5
        a = ref_cc.viterbi_decode(soft, rt, 15, "soft")
        b = viterbi_decode(soft, t, 15, "soft")
        np.testing.assert_array_equal(a, b, err_msg=f"g={g} soft")


def test_turbo_encode_fuzz_vs_reference():
    ref_t = pytest.importorskip("commpy.channelcoding.turbo")
    ref_cc = pytest.importorskip("commpy.channelcoding.convcode")
    ref_i = pytest.importorskip("commpy.channelcoding.interleavers")

    from commpy_tpu.ops.turbo import turbo_encode_device

    rng = np.random.RandomState(45)
    for _ in range(5):
        memory = int(rng.randint(2, 5))
        hi = 1 << (memory + 1)
        fb = int(rng.randint(hi // 2, hi)) | 1  # feedback with tap 1
        g2 = int(rng.randint(hi // 2, hi))
        mem = np.array([memory])
        g = np.array([[fb, g2]])
        rt = ref_cc.Trellis(mem.copy(), g.copy(), fb, "rsc")
        t = Trellis(mem, g, fb, "rsc")
        L = int(rng.randint(32, 128))
        interlv = ref_i.RandInterlv(L, int(rng.randint(1000)))
        msg = rng.randint(0, 2, L)
        a_sys, a_p1, a_p2 = ref_t.turbo_encode(msg, rt, rt, interlv)
        b_sys, b_p1, b_p2 = turbo_encode_device(
            msg, t, t, np.asarray(interlv.p_array)
        )
        np.testing.assert_array_equal(a_sys, np.asarray(b_sys))
        np.testing.assert_array_equal(a_p1, np.asarray(b_p1))
        # the reference's punctured conv_encode keeps its historical
        # full-length framing: p2 is [L real parity bits, zero padding]
        # (see docs/parity.md "known intentional differences")
        np.testing.assert_array_equal(a_p2[:L], np.asarray(b_p2))
        assert not a_p2[L:].any()


def test_modem_fuzz_vs_reference():
    ref_mod = pytest.importorskip("commpy.modulation")

    from commpy_tpu.ops import modem as M

    rng = np.random.RandomState(46)
    for bps in (2, 3, 4):
        m = 1 << bps
        const = (rng.randn(m) + 1j * rng.randn(m)).astype(np.complex128)
        # reorder_as_gray=False: compare the raw table mapping (our
        # modem applies Gray ordering when BUILDING standard
        # constellations, not when given an explicit table)
        modem = ref_mod.Modem(const, reorder_as_gray=False)
        bits = rng.randint(0, 2, 20 * bps)
        a = modem.modulate(bits)
        b = np.asarray(M.modulate(
            bits.reshape(1, -1).astype(np.int8),
            const.astype(np.complex64), bps,
        ))[0]
        np.testing.assert_allclose(a, b, rtol=1e-6)

        y = a + (rng.randn(a.size) + 1j * rng.randn(a.size)) * 0.4
        hard_ref = modem.demodulate(y, "hard")
        hard_us = np.asarray(M.demodulate_hard(
            y.reshape(1, -1).astype(np.complex64),
            const.astype(np.complex64), bps,
        ))[0]
        np.testing.assert_array_equal(hard_ref, hard_us)

        llr_ref = modem.demodulate(y, "soft", 0.5)
        llr_us = np.asarray(M.demodulate_soft(
            y.reshape(1, -1).astype(np.complex64),
            const.astype(np.complex64), bps, 0.5,
        ))[0]
        np.testing.assert_allclose(llr_ref, llr_us, rtol=2e-3, atol=2e-3)
