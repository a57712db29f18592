"""Conv code parity tests.

Tier-1 bit-exact goldens mirroring the reference test suite
(reference commpy/channelcoding/tests/test_convcode.py:22-178), plus direct
cross-checks against the reference implementation where available.
"""
import numpy as np
import pytest

from commpy_tpu.ops.trellis import Trellis
from commpy_tpu.ops.convcode import (
    conv_encode,
    depuncturing,
    encode_scan,
    puncturing,
)
from commpy_tpu.ops.viterbi import viterbi_decode, viterbi_decode_device

CASES = [
    # (memory, g_matrix, feedback, code_type, poly_format)
    (np.array([2]), np.array([[5, 7]]), None, "default", "MSB"),
    (np.array([2]), np.array([[1, 7]]), 5, "rsc", "MSB"),
    (np.array([2, 1]), np.array([[5, 7, 0], [0, 2, 3]]), None, "default", "MSB"),
    (np.array([2, 1]), np.array([[5, 7, 0], [0, 2, 6]]), None, "default", "LSB"),
    (
        np.array([1, 1]),
        np.array([[1, 0, 0], [0, 1, 3]]),
        np.array([[2, 2], [3, 1]]),
        "rsc",
        "MSB",
    ),
]

GOLD_NST = [
    np.array([[0, 2], [0, 2], [1, 3], [1, 3]]),
    np.array([[0, 2], [2, 0], [1, 3], [3, 1]]),
    np.array(
        [[0, 1, 4, 5]] * 4 + [[2, 3, 6, 7]] * 4
    ),
    np.array(
        [[0, 1, 4, 5]] * 4 + [[2, 3, 6, 7]] * 4
    ),
    np.array([[0, 1, 1, 0], [2, 3, 3, 2], [3, 2, 2, 3], [1, 0, 0, 1]]),
]
GOLD_OT = [
    np.array([[0, 3], [3, 0], [1, 2], [2, 1]]),
    np.array([[0, 3], [0, 3], [1, 2], [1, 2]]),
    np.array(
        [
            [0, 1, 6, 7],
            [3, 2, 5, 4],
            [6, 7, 0, 1],
            [5, 4, 3, 2],
            [2, 3, 4, 5],
            [1, 0, 7, 6],
            [4, 5, 2, 3],
            [7, 6, 1, 0],
        ]
    ),
    np.array(
        [
            [0, 1, 6, 7],
            [3, 2, 5, 4],
            [6, 7, 0, 1],
            [5, 4, 3, 2],
            [2, 3, 4, 5],
            [1, 0, 7, 6],
            [4, 5, 2, 3],
            [7, 6, 1, 0],
        ]
    ),
    np.array([[0, 3, 4, 7], [1, 2, 5, 6], [0, 3, 4, 7], [1, 2, 5, 6]]),
]
GOLD_ENC_CONT = [
    np.array([0, 0, 0, 0, 1, 1, 0, 1]),
    np.array([0, 0, 0, 0, 1, 1, 0, 1]),
    np.array([0, 0, 0, 1, 1, 0]),
    np.array([0, 0, 0, 1, 1, 0]),
    np.array([0, 0, 0, 1, 0, 0]),
]
MES = np.array([0, 0, 1, 0])


def _trellises():
    return [Trellis(*c) for c in CASES]


def test_tables_match_goldens():
    for t, nst, ot in zip(_trellises(), GOLD_NST, GOLD_OT):
        np.testing.assert_array_equal(t.next_state_table, nst)
        np.testing.assert_array_equal(t.output_table, ot)


def test_conv_encode_cont_goldens():
    for t, enc in zip(_trellises(), GOLD_ENC_CONT):
        np.testing.assert_array_equal(conv_encode(MES, t, "cont"), enc)


def test_encode_scan_matches_conv_encode_cont():
    rng = np.random.RandomState(0)
    for t in _trellises():
        msg = rng.randint(0, 2, 6 * t.k * 10)
        ref = conv_encode(msg, t, "cont")
        dev = np.asarray(encode_scan(msg, t)[0])
        np.testing.assert_array_equal(ref, dev)
        # batched
        msgs = rng.randint(0, 2, (4, 6 * t.k * 5))
        dev_b = np.asarray(encode_scan(msgs, t)[0])
        for i in range(4):
            np.testing.assert_array_equal(
                conv_encode(msgs[i], t, "cont"), dev_b[i]
            )


@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_encode_viterbi_roundtrip(case_idx):
    np.random.seed(17121996)
    t = Trellis(*CASES[case_idx])
    msg = np.random.randint(0, 2, 200)

    coded = conv_encode(msg, t)
    dec = viterbi_decode(coded.astype(float), t, 15)
    np.testing.assert_array_equal(dec[: len(msg)], msg)

    coded = conv_encode(msg, t, termination="cont")
    dec = viterbi_decode(coded.astype(float), t, 15)
    np.testing.assert_array_equal(dec, msg)

    coded = conv_encode(msg, t)
    dec = viterbi_decode(2.0 * coded - 1, t, 15, "unquantized")
    np.testing.assert_array_equal(dec[: len(msg)], msg)

    coded = conv_encode(msg, t)
    soft = 10.0 * coded - 5 + np.random.randn(len(coded)) * 2
    dec = viterbi_decode(soft, t, 15, "soft")
    np.testing.assert_array_equal(dec[: len(msg)], msg)

    # +-inf LLRs must survive the clip path
    coded = conv_encode(msg, t)
    dec = viterbi_decode((2.0 * coded - 1) * np.inf, t, 15, "soft")
    np.testing.assert_array_equal(dec[: len(msg)], msg)


def test_viterbi_batched_matches_single():
    np.random.seed(3)
    t = Trellis(np.array([2]), np.array([[5, 7]]))
    msgs = np.random.randint(0, 2, (5, 100))
    coded = np.stack([conv_encode(m, t, "cont") for m in msgs])
    noisy = 2.0 * coded - 1 + np.random.randn(*coded.shape) * 0.8
    batch = np.asarray(
        viterbi_decode_device(noisy, t, 15, "unquantized")
    )
    for i in range(len(msgs)):
        single = np.asarray(
            viterbi_decode_device(noisy[i], t, 15, "unquantized")
        )
        np.testing.assert_array_equal(batch[i], single)


def test_viterbi_bit_exact_vs_reference():
    ref_cc = pytest.importorskip("commpy.channelcoding.convcode")
    np.random.seed(8071996)
    for (mem, g, fb, ct, pf), t in zip(CASES, _trellises()):
        rt = ref_cc.Trellis(
            mem.copy(),
            g.copy(),
            fb if fb is None or isinstance(fb, int) else fb.copy(),
            ct,
            pf,
        )
        msg = np.random.randint(0, 2, 120)
        coded = conv_encode(msg, t)
        # heavy noise: decoded bits may be wrong, but must be wrong in
        # exactly the same way as the reference (tie-break parity)
        noisy_hard = coded.copy()
        flips = np.random.choice(coded.size, coded.size // 8, replace=False)
        noisy_hard[flips] ^= 1
        a = ref_cc.viterbi_decode(noisy_hard.astype(float), rt, 15)
        b = viterbi_decode(noisy_hard.astype(float), t, 15)
        np.testing.assert_array_equal(a, b)

        soft = 3.0 * (2 * coded - 1) + np.random.randn(coded.size) * 3
        a = ref_cc.viterbi_decode(soft, rt, 15, "soft")
        b = viterbi_decode(soft, t, 15, "soft")
        np.testing.assert_array_equal(a, b)


def test_puncturing_roundtrip():
    rng = np.random.RandomState(1)
    msg = rng.randint(0, 2, 120)
    pv = np.array([1, 1, 1, 0, 0, 1])
    p = puncturing(msg, pv)
    assert p.size == msg.size * pv.sum() // pv.size
    d = depuncturing(p, pv, msg.size)
    kept = np.tile(pv, msg.size // pv.size).astype(bool)
    np.testing.assert_array_equal(d[kept], msg[kept])
    np.testing.assert_array_equal(d[~kept], 0)


def test_puncturing_matches_reference():
    ref_cc = pytest.importorskip("commpy.channelcoding.convcode")
    rng = np.random.RandomState(2)
    msg = rng.randint(0, 2, 90)
    for pv in ([1, 1, 1, 0], [1, 1, 1, 0, 0, 1], [1, 1, 1, 0, 0, 1, 1, 0, 0, 1]):
        a = ref_cc.puncturing(msg, np.array(pv))
        b = puncturing(msg, np.array(pv))
        np.testing.assert_array_equal(a, b)
        da = ref_cc.depuncturing(a, np.array(pv), len(msg))
        db = depuncturing(b, np.array(pv), len(msg))
        np.testing.assert_array_equal(da, db)


def test_wifi_code_not_catastrophic():
    """The flagship K=7 code must be the real 802.11 (133,171)_OCTAL.

    Passing the octal constants as decimal (as reference wifi80211.py:49
    does) leaves both effective generators with even tap weight, so
    (1+D) divides both and the code is catastrophic: one decision error
    inverts the rest of the frame (whole-frame BER ~0.5 under 4% hard
    flips, ML-tied with the true path).  Guard both the generator parse
    and end-to-end frame recovery at a moderate flip rate.
    """
    from commpy_tpu.models.wifi80211_link import wifi80211_device_link
    from commpy_tpu.ops.convcode import encode_scan
    from commpy_tpu.ops.viterbi import viterbi_decode_device
    from commpy_tpu.wifi80211 import Wifi80211

    # (1+D) | g  <=>  g(1) = 0  <=>  even tap weight; both generators
    # sharing it is exactly the decimal-parse catastrophe.
    for g in (Wifi80211.generator_matrix.ravel()):
        taps = bin(int(g)).count("1")
        assert taps % 2 == 1, f"generator {g:o} has even tap weight"

    tr = Trellis(np.array([6]), np.array([[0o133, 0o171]]))
    rng = np.random.RandomState(11)
    B, L = 8, 1024
    msg = rng.randint(0, 2, (B, L)).astype(np.int8)
    coded = np.asarray(encode_scan(msg, tr)[0]).astype(np.int8)
    flips = rng.rand(*coded.shape) < 0.04
    rx = (coded ^ flips).astype(np.float32)
    d = np.asarray(viterbi_decode_device(rx, tr, 35, "hard", L=L,
                                         backend="xla"))
    ber = (d != msg).mean()
    # the real code: scattered error events only (measured ~1e-3); the
    # catastrophic parse fails whole frames (BER 0.2-0.5 here)
    assert ber < 0.02, f"K=7 hard BER {ber} at 4% flips: catastrophic?"
