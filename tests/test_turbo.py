"""Turbo codec tests (the reference ships none — SURVEY §4 gap filled):
encoder parity vs reference, log-MAP vs probability-domain BCJR, batched
round trips."""
import numpy as np
import pytest

from commpy_tpu.channelcoding import RandInterlv
from commpy_tpu.ops.trellis import Trellis
from commpy_tpu.ops import turbo as T


def _trellis():
    return Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")


def test_turbo_encode_matches_reference():
    ref = pytest.importorskip("commpy.channelcoding")
    np.random.seed(5)
    rt = ref.Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
    mt = _trellis()
    L = 96
    interlv = RandInterlv(L, 3)
    msg = np.random.randint(0, 2, L)
    rs, rp1, rp2 = ref.turbo_encode(msg, rt, rt, interlv)
    ms, mp1, mp2 = T.turbo_encode(msg, mt, mt, interlv)
    np.testing.assert_array_equal(rs, ms)
    np.testing.assert_array_equal(rp1, mp1)
    np.testing.assert_array_equal(rp2, mp2)
    ds, dp1, dp2 = T.turbo_encode_device(msg, mt, mt, interlv.p_array)
    np.testing.assert_array_equal(np.asarray(ds), rs[:L])
    np.testing.assert_array_equal(np.asarray(dp1), rp1[:L])
    np.testing.assert_array_equal(np.asarray(dp2), rp2[:L])


def test_map_decode_matches_reference():
    refT = pytest.importorskip("commpy.channelcoding.turbo")
    ref = pytest.importorskip("commpy.channelcoding")
    np.random.seed(6)
    rt = ref.Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
    mt = _trellis()
    L = 64
    msg = np.random.randint(0, 2, L)
    interlv = RandInterlv(L, 1)
    s, p1, _ = T.turbo_encode(msg, mt, mt, interlv)
    sigma2 = 0.6
    sy = (2.0 * s[:L] - 1) + np.random.randn(L) * np.sqrt(sigma2)
    py = (2.0 * p1[:L] - 1) + np.random.randn(L) * np.sqrt(sigma2)
    L_int = np.random.randn(L) * 0.5
    Lr, dr = refT.map_decode(sy, py, rt, sigma2, L_int, "decode")
    Lm, dm = T.map_decode(sy, py, mt, sigma2, L_int)
    rel = np.max(np.abs(Lr - np.asarray(Lm)) / (1 + np.abs(Lr)))
    assert rel < 1e-4
    np.testing.assert_array_equal(dr, np.asarray(dm))


def test_turbo_decode_roundtrip_and_reference_parity():
    refcc = pytest.importorskip("commpy.channelcoding")
    np.random.seed(7)
    rt = refcc.Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
    mt = _trellis()
    L = 128
    interlv = RandInterlv(L, 0)
    msg = np.random.randint(0, 2, L)
    s, p1, p2 = T.turbo_encode(msg, mt, mt, interlv)
    sigma2 = 0.45
    sy = (2.0 * s[:L] - 1) + np.random.randn(L) * np.sqrt(sigma2)
    py1 = (2.0 * p1[:L] - 1) + np.random.randn(L) * np.sqrt(sigma2)
    py2 = (2.0 * p2[:L] - 1) + np.random.randn(L) * np.sqrt(sigma2)
    dr = refcc.turbo_decode(sy, py1, py2, rt, sigma2, 6, interlv)
    dm = T.turbo_decode(sy, py1, py2, mt, sigma2, 6, interlv)
    np.testing.assert_array_equal(dr, np.asarray(dm))
    assert (np.asarray(dm) != msg).sum() == 0


def test_windowed_bcjr_matches_serial():
    # Sliding-window BCJR (sub-blocks + warmup halos) must reproduce the
    # exact recursion's extrinsics closely and its decisions exactly on a
    # well-conditioned frame.
    np.random.seed(9)
    mt = _trellis()
    L = 512
    interlv = RandInterlv(L, 4)
    msg = np.random.randint(0, 2, (2, L))
    s, p1, p2 = T.turbo_encode_device(msg, mt, mt, interlv.p_array)
    sigma2 = 0.5
    noise = np.random.randn(3, 2, L) * np.sqrt(sigma2)
    sy = 2.0 * np.asarray(s) - 1 + noise[0]
    py = 2.0 * np.asarray(p1) - 1 + noise[1]
    L_int = np.random.randn(2, L) * 0.3

    exact_l, exact_d = T.map_decode_device(sy, py, mt, sigma2, L_int)
    win_l, win_d = T._log_bcjr_windowed(
        np.asarray(sy, np.float32), np.asarray(py, np.float32),
        np.asarray(L_int, np.float32), np.float32(sigma2), mt,
        chunk=128, warmup=24,
    )
    assert np.array_equal(np.asarray(exact_d), np.asarray(win_d))
    rel = np.abs(np.asarray(exact_l) - np.asarray(win_l)) / (
        1.0 + np.abs(np.asarray(exact_l))
    )
    assert np.median(rel) < 1e-4 and np.max(rel) < 0.05


def test_turbo_decode_windowed_roundtrip():
    # Full turbo decode with the windowed BCJR: recovers the message and
    # agrees with the exact decoder, including a non-chunk-multiple L.
    np.random.seed(10)
    mt = _trellis()
    L = 300  # not a multiple of the chunk size
    interlv = RandInterlv(L, 5)
    msg = np.random.randint(0, 2, (3, L))
    s, p1, p2 = T.turbo_encode_device(msg, mt, mt, interlv.p_array)
    sigma2 = 0.45
    noise = np.random.randn(3, 3, L) * np.sqrt(sigma2)
    sy = 2.0 * np.asarray(s) - 1 + noise[0]
    py1 = 2.0 * np.asarray(p1) - 1 + noise[1]
    py2 = 2.0 * np.asarray(p2) - 1 + noise[2]
    exact = np.asarray(
        T.turbo_decode_device(sy, py1, py2, mt, sigma2, 6, interlv.p_array)
    )
    win = np.asarray(
        T.turbo_decode_device(sy, py1, py2, mt, sigma2, 6, interlv.p_array,
                              window=(128, 24))
    )
    np.testing.assert_array_equal(exact, win)
    assert (win != msg).sum() == 0


def test_turbo_decode_batched_matches_single():
    np.random.seed(8)
    mt = _trellis()
    L = 64
    interlv = RandInterlv(L, 2)
    msgs = np.random.randint(0, 2, (4, L))
    sys_b, p1_b, p2_b = T.turbo_encode_device(
        msgs, mt, mt, interlv.p_array
    )
    sigma2 = 0.5
    noise = np.random.randn(3, 4, L) * np.sqrt(sigma2)
    sy = 2.0 * np.asarray(sys_b) - 1 + noise[0]
    py1 = 2.0 * np.asarray(p1_b) - 1 + noise[1]
    py2 = 2.0 * np.asarray(p2_b) - 1 + noise[2]
    batch = np.asarray(
        T.turbo_decode_device(sy, py1, py2, mt, sigma2, 4, interlv.p_array)
    )
    for i in range(4):
        single = np.asarray(
            T.turbo_decode_device(
                sy[i], py1[i], py2[i], mt, sigma2, 4, interlv.p_array
            )
        )
        np.testing.assert_array_equal(batch[i], single)


def test_turbo_decode_long_frame_l6144():
    # Production frame length (L > the 2048 one-hot cutoff): the unrolled
    # gather interleave + windowed BCJR recover the message.
    np.random.seed(12)
    mt = _trellis()
    L = 6144
    interlv = RandInterlv(L, 7)
    msg = np.random.randint(0, 2, (2, L))
    s, p1, p2 = T.turbo_encode_device(msg, mt, mt, interlv.p_array)
    sigma2 = 0.5
    noise = np.random.randn(3, 2, L) * np.sqrt(sigma2)
    sy = 2.0 * np.asarray(s) - 1 + noise[0]
    py1 = 2.0 * np.asarray(p1) - 1 + noise[1]
    py2 = 2.0 * np.asarray(p2) - 1 + noise[2]
    dec = np.asarray(
        T.turbo_decode_device(sy, py1, py2, mt, sigma2, 4, interlv.p_array,
                              window=(512, 32))
    )
    assert (dec != msg).sum() == 0


def test_turbo_pallas_backend_matches_xla():
    # The fused Pallas BCJR kernel (kernels/bcjr.py, interpret mode on
    # CPU) must reproduce the XLA scan core's decisions on whole frames
    # and under the windowed sub-block decomposition.
    np.random.seed(13)
    mt = _trellis()
    L = 64
    interlv = RandInterlv(L, 2)
    msg = np.random.randint(0, 2, (4, L))
    s, p1, p2 = T.turbo_encode_device(msg, mt, mt, interlv.p_array)
    sigma2 = 0.6
    noise = np.random.randn(3, 4, L) * np.sqrt(sigma2)
    sy = 2.0 * np.asarray(s) - 1 + noise[0]
    py1 = 2.0 * np.asarray(p1) - 1 + noise[1]
    py2 = 2.0 * np.asarray(p2) - 1 + noise[2]
    args = (sy, py1, py2, mt, sigma2, 3, interlv.p_array)
    for kw in ({}, {"window": (16, 8)}, {"algorithm": "max-log"}):
        d_x = np.asarray(T.turbo_decode_device(*args, backend="xla", **kw))
        d_p = np.asarray(
            T.turbo_decode_device(*args, backend="pallas", **kw)
        )
        np.testing.assert_array_equal(d_x, d_p)


def test_turbo_pallas_bf16_io_matches_f32_decisions():
    # kernel_io="bf16" quantizes the Pallas kernel's stream traffic to
    # bfloat16 (8-bit mantissa LLRs; production decoders run 4-6 bits).
    # At working SNR the decisions must match the f32 kernel's.
    np.random.seed(21)
    mt = _trellis()
    L = 512
    interlv = RandInterlv(L, 4)
    msg = np.random.randint(0, 2, (4, L))
    s, p1, p2 = T.turbo_encode_device(msg, mt, mt, interlv.p_array)
    sigma2 = 0.45
    noise = np.random.randn(3, 4, L) * np.sqrt(sigma2)
    sy = 2.0 * np.asarray(s) - 1 + noise[0]
    py1 = 2.0 * np.asarray(p1) - 1 + noise[1]
    py2 = 2.0 * np.asarray(p2) - 1 + noise[2]
    args = (sy, py1, py2, mt, sigma2, 4, interlv.p_array)
    # L=512 whole-frame f32 exceeds the kernel's VMEM budget (it decodes
    # windowed or on the XLA core); cover windowed + bf16 whole-frame,
    # and whole-frame f32-vs-bf16 at a length that fits both.
    for kw in ({"window": (128, 32)},
               {"window": (128, 0), "window_init": "nii"}):
        d32 = np.asarray(T.turbo_decode_device(
            *args, backend="pallas", kernel_io="f32", **kw))
        d16 = np.asarray(T.turbo_decode_device(
            *args, backend="pallas", kernel_io="bf16", **kw))
        assert (d32 != d16).mean() < 5e-3, kw
        assert (d16 != msg).mean() < 5e-3, kw
    half = (sy[:, :256], py1[:, :256], py2[:, :256], mt, sigma2, 4,
            RandInterlv(256, 4).p_array)
    d32 = np.asarray(T.turbo_decode_device(
        *half, backend="pallas", kernel_io="f32"))
    d16 = np.asarray(T.turbo_decode_device(
        *half, backend="pallas", kernel_io="bf16"))
    assert (d32 != d16).mean() < 5e-3


def test_turbo_nii_first_iteration_matches_warmup_w0():
    # NII iteration 1 starts every non-first window from a uniform
    # alpha and every window from a uniform end-beta — exactly the
    # masked warmup path with W=0 halos.  Decisions must be
    # bit-identical for a single iteration.
    np.random.seed(31)
    mt = _trellis()
    L = 256
    interlv = RandInterlv(L, 6)
    msg = np.random.randint(0, 2, (3, L))
    s, p1, p2 = T.turbo_encode_device(msg, mt, mt, interlv.p_array)
    sigma2 = 0.7
    noise = np.random.randn(3, 3, L) * np.sqrt(sigma2)
    sy = 2.0 * np.asarray(s) - 1 + noise[0]
    py1 = 2.0 * np.asarray(p1) - 1 + noise[1]
    py2 = 2.0 * np.asarray(p2) - 1 + noise[2]
    args = (sy, py1, py2, mt, sigma2, 1, interlv.p_array)
    d_w0 = np.asarray(T.turbo_decode_device(
        *args, window=(64, 0), backend="pallas"))
    d_nii = np.asarray(T.turbo_decode_device(
        *args, window=(64, 0), backend="pallas", window_init="nii"))
    np.testing.assert_array_equal(d_w0, d_nii)


def test_turbo_nii_converges_like_whole_frame():
    # After a few iterations the carried boundary states converge: the
    # NII decode must recover the message wherever the whole-frame
    # decode does (same working SNR).
    np.random.seed(32)
    mt = _trellis()
    L = 1024
    interlv = RandInterlv(L, 8)
    msg = np.random.randint(0, 2, (4, L))
    s, p1, p2 = T.turbo_encode_device(msg, mt, mt, interlv.p_array)
    sigma2 = 0.5
    noise = np.random.randn(3, 4, L) * np.sqrt(sigma2)
    sy = 2.0 * np.asarray(s) - 1 + noise[0]
    py1 = 2.0 * np.asarray(p1) - 1 + noise[1]
    py2 = 2.0 * np.asarray(p2) - 1 + noise[2]
    d_nii = np.asarray(T.turbo_decode_device(
        sy, py1, py2, mt, sigma2, 6, interlv.p_array, window=(128, 0),
        backend="pallas", window_init="nii"))
    assert (d_nii != msg).sum() == 0
    # bf16 io composes with NII
    d_nii16 = np.asarray(T.turbo_decode_device(
        sy, py1, py2, mt, sigma2, 6, interlv.p_array, window=(128, 0),
        backend="pallas", window_init="nii", kernel_io="bf16"))
    assert (d_nii16 != msg).sum() == 0


def test_turbo_nii_xla_matches_pallas():
    # NII on the xla backend (reshape windows + _bcjr_masked carries)
    # must agree with the pallas NII loop: both recover the message and
    # decisions match except possibly at near-zero LLRs.
    np.random.seed(33)
    mt = _trellis()
    L = 512
    interlv = RandInterlv(L, 9)
    msg = np.random.randint(0, 2, (3, L))
    s, p1, p2 = T.turbo_encode_device(msg, mt, mt, interlv.p_array)
    sigma2 = 0.5
    noise = np.random.randn(3, 3, L) * np.sqrt(sigma2)
    sy = 2.0 * np.asarray(s) - 1 + noise[0]
    py1 = 2.0 * np.asarray(p1) - 1 + noise[1]
    py2 = 2.0 * np.asarray(p2) - 1 + noise[2]
    args = (sy, py1, py2, mt, sigma2, 5, interlv.p_array)
    d_x = np.asarray(T.turbo_decode_device(
        *args, window=(128, 0), backend="xla", window_init="nii"))
    d_p = np.asarray(T.turbo_decode_device(
        *args, window=(128, 0), backend="pallas", window_init="nii"))
    assert (d_x != msg).sum() == 0
    assert (d_x != d_p).mean() < 2e-3


def test_extrinsic_scaling_improves_max_log():
    # Vogt & Finger extrinsic scaling: damped max-log extrinsics must
    # decode strictly better than unscaled max-log at waterfall SNR
    # (measured: recovers ~2/3 of the gap to full log-MAP here)
    np.random.seed(5)
    tr = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
    L, B = 512, 64
    interlv = RandInterlv(L, 0)
    msg = np.random.randint(0, 2, (B, L))
    s, p1, p2 = T.turbo_encode_device(msg, tr, tr, interlv.p_array)
    sigma2 = 1 / (2 * (1 / 3))  # Eb/N0 = 0 dB at rate 1/3
    noise = np.random.randn(3, B, L) * np.sqrt(sigma2)
    sy = (2.0 * np.asarray(s) - 1 + noise[0]).astype(np.float32)
    py1 = (2.0 * np.asarray(p1) - 1 + noise[1]).astype(np.float32)
    py2 = (2.0 * np.asarray(p2) - 1 + noise[2]).astype(np.float32)

    errs = {}
    for es in (1.0, 0.7):
        d = T.turbo_decode_device(sy, py1, py2, tr, sigma2, 8,
                                  interlv.p_array, algorithm="max-log",
                                  ext_scale=es)
        errs[es] = int((np.asarray(d) != msg).sum())
    assert errs[0.7] < errs[1.0], errs

    # scaling threads through the windowed/NII paths too (smoke: runs
    # and stays in the same error ballpark)
    d_nii = T.turbo_decode_device(sy, py1, py2, tr, sigma2, 8,
                                  interlv.p_array, algorithm="max-log",
                                  window=(128, 0), window_init="nii",
                                  backend="xla", ext_scale=0.7)
    nii_errs = int((np.asarray(d_nii) != msg).sum())
    assert nii_errs < errs[1.0]
