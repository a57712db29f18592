"""Sequence-sharded streaming Viterbi vs serial decode."""
import numpy as np
from numpy.testing import assert_array_equal

from commpy_tpu.ops.convcode import conv_encode
from commpy_tpu.ops.stream import sharded_viterbi_stream
from commpy_tpu.ops.trellis import Trellis
from commpy_tpu.ops.viterbi import viterbi_decode_device
from commpy_tpu.parallel import make_mesh


def test_sharded_stream_matches_serial():
    np.random.seed(11)
    tr = Trellis(np.array([2]), np.array([[5, 7]]))
    L = 8 * 512  # message bits; 8-way time sharding
    msg = np.random.randint(0, 2, L)
    coded = conv_encode(msg, tr, "cont").astype(np.float32)
    llr = (2.0 * coded - 1) * 4 + np.random.randn(coded.size) * 2.0

    mesh = make_mesh(8, "sp")
    out = np.asarray(
        sharded_viterbi_stream(
            llr, tr, mesh, tb_depth=15, decoding_type="soft",
            warmup_codewords=96,
        )
    )
    serial = np.asarray(
        viterbi_decode_device(llr, tr, 15, "soft", L=L)
    )
    # warm-up windows make boundary decisions statistically equivalent;
    # with 96-codeword warmup they coincide on this seed
    mismatch = (out != serial).mean()
    assert mismatch < 1e-3, mismatch
    # and the decode is actually correct
    assert (out != msg).mean() < 0.02


def test_sharded_stream_k7():
    # True 802.11 octal generators (133,171)_8 = (91,121): odd tap weights,
    # so no complement degeneracy (see ops/stream.py docstring) and
    # mid-stream windowed decoding is well-posed.
    np.random.seed(12)
    tr = Trellis(np.array([6]), np.array([[0o133, 0o171]]))
    L = 8 * 256
    msg = np.random.randint(0, 2, L)
    coded = conv_encode(msg, tr, "cont").astype(np.float32)
    llr = (2.0 * coded - 1) * 5 + np.random.randn(coded.size) * 2.0
    mesh = make_mesh(8, "sp")
    out = np.asarray(
        sharded_viterbi_stream(
            llr, tr, mesh, tb_depth=30, decoding_type="soft",
            warmup_codewords=128,
        )
    )
    assert_array_equal(out, msg)


def test_sharded_turbo_stream_matches_serial():
    # Sequence-parallel turbo (VERDICT r1 item 6): one long frame sharded
    # over 8 devices, BCJR state-metric warmup halos via ppermute, global
    # interleaver via all_gather; decisions match the exact serial decode.
    import jax

    from commpy_tpu.channelcoding import RandInterlv
    from commpy_tpu.ops import turbo as T
    from commpy_tpu.ops.stream import sharded_turbo_stream

    np.random.seed(13)
    tr = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
    L = 8192
    interlv = RandInterlv(L, 0)
    msg = np.random.randint(0, 2, (1, L))
    s, p1, p2 = T.turbo_encode_device(msg, tr, tr, interlv.p_array)
    sigma2 = 0.5
    noise = np.random.randn(3, L) * np.sqrt(sigma2)
    sy = (2.0 * np.asarray(s)[0] - 1 + noise[0]).astype(np.float32)
    py1 = (2.0 * np.asarray(p1)[0] - 1 + noise[1]).astype(np.float32)
    py2 = (2.0 * np.asarray(p2)[0] - 1 + noise[2]).astype(np.float32)

    serial = np.asarray(
        T.turbo_decode_device(sy, py1, py2, tr, sigma2, 3, interlv.p_array)
    )
    mesh = make_mesh(8, "sp")
    sharded = np.asarray(
        sharded_turbo_stream(sy, py1, py2, tr, sigma2, 3, interlv.p_array,
                             mesh, warmup=64)
    )
    assert (serial != sharded).mean() < 1e-3
    assert (sharded != msg[0]).sum() == 0


def test_sharded_turbo_stream_nii_matches_serial():
    # NII sequence parallelism: boundary alpha/beta carried across
    # turbo iterations as [S]-float ppermutes — no halo recompute.
    # After enough iterations decisions match the serial decode and
    # recover the message.
    from commpy_tpu.channelcoding import RandInterlv
    from commpy_tpu.ops import turbo as T
    from commpy_tpu.ops.stream import sharded_turbo_stream

    np.random.seed(17)
    tr = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
    L = 8192
    interlv = RandInterlv(L, 1)
    msg = np.random.randint(0, 2, (1, L))
    s, p1, p2 = T.turbo_encode_device(msg, tr, tr, interlv.p_array)
    sigma2 = 0.5
    noise = np.random.randn(3, L) * np.sqrt(sigma2)
    sy = (2.0 * np.asarray(s)[0] - 1 + noise[0]).astype(np.float32)
    py1 = (2.0 * np.asarray(p1)[0] - 1 + noise[1]).astype(np.float32)
    py2 = (2.0 * np.asarray(p2)[0] - 1 + noise[2]).astype(np.float32)

    serial = np.asarray(
        T.turbo_decode_device(sy, py1, py2, tr, sigma2, 5, interlv.p_array)
    )
    mesh = make_mesh(8, "sp")
    sharded = np.asarray(
        sharded_turbo_stream(sy, py1, py2, tr, sigma2, 5, interlv.p_array,
                             mesh, boundary_init="nii")
    )
    assert (serial != sharded).mean() < 1e-3
    assert (sharded != msg[0]).sum() == 0


def test_sharded_turbo_stream_warmup_zero():
    # warmup=0 (no halos) must run, not crash on the x[-0:] slice, and
    # still decode a clean high-SNR frame exactly
    from commpy_tpu.channelcoding import RandInterlv
    from commpy_tpu.ops import turbo as T
    from commpy_tpu.ops.stream import sharded_turbo_stream

    np.random.seed(23)
    tr = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
    L = 1024
    interlv = RandInterlv(L, 0)
    msg = np.random.randint(0, 2, (1, L))
    s, p1, p2 = T.turbo_encode_device(msg, tr, tr, interlv.p_array)
    sy = (2.0 * np.asarray(s)[0] - 1).astype(np.float32) * 4
    py1 = (2.0 * np.asarray(p1)[0] - 1).astype(np.float32) * 4
    py2 = (2.0 * np.asarray(p2)[0] - 1).astype(np.float32) * 4
    mesh = make_mesh(8, "sp")
    out = np.asarray(
        sharded_turbo_stream(sy, py1, py2, tr, 0.5, 2, interlv.p_array,
                             mesh, warmup=0)
    )
    assert (out != msg[0]).sum() == 0
