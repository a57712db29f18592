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
