"""Block + convolutional (Forney) interleavers, incl. the DVB-T chain."""
import numpy as np

import jax.numpy as jnp

from commpy_tpu.ops.interleave import (
    block_interleaver,
    conv_deinterleave,
    conv_interleave,
    conv_interleaver_delay,
    deinterleave,
    interleave,
)


def test_block_interleaver_permutation_and_burst_spreading():
    rows, cols = 8, 25
    p = block_interleaver(rows, cols)
    assert sorted(p.tolist()) == list(range(rows * cols))
    x = np.arange(rows * cols)
    y = np.asarray(interleave(x, p))
    rt = np.asarray(deinterleave(jnp.asarray(y), p))
    assert np.array_equal(rt, x)
    # a burst of `rows` consecutive interleaved symbols deinterleaves to
    # positions >= cols apart... (write rows x cols row-wise, read
    # column-wise: consecutive read positions are one ROW apart)
    burst = set(p[:rows].tolist())
    gaps = np.diff(sorted(burst))
    assert gaps.min() >= cols


def test_conv_interleaver_roundtrip_with_delay():
    I, M, n = 12, 17, 5000
    D = conv_interleaver_delay(I, M)
    assert D == I * (I - 1) * M
    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, (3, n))
    y = conv_interleave(jnp.asarray(x), I, M)
    z = np.asarray(conv_deinterleave(y, I, M))
    assert np.array_equal(z[:, D:], x[:, :n - D])


def test_conv_interleaver_small_identity():
    # I=1 is a wire (no delays)
    x = np.arange(20)
    y = np.asarray(conv_interleave(x, 1, 5))
    assert np.array_equal(y, x)


def test_dvbt_rs_conv_interleaver_burst_chain():
    """DVB-T outer chain: RS(204,188) + Forney I=12/M=17 vs a symbol
    burst far beyond t=8.  M = 204/12 makes the end-to-end delay
    exactly 11 RS frames, so frame k re-emerges at frame k+11."""
    from commpy_tpu.ops.rs import rs_construct, rs_decode, rs_encode

    code = rs_construct(8, 8, shorten=51, fcr=0)  # RS(204,188)
    I, M = 12, 17
    D = conv_interleaver_delay(I, M)
    assert D == 11 * code.n
    rng = np.random.default_rng(11)
    F = 24
    msg = rng.integers(0, 256, (F, code.k))
    stream = np.asarray(rs_encode(code, msg)).reshape(-1)
    tx = np.asarray(conv_interleave(stream, I, M))
    # burst of 90 consecutive corrupted symbols (>> t=8 per frame)
    rx = tx.copy()
    burst0 = 6 * code.n
    rx[burst0:burst0 + 90] ^= rng.integers(1, 256, 90)
    de = np.asarray(conv_deinterleave(jnp.asarray(rx), I, M))
    frames = de.reshape(F, code.n)[11:]  # frame k is at k + 11
    corrected, nerr, ok = (np.asarray(a) for a in rs_decode(code, frames))
    want = np.asarray(rs_encode(code, msg))[:F - 11]
    assert ok.all()
    assert nerr.max() <= 8 and nerr.sum() > 0  # spread below t, nonzero
    assert np.array_equal(corrected, want)
