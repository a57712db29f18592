"""FIR / polyphase / sequence-sharded convolution tests."""
import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax

from commpy_tpu.filters import rrcosfilter
from commpy_tpu.ops.fir import fir_filter, pulse_shape, sharded_fir_filter, upfirdn
from commpy_tpu.parallel import make_mesh


def test_fir_matches_npconvolve():
    rng = np.random.RandomState(0)
    x = rng.randn(357)
    h = rng.randn(33)
    assert_allclose(
        np.asarray(fir_filter(x, h, "full")), np.convolve(x, h), atol=1e-4
    )
    same = np.asarray(fir_filter(x, h, "same"))
    assert_allclose(same, np.convolve(x, h, "same"), atol=1e-4)
    # complex + batch
    xc = rng.randn(4, 100) + 1j * rng.randn(4, 100)
    out = np.asarray(fir_filter(xc, h))
    for i in range(4):
        assert_allclose(out[i], np.convolve(xc[i], h), atol=1e-4)


def test_upfirdn_matches_scipy():
    scipy_signal = pytest.importorskip("scipy.signal")
    rng = np.random.RandomState(1)
    x = rng.randn(123)
    h = rng.randn(31)
    for up, down in ((1, 1), (4, 1), (1, 3), (4, 3), (8, 2)):
        mine = np.asarray(upfirdn(x, h, up, down))
        ref = scipy_signal.upfirdn(h, x, up, down)
        assert_allclose(mine, ref, atol=1e-4), (up, down)


def test_pulse_shape_rrc():
    _, h = rrcosfilter(64, 0.35, 1.0, 8.0)
    rng = np.random.RandomState(2)
    syms = rng.choice([-1.0, 1.0], 50)
    wave = np.asarray(pulse_shape(syms, h, 8))
    up = np.zeros(50 * 8)
    up[::8] = syms
    full = np.convolve(up, h)
    # upfirdn convention: length (n-1)*up + t (the trailing zero-insertion
    # tail carries no signal)
    assert_allclose(wave, full[: len(wave)], atol=1e-4)
    assert_allclose(full[len(wave):], 0, atol=1e-12)


def test_sharded_fir_matches_serial():
    rng = np.random.RandomState(3)
    n = 1024
    x = rng.randn(n).astype(np.float32)
    h = rng.randn(17).astype(np.float32)
    mesh = make_mesh(8, "sp")
    out = np.asarray(sharded_fir_filter(x, h, mesh))
    expect = np.convolve(x, h)[:n]
    assert_allclose(out, expect, atol=1e-4)
