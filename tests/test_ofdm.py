"""OFDM tests: roundtrip, subcarrier map vs the reference algorithm
(re-expressed with int indices — the reference source is Python-2-broken,
modulation.py:268-277), and batching."""
import numpy as np
from numpy.testing import assert_allclose

from commpy_tpu.modulation import ofdm_rx, ofdm_tx


def _ref_ofdm_tx(x, nfft, nsc, cp_length):
    """Reference semantics with int arithmetic (modulation.py:265-282)."""
    out = np.array([], complex)
    for i in range(x.shape[1]):
        symbols = x[:, i]
        freq = np.zeros(nfft, complex)
        freq[1 : nsc // 2 + 1] = symbols[nsc // 2 :]
        freq[-(nsc // 2):] = symbols[: nsc // 2]
        time = np.fft.ifft(freq)
        out = np.concatenate((out, time[-cp_length:], time))
    return out


def _ref_ofdm_rx(y, nfft, nsc, cp_length):
    n = int(len(y) / (nfft + cp_length))
    x_hat = np.zeros((nsc, n), complex)
    for i in range(n):
        sym = y[i * nfft + (i + 1) * cp_length : (i + 1) * (nfft + cp_length)]
        freq = np.fft.fft(sym)
        x_hat[:, i] = np.concatenate(
            (freq[-(nsc // 2):], freq[1 : nsc // 2 + 1])
        )
    return x_hat


def test_ofdm_matches_reference_semantics():
    rng = np.random.RandomState(0)
    x = rng.randn(48, 3) + 1j * rng.randn(48, 3)
    mine = ofdm_tx(x, 64, 48, 16)
    ref = _ref_ofdm_tx(x, 64, 48, 16)
    assert_allclose(mine, ref, atol=1e-6)
    back_ref = _ref_ofdm_rx(ref, 64, 48, 16)
    back_mine = ofdm_rx(mine, 64, 48, 16)
    assert_allclose(back_mine, back_ref, atol=1e-4)


def test_ofdm_roundtrip():
    rng = np.random.RandomState(1)
    x = rng.randn(64, 5) + 1j * rng.randn(64, 5)
    s = ofdm_tx(x, 128, 64, 16)
    assert s.shape == (5 * 144,)
    xh = ofdm_rx(s, 128, 64, 16)
    assert_allclose(x, xh, atol=1e-4)


def test_ofdm_batched():
    from commpy_tpu.ops.ofdm import ofdm_rx as rx_d, ofdm_tx as tx_d

    rng = np.random.RandomState(2)
    x = rng.randn(4, 2, 32, 3) + 1j * rng.randn(4, 2, 32, 3)
    s = np.asarray(tx_d(x, 64, 32, 8))
    assert s.shape == (4, 2, 3 * 72)
    xh = np.asarray(rx_d(s, 64, 32, 8))
    assert_allclose(x, xh, atol=1e-4)
