"""OFDM modulation / demodulation.

Batched FFT formulation of reference commpy/modulation.py:265-296, with the
reference's Python-2 float-index breakage fixed (int arithmetic throughout)
but the identical subcarrier map:

* tx: freq[0] = 0 (DC null); freq[1 : nsc/2+1] = symbols[nsc/2 :];
  freq[-nsc/2 :] = symbols[: nsc/2]; IFFT; cyclic prefix prepended.
* rx: strip CP, FFT, inverse mapping.

The per-OFDM-symbol Python loop of the reference becomes one batched
(I)FFT over a ``[..., n_sym, nfft]`` tensor.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "ofdm_tx",
    "ofdm_rx",
    "subcarrier_bins",
    "delay_subspace_matrix",
    "make_comb_estimator",
]


def ofdm_tx(x, nfft: int, nsc: int, cp_length: int):
    """OFDM transmit signal generation.

    Parameters
    ----------
    x : complex array ``[..., nsc, n_sym]`` — symbols, one OFDM symbol per
        trailing column (reference layout).
    nfft, nsc, cp_length : static ints; nsc must be even.

    Returns
    -------
    signal : complex array ``[..., n_sym * (nfft + cp_length)]``
    """
    x = jnp.asarray(x)
    lead = x.shape[:-2]
    n_sym = x.shape[-1]
    half = nsc // 2

    sym = jnp.moveaxis(x, -1, -2)  # [..., n_sym, nsc]
    freq = jnp.zeros(lead + (n_sym, nfft), dtype=jnp.complex64)
    freq = freq.at[..., 1 : half + 1].set(sym[..., half:])
    freq = freq.at[..., nfft - half :].set(sym[..., :half])

    time = jnp.fft.ifft(freq, axis=-1)
    cp = time[..., nfft - cp_length :]
    out = jnp.concatenate((cp, time), axis=-1)  # [..., n_sym, cp+nfft]
    return out.reshape(lead + (n_sym * (nfft + cp_length),))


def ofdm_rx(y, nfft: int, nsc: int, cp_length: int):
    """OFDM receive processing: inverse of :func:`ofdm_tx`.

    Returns complex array ``[..., nsc, n_sym]`` (reference layout).
    """
    y = jnp.asarray(y)
    lead = y.shape[:-1]
    n_sym = y.shape[-1] // (nfft + cp_length)
    half = nsc // 2

    blocks = y[..., : n_sym * (nfft + cp_length)].reshape(
        lead + (n_sym, nfft + cp_length)
    )
    time = blocks[..., cp_length:]
    freq = jnp.fft.fft(time, axis=-1)
    sym = jnp.concatenate(
        (freq[..., nfft - half :], freq[..., 1 : half + 1]), axis=-1
    )  # [..., n_sym, nsc]
    return jnp.moveaxis(sym, -1, -2)


# ---------------------------------------------------------------------------
# Channel estimation (beyond reference: CommPy's OFDM stops at the FFT
# mapping and has no estimator of any kind)
# ---------------------------------------------------------------------------

def subcarrier_bins(nfft: int, nsc: int) -> np.ndarray:
    """FFT bin index per subcarrier SLOT of the `ofdm_tx` map.

    Slots ``[0, nsc/2)`` ride the negative-frequency bins
    ``nfft-nsc/2 .. nfft-1``; slots ``[nsc/2, nsc)`` the positive bins
    ``1 .. nsc/2`` (DC is never loaded).
    """
    half = nsc // 2
    return np.concatenate(
        [np.arange(nfft - half, nfft), np.arange(1, half + 1)]
    )


def _dft_columns(nfft: int, bins: np.ndarray, n_taps: int) -> np.ndarray:
    return np.exp(
        -2j * np.pi * bins[:, None] * np.arange(n_taps)[None, :] / nfft
    ).astype(np.complex64)


def delay_subspace_matrix(nfft: int, nsc: int, n_taps: int,
                          reg: float = 1e-4) -> np.ndarray:
    """Smoothing matrix S projecting an LS estimate onto the delay subspace.

    A channel whose impulse response has ``n_taps`` taps lives in the
    ``n_taps``-dimensional column space of the per-slot DFT matrix ``W``
    (``H = W g``); per-subcarrier LS noise outside that subspace is pure
    estimation error.  ``S = W (W^H W + reg I)^-1 W^H`` (``[nsc, nsc]``,
    host-precomputed) removes it: applying ``H_ls @ S.T`` on device is one
    matmul and divides the estimator noise by ~``nsc / n_taps`` while
    leaving any true ``n_taps``-tap channel untouched (tested).
    """
    w = _dft_columns(nfft, subcarrier_bins(nfft, nsc), n_taps)
    gram = w.conj().T @ w + reg * np.eye(n_taps, dtype=np.complex64)
    return (w @ np.linalg.solve(gram, w.conj().T)).astype(np.complex64)


def make_comb_estimator(nfft: int, nsc: int, pilot_slots, n_taps: int,
                        reg: float = 1e-4):
    """Comb-pilot channel estimator: pilot-slot LS -> all-slot estimate.

    Scattered (comb) pilots are the production arrangement — 802.11 uses 4
    pilot tones per OFDM symbol, DVB-T a 1-in-12 scattered raster — so the
    receiver must infer the full ``[nsc]`` response from ``P`` pilot
    observations.  With the delay-subspace model this is least squares in
    ``g``: ``h_full = W (W_p^H W_p + reg I)^-1 W_p^H h_p`` — ONE
    host-precomputed ``[nsc, P]`` matrix, so the device-side estimator is a
    single matmul over the batch.  Exact for any ``n_taps``-tap channel
    when ``P >= n_taps`` (tested); needs no interpolation grid logic.

    Returns ``estimate(h_pilot_ls)`` mapping ``[..., P] -> [..., nsc]``.
    """
    pilot_slots = np.asarray(pilot_slots, np.int64)
    w_full = _dft_columns(nfft, subcarrier_bins(nfft, nsc), n_taps)
    w_p = w_full[pilot_slots]
    gram = w_p.conj().T @ w_p + reg * np.eye(n_taps, dtype=np.complex64)
    a = (w_full @ np.linalg.solve(gram, w_p.conj().T)).astype(np.complex64)

    def estimate(h_pilot_ls):
        return jnp.asarray(h_pilot_ls) @ jnp.asarray(a).T

    return estimate
