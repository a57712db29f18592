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

__all__ = ["ofdm_tx", "ofdm_rx"]


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
