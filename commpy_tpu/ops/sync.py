"""Synchronization: CFO estimation/correction + Schmidl-Cox timing.

Beyond-reference subsystem (CommPy models the impairment only: reference
commpy/impairments.py:20-42 injects a carrier frequency offset and provides
no estimator, corrector, or timing recovery).  This module is the receive
side: estimate the offset from structure the waveform already has (the OFDM
cyclic prefix, or a repeated preamble) and undo it.

TPU-native design: every estimator is a batched correlation expressible as
elementwise products + moving sums (cumulative-sum differences) — no data-
dependent control flow, trailing-axis time, arbitrary leading batch axes,
fully fusable by XLA.  The only argmax (timing) is a plain reduction.

Conventions: a normalized CFO ``eps`` is in SUBCARRIER SPACINGS (delta_f =
eps * Fs / nfft for sample rate Fs and FFT size nfft); estimators return
``eps`` so correction does not need to know Fs.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "cfo_correct",
    "cfo_estimate_cp",
    "integer_cfo_estimate",
    "schmidl_cox_preamble",
    "schmidl_cox_metric",
    "schmidl_cox_estimate",
]


def cfo_correct(waveform, eps, nfft: int, start: int = 0):
    """Derotate a waveform by a normalized CFO ``eps`` (subcarrier units).

    Inverse of ``add_frequency_offset(w, Fs, eps*Fs/nfft)``; ``eps`` may be
    a scalar or carry the leading batch axes (per-frame estimates).
    ``start`` offsets the sample index of the first element (for correcting
    a slice cut out of a longer stream).
    """
    w = jnp.asarray(waveform)
    eps = jnp.asarray(eps)[..., None] if jnp.ndim(eps) else eps
    n = jnp.arange(start, start + w.shape[-1])
    return w * jnp.exp(-1j * 2 * jnp.pi * eps * n / nfft)


def cfo_estimate_cp(waveform, nfft: int, cp_length: int, n_symbols: int):
    """CP-correlation (van de Beek) fractional CFO estimate.

    Each OFDM symbol's cyclic prefix repeats ``nfft`` samples later; any
    CFO rotates the repeat by ``2*pi*eps``.  Summing ``y[t]*conj(y[t+nfft])``
    over every CP sample of ``n_symbols`` symbols and taking the angle
    estimates ``eps`` unbiasedly on the range (-0.5, 0.5) subcarriers
    (integer offsets alias; resolve those with `schmidl_cox_estimate` or a
    frequency-domain preamble search).

    ``waveform``: ``[..., T]`` with symbols of ``cp_length + nfft`` samples
    back to back from sample 0.  Returns ``eps`` with the leading axes.
    """
    w = jnp.asarray(waveform)
    sym = cp_length + nfft
    t = (np.arange(n_symbols)[:, None] * sym
         + np.arange(cp_length)[None, :]).ravel()  # static gather indices
    corr = jnp.sum(jnp.conj(w[..., t]) * w[..., t + nfft], axis=-1)
    return jnp.angle(corr) / (2 * jnp.pi)


def integer_cfo_estimate(rx_block, ref_freq, max_shift: int = 8,
                         spacing: int = 1):
    """Integer (whole-bin) CFO from one known symbol, after fractional
    correction.

    `cfo_estimate_cp` only resolves the (-0.5, 0.5)-subcarrier fractional
    part; a residual INTEGER offset circularly shifts the whole spectrum
    (every subcarrier decodes someone else's data).  Given the ``nfft``
    time samples of a known symbol (CP stripped) and its known bin
    loading ``ref_freq``, the shift is the argmax of a circular
    cross-correlation — computed DIFFERENTIALLY (products of bins
    ``spacing`` apart) so a multipath channel's per-bin phase ramp
    cancels instead of decohering the sum (the LTE/802.11 cell-search
    trick).  Use ``spacing=2`` for a `schmidl_cox_preamble` (even bins
    only; magnitude-only correlation would be 2-bin ambiguous there).

    The candidate shifts are a static ``2*max_shift+1`` unroll of rolls +
    reductions — no dynamic shapes.  Returns the integer shift (positive
    = received spectrum shifted up) with leading batch axes.
    """
    w = jnp.asarray(rx_block)
    rxf = jnp.fft.fft(w, axis=-1)
    ref = np.asarray(ref_freq, np.complex64)
    d_rx = rxf * jnp.conj(jnp.roll(rxf, -spacing, axis=-1))
    shifts = np.arange(-max_shift, max_shift + 1)
    d_refs = np.stack([
        (r := np.roll(ref, s)) * np.conj(np.roll(r, -spacing))
        for s in shifts
    ])  # [S, nfft] static
    metric = jnp.abs(d_rx @ jnp.asarray(np.conj(d_refs)).T)  # [..., S]
    return jnp.asarray(shifts)[jnp.argmax(metric, axis=-1)]


def schmidl_cox_preamble(nfft: int, key=None, seed: int = 0):
    """A two-identical-halves time preamble (QPSK on even subcarriers).

    Loading only even FFT bins makes the time signal ``x[t] = x[t + nfft/2]``
    — the structure the Schmidl-Cox metric detects.  Returns ``[nfft]``
    complex64 with unit average energy (host constant; bake into links).
    """
    rng = np.random.RandomState(seed)
    bins = np.zeros(nfft, np.complex64)
    even = np.arange(2, nfft, 2)  # skip DC
    qpsk = (rng.randint(0, 2, even.size) * 2 - 1
            + 1j * (rng.randint(0, 2, even.size) * 2 - 1)) / np.sqrt(2)
    bins[even] = qpsk
    x = np.fft.ifft(bins)
    x = x / np.sqrt(np.mean(np.abs(x) ** 2))
    return x.astype(np.complex64)


def _moving_sum(x, length: int):
    """Trailing-axis moving sum of ``length`` (cumsum difference)."""
    c = jnp.cumsum(x, axis=-1)
    pad = jnp.zeros_like(c[..., :1])
    c = jnp.concatenate([pad, c], axis=-1)
    return c[..., length:] - c[..., :-length]


def schmidl_cox_metric(waveform, nfft: int):
    """Schmidl-Cox timing metric M(d) and half-lag correlation P(d).

    ``P(d) = sum_{m<L} conj(r[d+m]) r[d+m+L]`` and ``R(d) = sum |r[d+m+L]|^2``
    with ``L = nfft/2``; ``M = |P|^2 / R^2`` plateaus at 1 across the
    preamble.  Both sums are moving sums — O(T) total, fully parallel.
    Returns ``(M, P)``, each ``[..., T - nfft + 1]``.
    """
    w = jnp.asarray(waveform)
    L = nfft // 2
    p = _moving_sum(jnp.conj(w[..., :-L]) * w[..., L:], L)
    r = _moving_sum(jnp.abs(w[..., L:]) ** 2, L)
    m = jnp.abs(p) ** 2 / jnp.maximum(r, 1e-12) ** 2
    return m, p


def schmidl_cox_estimate(waveform, nfft: int):
    """Joint timing + fractional CFO from a Schmidl-Cox preamble.

    Timing: the M(d) plateau is flat over the CP region, so the argmax of
    M smoothed by an ``nfft/2`` moving average sits at the plateau center;
    the returned ``d_hat`` is the argmax of the raw metric (within the
    plateau — downstream OFDM demodulation tolerates any in-CP start).
    CFO: ``eps = angle(P(d_hat)) / pi`` (half-symbol lag -> half cycle per
    subcarrier), range (-1, 1) subcarriers.

    Returns ``(d_hat, eps, M)`` with leading batch axes.
    """
    m, p = schmidl_cox_metric(waveform, nfft)
    d_hat = jnp.argmax(m, axis=-1)
    p_at = jnp.take_along_axis(p, d_hat[..., None], axis=-1)[..., 0]
    eps = jnp.angle(p_at) / jnp.pi
    return d_hat, eps, m
