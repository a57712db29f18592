r"""Linear channel equalization: MMSE and zero-forcing FIR designs.

Beyond-reference subsystem (CommPy has no equalizer; its MIMO detectors
assume flat per-stream channels, and the OFDM links equalize per
subcarrier).  This module designs single-carrier FIR equalizers for a
known frequency-selective impulse response — the classic receiver
front-end for ISI channels.

Design math: with channel taps ``h`` (length Lh) and receiver taps
``w`` (length Lw), the combined response is the convolution matrix
``H [Lw, Lw+Lh-1]`` (row i = h shifted by i).  The MMSE taps solve

    (H H^H + noise_var I) w = H e_delay

which minimizes E|w * y - x[n-delay]|^2 for unit-power i.i.d. symbols;
zero-forcing is the noise_var -> 0 limit (a tiny diagonal keeps the
solve well posed).  The delay defaults to the combined-center
``(Lw + Lh - 1) // 2``, the standard choice.

TPU notes: the Toeplitz system is tiny (Lw <= a few tens), so the
batched solve runs as a REAL block system ``[[A, -B], [B, A]]`` — f64
complex ``linalg.solve`` does not lower on all TPU runtimes; the block
form is plain f32 linear algebra.  Application is the existing
overlap-save FFT convolution (ops/fir.py).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .fir import fir_filter

__all__ = ["mmse_fir_taps", "zf_fir_taps", "equalize", "equalizer_delay",
           "lms_equalize"]


def equalizer_delay(n_taps, channel_len):
    """Default decision delay of the designed equalizer."""
    return (n_taps + channel_len - 1) // 2


def _conv_matrix(h, n_taps):
    """[..., Lw, Lw+Lh-1] convolution (filtering) matrix of h."""
    h = jnp.asarray(h)
    Lh = h.shape[-1]
    out = Lh + n_taps - 1
    lead = h.shape[:-1]
    H = jnp.zeros(lead + (n_taps, out), h.dtype)
    for i in range(n_taps):
        H = H.at[..., i, i:i + Lh].set(h)
    return H


def _solve_complex(A, b):
    """Batched solve of complex A x = b via the real block system."""
    Ar, Ai = jnp.real(A), jnp.imag(A)
    br, bi = jnp.real(b), jnp.imag(b)
    top = jnp.concatenate([Ar, -Ai], axis=-1)
    bot = jnp.concatenate([Ai, Ar], axis=-1)
    blk = jnp.concatenate([top, bot], axis=-2)
    rhs = jnp.concatenate([br, bi], axis=-1)
    x = jnp.linalg.solve(blk, rhs[..., None])[..., 0]
    n = A.shape[-1]
    return x[..., :n] + 1j * x[..., n:]


def mmse_fir_taps(h, noise_var, n_taps, delay=None):
    """MMSE linear-equalizer taps for channel ``h`` [..., Lh].

    ``noise_var``: complex noise variance relative to unit symbol
    power.  Returns taps [..., n_taps]; apply with :func:`equalize`.
    """
    h = jnp.asarray(h, jnp.complex64)
    Lh = h.shape[-1]
    if delay is None:
        delay = equalizer_delay(n_taps, Lh)
    if not 0 <= delay < n_taps + Lh - 1:
        raise ValueError(f"delay {delay} outside combined response "
                         f"[0, {n_taps + Lh - 2}]")
    H = _conv_matrix(h, n_taps)
    R = H @ jnp.conj(jnp.swapaxes(H, -1, -2))  # E[y y^H] for unit x
    R = R + noise_var * jnp.eye(n_taps, dtype=H.dtype)
    p = H[..., :, delay]  # E[y x*[n-delay]]
    # Wiener: z = u^H y with u = R^{-1} p; the plain-convolution taps
    # are w = conj(u) (verified against data least squares)
    return jnp.conj(_solve_complex(R, p))


def zf_fir_taps(h, n_taps, delay=None, eps=1e-6):
    """Zero-forcing taps (MMSE with a tiny regularizer)."""
    return mmse_fir_taps(h, eps, n_taps, delay=delay)


def equalize(y, w, delay, n_out=None):
    """Apply equalizer taps and align the decision delay.

    y [..., n] received samples, w [t] (or [..., t]) taps; returns the
    equalized estimate of x[0:n_out] (n_out defaults to n - pick the
    valid region).
    """
    y = jnp.asarray(y)
    w = jnp.asarray(w)
    if w.ndim > 1:
        raise ValueError(
            "per-batch tap sets: vmap equalize over the leading axes")
    z = fir_filter(y, w, mode="full")
    n_out = y.shape[-1] if n_out is None else n_out
    short = delay + n_out - z.shape[-1]
    if short > 0:  # few-tap equalizers: keep the output length exact
        z = jnp.concatenate(
            [z, jnp.zeros(z.shape[:-1] + (short,), z.dtype)], axis=-1)
    return z[..., delay:delay + n_out]


def lms_equalize(y, train, n_taps, mu, delay, block=32):
    """Adaptive block-LMS equalization with training symbols.

    y [..., n] received samples; train [..., n] known transmitted
    symbols (training-directed: the desired output at sample i is
    ``train[i - delay]``); ``mu`` step size; ``block`` samples per tap
    update (the whole block is filtered with the current taps, then one
    accumulated-gradient update ``w += mu * sum(conj(x_vec) * e)``, the
    TPU-friendly form — per-sample LMS would be an n-step scalar scan).

    Returns ``(z, w, mse)``: the equalized stream [..., n], the final
    taps [..., n_taps], and the per-block mean-square error trajectory
    [n_blocks] (averaged over the batch) — converges toward the Wiener
    MSE of :func:`mmse_fir_taps` on a stationary channel and re-adapts
    after channel changes (see tests).
    """
    import jax
    from jax import lax

    y = jnp.asarray(y, jnp.complex64)
    train = jnp.asarray(train, jnp.complex64)
    lead = y.shape[:-1]
    n = y.shape[-1]
    nb = n // block
    n_use = nb * block
    # windows[..., i, k] = y[i - k] (zeros before the stream start)
    ypad = jnp.concatenate(
        [jnp.zeros(lead + (n_taps - 1,), y.dtype), y], axis=-1)
    windows = jnp.stack(
        [ypad[..., n_taps - 1 - k:n_taps - 1 - k + n_use]
         for k in range(n_taps)], axis=-1)  # [..., n_use, n_taps]
    # desired output at sample i is train[i - delay]
    tpad = jnp.concatenate(
        [jnp.zeros(lead + (delay,), train.dtype), train], axis=-1)
    desired = tpad[..., :n_use]
    Xb = windows.reshape(lead + (nb, block, n_taps))
    Db = desired.reshape(lead + (nb, block))
    # scan over blocks: move the block axis first
    perm = (len(lead),) + tuple(range(len(lead))) + (len(lead) + 1,
                                                     len(lead) + 2)
    Xs = jnp.transpose(Xb, perm)  # [nb, ..., block, n_taps]
    Ds = jnp.transpose(Db, perm[:-1])  # [nb, ..., block]

    def step(w, xd):
        X, d = xd
        z = jnp.sum(X * w[..., None, :], axis=-1)  # [..., block]
        e = d - z
        grad = jnp.sum(jnp.conj(X) * e[..., None], axis=-2)
        w = w + mu * grad
        mse = jnp.mean(jnp.abs(e) ** 2)
        return w, (z, mse)

    w0 = jnp.zeros(lead + (n_taps,), y.dtype)
    w, (zs, mse) = lax.scan(step, w0, (Xs, Ds))
    # reassemble the equalized stream [..., n_use] (+ tail passthrough)
    inv = tuple(range(1, len(lead) + 1)) + (0, len(lead) + 1)
    z = jnp.transpose(zs, inv).reshape(lead + (n_use,))
    if n_use < n:
        z = jnp.concatenate([z, y[..., n_use:]], axis=-1)
    return z, w, mse
