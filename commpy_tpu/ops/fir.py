"""FIR filtering, polyphase resampling, and sequence-sharded streams.

The reference only *generates* filter taps (filters.py) and zero-inserts
(utilities.py:157) — it has no convolution engine.  This module supplies
the TPU-native engine those taps plug into:

* ``fir_filter`` — batched FFT overlap-save convolution (HBM-friendly:
  one FFT size, static shapes, fused multiply in frequency domain);
* ``upfirdn`` — polyphase upsample -> FIR -> downsample in one pass
  (zero-insertion never materialized at full rate);
* ``sharded_fir_filter`` — **sequence parallelism**: a long waveform is
  sharded over the mesh along time; each device convolves its shard and
  the filter tail crossing shard boundaries is exchanged with the left
  neighbour via ``ppermute`` (the domain's ring/halo exchange — this is
  the TPU equivalent of the reference's chunked streaming, SURVEY §5).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import P, shard_map

__all__ = ["fir_filter", "upfirdn", "sharded_fir_filter", "pulse_shape"]


def _next_pow2(n):
    return 1 << (int(n) - 1).bit_length()


def fir_filter(x, taps, mode="full"):
    """Convolve along the last axis via FFT overlap-save.

    x : ``[..., n]`` real or complex signal
    taps : ``[t]`` FIR taps
    mode : 'full' (len n+t-1, matching np.convolve) or 'same' (len n).
    """
    x = jnp.asarray(x)
    taps = jnp.asarray(taps)
    n = x.shape[-1]
    t = taps.shape[0]
    out_len = n + t - 1
    nfft = _next_pow2(out_len)
    cplx = jnp.iscomplexobj(x) or jnp.iscomplexobj(taps)
    if cplx:
        X = jnp.fft.fft(x.astype(jnp.complex64), nfft, axis=-1)
        H = jnp.fft.fft(taps.astype(jnp.complex64), nfft)
        y = jnp.fft.ifft(X * H, axis=-1)[..., :out_len]
    else:
        X = jnp.fft.rfft(x.astype(jnp.float32), nfft, axis=-1)
        H = jnp.fft.rfft(taps.astype(jnp.float32), nfft)
        y = jnp.fft.irfft(X * H, nfft, axis=-1)[..., :out_len]
    if mode == "same":
        start = (t - 1) // 2
        return y[..., start : start + n]
    return y


def upfirdn(x, taps, up: int = 1, down: int = 1):
    """Polyphase upsample-by-``up``, filter, downsample-by-``down``.

    Matches ``scipy.signal.upfirdn`` semantics: output length
    ``ceil(((n-1)*up + t) / down)``.  The up-sampled signal is never
    materialized — zero-insertion followed by convolution is algebraically
    a strided gather of the full convolution, which XLA fuses.
    """
    x = jnp.asarray(x)
    t = jnp.asarray(taps).shape[0]
    n = x.shape[-1]
    if up == 1:
        y = fir_filter(x, taps, "full")
    else:
        # conv(upsample(x), h)[j] = sum_k x[k] h[j - k*up]
        # Compute per-phase convolutions with the polyphase components.
        taps_arr = jnp.asarray(taps)
        pad = (-t) % up
        taps_pad = jnp.pad(taps_arr, (0, pad))
        poly = taps_pad.reshape(-1, up).T  # [up, t_phase]
        # phase p output: conv(x, poly[p]) placed at indices p::up
        full_len = (n - 1) * up + t
        outs = jax.vmap(lambda h: fir_filter(x, h, "full"))(poly)
        # outs[p] has length n + t_phase - 1; interleave
        t_phase = poly.shape[1]
        inter_len = up * (n + t_phase - 1)
        y = jnp.moveaxis(outs, 0, -1).reshape(x.shape[:-1] + (inter_len,))
        y = y[..., :full_len]
    if down > 1:
        y = y[..., ::down]
    return y


def pulse_shape(symbols, taps, sps: int):
    """Transmit pulse shaping: upsample by ``sps`` and filter (polyphase)."""
    return upfirdn(symbols, taps, up=sps)


def sharded_fir_filter(x_sharded, taps, mesh, axis_name: str = "sp"):
    """'same'-mode FIR over a time-sharded waveform with halo exchange.

    x_sharded : ``[n]`` waveform, sharded over ``axis_name`` along time.
    Each device convolves its local shard plus a (t-1)-sample halo
    received from its left neighbour via ``ppermute`` over ICI — the
    overlap-save boundary exchange (no gather of the full signal anywhere).

    Returns the causally-filtered waveform (``y[i] = sum_k h[k] x[i-k]``),
    identical to ``fir_filter(x, taps, 'full')[: n]``.
    """
    taps = jnp.asarray(taps)
    t = taps.shape[0]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(axis_name),
        check_vma=False,
    )
    def _run(x_local, taps_):
        n_dev = jax.lax.axis_size(axis_name)
        # halo: last (t-1) samples of the LEFT neighbour
        tail = x_local[-(t - 1):] if t > 1 else x_local[:0]
        halo = jax.lax.ppermute(
            tail, axis_name,
            perm=[(i, (i + 1) % n_dev) for i in range(n_dev)],
        )
        idx = jax.lax.axis_index(axis_name)
        halo = jnp.where(idx == 0, jnp.zeros_like(halo), halo)
        ext = jnp.concatenate([halo, x_local])
        y = fir_filter(ext, taps_, "full")
        # valid region: samples whose window is fully inside ext
        return y[t - 1 : t - 1 + x_local.shape[0]]

    return _run(x_sharded, taps)
