"""Fading / AWGN channel models as pure sampled functions.

TPU-native redesign of reference commpy/channels.py: the reference's
stateful channel objects (which stash ``noises`` / ``channel_gains`` /
``unnoisy_output`` on ``self``, channels.py:30-35) become pure functions
``propagate(key, msg, params) -> (output, gains, noise)`` so receivers get
the channel state explicitly and everything vmaps/shards.

Noise and SNR conventions match the reference exactly:

* complex noise = (N(0,1) + jN(0,1)) * noise_std * 0.5   (channels.py:52-55)
* noise_std = sqrt((isComplex+1) * nb_tx * Es / (rate * 10^(SNR/10)))
  (channels.py:74)
* SISO gains = LOS + N * sqrt(0.5 * NLOS)                (channels.py:213-217)
* MIMO Kronecker: sqrtm(Rr) @ H_iid @ sqrtm(Rt) + mean   (channels.py:377-379)

All functions accept arbitrary leading batch axes on ``msg``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy.linalg import sqrtm as _host_sqrtm

__all__ = [
    "snr_to_noise_std",
    "siso_propagate",
    "mimo_propagate",
    "kronecker_sqrt_factors",
    "bec",
    "bsc",
    "awgn",
]


def snr_to_noise_std(snr_db, *, code_rate=1.0, Es=1.0, is_complex=True, nb_tx=1):
    """Noise std from SNR in dB (reference channels.py:57-74)."""
    snr_lin = 10.0 ** (jnp.asarray(snr_db) / 10.0)
    return jnp.sqrt(
        (int(is_complex) + 1) * nb_tx * Es / (code_rate * snr_lin)
    )


def _crandn(key, shape, dtype=jnp.float32):
    kr, ki = jax.random.split(key)
    return jax.random.normal(kr, shape, dtype) + 1j * jax.random.normal(
        ki, shape, dtype
    )


def siso_propagate(key, msg, noise_std, fading_param=(1.0, 0.0), is_complex=True):
    """Flat-fading SISO channel.

    Parameters
    ----------
    key : PRNG key
    msg : ``[..., n]`` symbols
    noise_std : scalar (see :func:`snr_to_noise_std`)
    fading_param : (LOS mean, NLOS variance); (1,0) = no fading,
        (0,1) = Rayleigh. Energy invariant |p0|^2 + p1 = 1
        (reference channels.py:230-231) is the caller's contract.

    Returns
    -------
    (output, gains, noise) : each ``[..., n]``
    """
    msg = jnp.asarray(msg)
    kg, kn = jax.random.split(jnp.asarray(key))
    los, nlos = fading_param
    if is_complex:
        gains = los + _crandn(kg, msg.shape) * jnp.sqrt(0.5 * nlos)
        noise = _crandn(kn, msg.shape) * (noise_std * 0.5)
    else:
        gains = los + jax.random.normal(kg, msg.shape) * jnp.sqrt(nlos)
        noise = jax.random.normal(kn, msg.shape) * noise_std
    unnoisy = gains * msg
    return unnoisy + noise, gains, noise


def kronecker_sqrt_factors(fading_param):
    """Host precompute of (mean, sqrtm(Rt), sqrtm(Rr)) for mimo_propagate.

    ``fading_param`` is the reference triple (mean, Rt, Rr)
    (channels.py:242-339).  Matrix square roots are configuration-time
    constants, computed once with SciPy on the host.
    """
    mean, rt, rr = fading_param
    srt = np.asarray(_host_sqrtm(np.asarray(rt)))
    srr = np.asarray(_host_sqrtm(np.asarray(rr)))
    return np.asarray(mean), srt, srr


def mimo_propagate(key, msg, noise_std, mean, sqrt_rt, sqrt_rr, is_complex=True):
    """Kronecker-model flat MIMO channel.

    Parameters
    ----------
    msg : ``[..., nb_vect, nb_tx]`` symbol vectors (caller pads/reshapes;
        the reference's implicit padding, channels.py:359-361, lives in the
        compat layer).
    mean, sqrt_rt, sqrt_rr : arrays ``[nb_rx, nb_tx]``, ``[nb_tx, nb_tx]``,
        ``[nb_rx, nb_rx]`` from :func:`kronecker_sqrt_factors`.

    Returns
    -------
    (output ``[..., nb_vect, nb_rx]``, gains ``[..., nb_vect, nb_rx, nb_tx]``,
     noise ``[..., nb_vect, nb_rx]``)
    """
    msg = jnp.asarray(msg)
    nb_rx, nb_tx = np.shape(mean)
    lead = msg.shape[:-1]
    kg, kn = jax.random.split(jnp.asarray(key))
    dims = lead + (nb_rx, nb_tx)
    if is_complex:
        h_iid = _crandn(kg, dims) * jnp.sqrt(0.5)
        noise = _crandn(kn, lead + (nb_rx,)) * (noise_std * 0.5)
    else:
        h_iid = jax.random.normal(kg, dims)
        noise = jax.random.normal(kn, lead + (nb_rx,)) * noise_std
    # Correlate: sqrtm(Rr) @ H @ sqrtm(Rt)^T-free form — reference uses
    # einsum('ij,ajk,lk->ail', sqrtm(Rr), H, sqrtm(Rt)) (channels.py:377).
    gains = jnp.einsum(
        "ij,...jk,lk->...il",
        jnp.asarray(sqrt_rr, h_iid.dtype),
        h_iid,
        jnp.asarray(sqrt_rt, h_iid.dtype),
    ) + jnp.asarray(mean, h_iid.dtype)
    unnoisy = jnp.einsum("...ij,...j->...i", gains, msg.astype(gains.dtype))
    return unnoisy + noise, gains, noise


def bec(key, input_bits, p_e):
    """Binary erasure channel: erased positions become -1 (channels.py:630)."""
    bits = jnp.asarray(input_bits)
    erase = jax.random.uniform(key, bits.shape) <= p_e
    return jnp.where(erase, -1, bits)


def bsc(key, input_bits, p_t):
    """Binary symmetric channel: flips with prob p_t (channels.py:652)."""
    bits = jnp.asarray(input_bits)
    flip = jax.random.uniform(key, bits.shape) <= p_t
    return jnp.where(flip, 1 - bits, bits)


def awgn(key, input_signal, snr_dB, rate=1.0):
    """Legacy AWGN helper measuring average input energy (channels.py:675)."""
    x = jnp.asarray(input_signal)
    avg_energy = jnp.sum(jnp.abs(x) * jnp.abs(x)) / x.size
    snr_linear = 10 ** (snr_dB / 10.0)
    noise_variance = avg_energy / (2 * rate * snr_linear)
    if jnp.iscomplexobj(x):
        kr, ki = jax.random.split(key)
        noise = jnp.sqrt(noise_variance) * (
            jax.random.normal(kr, x.shape) + 1j * jax.random.normal(ki, x.shape)
        )
    else:
        noise = jnp.sqrt(2 * noise_variance) * jax.random.normal(key, x.shape)
    return x + noise
