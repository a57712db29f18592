"""Distance / power / resampling helpers.

Batched JAX counterparts of reference commpy/utilities.py:112-205.  All
functions accept arbitrary leading batch axes and reduce over the trailing
axis (the reference operates on single 1-D arrays).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["hamming_dist", "euclid_dist", "upsample", "signal_power"]


def hamming_dist(a, b, axis=None):
    """Hamming distance between 0/1 arrays (reference utilities.py:112)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    return jnp.sum(jnp.bitwise_xor(a.astype(jnp.int32), b.astype(jnp.int32)), axis=axis)


def euclid_dist(a, b, axis=None):
    """Squared Euclidean distance (reference utilities.py:135)."""
    d = jnp.asarray(a) - jnp.asarray(b)
    return jnp.sum(d * d, axis=axis)


def upsample(x, n: int):
    """Zero-insertion upsampling along the last axis.

    Reference utilities.py:157 always returns complex; we preserve that for
    the compat layer but keep the dtype generic here (complex promotion is
    done by the shim).
    """
    x = jnp.asarray(x)
    out_shape = x.shape[:-1] + (x.shape[-1] * n,)
    y = jnp.zeros(out_shape, dtype=x.dtype)
    return y.at[..., ::n].set(x)


def signal_power(signal, axis=None):
    """Mean of |s|^2 (reference utilities.py:185)."""
    s = jnp.asarray(signal)
    return jnp.mean(jnp.abs(s) ** 2, axis=axis)
