"""Iterative detection and decoding (IDD) — device path.

Batched redesign of reference commpy/links.py:345-407: the per-vector
Python loop becomes a vmapped detector inside a `lax.fori_loop` over IDD
iterations; extrinsic information flows detector <-> decoder exactly as in
the reference closure.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["idd_decoder_device"]


def idd_decoder_device(detector: Callable, decoder: Callable,
                       decision: Callable, n_it: int):
    """Build a batched IDD decode function.

    Parameters
    ----------
    detector : ``(y [V, nr], h [V, nr, nt], noise_var, a_priori [V, bps*nt])
        -> LLRs [V, bps*nt]`` — batched soft detector (e.g. a partial of
        :func:`commpy_tpu.ops.mimo.kbest_device` with soft output).
    decoder : ``(LLRs [n_bits]) -> LLRs [n_bits]`` — soft-in/soft-out FEC
        decoder over the whole frame.
    decision : ``(LLRs [n_bits]) -> bits`` — final hard decision.
    n_it : IDD iterations.

    Returns
    -------
    decode : ``(y, h, noise_var, a_priori) -> bits`` (jit-compatible)
    """

    def decode(y, h, noise_var, a_priori):
        V = y.shape[0]
        bits_per_vec = a_priori.shape[0] // V

        def body(_, carry):
            a_dec, a_det = carry
            a_det_new = decoder(a_dec) - a_dec
            det_in = a_det_new.reshape(V, bits_per_vec)
            det_out = detector(y, h, noise_var, det_in)
            a_dec_new = det_out.reshape(-1) - a_det_new
            return a_dec_new, a_det_new

        a_dec0 = a_priori
        a_det0 = jnp.zeros_like(a_priori)
        a_dec, a_det = jax.lax.fori_loop(0, n_it, body, (a_dec0, a_det0))
        return decision(a_dec + a_det)

    return decode
