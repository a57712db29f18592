"""Convolutional encoding + puncturing.

Device path: ``encode_scan`` clocks the trellis state machine with a
``lax.scan`` over time and vmaps over the batch — replacing the reference's
per-bit Python loop (commpy/channelcoding/convcode.py:535-540).

Compat path: :func:`conv_encode` reproduces the reference's exact framing
semantics (convcode.py:475-558): 'cont' vs 'term', the RSC tail driven by
the reversed state bits, and the historical behaviour that the returned
array always has the *unpunctured* length with punctured bits packed at the
front (convcode.py:522-558).

Puncture / depuncture are vectorized mask gathers (convcode.py:752-804).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bits import np_pack_bits, np_unpack_bits, pack_bits, unpack_bits
from .trellis import Trellis

__all__ = ["conv_encode", "encode_scan", "puncturing",
           "depuncturing", "puncture_mask", "depuncture_device"]


@partial(jax.jit, static_argnames=("n_bits",))
def _encode_symbols(symbols, next_state_table, output_table, n_bits, start_state=0):
    """Scan the encoder FSM over packed input symbols.

    Parameters
    ----------
    symbols : int32 ``[..., T]`` packed k-bit inputs
    next_state_table, output_table : ``[S, 2^k]`` int32
    n_bits : static — output codeword width n

    Returns
    -------
    (out_bits ``[..., T, n]`` int8, final_state ``[...]`` int32)
    """
    symbols = jnp.asarray(symbols, jnp.int32)
    nst = jnp.asarray(next_state_table, jnp.int32)
    ot = jnp.asarray(output_table, jnp.int32)
    lead = symbols.shape[:-1]
    s0 = jnp.full(lead, start_state, jnp.int32)

    def step(state, sym):
        out = ot[state, sym]
        return nst[state, sym], out

    final_state, outs = jax.lax.scan(
        step, s0, jnp.moveaxis(symbols, -1, 0)
    )
    outs = jnp.moveaxis(outs, 0, -1)  # [..., T]
    return unpack_bits(outs, n_bits), final_state


def encode_scan(message_bits, trellis: Trellis, start_state=0):
    """Batched continuous ('cont') convolutional encoding on device.

    message_bits : ``[..., L]`` with L % k == 0.
    Returns coded bits ``[..., L * n / k]`` (int8) and the final state.

    Feedforward codes (identity feedback) bypass the sequential FSM scan:
    the codeword is a binary convolution of the input with the generator
    taps, evaluated as one float matmul + mod-2 (O(1) sequential depth on
    the MXU instead of O(L) scan steps).
    """
    bits = jnp.asarray(message_bits)
    k, n = trellis.k, trellis.n
    lead = bits.shape[:-1]
    if trellis.is_feedforward and start_state == 0:
        coded = _encode_feedforward(bits, trellis)
        # final state = last total_memory input bits, per-line layout:
        # state bits are [line0 newest..oldest, line1 ...] (trellis packing)
        L_sym = bits.shape[-1] // k
        u = bits.reshape(lead + (L_sym, k))
        state_bits = []
        for line, mem in enumerate(trellis.memory):
            for d in range(1, mem + 1):
                idx = L_sym - d
                if idx >= 0:
                    state_bits.append(u[..., idx, line])
                else:
                    state_bits.append(jnp.zeros(lead, bits.dtype))
        if state_bits:
            final_state = pack_bits(jnp.stack(state_bits, axis=-1))
        else:
            final_state = jnp.zeros(lead, jnp.int32)
        return coded, final_state
    syms = pack_bits(bits.reshape(lead + (-1, k)))
    out_bits, final_state = _encode_symbols(
        syms, trellis.next_state_table, trellis.output_table, n, start_state
    )
    return out_bits.reshape(lead + (-1,)), final_state


@partial(jax.jit, static_argnames=("trellis",))
def _encode_feedforward(bits, trellis: Trellis):
    """coded[..., t*n + r] = XOR_i u[t-i] . g_taps[i,:,r].

    Pure shifted-XOR accumulation: for every set tap (delay i, input
    line l, output r) XOR a statically-shifted slice of the padded input
    into output r.  Integer VPU ops on [B, L] slabs — no windowed-view
    materialization (depth x the input) and no matmul+mod round trip;
    ~5x less HBM traffic than the einsum form at wifi shapes.
    """
    k, n = trellis.k, trellis.n
    taps = np.asarray(trellis.g_taps, np.int64)  # [depth, k, n]
    depth = taps.shape[0]
    lead = bits.shape[:-1]
    L_sym = bits.shape[-1] // k
    u = bits.reshape(lead + (L_sym, k)).astype(jnp.int8)
    u_flat = u.reshape((-1, L_sym, k))
    pad = jnp.pad(u_flat, ((0, 0), (depth - 1, 0), (0, 0)))
    outs = []
    for r in range(n):
        acc = jnp.zeros(pad.shape[:1] + (L_sym,), jnp.int8)
        for i in range(depth):
            for line in range(k):
                if taps[i, line, r]:
                    acc = acc ^ pad[:, depth - 1 - i:depth - 1 - i + L_sym,
                                    line]
        outs.append(acc)
    out = jnp.stack(outs, axis=-1)  # [B, L_sym, n]
    return out.reshape(lead + (L_sym * n,))


def conv_encode(message_bits, trellis: Trellis, termination="term",
                puncture_matrix=None):
    """Reference-compatible convolutional encoder (see module docstring)."""
    message_bits = np.asarray(message_bits)
    k, n = trellis.k, trellis.n
    total_memory = trellis.total_memory
    rate = float(k) / n
    code_type = trellis.code_type

    nbits = message_bits.size
    if termination == "cont":
        inbits = message_bits
        number_inbits = nbits
        number_outbits = int(number_inbits / rate)
    else:
        if code_type == "rsc":
            inbits = message_bits
            number_inbits = nbits
            number_outbits = int((number_inbits + k * total_memory) / rate)
        else:
            number_inbits = nbits + total_memory + total_memory % k
            inbits = np.zeros(number_inbits, int)
            inbits[:nbits] = message_bits
            number_outbits = int(number_inbits / rate)

    n_steps = int(number_inbits / k)
    syms = np_pack_bits(
        np.asarray(inbits[: n_steps * k]).reshape(n_steps, k)
    ).astype(np.int32)
    out_bits, final_state = _encode_symbols(
        jnp.asarray(syms), trellis.next_state_table, trellis.output_table, n
    )
    outbits = np.zeros(number_outbits, int)
    outbits[: n_steps * n] = np.asarray(out_bits).reshape(-1)

    # NOTE: the tail drive only happens for termination == 'term' exactly;
    # e.g. turbo_encode passes termination='rsc' and gets a ZERO tail
    # (convcode.py:542 guard).
    if code_type == "rsc" and termination == "term":
        # Tail drive: reversed state bits fed back in, exactly
        # convcode.py:542-550 (slices beyond the state width read as 0).
        state = int(final_state)
        term_bits = np_unpack_bits(state, total_memory)[::-1]
        j = n_steps
        for i in range(total_memory):
            chunk = term_bits[i * k : (i + 1) * k]
            cur_in = int(np_pack_bits(chunk)) if chunk.size else 0
            cur_out = trellis.output_table[state][cur_in]
            outbits[j * n : (j + 1) * n] = np_unpack_bits(cur_out, n)
            state = trellis.next_state_table[state][cur_in]
            j += 1

    if puncture_matrix is None:
        return outbits

    # Historical framing: full-length output, punctured bits packed at the
    # front, zero tail (convcode.py:522-558).
    pv = np.asarray(puncture_matrix)[0].ravel()
    keep = np.tile(pv, -(-number_outbits // pv.size))[:number_outbits] == 1
    p_outbits = np.zeros(number_outbits, int)
    kept = outbits[keep]
    p_outbits[: kept.size] = kept
    return p_outbits


def puncturing(message, punct_vec):
    """Compact puncturing (reference convcode.py:752-774), vectorized."""
    message = np.asarray(message)
    pv = np.asarray(punct_vec).ravel()
    keep = np.tile(pv, -(-message.size // pv.size))[: message.size] == 1
    return message[keep]


def depuncturing(punctured, punct_vec, shouldbe: int):
    """Zero-insertion depuncturing (reference convcode.py:777-804), vectorized."""
    punctured = np.asarray(punctured)
    pv = np.asarray(punct_vec).ravel()
    keep = np.tile(pv, -(-int(shouldbe) // pv.size))[: int(shouldbe)] == 1
    src = np.cumsum(keep) - keep  # index into punctured for kept slots
    dep = np.zeros(int(shouldbe), dtype=float)
    dep[keep] = punctured[src[keep]]
    return dep


def puncture_mask(punct_vec, length: int):
    """Boolean keep-mask of ``length`` for device-side puncturing."""
    pv = np.asarray(punct_vec).ravel()
    return np.tile(pv, -(-length // pv.size))[:length] == 1


def depuncture_device(punctured, keep_mask):
    """Device-side depuncture: scatter kept LLRs into zeros by static mask.

    punctured : ``[..., n_kept]``; keep_mask : static bool ``[n_out]``.
    """
    keep_mask = np.asarray(keep_mask)
    src = np.cumsum(keep_mask) - keep_mask
    punctured = jnp.asarray(punctured)
    gathered = punctured[..., jnp.asarray(src)]
    return jnp.where(jnp.asarray(keep_mask), gathered, 0.0)
