r"""Turbo product codes: BCH x BCH with Chase-Pyndiah iterative decoding.

Beyond-reference subsystem: the classic block turbo code (Pyndiah 1998;
optional mode of IEEE 802.16).  A (nr,kr) x (nc,kc) product code places
data in a [kr, kc] array, extends every row with the row code's parity
and every column with the column code's (parity-of-parity is consistent
by linearity); minimum distance is the PRODUCT dr * dc.

Decoding alternates row and column half-iterations of the soft-output
Chase element (ops/bch.py make_bch_chase_soft): each half-iteration
takes R = channel + alpha_j * extrinsic, runs the batched Chase SISO on
every row (resp. column) at once — the other axis folds into the batch,
so the whole array decodes as one [B*nr, nc] call — and emits new
extrinsic W = soft_out - R.  ``alpha`` is Pyndiah's confidence ramp.

All trials/rows/columns batch; there is no per-codeword loop anywhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .bch import make_bch_chase_soft, make_bch_encoder

__all__ = ["tpc_encode", "tpc_decode", "make_tpc_decoder"]

#: Pyndiah's per-half-iteration extrinsic weights (ramping confidence).
_ALPHA = (0.0, 0.2, 0.3, 0.5, 0.7, 0.9, 1.0, 1.0)


def tpc_encode(code_row, code_col, data):
    """data [B, kr, kc] bits -> product codeword [B, nr, nc] (int8).

    ``code_row`` encodes along the last axis (rows of length nc),
    ``code_col`` along the second-to-last (columns of length nr).
    """
    data = jnp.asarray(data)
    B, kr, kc = data.shape
    if kr != code_col.k or kc != code_row.k:
        raise ValueError(
            f"data [{kr}, {kc}] must be [{code_col.k}, {code_row.k}]")
    enc_r = make_bch_encoder(code_row)
    enc_c = make_bch_encoder(code_col)
    rows = enc_r(data.reshape(B * kr, kc)).reshape(B, kr, code_row.n)
    cols = enc_c(jnp.swapaxes(rows, 1, 2).reshape(B * code_row.n, kr))
    return jnp.swapaxes(
        cols.reshape(B, code_row.n, code_col.n), 1, 2).astype(jnp.int8)


@functools.lru_cache(maxsize=16)
def make_tpc_decoder(code_row, code_col, iterations=4, p=4, beta=0.5,
                     alpha=_ALPHA):
    """jitted llr [B, nr, nc] -> (data [B, kr, kc] int8, hard [B, nr, nc]).

    LLR convention: positive => bit 0.  ``iterations`` full iterations
    = 2x half-iterations of the Chase SISO; ``alpha`` supplies the
    extrinsic weight per half-iteration (the last entry repeats if the
    schedule is shorter than 2*iterations).
    """
    nr, nc = code_col.n, code_row.n
    siso_r = make_bch_chase_soft(code_row, p=p, beta=beta)
    siso_c = make_bch_chase_soft(code_col, p=p, beta=beta)

    @jax.jit
    def decode(llr):
        llr = jnp.asarray(llr, jnp.float32)
        B = llr.shape[0]
        W = jnp.zeros_like(llr)
        hard = None
        for h in range(2 * iterations):
            a = alpha[min(h, len(alpha) - 1)]
            R = llr + a * W
            if h % 2 == 0:  # rows
                soft, hrd = siso_r(R.reshape(B * nr, nc))
                soft = soft.reshape(B, nr, nc)
                hard = hrd.reshape(B, nr, nc)
            else:  # columns
                Rt = jnp.swapaxes(R, 1, 2).reshape(B * nc, nr)
                soft, hrd = siso_c(Rt)
                soft = jnp.swapaxes(soft.reshape(B, nc, nr), 1, 2)
                hard = jnp.swapaxes(hrd.reshape(B, nc, nr), 1, 2)
            W = soft - R
        data = hard[:, :code_col.k, :code_row.k]
        return data.astype(jnp.int8), hard.astype(jnp.int8)

    return decode


def tpc_decode(code_row, code_col, llr, iterations=4, p=4):
    """Chase-Pyndiah decode: llr [B, nr, nc] -> (data, hard array)."""
    return make_tpc_decoder(code_row, code_col, iterations=iterations,
                            p=p)(jnp.asarray(llr))
