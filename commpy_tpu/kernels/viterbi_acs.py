"""Pallas TPU kernel: fused branch-metric + ACS forward pass.

Replaces the XLA `lax.scan` forward recursion of
:mod:`commpy_tpu.ops.viterbi` for large batches/trellises.  Design:

* **batch-last layout**: every on-chip tensor keeps the batch on the
  128-lane axis ([S, B], [n, B], [G, B]) so no narrow trailing dimension
  gets padded to a full lane tile;
* the predecessor gather ``pm[pred_state[s, j]]`` becomes a one-hot
  permutation **matmul** ``Q_j @ pm`` (MXU), so there is no gather at all;
* branch metrics are computed in-kernel (``C_j @ r_t``), so the
  ``[B,T,S,I]`` branch-metric tensor is never materialized in HBM;
* the grid iterates sequentially over time chunks; path metrics live in a
  VMEM scratch buffer that persists across grid steps (TPU grid order is
  sequential);
* branch decisions are **bit-packed 16 states per int32 in-kernel** (a
  powers-of-two matmul over the state axis), cutting decision-tensor HBM
  traffic 16x (binary codes have one decision bit per state);
* per step the metrics are renormalized by their min (a uniform shift
  that preserves every comparison) to keep float32 well-scaled.

The packed decisions feed the packed traceback in ops/viterbi.py
(``_traceback_packed_structured``).  Binary-input (k=1) codes only; k>1
falls back to the XLA scan.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.trellis import Trellis

__all__ = ["acs_forward_pallas"]

_PACK = 16  # states per int32 word (2^15 max is f32-exact)


def _perm_matrices(pred_state: np.ndarray) -> np.ndarray:
    """[I, S, S] with Q[j, s, p] = 1 iff pred_state[s, j] == p.

    Then (Q_j @ pm)[s, b] = pm[pred_state[s, j], b].
    """
    S, I = pred_state.shape
    Q = np.zeros((I, S, S), np.float32)
    for j in range(I):
        Q[j, np.arange(S), pred_state[:, j]] = 1.0
    return Q


def _pack_matrix(S: int) -> np.ndarray:
    """[G, S] powers-of-two packing matrix: G = ceil(S/16) words."""
    G = -(-S // _PACK)
    W = np.zeros((G, S), np.float32)
    for s in range(S):
        W[s // _PACK, s] = float(1 << (s % _PACK))
    return W


def _acs_kernel(r_ref, C_ref, Q_ref, W_ref, dec_ref, best_ref, pm_ref, *,
                n_steps: int, S: int, I: int):
    """One time-chunk of the ACS recursion (batch-last layout).

    r_ref:   [TC, n, B]   received codewords for this chunk
    C_ref:   [I*S, n]     stacked branch vectors (bm = C @ r_t)
    Q_ref:   [I*S, S]     stacked predecessor permutation matrices
    W_ref:   [G, S]       bit-packing matrix
    dec_ref: [TC, G, B]   (out) packed branch decisions, int32
    best_ref:[TC, B]      (out) argmin state per step, int32
    pm_ref:  [S, B]       (scratch) persistent path metrics
    """
    @pl.when(pl.program_id(0) == 0)
    def _():
        B = pm_ref.shape[1]
        row = jax.lax.broadcasted_iota(jnp.int32, (S, B), 0)
        pm_ref[:, :] = jnp.where(row == 0, 0.0, 1e30)

    def step(t, pm):
        r_t = r_ref[t, :, :]  # [n, B]
        # both branches in ONE stacked matmul each: [2S,S]@[S,B] and
        # [2S,n]@[n,B] (halves the dependent-MXU-op chain per step)
        permuted = jax.lax.dot_general(
            Q_ref[:, :], pm,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [2S, B]
        bm = jax.lax.dot_general(
            C_ref[:, :], r_t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [2S, B]
        cand = permuted + bm
        # binary branch decision (I == 2), first-index tie-break
        take = cand[S:, :] < cand[:S, :]
        new_pm = jnp.where(take, cand[S:, :], cand[:S, :])
        # pack decision bits over the state (sublane) axis: [G,S]@[S,B]
        packed = jax.lax.dot_general(
            W_ref[:, :], take.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # [G, B]
        # argmin over the state (sublane) axis, first index on ties
        m = jnp.min(new_pm, axis=0, keepdims=True)
        row = jax.lax.broadcasted_iota(jnp.int32, new_pm.shape, 0)
        best = jnp.min(jnp.where(new_pm == m, row, S), axis=0)
        dec_ref[t, :, :] = packed
        best_ref[t, :] = best.astype(jnp.int32)
        return new_pm - m

    pm = pm_ref[:, :]
    pm = jax.lax.fori_loop(0, n_steps, step, pm)
    pm_ref[:, :] = pm


@partial(jax.jit, static_argnames=("trellis", "decoding_type", "time_chunk"))
def acs_forward_pallas(r, trellis: Trellis, decoding_type: str = "soft",
                       time_chunk: int = 512):
    """Run the fused ACS forward pass.

    r : ``[B, T, n]`` float32 received codewords (already clipped/padded).
    Returns (dec_packed ``[B, T, G]`` int32, best_state ``[B, T]`` int32).
    """
    from ..ops.viterbi import _branch_vectors, _hard_const

    B, T, n = r.shape
    S, I = trellis.number_states, trellis.number_inputs
    if I != 2:
        raise NotImplementedError(
            "the Pallas ACS kernel supports binary-input (k=1) codes; "
            "use backend='xla' for k>1"
        )
    C = _branch_vectors(trellis, decoding_type)  # [S*I, n]
    if decoding_type == "hard":
        # fold the per-branch constant into C via a homogeneous coordinate
        C = np.concatenate([C, _hard_const(trellis)[:, None]], axis=1)
        r = jnp.concatenate([r, jnp.ones((B, T, 1), r.dtype)], axis=-1)
        n += 1
    C = C.reshape(S, I, -1).transpose(1, 0, 2).reshape(I * S, -1)  # [I*S, n]
    Q = _perm_matrices(trellis.pred_state_table).reshape(I * S, S)
    W = _pack_matrix(S)
    G = W.shape[0]

    # Cap the time chunk so the largest VMEM block (the packed-decision
    # output, [TC, G, B] int32) stays within the scoped-vmem budget.
    G_est = -(-S // _PACK)
    tc_cap = max(32, (4 * 1024 * 1024) // max(B * G_est * 4, 1))
    TC = min(time_chunk, T, tc_cap)
    n_chunks = -(-T // TC)
    T_pad = n_chunks * TC
    if T_pad != T:
        r = jnp.pad(r, ((0, 0), (0, T_pad - T), (0, 0)))
    r_tl = jnp.transpose(r, (1, 2, 0))  # [T, n, B] batch-last

    kernel = partial(_acs_kernel, n_steps=TC, S=S, I=I)
    # Interpret mode off-TPU so tests run on the CPU backend unchanged.
    interpret = jax.default_backend() not in ("tpu", "axon")
    dec_packed, best = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((TC, n, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((I * S, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((I * S, S), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, S), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TC, G, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, G, B), jnp.int32),
            jax.ShapeDtypeStruct((T_pad, B), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((S, B), jnp.float32)],
        interpret=interpret,
    )(r_tl.astype(jnp.float32), jnp.asarray(C), jnp.asarray(Q),
      jnp.asarray(W))

    dec_packed = jnp.transpose(dec_packed[:T], (2, 0, 1))  # [B, T, G]
    best = best[:T].T  # [B, T]
    return dec_packed, best
