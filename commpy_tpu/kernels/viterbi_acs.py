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

# MXU precision for the in-kernel matmuls.  HIGHEST keeps the f32 inputs
# exact (multi-pass), so kernel decisions are bit-identical across
# radix-1/radix-2/interpret; DEFAULT rounds operands to bf16 per MXU pass,
# which flips near-tie ACS comparisons on real TPUs (measured: ~0.1% of
# decisions at sigma=0.33 LLR noise; BER-invisible) but runs ~2.1x faster
# (643 vs 302 Mbit/s forward at B=1024).  DEFAULT is the throughput
# configuration; pass exact=True to acs_forward_pallas for cross-backend
# bit-exactness (Mosaic supports only DEFAULT and HIGHEST in-kernel).
_DOT_PRECISION = jax.lax.Precision.DEFAULT


def _dot(a, b, precision=_DOT_PRECISION):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )

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
                n_steps: int, S: int, prec=_DOT_PRECISION):
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
        permuted = _dot(Q_ref[:, :], pm, prec)  # [2S, B]
        bm = _dot(C_ref[:, :], r_t, prec)  # [2S, B]
        cand = permuted + bm
        # binary branch decision (I == 2), first-index tie-break
        take = cand[S:, :] < cand[:S, :]
        new_pm = jnp.where(take, cand[S:, :], cand[:S, :])
        # pack decision bits over the state (sublane) axis: [G,S]@[S,B]
        packed = _dot(W_ref[:, :], take.astype(jnp.float32)).astype(jnp.int32)  # [G, B]
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


def _radix2_tables(trellis: Trellis, decoding_type: str):
    """Host tables for the 2-step fused ACS.

    Rows of the stacked [4S] candidate axis are ordered
    ``row = j0 * 2S + j1 * S + s`` (j0 = older-step branch, j1 = newer-step
    branch, s = end state), chosen so that

    * the final 4-way min reduces over two CONTIGUOUS halves (min over j0)
      and then two contiguous S-blocks (min over j1), and
    * the older step's per-state ACS decisions fall out of the partial sums
      ``part = pm[prev2] + bm_old`` by an S/2-row interleave (see kernel).

    Returns (Q2 [4S, S], Ca [4S, n(+1)], Cb [4S, n(+1)]) where Ca dots the
    older codeword r_{t-1} and Cb the newer r_t (hard metrics use a
    homogeneous coordinate for their per-branch constant).
    """
    from ..ops.viterbi import _branch_vectors, _hard_const

    S = trellis.number_states
    ps = trellis.pred_state_table  # [S, 2]
    BV = _branch_vectors(trellis, decoding_type)  # [2S, n], row s*2+j
    if decoding_type == "hard":
        BV = np.concatenate([BV, _hard_const(trellis)[:, None]], axis=1)
    n = BV.shape[1]
    Q2 = np.zeros((4 * S, S), np.float32)
    Ca = np.zeros((4 * S, n), np.float32)
    Cb = np.zeros((4 * S, n), np.float32)
    for j0 in range(2):
        for j1 in range(2):
            for s in range(S):
                row = j0 * 2 * S + j1 * S + s
                i = ps[s, j1]           # intermediate state (time t-1)
                p = ps[i, j0]           # state two steps back
                Q2[row, p] = 1.0
                Ca[row] = BV[i * 2 + j0]   # branch p -> i, consumes r_{t-1}
                Cb[row] = BV[s * 2 + j1]   # branch i -> s, consumes r_t
    return Q2, Ca, Cb


def _mid_pack_matrix(S: int) -> np.ndarray:
    """[G, 2S] packing matrix for mid-step decisions kept in BLOCK order.

    The fused kernel evaluates the older step's per-state comparison at
    block-order row ``j1 * S + s'`` which holds state ``i = 2 s' + j1``
    (s' < S/2; rows with s' >= S/2 are duplicates and get weight 0).  The
    state->bit-position permutation is folded into the powers-of-two
    packing matmul, so the kernel never shuffles sublanes.
    """
    G = -(-S // _PACK)
    W2 = np.zeros((G, 2 * S), np.float32)
    for i in range(S):
        row = (i % 2) * S + (i // 2)
        W2[i // _PACK, row] = float(1 << (i % _PACK))
    return W2


def _acs2_kernel(r_ref, Ca_ref, Cb_ref, Q2_ref, W_ref, W2_ref, dec0_ref,
                 dec1_ref, best0_ref, best1_ref, pm_ref, *, n_pairs: int,
                 S: int, prec=_DOT_PRECISION):
    """Two trellis steps per loop iteration (radix-2 ACS fusion).

    The radix-1 recursion is latency-bound: each step is one small
    dependent MXU op.  Fusing two steps turns the dependent chain into ONE
    [4S, S] @ [S, B] matmul per pair — same total FLOPs, half the number
    of dependent ops.  Per-original-step decisions and argmin states are
    recovered exactly (Bellman: the older step's ACS comparisons are
    subexpressions of the 4-way candidates), so the packed traceback is
    unchanged and outputs stay bit-identical to the radix-1 kernel.

    All extractions use contiguous sublane slices; the only state-order
    permutation (mid-step block order -> state order) is folded into the
    host-built packing matrix ``W2`` and elementwise iota arithmetic.
    The two original steps write to SEPARATE refs (no in-kernel
    concatenate, no narrow paired axis) — each ref sees exactly one
    contiguous dynamic store per iteration; the step interleave happens
    outside the kernel.

    r_ref:    [TC/2, 2n, B]  step-pair codewords ([0:n] older, [n:2n] newer)
    dec0_ref: [TC/2, G, B]   packed decisions, older step of each pair
    dec1_ref: [TC/2, G, B]   packed decisions, newer step
    best0_ref:[TC/2, B]      argmin state, older step
    best1_ref:[TC/2, B]      argmin state, newer step
    pm_ref:   [S, B]         persistent path metrics (scratch)
    """
    @pl.when(pl.program_id(0) == 0)
    def _():
        B = pm_ref.shape[1]
        row = jax.lax.broadcasted_iota(jnp.int32, (S, B), 0)
        pm_ref[:, :] = jnp.where(row == 0, 0.0, 1e30)

    H = S // 2
    B = pm_ref.shape[1]
    # Block-order row r = j1*S + s' holds state i = 2 s' + j1 (s' < S/2).
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (2 * S, B), 0)
    j1v = (r_iota >= S).astype(jnp.int32)
    s_prime = r_iota - j1v * S
    i_of_row = 2 * s_prime + j1v
    row_valid = s_prime < H

    def argmin_state(x):
        # first-index argmin over the sublane (state) axis of [S, B]
        m = jnp.min(x, axis=0, keepdims=True)
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        return jnp.min(jnp.where(x == m, row, S), axis=0).astype(jnp.int32), m

    def pack(bits, W):
        # bool rows -> [G, B] int32 via the powers-of-two matmul
        return _dot(W, bits.astype(jnp.float32)).astype(jnp.int32)

    def step(tau, pm):
        r01 = r_ref[tau, :, :]         # [2n, B] step-pair codewords
        n = r01.shape[0] // 2
        r0 = r01[0:n, :]               # older codeword
        r1 = r01[n:, :]                # newer codeword
        part = _dot(Q2_ref[:, :], pm, prec) + _dot(Ca_ref[:, :], r0, prec)  # [4S, B]: pm[prev2] + bm_{t-1}
        cand = part + _dot(Cb_ref[:, :], r1, prec)  # full 2-step candidates

        # ---- older step (t-1), all in block order [2S, B] ----
        # row j1*S + s of the j0 halves holds pm[prev(i, j0)] + bm(prev->i)
        # for the state i = prev(s, j1) = 2s + j1 (shift trellis, s < S/2).
        mid0 = part[0:2 * S, :]
        mid1 = part[2 * S:4 * S, :]
        take_mid_blk = mid1 < mid0
        pm_mid_blk = jnp.minimum(mid0, mid1)
        pm_valid = jnp.where(row_valid, pm_mid_blk, jnp.float32(3.0e38))
        m_mid = jnp.min(pm_valid, axis=0, keepdims=True)
        best_mid = jnp.min(
            jnp.where(pm_valid == m_mid, i_of_row, S), axis=0
        ).astype(jnp.int32)

        # ---- newer step (t): 4-way min over contiguous blocks ----
        mj0 = jnp.minimum(cand[0:2 * S, :], cand[2 * S:4 * S, :])  # min j0
        m0 = mj0[0:S, :]       # j1 = 0
        m1 = mj0[S:2 * S, :]   # j1 = 1
        take_new = m1 < m0
        new_pm = jnp.minimum(m0, m1)
        best_new, mn = argmin_state(new_pm)

        dec0_ref[tau, :, :] = pack(take_mid_blk, W2_ref[:, :])
        dec1_ref[tau, :, :] = pack(take_new, W_ref[:, :])
        best0_ref[tau, :] = best_mid
        best1_ref[tau, :] = best_new
        return new_pm - mn

    pm = pm_ref[:, :]
    pm = jax.lax.fori_loop(0, n_pairs, step, pm)
    pm_ref[:, :] = pm


@partial(jax.jit,
         static_argnames=("trellis", "decoding_type", "time_chunk", "radix",
                          "layout", "exact"))
def acs_forward_pallas(r, trellis: Trellis, decoding_type: str = "soft",
                       time_chunk: int = 512, radix: int = 1,
                       layout: str = "btg", exact: bool = False):
    """Run the fused ACS forward pass.

    r : ``[B, T, n]`` float32 received codewords (already clipped/padded).
    radix : 2 fuses two trellis steps per kernel iteration (same FLOPs,
        half the dependent-MXU chain); 1 is the single-step kernel and the
        default (radix 2 currently misdecodes on the remote-TPU Mosaic
        at S >= 64 — under investigation; bit-exact in interpret mode).
    layout : 'btg' returns dec_packed ``[B, T, G]``; 'gmaj' returns it
        ``[G, B, T]`` (the layout ``traceback_pallas`` consumes), saving
        one full HBM transpose of the decision tensor in the decode path.
    exact : run the metric matmuls at Precision.HIGHEST so ACS decisions
        are bit-identical across radix/backends on real TPUs (DEFAULT
        rounds operands to bf16 per MXU pass, flipping ~0.1% of near-tie
        comparisons; ~2.1x slower forward pass).
    Returns (dec_packed, best_state ``[B, T]`` int32).
    """
    from ..ops.viterbi import _branch_vectors, _hard_const

    B, T, n = r.shape
    S, I = trellis.number_states, trellis.number_inputs
    if I != 2:
        raise NotImplementedError(
            "the Pallas ACS kernel supports binary-input (k=1) codes; "
            "use backend='xla' for k>1"
        )
    if decoding_type == "hard":
        # per-branch constants ride a homogeneous coordinate
        r = jnp.concatenate([r, jnp.ones((B, T, 1), r.dtype)], axis=-1)
        n += 1
    W = _pack_matrix(S)
    G = W.shape[0]

    # The kernels assume the binary shift-trellis predecessor closed
    # form (prev(s, j) = ((s & (S/2-1)) << 1) | j, see _perm_matrices /
    # _radix2_tables); reject other predecessor layouts loudly instead
    # of decoding garbage.
    from ..ops.viterbi import _is_shift_structured

    if not _is_shift_structured(trellis):
        raise NotImplementedError(
            "the Pallas ACS kernels require a shift-structured binary "
            "trellis; use backend='xla'"
        )

    # Cap the time chunk so the per-grid-step VMEM blocks — r input
    # [TC, n, B] f32, packed decisions [TC, G, B] int32, best [TC, B]
    # int32, each double-buffered — fit the scoped budget (14 MiB: the
    # measured-working K=7 B=2048 TC=128 configuration).
    G_est = -(-S // _PACK)
    step_bytes = 2 * 4 * B * (n + G_est + 1)  # double-buffered
    tc_cap = max(32, (14 * 1024 * 1024) // max(step_bytes, 1))
    TC = min(time_chunk, T, tc_cap)
    if radix == 2:
        TC += TC % 2  # whole step-pairs per chunk
    n_chunks = -(-T // TC)
    T_pad = n_chunks * TC
    if T_pad != T:
        # zero-pad: padded steps produce decisions no traceback window
        # ever consumes (emissions stop at t = T-1)
        r = jnp.pad(r, ((0, 0), (0, T_pad - T), (0, 0)))
    r_tl = jnp.transpose(r, (1, 2, 0))  # [T, n, B] batch-last

    # Interpret mode off-TPU so tests run on the CPU backend unchanged.
    interpret = jax.default_backend() not in ("tpu", "axon")

    if radix == 2:
        Q2, Ca, Cb = _radix2_tables(trellis, decoding_type)
        W2 = _mid_pack_matrix(S)
        kernel = partial(_acs2_kernel, n_pairs=TC // 2, S=S,
                         prec=(jax.lax.Precision.HIGHEST if exact
                               else _DOT_PRECISION))
        in_mats = [jnp.asarray(Ca), jnp.asarray(Cb), jnp.asarray(Q2),
                   jnp.asarray(W), jnp.asarray(W2)]
        mat_specs = [
            pl.BlockSpec((4 * S, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * S, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * S, S), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, S), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 2 * S), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        # step-pair layout: every ref is touched once per fused step
        r_pairs = r_tl.astype(jnp.float32).reshape(T_pad // 2, 2 * n, B)
        r_spec = pl.BlockSpec((TC // 2, 2 * n, B), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        out_specs = [
            pl.BlockSpec((TC // 2, G, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC // 2, G, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC // 2, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC // 2, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((T_pad // 2, G, B), jnp.int32),
            jax.ShapeDtypeStruct((T_pad // 2, G, B), jnp.int32),
            jax.ShapeDtypeStruct((T_pad // 2, B), jnp.int32),
            jax.ShapeDtypeStruct((T_pad // 2, B), jnp.int32),
        ]
    else:
        C = _branch_vectors(trellis, decoding_type)  # [S*I, n] rows s*2+j
        if decoding_type == "hard":
            C = np.concatenate([C, _hard_const(trellis)[:, None]], axis=1)
        C = C.reshape(S, I, -1).transpose(1, 0, 2).reshape(I * S, -1)
        Q = _perm_matrices(trellis.pred_state_table).reshape(I * S, S)
        kernel = partial(_acs_kernel, n_steps=TC, S=S,
                         prec=(jax.lax.Precision.HIGHEST if exact
                               else _DOT_PRECISION))
        in_mats = [jnp.asarray(C), jnp.asarray(Q), jnp.asarray(W)]
        mat_specs = [
            pl.BlockSpec((I * S, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((I * S, S), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, S), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        r_pairs = r_tl.astype(jnp.float32)
        r_spec = pl.BlockSpec((TC, n, B), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        out_specs = [
            pl.BlockSpec((TC, G, B), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((T_pad, G, B), jnp.int32),
            jax.ShapeDtypeStruct((T_pad, B), jnp.int32),
        ]

    outs = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[r_spec, *mat_specs],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((S, B), jnp.float32)],
        interpret=interpret,
    )(r_pairs, *in_mats)

    if radix == 2:
        # interleave the per-pair outputs back into step order (plain XLA
        # ops outside the kernel)
        dec0, dec1, best0, best1 = outs
        dec_packed = jnp.stack([dec0, dec1], axis=1).reshape(T_pad, G, B)
        best = jnp.stack([best0, best1], axis=1).reshape(T_pad, B)
    else:
        dec_packed, best = outs
    best = best[:T].T  # [B, T]
    if layout == "gmaj":
        # word-major handoff for traceback_pallas: ONE transpose
        # [T, G, B] -> [G, B, T] instead of the [B, T, G] API layout plus
        # a second [B,T,G] -> [G,B,T] inside the traceback wrapper (each
        # is a full HBM round trip of the ~T*G*B*4-byte decision tensor).
        return jnp.transpose(dec_packed[:T], (1, 2, 0)), best
    dec_packed = jnp.transpose(dec_packed[:T], (2, 0, 1))  # [B, T, G]
    return dec_packed, best


def _traceback_kernel(dec_ref, best_ref, out_ref, *, T: int, S: int,
                      tb_depth: int, pu_words):
    """Packed traceback, one batch chunk fully in VMEM.

    The XLA traceback (`ops/viterbi.py:_traceback_packed_structured`)
    rolls the whole [B, T, G] decision tensor through HBM once per
    depth step (~80 MB of traffic x tb_depth for the K=7 bench shape) —
    it dominates the decode wall clock 10:1 over the ACS forward pass.
    Here the chunk's decisions stay resident in VMEM and every roll is
    an on-chip shift; the depth loop is unrolled (tb_depth is static),
    so all shifts and emission masks are compile-time constants.

    Same arithmetic, same tie-breaks, all-integer -> bit-identical to
    the XLA version by construction.

    dec_ref  : [G, BC, T] int32 packed branch decisions (word-major so
               the 128-lane minor axis is T, not the tiny word count)
    best_ref : [BC, T] int32 per-step argmin states
    out_ref  : [BC, T] int8 decoded bits (int8: XLA likes to place the
               result in VMEM, and an int32 [B, T] word overflows the
               scoped limit at B >= 2048)
    pu_words : static ((w0, w1), ...) per-word pred_input bit packs
    """
    G = dec_ref.shape[0]
    BC = dec_ref.shape[1]
    half_mask = S // 2 - 1
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (BC, T), 1)

    rolled = [dec_ref[g] for g in range(G)]
    cur = best_ref[:, :]
    out = jnp.zeros((BC, T), jnp.int32)

    for d in range(max(tb_depth - 1, 1)):
        cur_g = cur >> 4
        pos = cur & 15
        w = rolled[0]
        pw0 = jnp.full((BC, T), pu_words[0][0], jnp.int32)
        pw1 = jnp.full((BC, T), pu_words[0][1], jnp.int32)
        for g in range(1, G):
            sel = cur_g == g
            w = jnp.where(sel, rolled[g], w)
            pw0 = jnp.where(sel, pu_words[g][0], pw0)
            pw1 = jnp.where(sel, pu_words[g][1], pw1)
        j = (w >> pos) & 1
        inp = (jnp.where(j == 0, pw0, pw1) >> pos) & 1
        cur = ((cur & half_mask) << 1) | j
        emit = (t_iota <= T - 1 - d) & (
            (d == tb_depth - 2) | (t_iota == T - 1 - d)
        )
        # roll by -d == roll by T - d (pltpu.roll wants shift >= 0)
        inp_pos = pltpu.roll(inp, (T - d) % T, axis=1) if d else inp
        out = jnp.where(emit, inp_pos, out)
        if d + 1 < max(tb_depth - 1, 1):
            rolled = [pltpu.roll(x, 1, axis=1) for x in rolled]
    out_ref[:, :] = out.astype(jnp.int8)


@partial(jax.jit, static_argnames=("S", "tb_depth", "pu_words", "layout"))
def traceback_pallas(dec_packed, best_state, S: int, tb_depth: int,
                     pu_words, batch_chunk: int = 128,
                     layout: str = "btg"):
    """Run the packed traceback kernel.

    dec_packed : [B, T, G] int32 (from `acs_forward_pallas`), or
                 [G, B, T] when ``layout='gmaj'`` (no transpose needed)
    best_state : [B, T] int32
    pu_words   : tuple of (w0, w1) int pairs, one per 16-state word
    Returns decoded bits [B, T] int8.
    """
    if layout == "gmaj":
        G, B, T = dec_packed.shape
    else:
        B, T, G = dec_packed.shape
    # Cap the batch chunk so the kernel fits scoped VMEM: double-buffered
    # dec/best/out blocks plus the unrolled walk's working set.  Theory
    # says 4*T*BC*(2G+10) bytes; Mosaic's stack allocator measures ~1.5x
    # that (16.64 MB at T=1205, G=4, BC=128), hence the 6x multiplier
    # against a 14.5 MB budget.
    cap = max(32, (14_500_000 // (6 * T * (2 * G + 10))) // 32 * 32)
    BC = min(batch_chunk, cap, -(-B // 32) * 32)
    n_chunks = -(-B // BC)
    Bp = n_chunks * BC
    if Bp != B:
        pad_b = Bp - B
        if layout == "gmaj":
            dec_packed = jnp.pad(dec_packed, ((0, 0), (0, pad_b), (0, 0)))
        else:
            dec_packed = jnp.pad(dec_packed, ((0, pad_b), (0, 0), (0, 0)))
        best_state = jnp.pad(best_state, ((0, pad_b), (0, 0)))
    # word-major layout so the VMEM window's minor axis is T (a [.., G]
    # minor axis would be lane-padded to 128: 32x the footprint)
    dec_gmaj = (dec_packed if layout == "gmaj"
                else jnp.transpose(dec_packed, (2, 0, 1)))

    kernel = partial(_traceback_kernel, T=T, S=S, tb_depth=int(tb_depth),
                     pu_words=tuple(tuple(w) for w in pu_words))
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((G, BC, T), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BC, T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BC, T), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, T), jnp.int8),
        interpret=interpret,
    )(dec_gmaj, best_state)
    return out[:B]
