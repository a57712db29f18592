"""Pallas TPU kernel: fused BCJR pass (forward + backward + APP).

One call runs ONE constituent-decoder MAP pass of the turbo loop
(reference turbo.py:78-158): the forward alpha recursion stores its
metrics in a VMEM scratch, then the backward beta recursion computes the
a-posteriori log-ratio inline — the betas never exist outside vector
registers, and nothing but the three symbol streams and the extrinsic
output ever crosses HBM.

Design (vs the XLA `lax.scan` core in ops/turbo.py):

* **batch-last layout** [T, R]: the Monte-Carlo batch rides the 128-lane
  axis, states ride sublanes;
* **sublane chunk-stacking**: a 4-state trellis only fills half of the
  VPU's 8 sublanes, so P = 8 // S lane chunks are STACKED on the sublane
  axis (alpha carries P chunks as [P*S, BC]; candidates as [I*P*S, BC])
  — every hot op runs on full (8, 128) vector tiles and the alpha
  history scratch pads nothing;
* **static-slice state picks**: the predecessor/successor lookups are
  python-int sublane slices baked into the kernel at trace time — exact
  f32 on the VPU.  A one-hot MXU matmul was measured slower AND rounds
  operands to bf16 (the scripts/bcjr_kernel_probe.py sweep: 83 ns/step
  slice vs 159 mxu vs 219 mxu-HIGHEST at 1024 lanes), which at the
  unnormalized metric magnitudes here (~1e3-1e4 over a frame) would
  quantize away the O(1) state differences;
* **linearized branch metrics**: for +-1 symbol tables the full branch
  metric + prior collapses, up to per-step uniform shifts that cancel in
  every APP difference, to ``(sy*cs + pa*cp)/nv + u*li`` — assembled per
  step from broadcast multiply-adds against a tiny coefficient table, so
  no ``[B,T,S,I]`` branch tensor is ever materialized (the reference
  carries absolute log-probs; only differences are observable);
* **no per-step normalization**: f32 accumulates the uniform drift
  harmlessly (~1e4 for LTE frames vs 3e38 range) and every shift cancels
  in the APP differences — per-step renorm ops are pure overhead here;
* the grid iterates over lane chunks; each chunk's full 2T-step
  recursion runs inside one grid step with the alpha history in VMEM.

Masked variant (``masked=True``): ``valid`` freezes the recursions
through padded/halo positions and ``first`` selects exact state-0 vs
uniform alpha starts — the windowed sub-block decomposition of long
frames folds windows into the lane axis and decodes them all at once.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.trellis import Trellis

__all__ = ["bcjr_appdiff_pallas"]


def _linear_tables(trellis: Trellis, P: int):
    """Static tables for the linearized, P-chunk-stacked BCJR recursion.

    Candidate rows are branch-major, then STATE, then chunk:
    ``r = j*(P*S) + s*P + c`` — chunk-minor because ``pltpu.repeat``
    TILES its input ([c0, c1, c0, c1, ...]), so a repeated [P, BC]
    symbol row lands on exactly this layout; it also makes the
    state reduction a pure contiguous-halving tree (each halving of a
    [P*S]-row tensor splits the MSB of s, for power-of-two S), and the
    branch (j or u) reduction stays I contiguous [P*S]-row halves.

    Returns (perm_a, perm_b, coef) where

      perm_a [I*P*S] ints: alpha candidate row r picks
          alpha_stacked[pred_state[s, j]*P + c]
      perm_b [I*P*S] ints: beta candidate row r picks
          beta_stacked[next_state[s, u]*P + c]
      coef   [I*P*S, 8] float32, columns (a_sy, a_pa, a_pu, b_sy, b_pa,
          0, 0, 0): the (sy, pa, li) coefficients of the alpha-side
          branch+prior term and the (sy, pa) coefficients of the
          beta-side branch term, duplicated per chunk.  The beta side
          carries NO prior column: the kernel adds ``u * li`` to the
          beta update alone, so the same candidate tensor doubles as
          the prior-free APP branch term (reference turbo.py:143-150
          drops the prior on the decision step).
    """
    from ..ops.turbo import _bcjr_tables_np

    nst, cs, cp, ps, pu = _bcjr_tables_np(trellis)
    S, I = nst.shape
    cs_re = cs[ps, pu]
    cp_re = cp[ps, pu]
    perm_a, perm_b = [], []
    coef = np.zeros((I * P * S, 8), np.float32)
    r = 0
    for j in range(I):
        for s in range(S):
            for c in range(P):
                perm_a.append(int(ps[s, j]) * P + c)
                coef[r, 0] = cs_re[s, j]
                coef[r, 1] = cp_re[s, j]
                coef[r, 2] = float(pu[s, j])
                r += 1
    r = 0
    for u in range(I):
        for s in range(S):
            for c in range(P):
                perm_b.append(int(nst[s, u]) * P + c)
                coef[r, 3] = cs[s, u]
                coef[r, 4] = cp[s, u]
                r += 1
    return tuple(perm_a), tuple(perm_b), coef


def _bcjr_kernel(syn_ref, pan_ref, li_ref, coef_ref, valid_ref, first_ref,
                 a0_ref, bT_ref, e_ref, af_ref, bf_ref, alphas_ref,
                 *scratch_refs,
                 T: int, S: int, I: int, P: int,
                 perm_a, perm_b, max_log: bool, masked: bool,
                 boundary: bool, upcast: bool = False):
    """One lane block's full BCJR pass (P chunks stacked on sublanes).

    Stream blocks are slot-major [P, T, BC] (the chunk-slot axis leads
    because pallas requires the last two block dims to be full-size or
    (8, 128)-aligned, and P < 8).

    syn/pan_ref : [P, T, BC] symbol streams PRE-SCALED by 1/noise_var
    li_ref      : [P, T, BC] intrinsic LLRs
    coef_ref    : [I*P*S, 8] linear branch coefficient table
    valid_ref   : [P, T, BC] 1.0 at live positions (masked variant)
    first_ref   : [P, 1, BC] 1.0 where the alpha start is exact state 0
    a0/bT_ref   : [1, P*S, BC] initial alpha / final-position beta
                  (boundary variant: NII state handoff between turbo
                  iterations; placeholders otherwise)
    e_ref       : [P, T, BC] (out) APP log-ratio app1 - app0 (prior-free)
    af/bf_ref   : [1, P*S, BC] (out) final alpha / backward-final beta
                  carries (written only in the boundary variant)
    alphas_ref  : [T, P*S, BC] (scratch) forward metric history
    scratch_refs: with ``upcast`` (bf16 stream io), f32 VMEM copies of
                  (syn, pan, li, e[, valid]) — real Mosaic cannot prove
                  sublane alignment for per-step dynamic slices into
                  packed 16-bit blocks, so the recursion reads/writes
                  run against full-width scratch copied once per block
                  (static full-block copies compile fine); HBM<->VMEM
                  DMA stays bf16.
    """
    BC = syn_ref.shape[2]
    PS = P * S
    neg_inf = jnp.float32(-1e30)
    if upcast:
        syn_s, pan_s, li_s, e_s = scratch_refs[:4]
        syn_s[...] = syn_ref[...].astype(jnp.float32)
        pan_s[...] = pan_ref[...].astype(jnp.float32)
        li_s[...] = li_ref[...].astype(jnp.float32)
        if masked:
            valid_s = scratch_refs[4]
            valid_s[...] = valid_ref[...].astype(jnp.float32)
        else:
            valid_s = valid_ref
    else:
        syn_s, pan_s, li_s, e_s, valid_s = (
            syn_ref, pan_ref, li_ref, e_ref, valid_ref)

    if max_log:
        def lse2(x, y):
            return jnp.maximum(x, y)
    else:
        # branch-free logaddexp: metrics are finite by construction (the
        # -1e30 start sentinel underflows exp to exactly 0), so the
        # inf/nan select chains of jnp.logaddexp are dead weight.
        def lse2(x, y):
            m = jnp.maximum(x, y)
            return m + jnp.log1p(jnp.exp(-jnp.abs(x - y)))

    def reduce_s(x):
        # [P*S, BC] -> [P, BC]: lse over states.  Rows are (s, c) with
        # chunk minor, so each contiguous halving splits the MSB of s —
        # log2(S) full-width lse2 ops, no per-chunk loops (S power of 2,
        # enforced by the wrapper's choice of P and trellis sizes).
        while x.shape[0] > P:
            h = x.shape[0] // 2
            x = lse2(x[:h], x[h:])
        return x

    def pick(vec, perm):
        # static sublane slices; exact f32, no gather, no MXU
        return jnp.concatenate([vec[i:i + 1] for i in perm], 0)

    def srep(x):  # [P, BC] -> [P*S, BC], chunk rows duplicated per state
        return pltpu.repeat(x, S, axis=0) if S > 1 else x

    def row(ref, t):  # [P, T, BC] ref -> [P, BC] step row (f32 upcast)
        return ref[:, pl.ds(t, 1), :].reshape(P, BC).astype(jnp.float32)

    a_sy = coef_ref[:, 0:1]
    a_pa = coef_ref[:, 1:2]
    a_pu = coef_ref[:, 2:3]
    b_sy = coef_ref[:, 3:4]
    b_pa = coef_ref[:, 4:5]

    # ---- alpha start ---- (rows are (s, c), chunk minor: s = r // P)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (PS, BC), 0)
    s_of_row = r_iota // P
    if boundary:
        alpha0 = a0_ref[0, :, :]
    elif masked:
        fr = srep(first_ref[:, 0, :].astype(jnp.float32))  # [PS, BC]
        alpha0 = jnp.where((s_of_row > 0) & (fr > 0.5), neg_inf, 0.0)
    else:
        alpha0 = jnp.where(s_of_row > 0, neg_inf, 0.0)

    # ---- forward: store PRE-update metrics (alpha_t is what the APP
    # at t consumes) ----
    def fwd(t, alpha):
        sy = srep(row(syn_s, t))  # [PS, BC]
        pa = srep(row(pan_s, t))
        lt = srep(row(li_s, t))
        syr = jnp.concatenate([sy] * I, 0)  # [I*PS, BC]
        par = jnp.concatenate([pa] * I, 0)
        ltr = jnp.concatenate([lt] * I, 0)
        cand = (pick(alpha, perm_a)
                + a_sy * syr + a_pa * par + a_pu * ltr)
        a = cand[0:PS, :]
        for j in range(1, I):
            a = lse2(a, cand[j * PS:(j + 1) * PS, :])
        if masked:
            vt = srep(row(valid_s, t))
            a = jnp.where(vt > 0.5, a, alpha)
        alphas_ref[pl.ds(t, 1), :, :] = alpha.reshape(1, PS, BC)
        return a

    alpha_fin = jax.lax.fori_loop(0, T, fwd, alpha0)
    if boundary:
        af_ref[0, :, :] = alpha_fin

    # ---- backward: beta recursion + APP inline ----
    def bwd(k, beta):
        t = T - 1 - k
        sy = srep(row(syn_s, t))
        pa = srep(row(pan_s, t))
        lt = srep(row(li_s, t))
        syr = jnp.concatenate([sy] * I, 0)
        par = jnp.concatenate([pa] * I, 0)
        cand = pick(beta, perm_b) + b_sy * syr + b_pa * par  # prior-free
        b = cand[0:PS, :]
        for u in range(1, I):
            b = lse2(b, cand[u * PS:(u + 1) * PS, :] + u * lt)
        al = alphas_ref[pl.ds(t, 1), :, :].reshape(PS, BC)
        app0 = reduce_s(al + cand[0:PS, :])  # [P, BC]
        app1 = reduce_s(al + cand[PS:2 * PS, :])
        for u in range(2, I):  # I > 2 trellises: fold the rest into app1
            app1 = lse2(app1, reduce_s(al + cand[u * PS:(u + 1) * PS, :]))
        e_s[:, pl.ds(t, 1), :] = (app1 - app0).reshape(
            P, 1, BC).astype(e_s.dtype)
        if masked:
            vt = srep(row(valid_s, t))
            b = jnp.where(vt > 0.5, b, beta)
        return b

    beta_T = bT_ref[0, :, :] if boundary else jnp.zeros((PS, BC),
                                                        jnp.float32)
    beta_fin = jax.lax.fori_loop(0, T, bwd, beta_T)
    if boundary:
        bf_ref[0, :, :] = beta_fin
    if upcast:
        e_ref[...] = e_s[...].astype(e_ref.dtype)


def _bcjr_butterfly_kernel(syn_ref, pan_ref, li_ref, coef_ref, valid_ref,
                           first_ref, a0_ref, bT_ref, e_ref, af_ref,
                           bf_ref, hist_ref, *scratch_refs, T: int, S: int,
                           I: int, P: int, perm_a, perm_b, max_log: bool,
                           masked: bool, boundary: bool,
                           upcast: bool = False):
    """Counter-propagating BCJR: alpha and beta advance in ONE loop.

    The plain kernel's 2T-step sequential chain (forward fori, then
    backward fori) halves to T steps: iteration k updates alpha at
    ``t = k`` AND beta at ``t = T-1-k``.  The two recursions are data-
    independent, so their op chains interleave in the VLIW pipeline —
    the per-iteration critical path is max(alpha, beta), not their sum.
    Once the sweeps cross at T/2, each iteration emits TWO inline APP
    rows (alpha live + beta history, beta live + alpha history).

    ``hist_ref`` [T, P*S, BC] is shared: slot t < ceil(T/2) holds the
    pre-update alpha_t from the first phase; slot t >= floor(T/2) holds
    the pre-update beta_{t+1}.  (At the crossing the two ranges overlap
    by one slot for odd T; the middle row is emitted between phases
    before beta overwrites it.)
    """
    BC = syn_ref.shape[2]
    PS = P * S
    neg_inf = jnp.float32(-1e30)
    if upcast:  # see _bcjr_kernel: dynamic sublane slices need f32
        syn_s, pan_s, li_s, e_s = scratch_refs[:4]
        syn_s[...] = syn_ref[...].astype(jnp.float32)
        pan_s[...] = pan_ref[...].astype(jnp.float32)
        li_s[...] = li_ref[...].astype(jnp.float32)
        if masked:
            valid_s = scratch_refs[4]
            valid_s[...] = valid_ref[...].astype(jnp.float32)
        else:
            valid_s = valid_ref
    else:
        syn_s, pan_s, li_s, e_s, valid_s = (
            syn_ref, pan_ref, li_ref, e_ref, valid_ref)

    if max_log:
        def lse2(x, y):
            return jnp.maximum(x, y)
    else:
        def lse2(x, y):
            m = jnp.maximum(x, y)
            return m + jnp.log1p(jnp.exp(-jnp.abs(x - y)))

    def reduce_s(x):
        while x.shape[0] > P:
            h = x.shape[0] // 2
            x = lse2(x[:h], x[h:])
        return x

    def pick(vec, perm):
        return jnp.concatenate([vec[i:i + 1] for i in perm], 0)

    def srep(x):
        return pltpu.repeat(x, S, axis=0) if S > 1 else x

    def row(ref, t):
        return ref[:, pl.ds(t, 1), :].reshape(P, BC).astype(jnp.float32)

    a_sy = coef_ref[:, 0:1]
    a_pa = coef_ref[:, 1:2]
    a_pu = coef_ref[:, 2:3]
    b_sy = coef_ref[:, 3:4]
    b_pa = coef_ref[:, 4:5]

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (PS, BC), 0)
    s_of_row = r_iota // P
    if masked:
        fr = srep(first_ref[:, 0, :].astype(jnp.float32))
        alpha0 = jnp.where((s_of_row > 0) & (fr > 0.5), neg_inf, 0.0)
    else:
        alpha0 = jnp.where(s_of_row > 0, neg_inf, 0.0)
    beta0 = jnp.zeros((PS, BC), jnp.float32)
    if boundary:
        alpha0 = a0_ref[0, :, :]
        beta0 = bT_ref[0, :, :]

    def streams3(t):
        sy = srep(row(syn_s, t))
        pa = srep(row(pan_s, t))
        lt = srep(row(li_s, t))
        return sy, pa, lt

    def alpha_step(t, alpha, store):
        sy, pa, lt = streams3(t)
        syr = jnp.concatenate([sy] * I, 0)
        par = jnp.concatenate([pa] * I, 0)
        ltr = jnp.concatenate([lt] * I, 0)
        cand = (pick(alpha, perm_a)
                + a_sy * syr + a_pa * par + a_pu * ltr)
        a = cand[0:PS, :]
        for j in range(1, I):
            a = lse2(a, cand[j * PS:(j + 1) * PS, :])
        if masked:
            vt = srep(row(valid_s, t))
            a = jnp.where(vt > 0.5, a, alpha)
        if store:
            hist_ref[pl.ds(t, 1), :, :] = alpha.reshape(1, PS, BC)
        return a

    def beta_cand(t, beta):
        sy, pa, lt = streams3(t)
        syr = jnp.concatenate([sy] * I, 0)
        par = jnp.concatenate([pa] * I, 0)
        cand = pick(beta, perm_b) + b_sy * syr + b_pa * par
        return cand, lt

    def beta_step(t, beta, store):
        cand, lt = beta_cand(t, beta)
        b = cand[0:PS, :]
        for u in range(1, I):
            b = lse2(b, cand[u * PS:(u + 1) * PS, :] + u * lt)
        if store:
            hist_ref[pl.ds(t, 1), :, :] = beta.reshape(1, PS, BC)
        if masked:
            vt = srep(row(valid_s, t))
            b = jnp.where(vt > 0.5, b, beta)
        return b, cand

    def emit_app(t, al, cand):
        app0 = reduce_s(al + cand[0:PS, :])
        app1 = reduce_s(al + cand[PS:2 * PS, :])
        for u in range(2, I):
            app1 = lse2(app1, reduce_s(al + cand[u * PS:(u + 1) * PS, :]))
        e_s[:, pl.ds(t, 1), :] = (app1 - app0).reshape(
            P, 1, BC).astype(e_s.dtype)

    H = T // 2  # phase-1 length: alpha fills slots [0, H),
    # beta fills slots [T-H, T) — disjoint for any T.

    # ---- phase 1: both recursions store history, no APP yet ----
    def phase1(k, carry):
        alpha, beta = carry
        a = alpha_step(k, alpha, store=True)
        b, _ = beta_step(T - 1 - k, beta, store=True)
        return a, b

    alpha, beta = jax.lax.fori_loop(0, H, phase1, (alpha0, beta0))

    # ---- odd-T middle row: both carries are live at t = H ----
    if T % 2:
        cand, _ = beta_cand(H, beta)  # beta carry IS beta_{H+1}
        emit_app(H, alpha, cand)  # alpha carry IS alpha_H
        alpha = alpha_step(H, alpha, store=False)
        beta, _ = beta_step(H, beta, store=False)

    # ---- phase 2: recursions continue; two APP rows per iteration ----
    def phase2(k, carry):
        alpha, beta = carry
        ta = k
        tb = T - 1 - k
        # alpha side: live alpha_t + beta history (pre-update beta_{t+1})
        bh = hist_ref[pl.ds(ta, 1), :, :].reshape(PS, BC)
        cand_a, _ = beta_cand(ta, bh)
        emit_app(ta, alpha, cand_a)
        a = alpha_step(ta, alpha, store=False)
        # beta side: live candidates + alpha history
        b, cand_b = beta_step(tb, beta, store=False)
        ah = hist_ref[pl.ds(tb, 1), :, :].reshape(PS, BC)
        emit_app(tb, ah, cand_b)
        return a, b

    alpha, beta = jax.lax.fori_loop((T + 1) // 2, T, phase2,
                                    (alpha, beta))
    if boundary:
        af_ref[0, :, :] = alpha
        bf_ref[0, :, :] = beta
    if upcast:
        e_ref[...] = e_s[...].astype(e_ref.dtype)


@partial(jax.jit, static_argnames=("trellis", "max_log", "lane_chunk",
                                   "butterfly", "io_dtype"))
def bcjr_appdiff_pallas(syn, pan, li, trellis: Trellis,
                        max_log: bool = False, valid=None, first=None,
                        lane_chunk: int = 1024, butterfly: bool = False,
                        io_dtype: str = "f32", boundary=None):
    """Fused BCJR pass; returns the prior-free APP log-ratio.

    syn/pan : [T, R] symbol streams PRE-SCALED by 1/noise_variance
    li      : [T, R] intrinsic LLRs
    valid   : [T, R] or None; recursions pass through invalid positions
              unchanged (window halos / padding)
    first   : [R] bool or None; True rows start exactly in state 0,
              False rows from a uniform metric; None = all exact.
    boundary: None, or (a0 [S, R], bT [S, R]) initial alpha / final-
              position beta metrics (NII window handoff — see
              ops/turbo.py).  When given, returns (e, a_fin [S, R],
              b_fin [S, R]): the post-final forward alpha and the
              backward-final beta carries.  Mutually exclusive with
              ``valid`` masking.
    Returns e [T, R] with lappr = li + e (reference turbo.py:78-158 up
    to uniform per-(t, r) shifts, which cancel in the difference).
    """
    T, R = syn.shape
    S, I = trellis.number_states, trellis.number_inputs
    if S & (S - 1):
        raise NotImplementedError(
            "the Pallas BCJR kernel requires a power-of-two state count "
            "(every shift-register trellis); use the XLA backend"
        )
    P = max(1, 8 // S)  # chunks stacked on the 8-sublane axis
    perm_a, perm_b, coef = _linear_tables(trellis, P)
    masked = valid is not None
    has_boundary = boundary is not None
    if has_boundary and masked:
        raise ValueError("boundary handoff and valid masking are "
                         "mutually exclusive")
    io = jnp.bfloat16 if io_dtype == "bf16" else jnp.float32
    io_bytes = 2 if io_dtype == "bf16" else 4

    # Cap the lane block so the kernel fits scoped VMEM: pallas DOUBLE-
    # BUFFERS every gridded block (input and output), so the per-lane
    # footprint is 2*(streams + e [+ valid]) * T in the io dtype + the
    # alpha scratch S*T in f32.  ~14 MB budget leaves headroom for
    # Mosaic spills.  bf16 io HALVES the HBM<->VMEM stream traffic but
    # not the VMEM cap: real Mosaic cannot vector-load a dynamic
    # sublane row of a packed 16-bit block, so the kernel upcasts each
    # block into single-buffered f32 scratches first (whose footprint
    # exactly offsets the double-buffered io saving).  LLR quantization
    # to bf16's 8-bit mantissa is benign — production decoders run
    # 4-6 bit LLRs.
    n_blocks = 5 if masked else 4
    per_lane = io_bytes * 2 * n_blocks * T + 4 * S * T
    upcast = io_dtype == "bf16"
    if upcast:
        per_lane += 4 * n_blocks * T  # f32 scratch copies, single-buffered
    cap_lanes = max(128 * P,
                    (14 * 1024 * 1024 // per_lane) // (128 * P) * 128 * P)
    LB = min(lane_chunk * P, cap_lanes, -(-R // (128 * P)) * 128 * P)
    # balance: with the chunk count fixed by the cap, shrink the block
    # to the smallest aligned width that still covers R — less padding
    # (e.g. R = 24576, cap 7168 -> 4 x 6144 instead of 4 x 7168)
    n_chunks = -(-R // LB)
    LB = min(LB, -(-R // (n_chunks * 128 * P)) * 128 * P)
    BC = LB // P
    Rp = n_chunks * LB
    if Rp != R:
        pad = ((0, 0), (0, Rp - R))
        syn = jnp.pad(syn, pad)
        pan = jnp.pad(pan, pad)
        li = jnp.pad(li, pad)
        if masked:
            valid = jnp.pad(valid, pad)
    n_slots = Rp // BC

    def slot3(x):  # [T', Rp] -> slot-major [n_slots, T', BC]
        Tx = x.shape[0]
        return jnp.transpose(x.reshape(Tx, n_slots, BC), (1, 0, 2))

    if masked:
        valid_f = slot3(jnp.asarray(valid, io))
        if first is None:
            first = jnp.ones((R,), bool)
        first_f = slot3(jnp.pad(
            jnp.asarray(first, io)[None, :], ((0, 0), (0, Rp - R))
        ))
        Tv = T
    else:
        # placeholders keep the kernel signature static; never read
        valid_f = jnp.zeros((n_slots, 1, BC), io)
        first_f = jnp.zeros((n_slots, 1, BC), io)
        Tv = 1

    PS = P * S
    if has_boundary:
        a0_in, bT_in = boundary

        def state_blocks(x):  # [S, R] -> [n_chunks, P*S, BC], row s*P+c
            xp = jnp.pad(jnp.asarray(x, jnp.float32),
                         ((0, 0), (0, Rp - R)))
            xq = xp.reshape(S, n_chunks, P, BC)
            return jnp.transpose(xq, (1, 0, 2, 3)).reshape(
                n_chunks, PS, BC)

        a0_f = state_blocks(a0_in)
        bT_f = state_blocks(bT_in)
    else:
        a0_f = jnp.zeros((n_chunks, PS, BC), jnp.float32)
        bT_f = jnp.zeros((n_chunks, PS, BC), jnp.float32)

    kernel = partial(
        _bcjr_butterfly_kernel if butterfly else _bcjr_kernel,
        T=T, S=S, I=I, P=P, perm_a=perm_a, perm_b=perm_b,
        max_log=bool(max_log), masked=masked,
        boundary=has_boundary, upcast=upcast,
    )
    interpret = jax.default_backend() not in ("tpu", "axon")

    scratch_shapes = [pltpu.VMEM((T, P * S, BC), jnp.float32)]
    if upcast:
        scratch_shapes += [
            pltpu.VMEM((P, T, BC), jnp.float32) for _ in range(4)
        ]
        if masked:
            scratch_shapes.append(pltpu.VMEM((P, T, BC), jnp.float32))

    state_spec = pl.BlockSpec((1, PS, BC), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    e, af, bf = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((P, T, BC), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, T, BC), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, T, BC), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((I * P * S, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, Tv, BC), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1, BC), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            state_spec,
            state_spec,
        ],
        out_specs=[
            pl.BlockSpec((P, T, BC), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            state_spec,
            state_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_slots, T, BC), io),
            jax.ShapeDtypeStruct((n_chunks, PS, BC), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, PS, BC), jnp.float32),
        ],
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(slot3(syn).astype(io), slot3(pan).astype(io), slot3(li).astype(io),
      jnp.asarray(coef), valid_f, first_f, a0_f, bT_f)
    e_out = jnp.transpose(e, (1, 0, 2)).reshape(
        T, Rp)[:, :R].astype(jnp.float32)
    if not has_boundary:
        return e_out

    def state_unblocks(x):  # [n_chunks, P*S, BC] -> [S, R]
        xq = x.reshape(n_chunks, S, P, BC)
        return jnp.transpose(xq, (1, 0, 2, 3)).reshape(S, Rp)[:, :R]

    return e_out, state_unblocks(af), state_unblocks(bf)
