"""Pallas TPU kernel: VMEM-resident QC-LDPC belief propagation.

The XLA QC decoder (:mod:`commpy_tpu.ops.qcldpc`) already routes every
message with cyclic rolls instead of gathers, but each of its BP
iterations streams the full edge tensor through HBM several times
(v2c assembly, CN update, two total-LLR passes, the syndrome check) —
~1 GB of traffic for 15 iterations at 802.11n-1944, B=256, which is the
measured wall clock almost exactly.  This kernel runs ALL iterations
inside VMEM: the c2v messages (one [Z, BC] tile per nonzero base-graph
block), the accumulated totals and the decision word never leave the
chip until the decode is done.

Design:

* batch-last [n, BC] layout, one grid step per 128-lane batch chunk;
* message routing = ``pltpu.roll`` on the Z sublane axis of per-block
  [Z, BC] tiles (shift ``Z - s`` for the inverse direction — pltpu.roll
  wants non-negative shifts);
* the base graph is python-unrolled at trace time (~90 nonzero blocks
  for 802.11n R=1/2): every shift is a static constant, every block a
  static slice of the column tensor;
* check-node leave-one-out (SPA tanh-product / MSA sign x two-min) uses
  the same prefix/suffix two-pass trick as the XLA paths, over the
  short per-row neighbor lists;
* per-lane convergence freeze: lanes whose syndrome is satisfied stop
  updating (reference ldpc.py:209-248 freezes converged FRAMES; a lane
  IS a frame here), so results match the XLA decoder's latching.

Cited reference behavior: commpy/channelcoding/ldpc.py:144-255 (BP with
per-frame early stop); parity vs the XLA path is tested in
tests/test_qcldpc.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.qcldpc import _llr_max  # single source for the clip constant

__all__ = ["qc_bp_pallas", "qc_bp_pallas_streamed", "vmem_bytes_per_lane",
           "streamed_vmem_bytes"]

_VMEM_BUDGET = 13_500_000  # scoped VMEM bytes available to the kernel
# the streamed kernel raises its own per-call compiler limit (v5e has
# 128 MB of physical VMEM; the 16 MB default is XLA's conservative
# scoped-stack ceiling) — budget must still leave room for Mosaic's
# internal scratch and XLA's operand promotion
_STREAMED_VMEM_LIMIT = 100_000_000


def _make_cn_update(algorithm: str, msa_scale: float, msa_offset: float):
    """Leave-one-out check-node update over a python list of tiles.

    Shared by the VMEM-resident and the HBM-streamed kernels; the
    prefix/suffix two-pass trick mirrors the XLA cores' `_loo_prod` /
    `_loo_min` (ops/qcldpc.py) over the short per-row neighbor lists.
    """
    def cn_update(v2c_row):
        K = len(v2c_row)
        if algorithm == "SPA":
            t = [jnp.tanh(v * 0.5) for v in v2c_row]
            pre = [None] * K
            suf = [None] * K
            acc = jnp.ones_like(t[0])
            for k in range(K):
                pre[k] = acc
                acc = acc * t[k]
            acc = jnp.ones_like(t[0])
            for k in range(K - 1, -1, -1):
                suf[k] = acc
                acc = acc * t[k]
            out = []
            for k in range(K):
                prod = jnp.clip(pre[k] * suf[k], -1.0, 1.0)
                # 2*atanh(x) = log1p(x) - log1p(-x); Mosaic has no atanh
                # primitive.  prod = +-1 gives +-inf, which the clip
                # saturates to +-_llr_max exactly like the XLA path.
                msg = jnp.log1p(prod) - jnp.log1p(-prod)
                out.append(jnp.clip(msg, -_llr_max, _llr_max))
            return out
        # MSA: sign product x leave-one-out min of magnitudes
        sg = [jnp.sign(v) for v in v2c_row]
        mg = [jnp.abs(v) for v in v2c_row]
        big = jnp.float32(3e38)
        pre_s = [None] * K
        suf_s = [None] * K
        pre_m = [None] * K
        suf_m = [None] * K
        acc_s, acc_m = jnp.ones_like(sg[0]), jnp.full_like(mg[0], big)
        for k in range(K):
            pre_s[k], pre_m[k] = acc_s, acc_m
            acc_s = acc_s * sg[k]
            acc_m = jnp.minimum(acc_m, mg[k])
        acc_s, acc_m = jnp.ones_like(sg[0]), jnp.full_like(mg[0], big)
        for k in range(K - 1, -1, -1):
            suf_s[k], suf_m[k] = acc_s, acc_m
            acc_s = acc_s * sg[k]
            acc_m = jnp.minimum(acc_m, mg[k])
        # normalized/offset min-sum magnitude correction; (1, 0) is
        # IEEE-exact plain MSA (loo-min >= 0, x*1.0 and x-0.0 exact)
        return [
            pre_s[k] * suf_s[k] * jnp.maximum(
                msa_scale * jnp.minimum(pre_m[k], suf_m[k]) - msa_offset,
                0.0,
            )
            for k in range(K)
        ]

    return cn_update


def vmem_bytes_per_lane(n: int, Z: int, n_blocks_nz: int) -> int:
    """Kernel VMEM footprint per batch lane at the 128-lane chunk.

    Double-buffered llr + out_llr (f32) + dec (int8), the per-block c2v
    message tiles, and ~3n of working set.  The batch rides the minor
    (lane) axis, which VMEM pads to 128 — a smaller chunk does NOT
    shrink the footprint, so codes whose 128-lane footprint exceeds the
    budget cannot run this kernel at all (use the XLA core).
    """
    return 4 * n * (2 + 2 + 3) + 2 * n + 4 * Z * n_blocks_nz


def _qc_bp_kernel(llr_ref, dec_ref, out_llr_ref, *, Z: int, Nb: int,
                  rows, algorithm: str, n_iters: int,
                  schedule: str = "flooding",
                  msa_scale: float = 1.0, msa_offset: float = 0.0):
    """One lane chunk's full BP decode.

    llr_ref     : [Nb*Z, BC] channel LLRs
    dec_ref     : [Nb*Z, BC] (out) hard decisions, int8 0/1 (int8
                  halves the double-buffered output footprint vs int32
                  — the 802.11n-1944 kernel is within 4% of the scoped
                  VMEM limit)
    out_llr_ref : [Nb*Z, BC] (out) posterior LLRs
    rows        : static tuple of per-check-row neighbor lists
                  ((j, s), ...) — block column and shift of each
                  nonzero base-graph block.
    """
    BC = llr_ref.shape[1]

    def col(ref, j):  # [Z, BC] tile of block column j
        return ref[j * Z:(j + 1) * Z, :]

    def rollz(x, s):
        s = s % Z
        return pltpu.roll(x, s, axis=0) if s else x

    llr_cols = [col(llr_ref, j) for j in range(Nb)]

    # c2v messages: one [Z, BC] tile per nonzero block, row-major order
    c2v0 = [
        jnp.zeros((Z, BC), jnp.float32)
        for r in rows for _ in r
    ]

    def totals(c2v):
        # total[j] = llr[j] + sum over blocks in column j of
        # roll(c2v, +s): the inverse of the check-side alignment
        tot = list(llr_cols)
        e = 0
        for r in rows:
            for (j, s) in r:
                tot[j] = tot[j] + rollz(c2v[e], s)
                e += 1
        return tot

    def decisions(tot):
        # signbit, not (t < 0): totals of exactly -0.0 must decode to
        # bit 1 like the XLA core's jnp.signbit decision
        return [jnp.signbit(t).astype(jnp.float32) for t in tot]

    def synd_bad(dec_cols):
        # [1, BC] 1.0 where ANY check fails for that lane
        bad = jnp.zeros((1, BC), jnp.float32)
        for r in rows:
            par = jnp.zeros((Z, BC), jnp.float32)
            for (j, s) in r:
                par = par + rollz(dec_cols[j], Z - s)
            odd = jnp.max(jnp.mod(par, 2.0), axis=0, keepdims=True)
            bad = jnp.maximum(bad, odd)
        return bad

    cn_update = _make_cn_update(algorithm, msa_scale, msa_offset)

    def body(it, carry):
        c2v, act = carry  # act [1, BC]: 1.0 while unconverged
        tot = totals(c2v)
        new_c2v = []
        e = 0
        for r in rows:
            v2c_row = []
            for (j, s) in r:
                v2c_row.append(rollz(tot[j], Z - s) - c2v[e])
                e += 1
            new_c2v.extend(cn_update(v2c_row))
        # freeze converged lanes (latched outputs + frozen messages)
        c2v = [
            jnp.where(act > 0.5, n, o) for n, o in zip(new_c2v, c2v)
        ]
        tot2 = totals(c2v)
        dec_cols = decisions(tot2)
        for j in range(Nb):
            out_llr_ref[j * Z:(j + 1) * Z, :] = jnp.where(
                act > 0.5, tot2[j], out_llr_ref[j * Z:(j + 1) * Z, :]
            )
            dec_ref[j * Z:(j + 1) * Z, :] = jnp.where(
                act > 0.5, dec_cols[j].astype(jnp.int8),
                dec_ref[j * Z:(j + 1) * Z, :]
            )
        act = jnp.minimum(act, synd_bad(dec_cols))
        return c2v, act

    def body_layered(it, carry):
        # serial (layered) schedule: totals update after EVERY check
        # row, so information propagates within one iteration — the
        # standard production convergence accelerator (~2x fewer
        # iterations than flooding at equal BER).
        c2v, act, tot = carry
        c2v = list(c2v)
        tot = list(tot)
        e = 0
        for r in rows:
            v2c_row = []
            for (j, sft) in r:
                v2c_row.append(rollz(tot[j], Z - sft) - c2v[e])
                e += 1
            new_row = cn_update(v2c_row)
            e -= len(r)
            for k, (j, sft) in enumerate(r):
                nc = jnp.where(act > 0.5, new_row[k], c2v[e])
                # frozen lanes: nc == old, delta 0 — totals untouched
                tot[j] = tot[j] + rollz(nc - c2v[e], sft)
                c2v[e] = nc
                e += 1
        dec_cols = decisions(tot)
        for j in range(Nb):
            out_llr_ref[j * Z:(j + 1) * Z, :] = jnp.where(
                act > 0.5, tot[j], out_llr_ref[j * Z:(j + 1) * Z, :]
            )
            dec_ref[j * Z:(j + 1) * Z, :] = jnp.where(
                act > 0.5, dec_cols[j].astype(jnp.int8),
                dec_ref[j * Z:(j + 1) * Z, :]
            )
        act = jnp.minimum(act, synd_bad(dec_cols))
        return tuple(c2v), act, tuple(tot)

    # initial state mirrors the XLA core: decisions from channel LLRs,
    # active = syndrome-failing lanes
    dec0 = decisions(llr_cols)
    for j in range(Nb):
        out_llr_ref[j * Z:(j + 1) * Z, :] = llr_cols[j]
        dec_ref[j * Z:(j + 1) * Z, :] = dec0[j].astype(jnp.int8)
    act0 = synd_bad(dec0)

    # Early exit once every lane's syndrome is satisfied (like the XLA
    # core's while_loop): outputs are identical — converged lanes are
    # frozen either way — but a chunk of clean-channel frames stops
    # after the 2-5 iterations it actually needs, not n_iters.
    def going(carry):
        it = carry[0]
        act = carry[1]
        return jnp.logical_and(it < n_iters, jnp.max(act) > 0.5)

    if schedule == "layered":
        def step_l(carry):
            it, act, c2v, tot = carry
            c2v, act, tot = body_layered(it, (c2v, act, tot))
            return it + 1, act, c2v, tot

        jax.lax.while_loop(
            going, step_l, (0, act0, tuple(c2v0), tuple(llr_cols))
        )
    else:
        def step_f(carry):
            it, act, c2v = carry
            c2v, act = body(it, (list(c2v), act))
            return it + 1, act, tuple(c2v)

        jax.lax.while_loop(going, step_f, (0, act0, tuple(c2v0)))


@partial(jax.jit, static_argnames=("algorithm", "n_iters", "meta",
                                   "schedule", "msa_scale", "msa_offset"))
def qc_bp_pallas(llr, algorithm: str, n_iters: int, meta,
                 schedule: str = "flooding",
                 msa_scale: float = 1.0, msa_offset: float = 0.0):
    """Run the VMEM-resident QC BP kernel.

    llr  : [B, Nb*Z] channel LLRs (clipped by the caller)
    meta : (Z, Nb, rows) with rows = ((j, s), ...) per check block row.
    Returns (dec int8 [B, Nb*Z], out_llr [B, Nb*Z]).

    Raises ValueError for codes whose VMEM footprint exceeds the budget
    (the batch lane axis pads to 128, so there is no smaller-chunk
    escape — DVB-S2-scale codes must use the XLA core, which also has
    the layered schedule).
    """
    Z, Nb, rows = meta
    B, n = llr.shape
    n_blocks_nz = sum(len(r) for r in rows)
    per_lane = vmem_bytes_per_lane(n, Z, n_blocks_nz)
    BC = 128
    if BC * per_lane > _VMEM_BUDGET:
        raise ValueError(
            f"QC code too large for the VMEM-resident kernel "
            f"(~{BC * per_lane / 1e6:.0f} MB at {BC} lanes); "
            f"use backend='xla'"
        )
    x = jnp.transpose(llr)  # [n, B] batch-last
    n_chunks = -(-B // BC)
    Bp = n_chunks * BC
    if Bp != B:
        x = jnp.pad(x, ((0, 0), (0, Bp - B)))

    kernel = partial(_qc_bp_kernel, Z=Z, Nb=Nb, rows=rows,
                     algorithm=algorithm, n_iters=int(n_iters),
                     schedule=schedule, msa_scale=msa_scale,
                     msa_offset=msa_offset)
    interpret = jax.default_backend() not in ("tpu", "axon")
    dec, out_llr = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((n, BC), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((n, BC), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, BC), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, Bp), jnp.int8),
            jax.ShapeDtypeStruct((n, Bp), jnp.float32),
        ],
        interpret=interpret,
    )(x)
    return (jnp.transpose(dec[:, :B]),
            jnp.transpose(out_llr[:, :B]))


# --------------------------------------------------------------------------
# HBM-streamed variant: production-largest codes (DVB-S2 n=16200+)
# --------------------------------------------------------------------------

_LANE_Q = 128


def streamed_vmem_bytes(n: int, Z: int, k_max: int) -> int:
    """VMEM footprint of the streamed kernel at the 128-lane chunk.

    Resident: the running totals [n, 128] f32.  Streamed per check
    block row: double-buffered read and write c2v buffers of the
    largest row ([2, k_max*Z, 128] f32 each).  The c2v store itself
    ([nnz*Z, 128] f32) lives in HBM; a small headroom term covers
    register spill.
    """
    return 4 * n * _LANE_Q + 4 * 4 * k_max * Z * _LANE_Q + 4 * Z * _LANE_Q


def _qc_bp_streamed_kernel(llr_hbm, stats_ref, out_llr_hbm, c2v_hbm,
                           tot_ref, rd2_ref, wr2_ref, rdf_ref, wrf_ref,
                           in_sem, out_sem, rd_sems, wr_sems, *,
                           Z: int, Nb: int, rows,
                           algorithm: str, n_iters: int,
                           msa_scale: float, msa_offset: float,
                           pos_masks=()):
    """One lane chunk's full LAYERED BP decode, c2v streamed from HBM.

    The VMEM-resident kernel holds every c2v message tile on-chip,
    which caps it at ~n=2000 codes (the batch lane axis pads to 128).
    This variant keeps only the running totals resident and streams
    each check block row's c2v tiles HBM->VMEM->HBM as the layered
    sweep visits it — the schedule is already row-sequential, so the
    row's working set IS the natural streaming unit.  HBM traffic per
    iteration: 2 x nnz x Z x 128 x 4 bytes (read + write the c2v
    store once), vs the XLA layered core's several full edge-tensor
    sweeps per row update chain.

    llr_hbm     : [n, Bp] channel LLRs (HBM, chunk sliced by DMA)
    stats_ref   : [8, 128] (out, VMEM) row 0 = 1.0 where the lane is
                  still unconverged, row 1 = iterations run.  Doubles
                  as the required small VMEM-blocked leading output:
                  with every output unblocked in HBM, XLA stack-
                  allocates the first custom-call result in VMEM and
                  OOMs at these sizes.
    out_llr_hbm : [n, Bp] (out) posterior LLRs — the hard decisions are
                  exactly ``signbit(out_llr)`` (decisions and totals
                  latch together), so no separate decision output
    c2v_hbm     : [nnz*Z, 128] c2v workspace (HBM, reused per chunk —
                  the TPU grid is sequential); f32, or bf16 when
                  ``msg_io='bf16'`` (halves the kernel's dominant HBM
                  stream — roofline: 63% of HBM at DVB-S2 size)
    tot_ref     : [n, 128] running totals (VMEM scratch, always f32)
    rd2/wr2_ref : [2, k_max*Z, 128] double-buffered row streaming
                  buffers (VMEM, same dtype as c2v_hbm): row ri+1's
                  c2v fetch overlaps row ri's compute, and write-backs
                  drain two rows behind
    rdf/wrf_ref : [k_max*Z, 128] f32 staging blocks for the bf16 mode:
                  Z=360 is not 16-row aligned, so slicing a packed
                  16-bit VMEM block at k*Z would hit the Mosaic
                  sublane-alignment wall (ROADMAP quirk; same fix as
                  kernels/bcjr.py) — each row's messages are upcast
                  once per FULL block (static copy), sliced in f32,
                  and downcast once on the way out.  (8, 128) dummies
                  in f32 mode.
    """
    BC = _LANE_Q
    i = pl.program_id(0)
    cn_update = _make_cn_update(algorithm, msa_scale, msa_offset)

    e_off = [0]
    for r in rows:
        e_off.append(e_off[-1] + len(r))

    # per-position edge masks: (ri, k) -> [Z, 1] f32 tile, 0.0 at
    # check positions where the circulant block is missing an edge
    # (DVB-S2 bit-accumulator wrap).  A masked position's v2c is forced
    # hugely positive (neutral in both SPA's tanh-product and MSA's
    # sign x min) and its c2v / syndrome contribution to zero.  Built
    # from iota in-kernel: Pallas kernels cannot capture array
    # constants.
    emask = {}
    for (ri, k, excluded) in pos_masks:
        pos = jax.lax.broadcasted_iota(jnp.int32, (Z, 1), 0)
        keep = None
        for pexc in excluded:
            c = pos != pexc
            keep = c if keep is None else jnp.logical_and(keep, c)
        emask[(ri, k)] = keep.astype(jnp.float32)

    cp = pltpu.make_async_copy(
        llr_hbm.at[:, pl.ds(i * BC, BC)], tot_ref, in_sem)
    cp.start()
    cp.wait()

    def tcol(j):
        return tot_ref[j * Z:(j + 1) * Z, :]

    def rollz(x, s):
        s = s % Z
        return pltpu.roll(x, s, axis=0) if s else x

    def synd_bad():
        # [1, BC] 1.0 where ANY check fails, from current totals;
        # decisions materialized once per column, not per edge
        dec_cols = [
            jnp.signbit(tcol(j)).astype(jnp.float32) for j in range(Nb)
        ]
        bad = jnp.zeros((1, BC), jnp.float32)
        for ri, r in enumerate(rows):
            par = jnp.zeros((Z, BC), jnp.float32)
            for k, (j, s) in enumerate(r):
                contrib = rollz(dec_cols[j], Z - s)
                if (ri, k) in emask:
                    contrib = contrib * emask[(ri, k)]
                par = par + contrib
            odd = jnp.max(jnp.mod(par, 2.0), axis=0, keepdims=True)
            bad = jnp.maximum(bad, odd)
        return bad

    def rd_cp(ri):
        # identical (src, dst, sem) triples reconstruct the same copy
        # for start/wait pairing
        K = len(rows[ri])
        return pltpu.make_async_copy(
            c2v_hbm.at[pl.ds(e_off[ri] * Z, K * Z)],
            rd2_ref.at[ri % 2, pl.ds(0, K * Z)], rd_sems.at[ri % 2])

    def wr_cp(ri):
        K = len(rows[ri])
        return pltpu.make_async_copy(
            wr2_ref.at[ri % 2, pl.ds(0, K * Z)],
            c2v_hbm.at[pl.ds(e_off[ri] * Z, K * Z)], wr_sems.at[ri % 2])

    n_rows = len(rows)

    def sweep(it, act):
        # one layered iteration: totals update after EVERY row; frozen
        # lanes (act == 0) write their old messages back -> zero delta,
        # so their totals (and therefore decisions) latch exactly like
        # the XLA layered core (ops/qcldpc.py body_layered).
        # DMA pipeline: row ri+1's c2v fetch runs under row ri's
        # compute; write-backs wait two rows later (disjoint edge
        # regions make in-flight read/write overlap safe, and the tail
        # waits below mean every write has landed by sweep end).
        bf16 = rd2_ref.dtype == jnp.bfloat16
        rd_cp(0).start()
        for ri, r in enumerate(rows):
            rd_cp(ri).wait()
            if ri + 1 < n_rows:
                rd_cp(ri + 1).start()
            slot = ri % 2
            if bf16:
                # full-block upcast once per row: k*Z slices of a
                # packed 16-bit block are not 16-row aligned (Z=360)
                rdf_ref[...] = rd2_ref[slot].astype(jnp.float32)

            def rd_k(k):
                return (rdf_ref[k * Z:(k + 1) * Z, :] if bf16
                        else rd2_ref[slot, k * Z:(k + 1) * Z, :])

            old, v2c_row = [], []
            for k, (j, s) in enumerate(r):
                c_old = jnp.where(it == 0, 0.0, rd_k(k))
                old.append(c_old)
                v2c = rollz(tcol(j), Z - s) - c_old
                if (ri, k) in emask:
                    v2c = jnp.where(emask[(ri, k)] > 0.5, v2c, 1e30)
                v2c_row.append(v2c)
            new_row = cn_update(v2c_row)
            if ri >= 2:
                wr_cp(ri - 2).wait()
            for k, (j, s) in enumerate(r):
                nc = jnp.where(act > 0.5, new_row[k], old[k])
                if (ri, k) in emask:
                    nc = nc * emask[(ri, k)]
                if bf16:
                    # quantize BEFORE the totals update so the stored
                    # message and the totals stay exactly consistent
                    # (the next iteration's leave-one-out subtracts the
                    # STORED value)
                    nc = nc.astype(jnp.bfloat16).astype(jnp.float32)
                tot_ref[j * Z:(j + 1) * Z, :] = tcol(j) + rollz(
                    nc - old[k], s)
                if bf16:
                    wrf_ref[k * Z:(k + 1) * Z, :] = nc
                else:
                    wr2_ref[slot, k * Z:(k + 1) * Z, :] = nc
            if bf16:
                wr2_ref[slot] = wrf_ref[...].astype(jnp.bfloat16)
            wr_cp(ri).start()
        if n_rows >= 2:
            wr_cp(n_rows - 2).wait()
        wr_cp(n_rows - 1).wait()
        return jnp.minimum(act, synd_bad())

    def going(carry):
        it, act = carry
        return jnp.logical_and(it < n_iters, jnp.max(act) > 0.5)

    def step(carry):
        it, act = carry
        return it + 1, sweep(it, act)

    it_fin, act_fin = jax.lax.while_loop(going, step, (0, synd_bad()))

    zeros6 = jnp.zeros((6, BC), jnp.float32)
    stats_ref[...] = jnp.concatenate(
        [act_fin, jnp.full((1, BC), it_fin, jnp.float32), zeros6], axis=0)
    cp2 = pltpu.make_async_copy(
        tot_ref, out_llr_hbm.at[:, pl.ds(i * BC, BC)], out_sem)
    cp2.start()
    cp2.wait()


@partial(jax.jit, static_argnames=("algorithm", "n_iters", "meta",
                                   "msa_scale", "msa_offset",
                                   "pos_masks", "msg_io"))
def qc_bp_pallas_streamed(llr, algorithm: str, n_iters: int, meta,
                          msa_scale: float = 1.0, msa_offset: float = 0.0,
                          pos_masks=(), msg_io: str = "f32"):
    """Run the HBM-streamed layered QC BP kernel (large codes).

    Same contract as :func:`qc_bp_pallas` with ``schedule="layered"``;
    use for codes whose c2v store exceeds the VMEM-resident kernel's
    budget (DVB-S2 n=16200 class).  Raises ValueError when even the
    totals-resident footprint does not fit (n=64800 class -> XLA core).

    msg_io='bf16' stores the streamed c2v messages bfloat16 in HBM,
    halving the kernel's dominant traffic (roofline: 63% of HBM peak at
    DVB-S2 size).  Messages are quantized to 8-bit mantissa at every
    store (totals stay f32 and exactly consistent with the stored
    values); decisions can differ from the f32 path near ties but BER
    parity holds at the tested operating points (test_qcldpc.py) —
    hardware LDPC decoders run 4-6 bit messages.
    """
    Z, Nb, rows = meta
    B, n = llr.shape
    BC = _LANE_Q
    k_max = max(len(r) for r in rows)
    nnz = sum(len(r) for r in rows)
    # + one [n, 128] f32 for the llr/posterior pair XLA may promote
    need = streamed_vmem_bytes(n, Z, k_max) + 4 * n * _LANE_Q
    if need > _STREAMED_VMEM_LIMIT:
        raise ValueError(
            f"QC code too large even for the streamed kernel "
            f"(~{need / 1e6:.0f} MB of VMEM totals at {BC} lanes); "
            f"use backend='xla'"
        )
    x = jnp.transpose(llr)  # [n, B] batch-last
    n_chunks = -(-B // BC)
    Bp = n_chunks * BC
    if Bp != B:
        x = jnp.pad(x, ((0, 0), (0, Bp - B)))

    if msg_io not in ("f32", "bf16"):
        raise ValueError('msg_io must be "f32" or "bf16"')
    mdt = jnp.bfloat16 if msg_io == "bf16" else jnp.float32
    stage_shape = (k_max * Z, _LANE_Q) if msg_io == "bf16" else (8, 128)
    kernel = partial(_qc_bp_streamed_kernel, Z=Z, Nb=Nb, rows=rows,
                     algorithm=algorithm, n_iters=int(n_iters),
                     msa_scale=msa_scale, msa_offset=msa_offset,
                     pos_masks=pos_masks)
    interpret = jax.default_backend() not in ("tpu", "axon")
    # pl.ANY lets the compiler place small arrays in VMEM — at these
    # sizes that blows the scoped budget, so pin everything to HBM
    # (interpret mode only accepts ANY)
    space = pl.ANY if interpret else pltpu.MemorySpace.HBM
    _, out_llr, _ = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(memory_space=space)],
        out_specs=[
            pl.BlockSpec((8, BC), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=space),
            pl.BlockSpec(memory_space=space),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, Bp), jnp.float32),
            jax.ShapeDtypeStruct((n, Bp), jnp.float32),
            jax.ShapeDtypeStruct((nnz * Z, BC), mdt),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, BC), jnp.float32),
            pltpu.VMEM((2, k_max * Z, BC), mdt),
            pltpu.VMEM((2, k_max * Z, BC), mdt),
            pltpu.VMEM(stage_shape, jnp.float32),
            pltpu.VMEM(stage_shape, jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # alias llr -> out_llr: each chunk's input columns are DMA'd
        # into tot before that chunk writes its output columns, and
        # chunks are sequential.
        input_output_aliases={0: 1},
        # XLA's scoped-memory pass may promote the (aliased) llr/out
        # pair into VMEM when it fits ([n,128] f32 = 8.3 MB at
        # n=16200); that rides the same 16 MB scoped stack as the
        # kernel's scratch and OOMs the compile.  Raise this call's
        # scoped limit (v5e has 128 MB of VMEM) instead of fighting
        # the promotion.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=need + 16_000_000,
        ),
        interpret=interpret,
    )(x)
    out_llr = jnp.transpose(out_llr[:, :B])
    # decisions and totals latch together in the layered core, so the
    # hard word is exactly the sign of the posterior (ldpc.py:250-254)
    return jnp.signbit(out_llr).astype(jnp.int8), out_llr
