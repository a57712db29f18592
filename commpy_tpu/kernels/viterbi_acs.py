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
* branch decisions are **bit-packed 32 states per int32 in-kernel** (a
  powers-of-two matmul over the state axis packs 16, then adjacent words
  pair with a shift-or), cutting decision-tensor HBM traffic 32x
  (binary codes have one decision bit per state);
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

# MXU precision for the in-kernel matmuls.  DEFAULT rounds operands to
# bf16 per MXU pass — exactly as XLA lowers the device core's einsums,
# so Pallas-DEFAULT and device-XLA decisions agree bit-for-bit; both
# deviate from the CPU/f32 ground truth on REAL-VALUED metrics
# (soft/unquantized: ~0.02% of decided bits flip near ACS ties, BER
# delta ~3e-5 — benchmarks/device_probes/viterbi_exact.jsonl).
# Hard-decision metrics are small integers (branch vectors +-1, Hamming
# path metrics with spread <= n * total_memory after per-step renorm),
# all exactly representable in bf16, so the hard path is bit-identical
# to CPU at DEFAULT (device-verified).  DEFAULT is the throughput
# configuration; exact=True restores CPU/f32 bit-identity for the soft
# paths via the 3-pass bf16 operand split (`_dot_split3`) riding the
# fused stacked-matmul step — r4 device-verified 0/65536 mismatches at
# ~1.5x e2e decode cost (1.05 vs 1.59 Gbit/s same-run), 2.6x faster
# than exact='highest' / Precision.HIGHEST at ~4x;
# benchmarks/device_probes/viterbi_exact.jsonl).
_DOT_PRECISION = jax.lax.Precision.DEFAULT


def _dot(a, b, precision=_DOT_PRECISION):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )


def _dot_split3(a, b):
    """f32-exact ``a @ b`` in 3 DEFAULT-precision MXU passes.

    Valid when ``a`` is bf16-exact (one-hot permutations, ±1/±2 branch
    vectors — every matrix this kernel multiplies by).  ``b`` is split
    into three bf16-exact terms covering its 24 mantissa bits
    (b1 top 8, b2 next 8, b3 rest); each pass then computes exact
    products with f32 accumulation, and the three partials add back
    without rounding for one-hot ``a`` (disjoint mantissa parts of one
    f32 value).  Compare Precision.HIGHEST, which splits BOTH operands
    (6 passes) because it cannot know ``a`` is exact.
    """
    b1 = b.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = b - b1
    b2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
    b3 = r1 - b2
    return _dot(a, b1) + (_dot(a, b2) + _dot(a, b3))

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
        if prec == "split":
            permuted = _dot_split3(Q_ref[:, :], pm)  # [2S, B]
            bm = _dot_split3(C_ref[:, :], r_t)  # [2S, B]
        else:
            permuted = _dot(Q_ref[:, :], pm, prec)  # [2S, B]
            bm = _dot(C_ref[:, :], r_t, prec)  # [2S, B]
        cand = permuted + bm
        # binary branch decision (I == 2), first-index tie-break
        take = cand[S:, :] < cand[:S, :]
        new_pm = jnp.where(take, cand[S:, :], cand[:S, :])
        # pack decision bits over the state (sublane) axis: [G,S]@[S,B]
        packed = _dot(W_ref[:, :], take.astype(jnp.float32)).astype(jnp.int32)  # [G, B]
        # pair 16-bit packs into int32 words (static row slices): halves
        # the decision tensor's HBM traffic and the traceback's VMEM set
        G = packed.shape[0]
        if G > 1:
            packed = jnp.concatenate(
                [packed[2 * g:2 * g + 1] | (packed[2 * g + 1:2 * g + 2]
                                            << 16)
                 if 2 * g + 1 < G else packed[2 * g:2 * g + 1]
                 for g in range((G + 1) // 2)], axis=0)
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


def _acs_kernel_fused(r_ref, QC_ref, W_ref, dec_ref, best_ref, pm_ref, *,
                      n_steps: int, S: int, split: bool = False):
    """ACS chunk with ONE stacked matmul per step.

    The per-step ``Q @ pm`` (predecessor permutation) and ``C @ r_t``
    (branch metrics) of :func:`_acs_kernel` are independent MXU ops but
    sit back-to-back in the dependent chain; stacking them as
    ``[Q | C] @ [pm ; r_t]`` ([2S, S+n] @ [S+n, B]) issues a single MXU
    op per trellis step — the contraction grows S -> S+n, which stays
    inside the same 128-wide MXU tile for every supported code.

    Numerics: the combined pass accumulates the permutation and branch
    products in one f32 systolic sum instead of two sums added on the
    VPU — a different rounding grouping in principle, but measured
    bit-identical to the two-matmul kernel on device (0 mismatches over
    134M decision bits at the K=7 bench shape, scripts/acs_fused_ab.py;
    plus interpret-mode equality on CPU), so it is the DEFAULT at
    B >= 2048 where it wins 1.62x.  If a future code/shape shows a
    deviation, pass ``fuse_bm=False`` (or use ``exact=``) — identity of
    the two-matmul form is by construction per pass.
    """
    QC = QC_ref[:, :]  # [2S, S + n]
    # pm_ref is [S + n, B]: rows [0:S] carry the path metrics across
    # steps, rows [S:] stage the current r_t — so the stacked operand
    # is read straight from scratch, no per-step concat (the concat
    # relayout is what made the fused form LOSE at small B).
    @pl.when(pl.program_id(0) == 0)
    def _():
        B = pm_ref.shape[1]
        row = jax.lax.broadcasted_iota(jnp.int32, (S, B), 0)
        pm_ref[0:S, :] = jnp.where(row == 0, 0.0, 1e30)

    def step(t, _):
        pm_ref[S:, :] = r_ref[t, :, :]  # stage r_t rows
        if split:
            # exact='split' on the STACKED operand: 3 DEFAULT passes
            # reconstruct the f32 products of the whole [pm; r_t]
            # operand at once (QC is bf16-exact), vs 6 passes for the
            # two-matmul split form — identity re-proved on device
            # (scripts/viterbi_exact_ab.py)
            cand = _dot_split3(QC, pm_ref[:, :])  # [2S, B]
        else:
            cand = _dot(QC, pm_ref[:, :])  # [2S, B]
        take = cand[S:, :] < cand[:S, :]
        new_pm = jnp.where(take, cand[S:, :], cand[:S, :])
        packed = _dot(W_ref[:, :], take.astype(jnp.float32)).astype(jnp.int32)
        G = packed.shape[0]
        if G > 1:
            packed = jnp.concatenate(
                [packed[2 * g:2 * g + 1] | (packed[2 * g + 1:2 * g + 2]
                                            << 16)
                 if 2 * g + 1 < G else packed[2 * g:2 * g + 1]
                 for g in range((G + 1) // 2)], axis=0)
        m = jnp.min(new_pm, axis=0, keepdims=True)
        row = jax.lax.broadcasted_iota(jnp.int32, new_pm.shape, 0)
        best = jnp.min(jnp.where(new_pm == m, row, S), axis=0)
        dec_ref[t, :, :] = packed
        best_ref[t, :] = best.astype(jnp.int32)
        pm_ref[0:S, :] = new_pm - m
        return 0

    jax.lax.fori_loop(0, n_steps, step, 0)


@partial(jax.jit,
         static_argnames=("trellis", "decoding_type", "time_chunk",
                          "layout", "exact", "fuse_bm"))
def acs_forward_pallas(r, trellis: Trellis, decoding_type: str = "soft",
                       time_chunk: int = 512,
                       layout: str = "btg", exact: bool = False,
                       fuse_bm=None):
    """Run the fused ACS forward pass.

    r : ``[B, T, n]`` float32 received codewords (already clipped/padded).
    layout : 'btg' returns dec_packed ``[B, T, G]``; 'gmaj' returns it
        ``[G, B, T]`` (the layout ``traceback_pallas`` consumes), saving
        one full HBM transpose of the decision tensor in the decode path.
    exact : make ACS decisions match the CPU/f32 ground truth
        bit-for-bit (DEFAULT rounds operands to bf16 per MXU pass —
        identically to the device XLA core, which Pallas-DEFAULT matches
        exactly; real-valued soft/unquantized metrics flip ~0.02% of
        near-tie decisions vs CPU, hard-path integer operands are
        bf16-exact at any setting).  ``True``/``'split'`` uses the
        3-pass bf16 operand split (`_dot_split3`) riding the fused
        stacked-matmul step (~1.5x e2e decode cost); ``'highest'`` uses
        Precision.HIGHEST on the two-matmul kernel (~4x e2e).  All r4
        device-verified, 0/65536 mismatches per configuration:
        scripts/viterbi_exact_ab.py,
        benchmarks/device_probes/viterbi_exact.jsonl.

    A radix-2 variant (two trellis steps fused per kernel iteration) was
    built and removed: it was bit-exact in interpret mode but misdecoded
    at S >= 64 on the real Mosaic compiler, and with the traceback kernel
    in place the forward pass is only ~27% of decode wall clock, so its
    best case was a ~13% end-to-end win — not worth shipping a
    device-broken option (r2 review item 5; see git history).
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
    G = (W.shape[0] + 1) // 2  # int32 words out (16-bit packs paired)

    # The kernels assume the binary shift-trellis predecessor closed
    # form (prev(s, j) = ((s & (S/2-1)) << 1) | j, see _perm_matrices /
    # _perm_matrices); reject other predecessor layouts loudly instead
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
    G_est = G
    step_bytes = 2 * 4 * B * (n + G_est + 1)  # double-buffered
    tc_cap = max(32, ((14 * 1024 * 1024) // max(step_bytes, 1)) // 8 * 8)
    TC = min(time_chunk, T, tc_cap)
    n_chunks = -(-T // TC)
    T_pad = n_chunks * TC
    if T_pad != T:
        # zero-pad: padded steps produce decisions no traceback window
        # ever consumes (emissions stop at t = T-1)
        r = jnp.pad(r, ((0, 0), (0, T_pad - T), (0, 0)))
    r_tl = jnp.transpose(r, (1, 2, 0))  # [T, n, B] batch-last

    # Interpret mode off-TPU so tests run on the CPU backend unchanged.
    interpret = jax.default_backend() not in ("tpu", "axon")

    C = _branch_vectors(trellis, decoding_type)  # [S*I, n] rows s*2+j
    if decoding_type == "hard":
        C = np.concatenate([C, _hard_const(trellis)[:, None]], axis=1)
    C = C.reshape(S, I, -1).transpose(1, 0, 2).reshape(I * S, -1)
    Q = _perm_matrices(trellis.pred_state_table).reshape(I * S, S)
    if exact is True:
        exact = "split"
    if exact not in (False, "split", "highest"):
        raise ValueError(
            f"exact must be False, True, 'split', or 'highest' "
            f"(got {exact!r})"
        )
    if fuse_bm is None:
        # Default since r4 (device A/B, float-sync timed): with r_t
        # STAGED into scratch rows [S:] instead of a per-step concat
        # (the concat relayout made the first fused form lose at small
        # B), the single stacked matmul wins at every batch size —
        # e2e decode 1.51x at B=256, 1.43x at B=2048 — and is measured
        # BIT-IDENTICAL to the two-matmul kernel on the real device
        # (0/134M decision bits; exact='split' through it stays 0/65536
        # vs CPU f32 — benchmarks/device_probes/).  In CPU INTERPRET
        # mode, though, XLA's different f32 regrouping can flip rare
        # near-ties vs the XLA core (~1 word in 25k observed), so the
        # default stays UNFUSED off-TPU to keep the deterministic CPU
        # parity tests exact; pass fuse_bm=True to exercise the fused
        # path in interpret mode.
        fuse_bm = exact in (False, "split") and not interpret
    if fuse_bm:
        if exact == "highest":
            raise ValueError(
                "fuse_bm composes with exact='split' or exact=False; "
                "Precision.HIGHEST keeps the two-matmul kernel"
            )
        QC = np.concatenate([Q, C], axis=1)  # [2S, S + n]
        kernel = partial(_acs_kernel_fused, n_steps=TC, S=S,
                         split=(exact == "split"))
        in_mats = [jnp.asarray(QC), jnp.asarray(W)]
        mat_specs = [
            pl.BlockSpec((I * S, S + n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W.shape[0], S), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        kernel = partial(
            _acs_kernel, n_steps=TC, S=S,
            prec=("split" if exact == "split"
                  else jax.lax.Precision.HIGHEST if exact == "highest"
                  else _DOT_PRECISION),
        )
        in_mats = [jnp.asarray(C), jnp.asarray(Q), jnp.asarray(W)]
        mat_specs = [
            pl.BlockSpec((I * S, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((I * S, S), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W.shape[0], S), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    r_steps = r_tl.astype(jnp.float32)
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
        # fused: rows [0:S] path metrics + rows [S:] staged r_t
        scratch_shapes=[pltpu.VMEM((S + n if fuse_bm else S, B),
                                   jnp.float32)],
        interpret=interpret,
    )(r_steps, *in_mats)

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
                      tb_depth: int):
    """Packed traceback, one batch chunk fully in VMEM.

    The XLA traceback (`ops/viterbi.py:_traceback_packed_structured`)
    rolls the whole [B, T, G] decision tensor through HBM once per
    depth step (~80 MB of traffic x tb_depth for the K=7 bench shape).
    Here the chunk's decisions stay resident in VMEM and every roll is
    an on-chip shift; the depth loop is unrolled (tb_depth is static),
    so all shifts and emission masks are compile-time constants.

    The walk exploits two shift-trellis identities (the kernel's
    existing precondition — the state update below is already the
    shift-register closed form):

    * the emitted input bit is the MSB of the current state,
      ``pred_input[s, j] == s >> (log2(S) - 1)`` for BOTH j — so the
      per-step pred-input word selects of the first version collapse
      to one shift (device-profiled: the traceback walk dominated the
      decode 1.3 ms : 1.15 ms against the ACS forward pass, and these
      selects were ~40% of its per-step ops);
    * decisions arrive packed 32 states per int32 word (paired inside
      the ACS kernel), halving the word-select chain, the per-step tile
      rolls, AND the decision tensor's HBM traffic.  Arithmetic >>
      keeps bit 31 extractable: ``(w >> pos) & 1`` reads the sign bit
      correctly.

    Same arithmetic, same tie-breaks, all-integer -> bit-identical to
    the XLA version by construction (tests decode through both).

    dec_ref  : [G, BC, T] int32 packed branch decisions (word-major so
               the 128-lane minor axis is T, not the tiny word count)
    best_ref : [BC, T] int32 per-step argmin states
    out_ref  : [BC, T] int8 decoded bits (int8: XLA likes to place the
               result in VMEM, and an int32 [B, T] word overflows the
               scoped limit at B >= 2048)
    """
    G32 = dec_ref.shape[0]
    BC = dec_ref.shape[1]
    half_mask = S // 2 - 1
    msb_shift = max(S.bit_length() - 2, 0)  # log2(S) - 1
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (BC, T), 1)

    rolled = [dec_ref[g] for g in range(G32)]
    cur = best_ref[:, :]
    out = jnp.zeros((BC, T), jnp.int32)

    last = max(tb_depth - 1, 1) - 1
    for d in range(last + 1):
        pos = cur & 31
        w = rolled[0]
        if G32 > 1:
            cur_g = cur >> 5
            for g in range(1, G32):
                w = jnp.where(cur_g == g, rolled[g], w)
        j = (w >> pos) & 1
        inp = cur >> msb_shift  # pred_input[s, *] == MSB(s), shift trellis
        cur = ((cur & half_mask) << 1) | j
        if d < last:
            # Non-final depth steps emit exactly ONE position,
            # t = T-1-d, and its bit comes from the walk that started
            # at the LAST column (t + d = T-1) — so instead of rolling
            # the whole [BC, T] tile by -d to line it up (a full lane
            # rotation per step, the single most expensive op of the
            # original walk), broadcast the static last column and mask
            # in the single static position.
            inp_last = jnp.broadcast_to(inp[:, T - 1:T], (BC, T))
            out = jnp.where(t_iota == T - 1 - d, inp_last, out)
            rolled = [pltpu.roll(x, 1, axis=1) for x in rolled]
        else:
            # Final step emits every remaining position t <= T-1-d from
            # the walk that started at t + d: one roll total.
            inp_pos = pltpu.roll(inp, (T - d) % T, axis=1) if d else inp
            out = jnp.where(t_iota <= T - 1 - d, inp_pos, out)
    out_ref[:, :] = out.astype(jnp.int8)


def _traceback_batch_cap(T: int, G: int) -> int:
    """Largest 32-multiple batch chunk that fits the traceback kernel
    in scoped VMEM at time length ``T`` with ``G`` decision words.

    Footprint model (Mosaic stack allocator, measured): 136.5 bytes per
    (BC, T) element at G=2 — 17.98 MB at T=1029 BC=128, a scoped-vmem
    OOM against the 16 MB limit caught on device at the K=7 B=2048
    bench shape.  The G-scaling term covers BOTH the double-buffered
    decision blocks (8G bytes/elem) and the unrolled walk's live
    ``rolled`` list + pltpu.roll temporaries (up to ~8G more): modelled
    at 16G bytes/elem total (ADVICE r3 — the 8G slope was extrapolated
    from the single G=2 point and undershoots for G >= 8).  Plus a pad
    to 136 for allocator variance; budget 13 MB for headroom.

    Returns 0 when even BC=32 does not fit (caller must fall back to
    the XLA traceback).
    """
    return (13_000_000 // (T * (16 * G + 136))) // 32 * 32


@partial(jax.jit, static_argnames=("S", "tb_depth", "layout"))
def traceback_pallas(dec_packed, best_state, S: int, tb_depth: int,
                     batch_chunk: int = 128,
                     layout: str = "btg"):
    """Run the packed traceback kernel (shift-structured trellises).

    dec_packed : [B, T, G] int32 (from `acs_forward_pallas`), or
                 [G, B, T] when ``layout='gmaj'`` (no transpose needed)
    best_state : [B, T] int32
    Returns decoded bits [B, T] int8.
    """
    if layout == "gmaj":
        G, B, T = dec_packed.shape
    else:
        B, T, G = dec_packed.shape
    cap = _traceback_batch_cap(T, G)
    if cap < 32 and jax.default_backend() in ("tpu", "axon"):
        # The smallest tileable chunk (BC=32) would exceed scoped VMEM
        # on device; don't rely on a floor that OOMs at compile time.
        # Callers (ops/viterbi.py auto-resolution) check the same cap
        # and route to the XLA traceback instead of reaching here.
        raise ValueError(
            f"traceback_pallas: T={T}, G={G} exceeds the 16 MB scoped-"
            "VMEM budget even at the minimum batch chunk (32); use "
            "backend='xla' (ops/viterbi._traceback_packed_structured)"
        )
    BC = min(batch_chunk, max(32, cap), -(-B // 32) * 32)
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

    kernel = partial(_traceback_kernel, T=T, S=S, tb_depth=int(tb_depth))
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
