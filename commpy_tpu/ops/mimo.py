"""MIMO detection: ML, K-best sphere decoding, best-first tree search.

TPU-native redesign of reference commpy/modulation.py:299-646:

* ``mimo_ml`` — the reference's repeat/tile candidate grid (modulation.py:
  316-319) becomes an index-arithmetic grid and ONE batched matmul + argmin;
* ``kbest`` — Schnorr-Euchner K-best (modulation.py:325-419) with the
  per-level candidate counts resolved statically (nb_can = min(K, m^level)),
  so every level is a fixed-shape expand -> score -> stable-argsort ->
  gather; vmapped over received vectors — this is the TPU path that
  replaces the reference's per-vector Python loop in links.py:320-326;
* ``best_first_detector`` / ``best_first_device`` — the priority-stack
  tree search (modulation.py:422-565) as a statistics-faithful host
  search plus a batched fixed-budget device variant (per-level beam
  widths + counter-hypothesis LLRs) that runs inside jit;
* ``max_log_approx`` / ``bit_lvl_repr`` — vectorized.
"""
from __future__ import annotations

from bisect import insort

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bits import unpack_bits

__all__ = [
    "mimo_ml",
    "mimo_ml_device",
    "kbest",
    "kbest_device",
    "best_first_detector",
    "best_first_device",
    "bit_lvl_repr",
    "max_log_approx",
    "max_log_approx_device",
]


# --------------------------------------------------------------------------
# ML detection
# --------------------------------------------------------------------------

def _candidate_grid(constellation, n):
    """[n, m^n] grid in the reference's repeat/tile order."""
    m = len(constellation)
    M = m ** n
    j = np.arange(M)
    idx = np.stack(
        [(j // m ** (n - 1 - i)) % m for i in range(n)], axis=0
    )  # [n, M]
    return np.asarray(constellation)[idx], idx


def mimo_ml_device(y, h, constellation):
    """Batched exhaustive ML detection.

    y: ``[..., nr]``; h: ``[..., nr, nt]``. Returns symbols ``[..., nt]``.
    """
    y = jnp.asarray(y)
    h = jnp.asarray(h)
    nt = h.shape[-1]
    grid, _ = _candidate_grid(constellation, nt)
    grid = jnp.asarray(grid)  # [nt, M]
    hx = jnp.einsum("...rt,tm->...rm", h, grid)
    d = y[..., None] - hx
    score = jnp.sum(d.real**2 + d.imag**2, axis=-2)  # [..., M]
    best = jnp.argmin(score, axis=-1)
    return jnp.moveaxis(grid[:, best], 0, -1)


def mimo_ml(y, h, constellation):
    """Reference-compatible single-vector ML detection (modulation.py:299)."""
    return np.asarray(
        mimo_ml_device(
            np.asarray(y), np.asarray(h), np.asarray(constellation)
        )
    )


# --------------------------------------------------------------------------
# K-best Schnorr-Euchner
# --------------------------------------------------------------------------

def kbest_device(y, h, constellation, K: int, noise_var=0.0,
                 output_type="hard", bits_per_symbol=None,
                 selection: str = "exact", a_priori=None,
                 llr_clip=None):
    """Batched K-best detection.

    y: ``[B, nr]``, h: ``[B, nr, nt]``.
    hard -> symbols ``[B, nt]``; soft -> LLRs ``[B, nt*bits_per_symbol]``.
    ``selection='approx'`` swaps the exact per-level ``lax.top_k``
    survivor sort for the TPU-native approximate top-k — much cheaper
    than the full sort the exact path pays, at a small survivor-recall
    loss (BER-level impact bounded in tests; reference parity requires
    'exact', the default).

    ``a_priori`` (soft only): ``[B, nt*bits_per_symbol]`` prior LLRs
    (positive <-> bit 0, the detector's own output convention — the
    shape the reference IDD loop feeds its detector,
    commpy/links.py:396-404).  The max-log MAP candidate metric gains
    the prior term: ``|y - Hx|^2 - N0 * sum_j (1-2 b_j(x)) * La_j``
    (i.e. ``2*N0*(-log p(y|x) - log P(x))`` up to a candidate-independent
    constant), applied DURING the tree search so priors also steer
    survivor selection; the returned LLRs are posteriors, which is what
    the IDD extrinsic exchange expects.

    ``llr_clip`` (soft only): clip the output LLRs to ``+-llr_clip``.
    Max-log LLRs are ``+-inf`` whenever every survivor agrees on a bit;
    an IDD extrinsic subtraction on an infinite LLR produces
    inf/NaN poison, so the loop needs finite outputs — the reference's
    detectors clip at ``llr_max=500`` for the same reason
    (commpy/modulation.py:558).
    """
    if selection not in ("exact", "approx"):
        raise ValueError(
            f"selection must be 'exact' or 'approx' (got {selection!r})"
        )
    y = jnp.asarray(y)
    h = jnp.asarray(h)
    constellation = jnp.asarray(constellation)
    nt = h.shape[-1]
    level_bias = None
    if a_priori is not None:
        if output_type != "soft":
            raise ValueError("a_priori requires output_type='soft'")
        if bits_per_symbol is None:
            bits_per_symbol = int(np.log2(constellation.shape[0]))
        m = int(constellation.shape[0])
        # sgn[j, b] = 1 - 2*bit_b(j), MSB-first (matches _leaf_bits /
        # unpack_bits layout, so La's within-symbol bit order is the
        # same one the soft output uses).
        j_idx = np.arange(m)[:, None]
        b_idx = np.arange(bits_per_symbol)[None, :]
        sgn = 1.0 - 2.0 * ((j_idx >> (bits_per_symbol - 1 - b_idx)) & 1)
        la = jnp.asarray(a_priori, jnp.float32).reshape(
            y.shape[0], nt, bits_per_symbol)
        # bias[B, t, j] = -N0 * sum_b sgn[j, b] * La[B, t, b]
        level_bias = -jnp.float32(noise_var) * jnp.einsum(
            "jb,vtb->vtj", jnp.asarray(sgn, jnp.float32), la)
    X, mets, idx = _beam_search_batched(y, h, constellation,
                                        (int(K),) * nt,
                                        selection=selection,
                                        level_bias=level_bias)
    if output_type == "hard":
        return X[:, :, 0]
    elif output_type == "soft":
        if bits_per_symbol is None:
            bits_per_symbol = int(np.log2(constellation.shape[0]))
        llrs = _max_log_llrs_batched(idx, mets, bits_per_symbol,
                                     noise_var)
        if llr_clip is not None:
            llrs = jnp.clip(llrs, -float(llr_clip), float(llr_clip))
        return llrs
    raise ValueError('output_type must be "hard" or "soft"')


def _leaf_bits(sym_idx, bps: int):
    """[B, nt, W] indices -> [B, W, nt*bps] bits (reference bit layout)."""
    bits = unpack_bits(sym_idx, bps)  # [B, nt, W, bps]
    B, nt, W, _ = bits.shape
    return jnp.transpose(bits, (0, 2, 1, 3)).reshape(B, W, nt * bps)


def _max_log_llrs_batched(sym_idx, mets, bps: int, noise_var):
    """Batched max-log LLRs straight from the search leaves.

    Replaces the vmapped per-vector ``max_log_approx_device`` tail: the
    leaf metrics already ARE ``|y - H x|^2``, and the constellation
    indices rode the search, so this is pure elementwise/reduction work
    (reference semantics: modulation.py:599-646).
    """
    bits = _leaf_bits(sym_idx, bps)  # [B, W, nb]
    big = jnp.float32(np.inf)
    m = mets[:, :, None]
    n0 = jnp.min(jnp.where(bits == 0, m, big), axis=1)  # [B, nb]
    n1 = jnp.min(jnp.where(bits == 1, m, big), axis=1)
    return -(n0 - n1) / (2 * noise_var)


def kbest(y, h, constellation, K, noise_var=0, output_type="hard",
          demode=None):
    """Reference-compatible K-best (modulation.py:325-419)."""
    h = np.asarray(h)
    nb_tx, nb_rx = h.shape
    if nb_rx > nb_tx:
        raise ValueError("h has more columns than rows")
    constellation = np.asarray(constellation)
    if output_type == "hard":
        out = kbest_device(
            np.asarray(y)[None], h[None], constellation, int(K)
        )
        return np.asarray(out[0])
    elif output_type == "soft":
        bps = int(np.log2(len(constellation)))
        out = kbest_device(
            np.asarray(y)[None], h[None], constellation, int(K),
            noise_var, "soft", bps,
        )
        return np.asarray(out[0])
    raise ValueError('output_type must be "hard" or "soft"')


# --------------------------------------------------------------------------
# Max-log LLR from a candidate list
# --------------------------------------------------------------------------

def max_log_approx_device(y, h, noise_var, pts, constellation,
                          bits_per_symbol: int):
    """Max-log LLRs over a candidate list (modulation.py:599-646).

    y ``[nr]``, h ``[nr, nt]``, pts ``[nt, P]`` (candidates column-wise).
    Bits are recovered by nearest-constellation lookup (the candidates are
    exact constellation points, so this equals the reference's demode).
    Returns LLRs ``[nt * bits_per_symbol]``.
    """
    pts = jnp.asarray(pts)
    nt, P = pts.shape
    const = jnp.asarray(constellation)
    d = jnp.abs(pts[..., None] - const)  # [nt, P, m]
    sym_idx = jnp.argmin(d, axis=-1)  # [nt, P]
    bits = unpack_bits(sym_idx, bits_per_symbol)  # [nt, P, bps]
    bits = jnp.moveaxis(bits, 1, 0).reshape(P, nt * bits_per_symbol)

    res = y[:, None] - h @ pts  # [nr, P]
    norms = jnp.sum(res.real**2 + res.imag**2, axis=0)  # [P]

    big = jnp.float32(np.inf)
    n0 = jnp.where(bits.T == 0, norms[None, :], big)  # [nb, P]
    n1 = jnp.where(bits.T == 1, norms[None, :], big)
    llr = jnp.min(n0, axis=-1) - jnp.min(n1, axis=-1)
    return -llr / (2 * noise_var)


def max_log_approx(y, h, noise_var, pts_list, demode):
    """Reference-compatible max-log LLR (callback-based demode)."""
    pts_list = np.asarray(pts_list)
    nb_pts = pts_list.shape[1]
    bits = np.asarray(
        demode(pts_list.reshape(-1, order="F"))
    ).reshape(nb_pts, -1)
    nb_bits = bits.shape[1]
    y = np.asarray(y)
    h = np.asarray(h)
    res = y[:, None] - h.dot(pts_list)
    norms = (np.abs(res) ** 2).sum(0)
    LLR = np.empty(nb_bits)
    for k in range(nb_bits):
        n0 = norms[bits[:, k] == 0]
        n1 = norms[bits[:, k] == 1]
        LLR[k] = (n0.min() if n0.size else np.inf) - (
            n1.min() if n1.size else np.inf
        )
    return -LLR / (2 * noise_var)


def bit_lvl_repr(H, w):
    """Bit-level channel lift A = H (I kron w) (modulation.py:568-596)."""
    w = np.asarray(w)
    beta = len(w)
    if beta % 2 != 0:
        raise ValueError("Beta (length of w) must be even.")
    H = np.asarray(H)
    n = H.shape[1]
    return np.asarray(
        jnp.einsum(
            "rt,tb->rtb", jnp.asarray(H), jnp.ones((n, 1)) * jnp.asarray(w)
        ).reshape(H.shape[0], n * beta)
    )


# --------------------------------------------------------------------------
# Best-first tree search
# --------------------------------------------------------------------------
#
# The detector of reference modulation.py:422-565 (He/Zhang/Liang 2019) is
# a priority search over the QR-triangularized tree: per-level bounded
# stacks of partial hypotheses, a MAP hypothesis plus per-bit
# counter-hypothesis metrics (their clipped difference is the LLR), and a
# radius rule — eqs (14)-(16) of the paper — that discards any node whose
# partial metric can no longer improve a counter-hypothesis it could
# still reach.
#
# Two implementations:
# * ``best_first_detector`` — host search replicating the reference's
#   statistics (same stack discipline, radius rule, and counter-metric
#   updates), written around flat sorted sibling groups instead of the
#   reference's recursive node objects;
# * ``best_first_device`` — the TPU path: the dynamic stacks become
#   STATIC per-level beam widths (a fixed-budget search = K-best with
#   per-level limits), which batches over received vectors and runs
#   entirely inside jit.  Its counter-hypothesis metrics come only from
#   genuinely differing leaves (true max-log), so per-bit LLR magnitudes
#   EXCEED the host's (which also damps counters with every
#   non-improving leaf): measured at 18 dB, 4x4 16-QAM, beam 16 vs host
#   stacks (1,3,5): signs agree on 100% of confident bits, ~80% of
#   magnitudes are >= the host's, median ratio ~4x with a heavy upper
#   tail where the host damped a counter to near the MAP metric
#   (bounded in tests/test_mimo.py::test_best_first_device_llr_bound).
#   BER-level behavior is equivalent — the tier-3 acceptance curve
#   (tests/test_links.py::test_bestfirst_ldpc_mimo_reference_curve)
#   runs THIS device detector through the WiMAX LDPC link and matches
#   the reference curve.  Downstream decoders consuming these LLRs see
#   a scale, not a sign, difference; max-log magnitudes are the
#   textbook semantics.


def best_first_detector(y, h, constellation, stack_size, noise_var, demode,
                        llr_max):
    """Best-first MIMO soft detection (host).

    Parameters mirror reference modulation.py:422-457: ``stack_size`` is a
    tuple of per-level stack bounds (length: number of levels - 1),
    ``demode`` maps a symbol vector to its hard bits, ``llr_max`` clips the
    counter-hypothesis metrics.  ``noise_var`` is accepted for signature
    parity (the metric differences are returned unscaled, as in the
    reference).  Returns per-bit LLRs ``(map_metric - counter) * sign``.

    Sequential priority search -> host only; use ``best_first_device``
    (or ``kbest(..., 'soft')``) for the batched device path.
    """
    h = np.asarray(h)
    n_lvl = h.shape[0]
    const = np.asarray(constellation)
    m = const.size
    bps = int(np.log2(m))

    q, r = np.linalg.qr(h)
    yt = q.conj().T.dot(np.asarray(y))

    best_metric = np.inf
    best_bits = None  # MAP hypothesis bits in {-1, +1}, [n_lvl, bps]
    counter = np.full((n_lvl, bps), np.inf)

    # A *sibling group* is the metric-sorted family of children of one
    # parent: (parent_suffix, symbols_sorted [m], metrics_sorted [m]).
    # A node is (metric, group, rank); its suffix is its own symbol
    # prepended to the parent suffix (antenna order: current .. last).
    def child_group(suffix, base_metric):
        d = suffix.size + 1
        res = yt[-d]
        if d > 1:
            res = res - r[-d, -d + 1:].dot(suffix)
        mets = base_metric + np.abs(res - r[-d, -d] * const) ** 2
        order = np.argsort(mets)
        return (suffix, const[order], mets[order])

    def node_suffix(group, rank):
        return np.concatenate(([group[1][rank]], group[0]))

    def signed_bits(vec):
        b = np.asarray(demode(vec)).reshape(-1, bps)
        return np.where(b == 0, -1, b)

    met_key = lambda node: node[0]

    # stacks[i] holds nodes with n_lvl - i assigned symbols, ascending by
    # metric; stacks[0] collects leaves.
    stacks = [[] for _ in range(n_lvl)]
    root = child_group(np.empty(0, const.dtype), 0.0)
    stacks[-1].append((root[2][0], root, 0))

    while any(len(s) for s in stacks[1:]):
        # One sweep: pop the best node of each stack (leaf side first),
        # re-arm its next sibling, push its best child one level down.
        for lower in range(n_lvl - 1):
            src = lower + 1
            if not stacks[src]:
                continue
            met, group, rank = stacks[src].pop(0)
            vec = node_suffix(group, rank)

            if best_bits is None:
                radius = np.inf
            else:
                bits = signed_bits(vec)
                differ = best_bits[src:] != bits
                reachable = counter[src:][differ]
                radius = max(
                    counter[:src].max(),
                    reachable.max() if reachable.size else np.inf,
                )

            if rank + 1 < m and group[2][rank + 1] <= radius:
                insort(stacks[src], (group[2][rank + 1], group, rank + 1),
                       key=met_key)
            child = child_group(vec, met)
            if child[2][0] <= radius:
                insort(stacks[lower], (child[2][0], child, 0), key=met_key)

        # Leaf bookkeeping: a better leaf becomes the MAP hypothesis (the
        # old MAP metric damps every counter); a worse one only damps.
        if stacks[0]:
            met, group, rank = stacks[0][0]
            if met < best_metric:
                np.minimum(counter, best_metric, out=counter)
                best_metric = met
                best_bits = signed_bits(node_suffix(group, rank))
            else:
                np.minimum(counter, met, out=counter)
            np.clip(counter, best_metric - llr_max, best_metric + llr_max,
                    out=counter)

        stacks[0].clear()
        for lower in range(n_lvl - 1):
            del stacks[lower + 1][stack_size[lower]:]

    return ((best_metric - counter) * best_bits).reshape(-1)


def _chol_qr_batched(h, y):
    """Batched triangularization without linalg.qr.

    h ``[B, nr, nt]``, y ``[B, nr]`` -> (r ``[B, nt, nt]`` upper
    triangular, yt ``[B, nt]``) with ``|yt - r x|^2 = |Q^H y - R x|^2``
    up to a per-row unit phase (metric-invariant).

    ``jnp.linalg.qr`` under vmap lowers to a slow generic factorization
    on TPU; for the small static nt of MIMO detection the Cholesky route
    R^H R = H^H H, yt = R^{-H} H^H y unrolls into O(nt^3) fused
    elementwise ops over the batch — pure VPU work, no per-vector loop.
    """
    nt = h.shape[-1]
    G = jnp.einsum("bij,bik->bjk", h.conj(), h)
    z = jnp.einsum("bij,bi->bj", h.conj(), y)
    # Unrolled Cholesky G = L L^H (lower), Cholesky-Banachiewicz order.
    L = [[None] * nt for _ in range(nt)]
    for i in range(nt):
        s = G[:, i, i].real
        for k in range(i):
            s = s - (L[i][k] * L[i][k].conj()).real
        L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-30)).astype(h.dtype)
        for j in range(i + 1, nt):
            t = G[:, j, i]
            for k in range(i):
                t = t - L[j][k] * L[i][k].conj()
            L[j][i] = t / L[i][i]
    # Forward substitution L w = z  ->  w = yt.
    w = []
    for i in range(nt):
        t = z[:, i]
        for k in range(i):
            t = t - L[i][k] * w[k]
        w.append(t / L[i][i])
    yt = jnp.stack(w, axis=-1)
    zero = jnp.zeros_like(L[0][0])
    r = jnp.stack(
        [
            jnp.stack(
                [L[j][i].conj() if j >= i else zero for j in range(nt)],
                axis=-1,
            )
            for i in range(nt)
        ],
        axis=-2,
    )
    return r, yt


def _beam_search_batched(y, h, constellation, widths, qr=None,
                         selection: str = "exact", level_bias=None):
    """Fully batched fixed-budget tree search (the fast device path).

    Same search and same candidate/tie-break order as
    :func:`_beam_search_single` (expanded candidate ``j * C + c`` for
    symbol j and parent c, exact ``lax.top_k`` selection), but written
    batch-first in real arithmetic with every survivor gather expressed
    as a one-hot batched matmul — the vmapped per-vector form lowers to
    XLA gathers, which dominate its wall clock on TPU 25:1 over the
    actual metric arithmetic (scripts/kbest_profile.py).

    y ``[B, nr]`` complex, h ``[B, nr, nt]`` complex.
    Returns (X ``[B, nt, W]`` complex leaves, d_tot ``[B, W]``,
    sym_idx ``[B, nt, W]`` int32 constellation indices).  The metrics
    d_tot equal ``|y - H x|^2`` per leaf (the Cholesky triangularization
    is metric-invariant), so soft outputs never recompute residuals.
    """
    nt = h.shape[-1]
    m = int(constellation.shape[0])
    if qr is None:
        qr = _chol_qr_batched(h, y)
    r, yt = qr
    B = yt.shape[0]
    hr = jnp.real(constellation).astype(jnp.float32)  # [m]
    hi = jnp.imag(constellation).astype(jnp.float32)
    rr = jnp.real(r).astype(jnp.float32)  # [B, nt, nt]
    ri = jnp.imag(r).astype(jnp.float32)

    # residual rows [B, nt, C]; chosen symbols [B, nt, C] (+ their
    # constellation indices, carried as exact small floats so the soft
    # output never needs a nearest-point argmin over the leaves)
    dr = jnp.real(yt).astype(jnp.float32)[:, :, None]
    di = jnp.imag(yt).astype(jnp.float32)[:, :, None]
    Xr = jnp.zeros((B, nt, 1), jnp.float32)
    Xi = jnp.zeros((B, nt, 1), jnp.float32)
    Ix = jnp.zeros((B, nt, 1), jnp.float32)
    dt = jnp.zeros((B, 1), jnp.float32)
    C = 1
    for lvl, coor in enumerate(range(nt - 1, -1, -1)):
        CM = C * m
        # metric increment |d[coor] - r[coor,coor] * s|^2; the Cholesky
        # diagonal is real, so the symbol scaling stays a real broadcast
        rii = rr[:, coor, coor][:, None, None]  # [B,1,1]
        er = dr[:, coor, :, None] - rii * hr[None, None, :]  # [B,C,m]
        ei = di[:, coor, :, None] - rii * hi[None, None, :]
        inc = er * er + ei * ei
        if level_bias is not None:
            # per-symbol prior cost for this antenna, raw metric units
            inc = inc + level_bias[:, coor, None, :]  # [B,1,m] broadcast
        # candidate index j*C + c (reference repeat order): [B, m, C]
        cand = (dt[:, None, :] + jnp.transpose(inc, (0, 2, 1))).reshape(
            B, CM
        )
        keep = min(CM, int(widths[lvl]))
        if selection == "approx" and keep < CM:
            # TPU-native approximate top-k (Chern et al. 2022): avoids
            # the full cross-lane sort that dominates this kernel's
            # wall clock (roofline: 1.3% of any throughput wall, the
            # rest is the sort).  Candidate RANKING within the kept set
            # is unordered, which the search never relies on; a small
            # recall loss can drop a survivor — BER impact bounded by
            # test_kbest_approx_selection_ber.
            _, sel = jax.lax.approx_max_k(-cand, keep,
                                          recall_target=0.99)
        else:
            _, sel = jax.lax.top_k(-cand, keep)  # [B, keep], stable order
        c_idx = sel % C      # parent index
        j_idx = sel // C     # symbol index
        # one-hot gathers as batched matmuls (MXU): parents and totals
        oh_p = (c_idx[:, :, None] ==
                jnp.arange(C)[None, None, :]).astype(jnp.float32)
        oh_s = (j_idx[:, :, None] ==
                jnp.arange(m)[None, None, :]).astype(jnp.float32)
        oh_f = (sel[:, :, None] ==
                jnp.arange(CM)[None, None, :]).astype(jnp.float32)
        F = jnp.concatenate([Xr, Xi, dr, di, Ix], axis=1)  # [B, 5nt, C]
        Fs = jnp.einsum("bkc,bfc->bfk", oh_p, F,
                        precision=jax.lax.Precision.HIGHEST)
        Xr, Xi, dr, di, Ix = (
            Fs[:, i * nt:(i + 1) * nt, :] for i in range(5)
        )
        sr = jnp.einsum("bkm,m->bk", oh_s, hr,
                        precision=jax.lax.Precision.HIGHEST)  # [B, keep]
        si = jnp.einsum("bkm,m->bk", oh_s, hi,
                        precision=jax.lax.Precision.HIGHEST)
        dt = jnp.einsum("bkc,bc->bk", oh_f, cand,
                        precision=jax.lax.Precision.HIGHEST)
        Xr = Xr.at[:, coor, :].set(sr)
        Xi = Xi.at[:, coor, :].set(si)
        Ix = Ix.at[:, coor, :].set(j_idx.astype(jnp.float32))
        # residual updates: row coor consumed its symbol; rows above
        # (indices < coor) subtract r[i, coor] * s (complex)
        dr = dr.at[:, coor, :].add(-rr[:, coor, coor][:, None] * sr)
        di = di.at[:, coor, :].add(-rr[:, coor, coor][:, None] * si)
        if coor > 0:
            rr_c = rr[:, :coor, coor][:, :, None]  # [B, coor, 1]
            ri_c = ri[:, :coor, coor][:, :, None]
            dr = dr.at[:, :coor, :].add(
                -(rr_c * sr[:, None, :] - ri_c * si[:, None, :])
            )
            di = di.at[:, :coor, :].add(
                -(rr_c * si[:, None, :] + ri_c * sr[:, None, :])
            )
        C = keep
    X = jax.lax.complex(Xr, Xi)
    return X, dt, Ix.astype(jnp.int32)


def _beam_search_single(y, h, constellation, widths, qr=None):
    """Fixed-budget tree search for ONE received vector.

    widths[l] is the number of survivors kept after expanding level l
    (l = 0 expands the last antenna).  Returns (X [nt, W_last],
    d_tot [W_last]) — every kept leaf and its metric.  ``qr`` passes a
    precomputed (r, yt) pair (see :func:`_chol_qr_batched`).
    """
    nt = h.shape[1]
    m = constellation.shape[0]
    if qr is None:
        q, r = jnp.linalg.qr(h)
        yt = q.conj().T @ y
    else:
        r, yt = qr

    X = jnp.zeros((nt, 1), constellation.dtype)
    d = yt[:, None]  # residuals [nr, cand]
    d_tot = jnp.zeros((1,), jnp.float32)
    nb_can = 1
    for lvl, coor in enumerate(range(nt - 1, -1, -1)):
        nb_hyp = nb_can * m
        X = jnp.tile(X, (1, m))
        d = jnp.tile(d, (1, m))
        d_tot_h = jnp.tile(d_tot, m)
        hyp = jnp.repeat(constellation, nb_can)
        X = X.at[coor].set(hyp)
        d = d.at[coor].add(-r[coor, coor] * hyp)
        d_tot_h = d_tot_h + jnp.abs(d[coor]) ** 2

        keep = min(nb_hyp, int(widths[lvl]))
        _, sel = jax.lax.top_k(-d_tot_h, keep)
        X = X[:, sel]
        d = d[:, sel]
        d = d.at[:coor].add(-r[:coor, coor, None] * hyp[sel])
        d_tot = d_tot_h[sel]
        nb_can = keep
    return X, d_tot


def best_first_device(y, h, constellation, beam=16, llr_max=500.0,
                      bits_per_symbol=None):
    """Batched fixed-budget best-first detection (the TPU path).

    The host detector's dynamic per-level stacks become static per-level
    beam widths, so every step is a fixed-shape expand -> score -> top_k
    and the whole search runs vmapped under jit.

    Parameters
    ----------
    y : ``[B, nr]`` received vectors; h : ``[B, nr, nt]`` channels.
    beam : int or per-level tuple (length nt) of survivor counts.
    llr_max : counter-metric clip (reference modulation.py:558).
    bits_per_symbol : defaults to log2(len(constellation)).

    Returns
    -------
    llrs : ``[B, nt * bits_per_symbol]`` in the reference convention
        ``(map_metric - counter_metric) * map_bit_sign`` (unscaled by the
        noise variance, positive <=> bit 0), counter clipped to
        ``map_metric + llr_max``.
    """
    y = jnp.asarray(y)
    h = jnp.asarray(h)
    constellation = jnp.asarray(constellation)
    nt = h.shape[-1]
    m = constellation.shape[0]
    if bits_per_symbol is None:
        bits_per_symbol = int(np.log2(m))
    widths = (beam,) * nt if np.ndim(beam) == 0 else tuple(beam)
    _, mets, idx = _beam_search_batched(y, h, constellation, widths)
    bits = _leaf_bits(idx, bits_per_symbol)  # [B, W, nb]
    map_i = jnp.argmin(mets, axis=-1)  # [B]
    map_met = jnp.take_along_axis(mets, map_i[:, None], axis=-1)  # [B,1]
    map_bits = jnp.take_along_axis(bits, map_i[:, None, None], axis=1)
    sign = (2 * map_bits[:, 0, :] - 1).astype(jnp.float32)  # [B, nb]
    differ = bits != map_bits
    counter = jnp.min(
        jnp.where(differ, mets[:, :, None], jnp.float32(np.inf)), axis=1
    )  # [B, nb]
    counter = jnp.clip(counter, map_met - llr_max, map_met + llr_max)
    return (map_met - counter) * sign


def _counter_hyp_llrs(X, mets, constellation, bps: int, llr_max):
    """MAP/counter-hypothesis LLRs from a leaf candidate list.

    X ``[nt, W]`` leaves (exact constellation points), mets ``[W]``.
    """
    map_idx = jnp.argmin(mets)
    map_met = mets[map_idx]
    d = jnp.abs(X[..., None] - constellation)  # [nt, W, m]
    sym_idx = jnp.argmin(d, axis=-1)
    bits = unpack_bits(sym_idx, bps)  # [nt, W, bps]
    map_bits = jnp.take(bits, map_idx, axis=1)  # [nt, bps]
    sign = (2 * map_bits - 1).astype(jnp.float32)
    differ = bits != map_bits[:, None, :]
    counter = jnp.min(
        jnp.where(differ, mets[None, :, None], jnp.inf), axis=1
    )  # [nt, bps]
    counter = jnp.clip(counter, map_met - llr_max, map_met + llr_max)
    return ((map_met - counter) * sign).reshape(-1)
