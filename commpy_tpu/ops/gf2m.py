r"""Bit-sliced GF(2^m) linear algebra for TPU-native algebraic codecs.

Shared toolbox of the BCH and Reed-Solomon codecs (ops/bch.py,
ops/rs.py).  Field elements are m-bit slices on the last axis; the
design rule is NO table lookups on the device path (gathers inside
scans lower to scalar loops on TPU):

* multiplying by a CONSTANT is a GF(2) linear map -> an m x m binary
  matrix applied as ``bits @ M`` (f32 0/1 matmul, parity-folded, exact);
* a VARIABLE x VARIABLE product is a carryless shift-XOR convolution of
  the outer bit product, folded by a constant [2m-1, m] reduction
  matrix;
* SQUARING is itself linear over GF(2) -> one constant matrix, so a
  batched inverse is Fermat's x^(2^m - 2) via m-1 squarings and m-2
  multiplies;
* the inversionless Berlekamp-Massey recurrence runs as a 2t-step
  ``lax.scan`` on bit-sliced state, and polynomial evaluation over a
  position range (Chien search / Forney) is BLOCKED: one
  ``[B, (deg+1)m] @ [(deg+1)m, D*m]`` matmul per D positions with a
  constant between-block coefficient advance.

Host-side construction helpers (exp/log tables, cyclotomic-coset
generator polynomials) live here too; they run once per code at build
time.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from .galois import _PRIMPOLYS

__all__ = [
    "gf_tables",
    "gf_constant_mult_matrix",
    "gf_reduce_matrix",
    "gf_square_matrix",
    "carryless",
    "conv_xor",
    "gf_inverse_bits",
    "mod2",
    "chien_tables",
    "bm_inversionless",
]


def gf_tables(m):
    """(exp, log) tables for GF(2^m) under the module primitive poly."""
    prim = int(_PRIMPOLYS[m])
    size = (1 << m) - 1
    exp = np.zeros(2 * size, np.int64)
    log = np.zeros(1 << m, np.int64)
    x = 1
    for i in range(size):
        exp[i] = x
        log[x] = i
        x <<= 1
        if x >> m:
            x ^= prim
    exp[size:] = exp[:size]
    return exp, log


def _reduce_int(v, m):
    prim = int(_PRIMPOLYS[m])
    for d in range(2 * m - 2, m - 1, -1):
        if v >> d:
            v ^= prim << (d - m)
    return v


def gf_constant_mult_matrix(const, m):
    """[m, m] GF(2) matrix M with bits(const * x) = bits(x) @ M."""
    rows = []
    for b in range(m):
        v = _reduce_int(int(const) << b, m)
        rows.append([(v >> c) & 1 for c in range(m)])
    return np.asarray(rows, np.int64)


def gf_reduce_matrix(m):
    """[2m-1, m] GF(2) matrix folding a carryless product to the field."""
    rows = []
    for d in range(2 * m - 1):
        v = _reduce_int(1 << d, m)
        rows.append([(v >> c) & 1 for c in range(m)])
    return np.asarray(rows, np.int64)


def gf_square_matrix(m):
    """[m, m] GF(2) matrix S with bits(x^2) = bits(x) @ S."""
    rows = []
    for b in range(m):
        v = _reduce_int(1 << (2 * b), m)
        rows.append([(v >> c) & 1 for c in range(m)])
    return np.asarray(rows, np.int64)


def mod2(x):
    return jnp.mod(x, 2.0)


def carryless(outer, m):
    """[..., m, m] outer bit products -> [..., 2m-1] f32 coefficient
    counts via static shift-adds (conv[a+c] += outer[a, c])."""
    lead = outer.shape[:-2]
    conv = jnp.zeros(lead + (2 * m - 1,), jnp.float32)
    for a in range(m):
        conv = conv.at[..., a:a + m].add(outer[..., a, :])
    return conv


def conv_xor(a, b, m, reduce_mat):
    """Bit-sliced GF(2^m) product of per-slot elements.

    a, b: [..., m] float 0/1 bit slices (broadcastable).  Carryless
    convolution of the outer product (f32 counts, parity-folded), then
    the constant reduction matrix back to m bits.
    """
    outer = a[..., :, None] * b[..., None, :]  # [..., m, m]
    return mod2(mod2(carryless(outer, m)) @ reduce_mat)


def gf_inverse_bits(x, m, square_mat, reduce_mat):
    """Batched inverse via Fermat: x^(2^m - 2); inverse of 0 is 0.

    x: [..., m] bit slices.  2^m - 2 = sum_{i=1..m-1} 2^i, so the
    inverse is the product of the iterated squares x^(2^i).
    """
    sq = mod2(x @ square_mat)  # x^2
    acc = sq
    cur = sq
    for _ in range(m - 2):
        cur = mod2(cur @ square_mat)
        acc = conv_xor(acc, cur, m, reduce_mat)
    return acc


def chien_tables(m, deg, size, block, exps=None):
    """Blocked polynomial-evaluation operators over alpha^{-i}.

    For coefficients p_k carried at exponent ``exps[k]`` (default: k =
    0..deg, an ordinary degree-``deg`` polynomial; entries may be
    negative — e.g. Forney's X^{1-fcr} factor rides exponent -1),
    ``eval_mat`` [K*m, block*m] yields bits of
    sum_k p_k alpha^{-(i0+d) exps[k]} for d in [0, block) from the block
    coefficients mu_k = p_k * alpha^{-i0 exps[k]}; ``step_mat`` advances
    mu by the constant map mu_k <- mu_k * alpha^{-block*exps[k]}.
    ``size`` = 2^m - 1.
    """
    exp, _ = gf_tables(m)
    if exps is None:
        exps = list(range(deg + 1))
    K = len(exps)
    eval_mat = np.zeros((K * m, block * m), np.int64)
    step_mat = np.zeros((K * m, K * m), np.int64)
    for k, ek in enumerate(exps):
        for d in range(block):
            Mm = gf_constant_mult_matrix(int(exp[(-d * ek) % size]), m)
            eval_mat[k * m:(k + 1) * m, d * m:(d + 1) * m] = Mm
        Ms = gf_constant_mult_matrix(int(exp[(-block * ek) % size]), m)
        step_mat[k * m:(k + 1) * m, k * m:(k + 1) * m] = Ms
    return eval_mat, step_mat


def bm_inversionless(synd, t, m, reduce_mat, nslots=None, init=None,
                     start=None, nf=None):
    """Inversionless (Burton) Berlekamp-Massey on bit-sliced syndromes.

    synd: [B, 2t, m] float 0/1 (S_1..S_2t).  Returns the locator bits
    lam [B, nslots, m] (overall scale is immaterial — roots are
    unchanged) and the locator degree L [B].

    The errata (errors-and-erasures) configuration initializes lam and
    the helper polynomial to the erasure locator Gamma with L = f and
    masks out iterations r < f per batch element (``init=(gamma, f)``,
    ``start=f``, ``nf=f``; the growth condition becomes
    2L <= r + f).  ``nslots`` widens the polynomial buffers (errata
    locators reach degree 2t).
    """
    B = synd.shape[0]
    ns = (t + 1) if nslots is None else nslots
    # Internal layout is LANES-MAJOR: the batch rides the 128-lane axis
    # ([slots, m, B] state) so the per-step tensors stay fully packed.
    # The natural [B, slots, m] layout puts (slots, m) — e.g. (3, 5) for
    # a t=2 GF(32) code — on the (8, 128) tile: ~65x padding, measured
    # 6.4 ms/call at the turbo-product batch (B=31744) vs sub-ms here.
    if init is None:
        lam = jnp.zeros((ns, m, B), jnp.float32).at[0, 0, :].set(1.0)
        Lr = jnp.zeros(B, jnp.int32)
    else:
        lam0, Lr = init
        lam = jnp.transpose(lam0, (1, 2, 0))
    bpoly = lam
    delta = jnp.zeros((m, B), jnp.float32).at[0, :].set(1.0)
    if start is None:
        start = jnp.zeros(B, jnp.int32)
    if nf is None:
        nf = jnp.zeros(B, jnp.int32)
    # The reduction matrix is a fixed binary pattern of the field: use
    # it STATICALLY (per-column row lists) so the fold is a handful of
    # fused adds — an einsum against it lowers to batched tiny matmuls
    # that cost ~1.3 ms alone at turbo-product batch shapes.
    red_np = np.asarray(gf_reduce_matrix(m))
    red_rows = [np.flatnonzero(red_np[:, c]).tolist() for c in range(m)]
    # pad so the discrepancy window S_{r-j}, j = 0..ns-1 is a
    # static-size dynamic_slice at offset r
    synd_l = jnp.transpose(synd, (1, 2, 0))  # [2t, m, B]
    synd_pad = jnp.concatenate(
        [jnp.zeros((ns - 1, m, B), jnp.float32), synd_l], axis=0)

    def cl_rows(outer):
        """[..., m(a), m(c), B] products -> [..., 2m-1, B] counts."""
        lead = outer.shape[:-3]
        conv = jnp.zeros(lead + (2 * m - 1, B), jnp.float32)
        for a in range(m):
            conv = conv.at[..., a:a + m, :].add(outer[..., a, :, :])
        return conv

    def fold(conv_bits):
        """[..., 2m-1, B] bit rows -> [..., m, B] via the static
        reduction pattern (sums of <= m rows, then parity)."""
        cols = [mod2(sum(conv_bits[..., u, :] for u in rows))
                for rows in red_rows]
        return jnp.stack(cols, axis=-2)

    def bm_step(carry, r_idx):
        lam, bpoly, delta, Lr = carry
        win = lax.dynamic_slice_in_dim(synd_pad, r_idx, ns, axis=0)
        win = win[::-1]  # win[j] = S_{r - j} (0-based syndromes)
        outer = sum(lam[j][:, None, :] * win[j][None, :, :]
                    for j in range(ns))  # [m, m, B] f32 counts
        d = fold(mod2(cl_rows(outer)))  # [m, B]

        xB = jnp.concatenate(
            [jnp.zeros((1, m, B), jnp.float32), bpoly[:-1]], axis=0)
        # delta * lam and d * xB, slotwise bit-sliced products
        o1 = delta[None, :, None, :] * lam[:, None, :, :]  # [ns,a,c,B]
        o2 = d[None, :, None, :] * xB[:, None, :, :]
        conv = mod2(cl_rows(o1)) + mod2(cl_rows(o2))  # [ns, 2m-1, B]
        lam_new = fold(mod2(conv))

        active = r_idx >= start
        d_nonzero = jnp.any(d > 0, axis=0)
        grow = active & d_nonzero & (2 * Lr <= r_idx + nf)
        bpoly_new = jnp.where(grow[None, None, :], lam, xB)
        bpoly = jnp.where(active[None, None, :], bpoly_new, bpoly)
        lam = jnp.where(active[None, None, :], lam_new, lam)
        delta = jnp.where(grow[None, :], d, delta)
        # errata degree bookkeeping: L <- r + 1 + f - L (f = 0 plain)
        Lr = jnp.where(grow, r_idx + 1 + nf - Lr, Lr)
        return (lam, bpoly, delta, Lr), None

    (lam, _, _, Lr), _ = lax.scan(
        bm_step, (lam, bpoly, delta, Lr),
        jnp.arange(2 * t, dtype=jnp.int32))
    return jnp.transpose(lam, (2, 0, 1)), Lr
