r"""BCH codes: construction, systematic encoding, hard-decision decoding.

Beyond-reference subsystem: CommPy's algebraic layer stops at GF(2^m)
element algebra and cyclic-code generator polynomials
(/root/reference/commpy/channelcoding/{gfields,algcode}.py) — it ships no
algebraic encoder or decoder.  This module adds t-error-correcting binary
BCH, the classic outer code (it is DVB-S2's outer code ahead of the LDPC
inner code, and the basis of many flash/OTN ECCs).

The TPU design principle is **bit-sliced GF(2^m) linear algebra** — no
log/antilog table lookups anywhere on the device path (gathers inside
scans lower to scalar loops on TPU):

* **Encoding** — systematic parity is linear over GF(2):
  ``parity = msg @ P mod 2`` with ``P`` the x^j-mod-g remainder table.
  One MXU matmul (0/1 operands are exact at any precision).
* **Syndromes** — S_j = r(alpha^j) is linear in the received bits:
  ``synd_bits = r @ S mod 2`` with S[i, (j,b)] = bit b of alpha^{i(j+1)}.
  One [B, n] @ [n, 2t*m] matmul.
* **Berlekamp-Massey** — the inversionless (Burton) iteration runs as a
  ``lax.scan`` over 2t steps.  Field elements are m-bit slices; a
  variable*variable product is a shift-XOR convolution (outer product,
  anti-diagonal sums, then a constant GF(2) reduction matrix) — parity
  of f32 counts, exact.  The degree bookkeeping (L, delta, the
  conditional B update) is `where`-masked per batch element.
* **Chien search** — evaluating Lambda(alpha^{-i}) at all n positions is
  blocked: within a block of D positions the evaluation is one
  ``[B, (t+1)m] @ [(t+1)m, D*m]`` matmul; between blocks the
  coefficients advance by the CONSTANT map mu_k <- mu_k * alpha^{-Dk}
  (an m x m GF(2) matrix per k).  O(n/D) scan steps of MXU work instead
  of an n-step Horner recurrence.

Cross-checked against an independent log/antilog-table NumPy golden
(tests/bch_ref.py) and classic generator-polynomial anchors
((15,7,t=2) g=0o721, (15,5,t=3), (31,21,t=2)).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .gf2m import (
    bm_inversionless,
    chien_tables,
    gf_reduce_matrix,
    gf_square_matrix,
    gf_tables,
    mod2 as _mod2,
)

__all__ = [
    "BchCode",
    "bch_construct",
    "bch_genpoly",
    "bch_encode",
    "bch_decode",
    "bch_chase_decode",
    "make_bch_encoder",
    "make_bch_decoder",
    "make_bch_chase_decoder",
]


# ---------------------------------------------------------------------------
# Host-side GF(2^m) tables and code construction
# ---------------------------------------------------------------------------

def _poly_mul_gf2(a, b):
    """Multiply GF(2)[x] polynomials given as coefficient int arrays."""
    out = np.zeros(len(a) + len(b) - 1, np.int64)
    for i, ai in enumerate(a):
        if ai:
            out[i:i + len(b)] ^= np.asarray(b, np.int64)
    return out


def bch_genpoly(m, t):
    """Generator polynomial of the primitive t-error BCH of length 2^m-1.

    LCM of the minimal polynomials of alpha^1..alpha^{2t}; returned as a
    coefficient array, lowest degree first.
    """
    exp, log = gf_tables(m)
    size = (1 << m) - 1
    covered = set()
    g = np.array([1], np.int64)
    for j in range(1, 2 * t + 1):
        if j % size in covered:
            continue
        # cyclotomic coset of j
        coset = []
        c = j % size
        while c not in coset:
            coset.append(c)
            c = (2 * c) % size
        covered.update(coset)
        # minimal poly = prod (x - alpha^c), computed in GF(2^m) then
        # verified binary
        poly = np.array([1], np.int64)  # coefficients in GF(2^m), low-first
        for c in coset:
            root = exp[c]
            # poly * (x + root)
            shifted = np.concatenate([[0], poly])
            scaled = np.array(
                [exp[(log[p] + log[root]) % size] if p else 0 for p in poly]
                + [0], np.int64)
            poly = shifted ^ scaled
        if np.any(poly > 1):
            raise AssertionError("minimal polynomial is not binary")
        g = _poly_mul_gf2(g, poly)
    return g


@dataclass(frozen=True)
class BchCode:
    """A (possibly shortened) binary BCH code.

    ``n``/``k`` are the transmitted lengths; ``m``/``t`` define the
    parent primitive code of length 2^m - 1 (shortening drops leading
    message bits, which both ends treat as zeros).
    """

    n: int
    k: int
    m: int
    t: int
    genpoly: tuple  # low-degree-first coefficients

    @property
    def n_parent(self):
        return (1 << self.m) - 1

    @property
    def n_parity(self):
        return len(self.genpoly) - 1

    @property
    def shortening(self):
        return self.n_parent - self.n


def bch_construct(m, t, shorten=0):
    """Build the t-error-correcting BCH code of length 2^m - 1 - shorten."""
    if not 2 <= m <= 16:
        raise ValueError(f"need 2 <= m <= 16, got {m}")
    g = bch_genpoly(m, t)
    n_parent = (1 << m) - 1
    r = len(g) - 1
    k = n_parent - r - shorten
    if k <= 0:
        raise ValueError(
            f"no message bits left: 2^{m}-1 = {n_parent}, parity {r}, "
            f"shorten {shorten}")
    return BchCode(n=n_parent - shorten, k=k, m=m, t=t,
                   genpoly=tuple(int(c) for c in g))


def _parity_table(code):
    """[k, r] GF(2) matrix: parity = msg @ P.

    Row j is the remainder of x^{n-1-j} mod g (message bit j rides
    coefficient x^{n-1-j}; parity occupies the low-degree coefficients),
    built with an iterate-multiply-by-x recurrence — O(n * r), no
    per-row division.
    """
    g = np.asarray(code.genpoly, np.int64)
    r = len(g) - 1
    n_parent = code.n_parent
    rows = np.zeros((n_parent, r), np.int64)  # x^deg mod g for all degs
    rem = np.zeros(r, np.int64)
    rem[0] = 1  # x^0
    for deg in range(n_parent):
        rows[deg] = rem
        carry = rem[r - 1]
        rem = np.concatenate([[0], rem[:r - 1]])
        if carry:
            rem ^= g[:r]
    degs = code.n - 1 - np.arange(code.k)  # message bit j -> x^{n-1-j}
    # parity wire position k + j carries coefficient x^{r-1-j}:
    # emit remainder columns high-degree first
    return rows[degs][:, ::-1]


def _syndrome_table(code):
    """[n, 2t*m] GF(2) matrix: syndrome bits = r @ S.

    Received bit at wire position i rides coefficient x^{n-1-i};
    S_j = r(alpha^j) for j = 1..2t.
    """
    exp, _ = gf_tables(code.m)
    size = code.n_parent
    degs = code.n - 1 - np.arange(code.n)
    tab = np.zeros((code.n, 2 * code.t * code.m), np.int64)
    for j in range(1, 2 * code.t + 1):
        vals = exp[(degs * j) % size]  # alpha^{deg * j}
        bits = (vals[:, None] >> np.arange(code.m)[None, :]) & 1
        tab[:, (j - 1) * code.m:j * code.m] = bits
    return tab


@functools.lru_cache(maxsize=32)
def make_bch_encoder(code):
    """jitted msg [B, k] (0/1) -> codeword [B, n] int8, systematic."""
    P = jnp.asarray(_parity_table(code), jnp.float32)

    @jax.jit
    def encode(msg):
        msg_f = msg.astype(jnp.float32)
        parity = _mod2(msg_f @ P)
        return jnp.concatenate([msg_f, parity], axis=-1).astype(jnp.int8)

    return encode


def bch_encode(code, msg):
    """Systematic BCH encode: [..., k] -> [..., n] (message first)."""
    return make_bch_encoder(code)(jnp.asarray(msg))


@functools.lru_cache(maxsize=32)
def make_bch_decoder(code, chien_block=None, locator="auto"):
    """jitted hard bits [B, n] -> (corrected [B, n] int8, n_err [B] int32,
    ok [B] bool).

    ``ok`` is False where decoding failed (more than t errors detected:
    the locator degree disagrees with its root count).  Complexity: one
    syndrome matmul + the locator solve + ceil(n/D) Chien matmuls.

    ``locator``: 'bm' runs the generic 2t-step inversionless
    Berlekamp-Massey scan; 'quad' (t=2 only) computes the locator in
    CLOSED FORM — for binary BCH, ``Lambda(x) ~ S1 + S1^2 x +
    (S3 + S1^3) x^2`` (the usual quadratic scaled by S1, which leaves
    the Chien roots unchanged) — one field squaring + one product
    instead of the scan.  The r5 split probe
    (scripts/bch_split_probe.py) showed BM is ~94% of the (31,21) hard
    decode that the Chase/TPC inner loop runs 8x16 times, so 'auto'
    picks 'quad' at t=2.  Decodable (<=2-error) words produce
    bit-identical corrections and ok flags; on >=t+1-error garbage both
    paths flag ok=False via the degree/root-count check (fuzz-tested
    against each other in tests/test_bch.py).
    """
    m, t, n = code.m, code.t, code.n
    if locator not in ("auto", "bm", "quad"):
        raise ValueError("locator must be 'auto', 'bm', or 'quad'")
    if locator == "quad" and t != 2:
        raise ValueError("the closed-form locator applies to t=2 only")
    use_quad = (locator == "quad") or (locator == "auto" and t == 2)
    if chien_block is None:
        chien_block = min(512, code.n_parent)
    D = chien_block
    S_tab = jnp.asarray(_syndrome_table(code), jnp.float32)
    R_mat = jnp.asarray(gf_reduce_matrix(m), jnp.float32)
    eval_mat_np, step_mat_np = chien_tables(m, t, code.n_parent, D)
    eval_mat = jnp.asarray(eval_mat_np, jnp.float32)
    step_mat = jnp.asarray(step_mat_np, jnp.float32)
    n_blocks = -(-code.n_parent // D)
    # static per-column row lists for the linear maps (an einsum against
    # a constant binary matrix lowers to batched tiny matmuls — the BM
    # rewrite's lesson, docs/performance.md "Algebraic codecs")
    red_np = np.asarray(gf_reduce_matrix(m))
    red_rows = [np.flatnonzero(red_np[:, c]).tolist() for c in range(m)]
    sq_np = np.asarray(gf_square_matrix(m))
    sq_rows = [np.flatnonzero(sq_np[:, c]).tolist() for c in range(m)]

    def _lin_rows(x, rows_list):
        """[m, B] bits through a static binary matrix -> [m, B]."""
        return jnp.stack(
            [_mod2(sum(x[r] for r in rows)) if rows else
             jnp.zeros_like(x[0]) for rows in rows_list], axis=0)

    def _mul_rows(a, b):
        """Bit-sliced GF(2^m) product, lanes-major [m, B] x [m, B]."""
        outer = a[:, None, :] * b[None, :, :]  # [m, m, B] f32 counts
        conv = jnp.zeros((2 * m - 1,) + a.shape[1:], jnp.float32)
        for i in range(m):
            conv = conv.at[i:i + m].add(outer[i])
        conv = _mod2(conv)
        return _lin_rows(conv, red_rows)

    def _quad_locator(synd):
        """Closed-form t=2 locator: lam [B, 3, m], Lr [B]."""
        s1 = jnp.transpose(synd[:, 0], (1, 0))  # [m, B]
        s3 = jnp.transpose(synd[:, 2], (1, 0))
        s1_2 = _lin_rows(s1, sq_rows)           # S1^2 (linear map)
        s1_3 = _mul_rows(s1_2, s1)              # S1^3
        lam2 = _mod2(s3 + s1_3)                 # S3 + S1^3
        s1_nz = jnp.any(s1 > 0, axis=0)         # [B]
        s3_nz = jnp.any(s3 > 0, axis=0)
        # S1 != 0: Lambda' = [S1, S1^2, S3+S1^3], L = 2 or 1
        # S1 == 0, S3 == 0: no errors: Lambda = [1, 0, 0], L = 0
        # S1 == 0, S3 != 0: uncorrectable: Lambda = 1 (no roots), L = 1
        one = jnp.zeros_like(s1).at[0].set(1.0)
        lam0 = jnp.where(s1_nz[None, :], s1, one)
        lam1 = jnp.where(s1_nz[None, :], s1_2, 0.0)
        lam2 = jnp.where(s1_nz[None, :], lam2, 0.0)
        Lr = jnp.where(
            s1_nz, jnp.where(jnp.any(lam2 > 0, axis=0), 2, 1),
            jnp.where(s3_nz, 1, 0)).astype(jnp.int32)
        lam = jnp.stack([lam0, lam1, lam2], axis=0)  # [3, m, B]
        return jnp.transpose(lam, (2, 0, 1)), Lr

    @jax.jit
    def decode(r_bits):
        B = r_bits.shape[0]
        r_f = r_bits.astype(jnp.float32)
        synd = _mod2(r_f @ S_tab).reshape(B, 2 * t, m)  # S_1..S_2t

        if use_quad:
            lam, Lr = _quad_locator(synd)
        else:
            # inversionless Berlekamp-Massey over 2t steps (gf2m)
            lam, Lr = bm_inversionless(synd, t, m, R_mat)

        # --- blocked Chien search over the parent length ---
        mu0 = lam.reshape(B, (t + 1) * m)

        def chien_step(mu, _):
            vals = _mod2(mu @ eval_mat).reshape(B, D, m)
            is_root = ~jnp.any(vals > 0, axis=-1)  # Lambda(alpha^{-i}) == 0
            mu = _mod2(mu @ step_mat)
            return mu, is_root

        _, roots = lax.scan(chien_step, mu0, None, length=n_blocks)
        # roots[b0][:, d] flags a root at alpha^{-(b0*D+d)}, i.e. an
        # error at coefficient DEGREE b0*D+d.
        roots = roots.transpose(1, 0, 2).reshape(B, n_blocks * D)
        roots = roots[:, :code.n_parent]
        # wire position j carries coefficient x^{n-1-j}
        degs = code.n - 1 - np.arange(code.n)
        err_wire = roots[:, degs]  # [B, n]
        corrected = jnp.bitwise_xor(
            r_bits.astype(jnp.int8), err_wire.astype(jnp.int8))
        # success: locator degree == number of roots, all of them inside
        # the transmitted length (a root in the shortened virtual prefix
        # means a miscorrection)
        total_roots = jnp.sum(roots.astype(jnp.int32), axis=-1)
        in_range = jnp.sum(err_wire.astype(jnp.int32), axis=-1)
        ok = (total_roots == Lr) & (in_range == total_roots)
        return corrected, in_range, ok

    return decode


def bch_decode(code, r_bits):
    """Hard-decision decode: [B, n] -> (corrected, n_errors, ok)."""
    return make_bch_decoder(code)(jnp.asarray(r_bits))


@functools.lru_cache(maxsize=32)
def make_bch_chase_decoder(code, p=4, chien_block=None):
    """jitted (hard_bits [B, n], reliability [B, n]) -> (corrected,
    n_errors, ok): Chase-2 soft-decision decoding.

    Flips every subset of the ``p`` least-reliable bit positions (2^p
    test patterns, folded into the batch of ONE hard decode), then
    picks the successful candidate with the smallest soft discrepancy
    (sum of reliabilities at the positions it changed vs the received
    hard word).  Decodes beyond-t patterns whose errors sit at
    low-reliability bits (t+1 all-least-reliable errors: 30/30 measured
    on (31,21) where hard decoding failed 16/30); falls back to the
    received word with ok=False when no pattern succeeds.  Note this is
    a soft-metric selection: past the soft half-distance another
    codeword can legitimately score closer and win — maximum-likelihood
    behavior, not a decoding defect.
    """
    hard = make_bch_decoder(code, chien_block=chien_block)
    n_pat = 1 << p
    # pattern bit table [2^p, p]
    pat_np = ((np.arange(n_pat)[:, None] >> np.arange(p)[None, :]) & 1
              ).astype(np.float32)

    @jax.jit
    def decode(r_bits, reliability):
        r_bits = jnp.asarray(r_bits)
        rel = jnp.asarray(reliability, jnp.float32)
        B, n = r_bits.shape
        order = jnp.argsort(rel, axis=-1)
        rank = jnp.argsort(order, axis=-1)  # [B, n]
        # flip_sets[b, q, i] = 1 iff pattern q flips position i (the
        # position whose reliability-rank r < p is flipped when pattern
        # bit r is set)
        in_lru = rank < p  # [B, n] the p least-reliable positions
        # pattern bit for each position = pat[q, rank] where in_lru —
        # via a one-hot contraction, not pat[:, rank_c]: the
        # fancy-indexing gather measured 15x slower on device
        # (scripts/tpc_attr_probe.py)
        rank_c = jnp.clip(rank, 0, p - 1)
        oh = (rank_c[..., None] == jnp.arange(p)[None, None, :]).astype(
            jnp.float32)  # [B, n, p]
        flip = jnp.einsum("qp,bnp->bqn", jnp.asarray(pat_np), oh) * \
            in_lru[:, None, :].astype(jnp.float32)  # [B, 2^p, n]
        rx = jnp.bitwise_xor(
            jnp.broadcast_to(r_bits[:, None, :], (B, n_pat, n)
                             ).astype(jnp.int8),
            flip.astype(jnp.int8))
        corr, nerr, ok = hard(rx.reshape(B * n_pat, n))
        corr = corr.reshape(B, n_pat, n)
        ok = ok.reshape(B, n_pat)
        changed = (corr != r_bits[:, None, :]).astype(jnp.float32)
        score = jnp.sum(changed * rel[:, None, :], axis=-1)
        score = jnp.where(ok, score, jnp.inf)
        best = jnp.argmin(score, axis=-1)
        selq = best[:, None] == jnp.arange(n_pat)[None, :]
        any_ok = jnp.any(ok, axis=-1)
        corrected = jnp.sum(
            corr * selq[..., None].astype(corr.dtype), axis=1)
        corrected = jnp.where(any_ok[:, None], corrected,
                              r_bits.astype(jnp.int8))
        n_out = jnp.sum(
            (corrected != r_bits).astype(jnp.int32), axis=-1)
        n_out = jnp.where(any_ok, n_out, 0)
        return corrected.astype(jnp.int8), n_out, any_ok

    return decode


def bch_chase_decode(code, hard_bits, reliability, p=4):
    """Chase-2 soft decode: 2^p batched test patterns over the ``p``
    least-reliable bits.  ``reliability`` [B, n]: larger = more
    trustworthy (e.g. |LLR|).  Returns (corrected, n_errors, ok)."""
    return make_bch_chase_decoder(code, p=p)(jnp.asarray(hard_bits),
                                             jnp.asarray(reliability))


@functools.lru_cache(maxsize=32)
def make_bch_chase_soft(code, p=4, beta=0.5, chien_block=None):
    """jitted llr [B, n] -> (soft_out [B, n], hard [B, n] int8):
    soft-output Chase (the Pyndiah SISO element of turbo product codes).

    Input LLRs: positive => bit 0 (the FEC convention).  For each bit,
    the soft output is (m_competitor - m_best)/2 signed by the best
    candidate's decision, where m are soft discrepancies of the Chase
    candidate list and the competitor is the best candidate DISAGREEING
    at that bit; when no competitor exists the output falls back to
    Pyndiah's +/- (beta + |llr|) saturation.
    """
    hard_dec = make_bch_decoder(code, chien_block=chien_block)
    n_pat = 1 << p
    pat_np = ((np.arange(n_pat)[:, None] >> np.arange(p)[None, :]) & 1
              ).astype(np.float32)

    @jax.jit
    def decode(llr):
        llr = jnp.asarray(llr, jnp.float32)
        B, n = llr.shape
        r_bits = (llr < 0).astype(jnp.int8)
        rel = jnp.abs(llr)
        order = jnp.argsort(rel, axis=-1)
        rank = jnp.argsort(order, axis=-1)
        in_lru = rank < p
        rank_c = jnp.clip(rank, 0, p - 1)
        # one-hot contraction, not pat[:, rank_c]: the fancy-indexing
        # gather measured 15x slower on device (scripts/tpc_attr_probe.py)
        oh = (rank_c[..., None] == jnp.arange(p)[None, None, :]).astype(
            jnp.float32)  # [B, n, p]
        flip = jnp.einsum("qp,bnp->bqn", jnp.asarray(pat_np), oh) * \
            in_lru[:, None, :].astype(jnp.float32)  # [B, 2^p, n]
        rx = jnp.bitwise_xor(
            jnp.broadcast_to(r_bits[:, None, :], (B, n_pat, n)
                             ).astype(jnp.int8),
            flip.astype(jnp.int8))
        corr, _, ok = hard_dec(rx.reshape(B * n_pat, n))
        corr = corr.reshape(B, n_pat, n)
        ok = ok.reshape(B, n_pat)
        changed = (corr != r_bits[:, None, :]).astype(jnp.float32)
        score = jnp.sum(changed * rel[:, None, :], axis=-1)
        score = jnp.where(ok, score, jnp.inf)  # [B, 2^p]
        best = jnp.argmin(score, axis=-1)
        selq = (best[:, None] == jnp.arange(n_pat)[None, :]
                ).astype(jnp.float32)
        m_best = jnp.min(score, axis=-1)  # [B]
        d_best = jnp.sum(corr.astype(jnp.float32) * selq[..., None],
                         axis=1)  # [B, n] best candidate's bits
        # best metric among candidates disagreeing with d_best at bit i
        agree = (corr.astype(jnp.float32) == d_best[:, None, :])
        comp_score = jnp.where(agree, jnp.inf, score[..., None])
        m_comp = jnp.min(comp_score, axis=1)  # [B, n]
        has_comp = jnp.isfinite(m_comp)
        sign = 1.0 - 2.0 * d_best  # +1 for bit 0 (positive-LLR side)
        soft = jnp.where(
            has_comp,
            0.5 * (m_comp - m_best[:, None]) * sign,
            (beta + rel) * sign)
        any_ok = jnp.any(ok, axis=-1)
        # no candidate at all: pass the channel belief through
        soft = jnp.where(any_ok[:, None], soft, llr)
        hard_out = jnp.where(any_ok[:, None], d_best.astype(jnp.int8),
                             r_bits)
        return soft, hard_out

    return decode
