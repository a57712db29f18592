r"""Reed-Solomon codes over GF(2^m): construction, encode, decode.

Beyond-reference subsystem (CommPy has no algebraic codec): classic
t-symbol-error-correcting RS, the workhorse outer code of CD/DVD, DVB-T
(RS(204,188), fcr=0), and CCSDS deep space (RS(255,223)).

Device path shares the bit-sliced GF(2^m) machinery of the BCH codec
(ops/gf2m.py): systematic parity and syndromes are single GF(2) matmuls
of the symbol BITS, Berlekamp-Massey runs inversionless as a 2t-step
scan, and both the Chien search and the Forney evaluator
(x^{1-fcr} * Omega at the locator roots, divided by Lambda' via
Fermat-inverse squaring chains) are blocked constant-matrix
evaluations.  No log/antilog table lookups anywhere on device.

Conventions: wire symbol j carries polynomial coefficient x^{n-1-j}
(message first, parity high-degree-first); generator
g(x) = prod_{j=fcr}^{fcr+2t-1} (x - alpha^j) with ``fcr`` in {0, 1};
shortening drops leading message symbols (virtual zeros).

Cross-checked against an independent log/antilog-table NumPy golden
(tests/rs_ref.py) including beyond-t failure behavior and arbitrary-word
fuzz.
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
    conv_xor,
    gf_constant_mult_matrix,
    gf_inverse_bits,
    gf_reduce_matrix,
    gf_square_matrix,
    gf_tables,
    mod2,
)

__all__ = [
    "RsCode",
    "rs_construct",
    "rs_genpoly",
    "rs_encode",
    "rs_decode",
    "rs_errata_decode",
    "rs_gmd_decode",
    "make_rs_encoder",
    "make_rs_decoder",
    "make_rs_errata_decoder",
    "make_rs_gmd_decoder",
]


def rs_genpoly(m, t, fcr=1):
    """g(x) = prod_{j=fcr}^{fcr+2t-1} (x - alpha^j); field-element
    coefficients, lowest degree first."""
    exp, log = gf_tables(m)
    size = (1 << m) - 1

    def gmul(a, b):
        if a == 0 or b == 0:
            return 0
        return int(exp[(log[a] + log[b]) % size])

    g = [1]
    for j in range(fcr, fcr + 2 * t):
        root = int(exp[j % size])
        new = [0] * (len(g) + 1)
        for i, c in enumerate(g):  # g * (x + root)
            new[i + 1] ^= c
            new[i] ^= gmul(root, c)
        g = new
    return tuple(g)


@dataclass(frozen=True)
class RsCode:
    """A (possibly shortened) Reed-Solomon code over GF(2^m).

    ``n``/``k`` count transmitted SYMBOLS; t = (n_parity)/2 symbol
    errors are correctable.  ``fcr`` is the first consecutive root
    exponent (1 = narrow sense; 0 = DVB/CCSDS convention).
    """

    n: int
    k: int
    m: int
    t: int
    fcr: int
    genpoly: tuple  # field-element coefficients, low-degree first

    @property
    def n_parent(self):
        return (1 << self.m) - 1

    @property
    def n_parity(self):
        return 2 * self.t

    @property
    def shortening(self):
        return self.n_parent - self.n


def rs_construct(m, t, shorten=0, fcr=1):
    """Build the t-symbol-error RS code of length 2^m - 1 - shorten."""
    if not 2 <= m <= 16:
        raise ValueError(f"need 2 <= m <= 16, got {m}")
    if fcr not in (0, 1):
        raise ValueError("fcr must be 0 or 1")
    n_parent = (1 << m) - 1
    k = n_parent - 2 * t - shorten
    if k <= 0:
        raise ValueError(
            f"no message symbols left: 2^{m}-1 = {n_parent}, parity "
            f"{2 * t}, shorten {shorten}")
    return RsCode(n=n_parent - shorten, k=k, m=m, t=t, fcr=fcr,
                  genpoly=rs_genpoly(m, t, fcr))


def _symbol_remainders(code):
    """[n_parent, 2t] field elements: x^deg mod g for every degree."""
    exp, log = gf_tables(code.m)
    size = code.n_parent
    g = np.asarray(code.genpoly, np.int64)
    r = len(g) - 1  # == 2t

    def gmul(a, b):
        if a == 0 or b == 0:
            return 0
        return int(exp[(log[a] + log[b]) % size])

    rows = np.zeros((size, r), np.int64)
    rem = np.zeros(r, np.int64)
    rem[0] = 1
    for deg in range(size):
        rows[deg] = rem
        top = int(rem[r - 1])
        rem = np.concatenate([[0], rem[:r - 1]])
        if top:
            # x^r = g[:r] (monic g): subtract top * g
            rem ^= np.array([gmul(top, int(c)) for c in g[:r]], np.int64)
    return rows


def _parity_table_bits(code):
    """[k*m, 2t*m] GF(2) matrix: parity bits = msg bits @ P."""
    m, t = code.m, code.t
    rows = _symbol_remainders(code)
    degs = code.n - 1 - np.arange(code.k)  # message symbol j -> x^{n-1-j}
    P = np.zeros((code.k * m, 2 * t * m), np.int64)
    for j in range(code.k):
        rem = rows[degs[j]]
        for el in range(2 * t):
            if rem[el]:
                Mm = gf_constant_mult_matrix(int(rem[el]), m)
                # parity wire slot p carries coefficient degree 2t-1-p
                p = 2 * t - 1 - el
                P[j * m:(j + 1) * m, p * m:(p + 1) * m] = Mm
    return P


def _syndrome_table_bits(code):
    """[n*m, 2t*m] GF(2) matrix: syndrome bits = received bits @ S.

    S_i = r(alpha^{fcr+i}) for i = 0..2t-1.
    """
    m, t = code.m, code.t
    exp, _ = gf_tables(m)
    size = code.n_parent
    degs = code.n - 1 - np.arange(code.n)
    S = np.zeros((code.n * m, 2 * t * m), np.int64)
    for p in range(code.n):
        for i in range(2 * t):
            c = int(exp[((code.fcr + i) * int(degs[p])) % size])
            Mm = gf_constant_mult_matrix(c, m)
            S[p * m:(p + 1) * m, i * m:(i + 1) * m] = Mm
    return S


def _sym_to_bits(x, m):
    """int symbols [..., n] -> float bit slices [..., n, m]."""
    return ((x[..., None].astype(jnp.int32) >>
             jnp.arange(m, dtype=jnp.int32)) & 1).astype(jnp.float32)


def _bits_to_sym(bits, m):
    """float bit slices [..., n, m] -> int32 symbols [..., n]."""
    w = jnp.asarray(1 << np.arange(m), jnp.float32)
    return jnp.round(bits @ w).astype(jnp.int32)


@functools.lru_cache(maxsize=32)
def make_rs_encoder(code):
    """jitted msg symbols [B, k] (ints) -> codeword [B, n] int32."""
    m = code.m
    P = jnp.asarray(_parity_table_bits(code), jnp.float32)

    @jax.jit
    def encode(msg):
        bits = _sym_to_bits(jnp.asarray(msg), m)  # [B, k, m]
        flat = bits.reshape(bits.shape[:-2] + (code.k * m,))
        parity = mod2(flat @ P).reshape(bits.shape[:-2] + (2 * code.t, m))
        return jnp.concatenate(
            [_bits_to_sym(bits, m), _bits_to_sym(parity, m)], axis=-1)

    return encode


def rs_encode(code, msg):
    """Systematic RS encode: symbol ints [..., k] -> [..., n]."""
    return make_rs_encoder(code)(jnp.asarray(msg))


@functools.lru_cache(maxsize=32)
def make_rs_decoder(code, chien_block=None):
    """jitted received symbols [B, n] -> (corrected [B, n] int32,
    n_err [B] int32, ok [B] bool).

    ``n_err`` counts corrected SYMBOL errors; ``ok`` False flags a
    detected failure (> t errors).
    """
    m, t = code.m, code.t
    if chien_block is None:
        chien_block = min(512, code.n_parent)
    D = chien_block
    size = code.n_parent
    S_tab = jnp.asarray(_syndrome_table_bits(code), jnp.float32)
    R_mat = jnp.asarray(gf_reduce_matrix(m), jnp.float32)
    SQ_mat = jnp.asarray(gf_square_matrix(m), jnp.float32)
    lam_eval_np, lam_step_np = chien_tables(m, t, size, D)
    # Forney numerator X^{1-fcr} * Omega(X^{-1}): coefficient omega_u
    # rides exponent u - (1 - fcr) (exponent -1 for fcr=0's X factor)
    om_exps = [u - (1 - code.fcr) for u in range(2 * t)]
    om_eval_np, om_step_np = chien_tables(m, 2 * t - 1, size, D,
                                          exps=om_exps)
    # Lambda'(x): coefficients d_j = lam_{j+1} for even j, else 0
    dv_eval_np, dv_step_np = chien_tables(m, max(t - 1, 0), size, D)
    lam_eval = jnp.asarray(lam_eval_np, jnp.float32)
    lam_step = jnp.asarray(lam_step_np, jnp.float32)
    om_eval = jnp.asarray(om_eval_np, jnp.float32)
    om_step = jnp.asarray(om_step_np, jnp.float32)
    dv_eval = jnp.asarray(dv_eval_np, jnp.float32)
    dv_step = jnp.asarray(dv_step_np, jnp.float32)
    n_blocks = -(-size // D)

    @jax.jit
    def decode(r_syms):
        r_syms = jnp.asarray(r_syms)
        B = r_syms.shape[0]
        r_bits = _sym_to_bits(r_syms, m)  # [B, n, m]
        flat = r_bits.reshape(B, code.n * m)
        synd = mod2(flat @ S_tab).reshape(B, 2 * t, m)

        lam, Lr = bm_inversionless(synd, t, m, R_mat)

        # Omega = S(x) * Lambda(x) mod x^{2t} (bit-sliced convolution)
        om = jnp.zeros((B, 2 * t, m), jnp.float32)
        for j in range(t + 1):
            prod = conv_xor(lam[:, j:j + 1, :], synd[:, :2 * t - j, :],
                            m, R_mat)
            om = om.at[:, j:].add(prod)
        om = mod2(om)
        # Lambda' coefficients (char-2 formal derivative)
        dmask = np.zeros(max(t, 1), np.float32)
        dmask[0::2] = 1.0  # keep lam_{j+1} for even j
        dv = lam[:, 1:t + 1, :] * jnp.asarray(dmask)[None, :, None]

        mu_l = lam.reshape(B, (t + 1) * m)
        mu_o = om.reshape(B, 2 * t * m)
        mu_d = dv.reshape(B, max(t, 1) * m)

        def chien_step(carry, _):
            mu_l, mu_o, mu_d = carry
            lv = mod2(mu_l @ lam_eval).reshape(B, D, m)
            ov = mod2(mu_o @ om_eval).reshape(B, D, m)
            dvv = mod2(mu_d @ dv_eval).reshape(B, D, m)
            is_root = ~jnp.any(lv > 0, axis=-1)
            # e = omega_eff(Xinv) * inv(Lambda'(Xinv)) at the roots
            inv_d = gf_inverse_bits(dvv, m, SQ_mat, R_mat)
            mag = conv_xor(ov, inv_d, m, R_mat)  # [B, D, m]
            mag = mag * is_root[..., None]
            mu_l = mod2(mu_l @ lam_step)
            mu_o = mod2(mu_o @ om_step)
            mu_d = mod2(mu_d @ dv_step)
            return (mu_l, mu_o, mu_d), (is_root, mag)

        _, (roots, mags) = lax.scan(
            chien_step, (mu_l, mu_o, mu_d), None, length=n_blocks)
        roots = roots.transpose(1, 0, 2).reshape(B, n_blocks * D)
        roots = roots[:, :size]
        mags = mags.transpose(1, 0, 2, 3).reshape(B, n_blocks * D, m)
        mags = mags[:, :size]

        degs = code.n - 1 - np.arange(code.n)
        err_wire = roots[:, degs]  # [B, n]
        err_mag_bits = mags[:, degs]  # [B, n, m]
        corrected_bits = mod2(r_bits + err_mag_bits)
        corrected = _bits_to_sym(corrected_bits, m)

        total_roots = jnp.sum(roots.astype(jnp.int32), axis=-1)
        in_range = jnp.sum(err_wire.astype(jnp.int32), axis=-1)
        ok = (total_roots == Lr) & (in_range == total_roots)
        corrected = jnp.where(ok[:, None], corrected, r_syms.astype(
            jnp.int32))
        return corrected, in_range, ok

    return decode


def rs_decode(code, r_syms):
    """Hard-decision decode: [B, n] symbol ints -> (corrected, n_errors,
    ok).  On failure (ok=False) the received word is returned as is."""
    return make_rs_decoder(code)(jnp.asarray(r_syms))


@functools.lru_cache(maxsize=32)
def make_rs_errata_decoder(code, chien_block=None):
    """jitted (r_syms [B, n], erasure_mask [B, n]) -> (corrected,
    n_errata, ok): errors-AND-erasures decoding.

    Corrects e errors plus f flagged erasures whenever 2e + f <= 2t
    (f <= 2t).  The erasure locator Gamma = prod (1 - X_i x) builds in
    an n-step scan of per-position constant-multiply matrices;
    Berlekamp-Massey starts from (Gamma, L=f) with its first f
    iterations masked per batch element (growth condition
    2L <= r + f), yielding the errata locator Psi = Lambda * Gamma
    directly; Chien/Forney run at degree 2t.  With an empty mask this
    reduces exactly to :func:`make_rs_decoder` (tested); the plain
    decoder is kept separate so the errors-only path never pays the
    n-step Gamma scan or the doubled locator degree.
    """
    m, t = code.m, code.t
    if chien_block is None:
        chien_block = min(512, code.n_parent)
    D = chien_block
    size = code.n_parent
    exp, _ = gf_tables(m)
    S_tab = jnp.asarray(_syndrome_table_bits(code), jnp.float32)
    R_mat = jnp.asarray(gf_reduce_matrix(m), jnp.float32)
    SQ_mat = jnp.asarray(gf_square_matrix(m), jnp.float32)
    ns = 2 * t + 1  # errata locator reaches degree 2t
    lam_eval_np, lam_step_np = chien_tables(m, 2 * t, size, D)
    om_exps = [u - (1 - code.fcr) for u in range(2 * t)]
    om_eval_np, om_step_np = chien_tables(m, 2 * t - 1, size, D,
                                          exps=om_exps)
    dv_eval_np, dv_step_np = chien_tables(m, 2 * t - 1, size, D)
    lam_eval = jnp.asarray(lam_eval_np, jnp.float32)
    lam_step = jnp.asarray(lam_step_np, jnp.float32)
    om_eval = jnp.asarray(om_eval_np, jnp.float32)
    om_step = jnp.asarray(om_step_np, jnp.float32)
    dv_eval = jnp.asarray(dv_eval_np, jnp.float32)
    dv_step = jnp.asarray(dv_step_np, jnp.float32)
    n_blocks = -(-size // D)
    # per-position X_p = alpha^{deg_p} constant-multiply matrices
    degs_np = code.n - 1 - np.arange(code.n)
    Mx_np = np.stack([
        gf_constant_mult_matrix(int(exp[int(d) % size]), m)
        for d in degs_np])  # [n, m, m]
    Mx = jnp.asarray(Mx_np, jnp.float32)

    @jax.jit
    def decode(r_syms, erasure_mask):
        r_syms = jnp.asarray(r_syms)
        B = r_syms.shape[0]
        mask = jnp.asarray(erasure_mask).astype(jnp.float32)  # [B, n]
        r_bits = _sym_to_bits(r_syms, m)
        flat = r_bits.reshape(B, code.n * m)
        synd = mod2(flat @ S_tab).reshape(B, 2 * t, m)

        # Gamma = prod over erased p of (1 + X_p x), degree capped at 2t
        gamma0 = jnp.zeros((B, ns, m), jnp.float32).at[:, 0, 0].set(1.0)

        def gamma_step(gamma, x):
            Mp, mk = x  # [m, m], [B]
            prod = mod2(gamma @ Mp)  # [B, ns, m]
            shifted = jnp.concatenate(
                [jnp.zeros((B, 1, m), jnp.float32), prod[:, :-1]], axis=1)
            return mod2(gamma + mk[:, None, None] * shifted), None

        gamma, _ = lax.scan(gamma_step, gamma0, (Mx, mask.T))
        f = jnp.sum(mask, axis=-1).astype(jnp.int32)  # [B]

        lam, Lr = bm_inversionless(synd, t, m, R_mat, nslots=ns,
                                   init=(gamma, f), start=f, nf=f)

        # Omega = S(x) * Psi(x) mod x^{2t}
        om = jnp.zeros((B, 2 * t, m), jnp.float32)
        for j in range(2 * t):
            prod = conv_xor(lam[:, j:j + 1, :], synd[:, :2 * t - j, :],
                            m, R_mat)
            om = om.at[:, j:].add(prod)
        om = mod2(om)
        # Psi' (char-2 formal derivative): d_k = psi_{k+1} for even k
        dmask = np.zeros(2 * t, np.float32)
        dmask[0::2] = 1.0
        dv = lam[:, 1:, :] * jnp.asarray(dmask)[None, :, None]

        mu_l = lam.reshape(B, ns * m)
        mu_o = om.reshape(B, 2 * t * m)
        mu_d = dv.reshape(B, 2 * t * m)

        def chien_step(carry, _):
            mu_l, mu_o, mu_d = carry
            lv = mod2(mu_l @ lam_eval).reshape(B, D, m)
            ov = mod2(mu_o @ om_eval).reshape(B, D, m)
            dvv = mod2(mu_d @ dv_eval).reshape(B, D, m)
            is_root = ~jnp.any(lv > 0, axis=-1)
            inv_d = gf_inverse_bits(dvv, m, SQ_mat, R_mat)
            mag = conv_xor(ov, inv_d, m, R_mat)
            mag = mag * is_root[..., None]
            mu_l = mod2(mu_l @ lam_step)
            mu_o = mod2(mu_o @ om_step)
            mu_d = mod2(mu_d @ dv_step)
            return (mu_l, mu_o, mu_d), (is_root, mag)

        _, (roots, mags) = lax.scan(
            chien_step, (mu_l, mu_o, mu_d), None, length=n_blocks)
        roots = roots.transpose(1, 0, 2).reshape(B, n_blocks * D)[:, :size]
        mags = mags.transpose(1, 0, 2, 3).reshape(
            B, n_blocks * D, m)[:, :size]

        degs = code.n - 1 - np.arange(code.n)
        err_wire = roots[:, degs]
        err_mag_bits = mags[:, degs]
        corrected_bits = mod2(r_bits + err_mag_bits)
        corrected = _bits_to_sym(corrected_bits, m)

        total_roots = jnp.sum(roots.astype(jnp.int32), axis=-1)
        in_range = jnp.sum(err_wire.astype(jnp.int32), axis=-1)
        ok = (total_roots == Lr) & (in_range == total_roots) & (f <= 2 * t)
        corrected = jnp.where(ok[:, None], corrected,
                              r_syms.astype(jnp.int32))
        return corrected, in_range, ok

    return decode


def rs_errata_decode(code, r_syms, erasure_mask):
    """Errors-and-erasures decode: corrects e errors + f erasures while
    2e + f <= 2t.  Returns (corrected, n_errata, ok)."""
    return make_rs_errata_decoder(code)(jnp.asarray(r_syms),
                                        jnp.asarray(erasure_mask))


@functools.lru_cache(maxsize=32)
def make_rs_gmd_decoder(code, chien_block=None):
    """jitted (r_syms [B, n], reliability [B, n]) -> (corrected,
    n_errata, ok): Forney's Generalized Minimum Distance soft decoding.

    Runs t+1 errors-and-erasures trials — erasing the 0, 2, ..., 2t
    LEAST-reliable symbols — as ONE batched errata decode (the trial
    axis folds into the batch), then picks the successful candidate
    with the smallest soft discrepancy (sum of reliabilities at the
    positions it changed).

    Intended for INFORMATIVE reliabilities — bimodal confidence such as
    interleaver-flagged burst spans, fading nulls, or demapper
    erasure hints — where it recovers beyond-t patterns whose errors
    sit at clearly-low-reliability symbols (tested).  On
    weakly-informative reliabilities (plain-AWGN |LLR| spreads) the
    large-f trials alias (at f = 2t any interpolation through the
    unerased symbols reports ok) with soft scores comparable to the
    correct candidate's, and hard decoding is the better tool — this
    was measured, not guessed (see ROADMAP round-4 notes).  Falls back
    to the received word with ok=False when no trial succeeds.
    """
    t = code.t
    errata = make_rs_errata_decoder(code, chien_block=chien_block)
    n_trials = t + 1

    @jax.jit
    def decode(r_syms, reliability):
        r_syms = jnp.asarray(r_syms)
        rel = jnp.asarray(reliability, jnp.float32)
        B, n = r_syms.shape
        # rank[b, i] = how many symbols are less reliable than i
        order = jnp.argsort(rel, axis=-1)
        rank = jnp.argsort(order, axis=-1)
        # trial j erases rank < 2j
        masks = rank[:, None, :] < (2 * jnp.arange(n_trials))[None, :, None]
        rx_t = jnp.broadcast_to(r_syms[:, None, :], (B, n_trials, n))
        corr, nerr, ok = errata(rx_t.reshape(B * n_trials, n),
                                masks.reshape(B * n_trials, n))
        corr = corr.reshape(B, n_trials, n)
        nerr = nerr.reshape(B, n_trials)
        ok = ok.reshape(B, n_trials)
        changed = (corr != r_syms[:, None, :]).astype(jnp.float32)
        score = jnp.sum(changed * rel[:, None, :], axis=-1)
        score = jnp.where(ok, score, jnp.inf)
        best = jnp.argmin(score, axis=-1)  # [B]
        sel = best[:, None] == jnp.arange(n_trials)[None, :]
        any_ok = jnp.any(ok, axis=-1)
        corrected = jnp.sum(corr * sel[..., None].astype(corr.dtype),
                            axis=1)
        corrected = jnp.where(any_ok[:, None], corrected,
                              r_syms.astype(jnp.int32))
        n_out = jnp.sum(nerr * sel.astype(nerr.dtype), axis=-1)
        n_out = jnp.where(any_ok, n_out, 0)
        return corrected, n_out, any_ok

    return decode


def rs_gmd_decode(code, r_syms, reliability):
    """GMD soft-decision decode (t+1 batched erasure trials).

    ``reliability`` [B, n]: larger = more trustworthy symbol (e.g. the
    minimum |LLR| over the symbol's bits).  Returns (corrected,
    n_errata, ok)."""
    return make_rs_gmd_decoder(code)(jnp.asarray(r_syms),
                                     jnp.asarray(reliability))
