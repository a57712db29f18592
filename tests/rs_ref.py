"""Independent NumPy golden for Reed-Solomon encode/decode.

Textbook log/antilog-table implementation (classic BM with inversion,
Horner Chien, Forney) — deliberately different machinery from the
bit-sliced device codec in commpy_tpu/ops/rs.py.  Conventions match:
wire symbol j carries coefficient x^{n-1-j}; systematic, message first;
g(x) = prod_{j=fcr}^{fcr+2t-1} (x - alpha^j).
"""
import numpy as np

from bch_ref import GfTab


def _poly_eval(gf, coeffs_low_first, x):
    """Evaluate a field polynomial at x (Horner, high degree first)."""
    acc = 0
    for c in reversed(coeffs_low_first):
        acc = gf.mul(acc, x) ^ int(c)
    return acc


def encode_np(msg, genpoly, n, m):
    """Systematic encode by symbol long division: [k] ints -> [n] ints."""
    gf = GfTab(m)
    g = list(genpoly)  # low-first, monic
    r = len(g) - 1
    work = list(np.asarray(msg, np.int64)) + [0] * r
    for i in range(len(msg)):
        top = work[i]
        if top:
            for j in range(r + 1):
                work[i + j] ^= gf.mul(top, g[r - j])
    return np.concatenate(
        [np.asarray(msg, np.int64), np.asarray(work[len(msg):], np.int64)])


def decode_np(r_syms, m, t, n, fcr=1):
    """Hard-decision RS decode of one frame of symbol ints.

    Returns (corrected [n], n_errors, ok).  On failure the received
    word is returned unchanged (matching the device codec).
    """
    gf = GfTab(m)
    size = gf.size
    r_syms = np.asarray(r_syms, np.int64)
    degs = n - 1 - np.arange(n)

    S = []
    for i in range(2 * t):
        acc = 0
        for p in range(n):
            if r_syms[p]:
                acc ^= gf.mul(int(r_syms[p]),
                              int(gf.exp[((fcr + i) * int(degs[p])) % size]))
        S.append(int(acc))
    if not any(S):
        return r_syms.copy(), 0, True

    # classic Berlekamp-Massey with inversion
    C = [1] + [0] * (2 * t)
    Bp = [1] + [0] * (2 * t)
    L, mm, b = 0, 1, 1
    for step in range(2 * t):
        d = S[step]
        for i in range(1, L + 1):
            d ^= gf.mul(C[i], S[step - i])
        if d == 0:
            mm += 1
        elif 2 * L <= step:
            T = C[:]
            coef = gf.mul(d, gf.inv(b))
            for i in range(len(C) - mm):
                C[i + mm] ^= gf.mul(coef, Bp[i])
            L = step + 1 - L
            Bp = T
            b = d
            mm = 1
        else:
            coef = gf.mul(d, gf.inv(b))
            for i in range(len(C) - mm):
                C[i + mm] ^= gf.mul(coef, Bp[i])
            mm += 1
    lam = C[:L + 1]

    # Omega = S(x) * Lambda(x) mod x^{2t}
    om = [0] * (2 * t)
    for u in range(2 * t):
        acc = 0
        for j in range(0, min(u, len(lam) - 1) + 1):
            acc ^= gf.mul(lam[j], S[u - j])
        om[u] = acc

    # Chien + Forney over the parent field
    err = {}
    n_roots = 0
    for e in range(size):
        xinv = int(gf.exp[(-e) % size])
        if _poly_eval(gf, lam, xinv) != 0:
            continue
        n_roots += 1
        # Lambda'(xinv): odd-degree terms only
        dv = 0
        for j in range(1, len(lam), 2):
            dv ^= gf.mul(lam[j], int(gf.exp[((j - 1) * (-e)) % size]))
        if dv == 0:
            return r_syms.copy(), 0, False
        num = _poly_eval(gf, om, xinv)
        x_pow = int(gf.exp[((1 - fcr) * e) % size])  # X^{1-fcr}
        mag = gf.mul(gf.mul(num, x_pow), gf.inv(dv))
        err[e] = mag

    in_range = {e: v for e, v in err.items() if e < n}
    ok = (n_roots == L) and (len(in_range) == n_roots)
    if not ok:
        return r_syms.copy(), len(in_range), False
    corrected = r_syms.copy()
    for e, v in in_range.items():
        corrected[n - 1 - e] ^= v
    return corrected, len(in_range), True
