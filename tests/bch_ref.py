"""Independent NumPy golden for binary BCH encode/decode.

Textbook log/antilog-table implementation (classic Berlekamp-Massey with
inversion, per-position Horner Chien search) — deliberately different
machinery from the bit-sliced device codec in commpy_tpu/ops/bch.py.
Conventions match: wire bit j carries coefficient x^{n-1-j}; systematic
encode keeps the message first.
"""
import numpy as np

from commpy_tpu.ops.galois import _PRIMPOLYS


class GfTab:
    def __init__(self, m):
        self.m = m
        self.size = (1 << m) - 1
        prim = int(_PRIMPOLYS[m])
        self.exp = np.zeros(2 * self.size, np.int64)
        self.log = np.zeros(1 << m, np.int64)
        x = 1
        for i in range(self.size):
            self.exp[i] = x
            self.log[x] = i
            x <<= 1
            if x >> m:
                x ^= prim
        self.exp[self.size:] = self.exp[:self.size]

    def mul(self, a, b):
        if a == 0 or b == 0:
            return 0
        return int(self.exp[(self.log[a] + self.log[b]) % self.size])

    def inv(self, a):
        return int(self.exp[(self.size - self.log[a]) % self.size])


def encode_np(msg, genpoly, n):
    """Systematic encode by long division: [k] bits -> [n] bits."""
    g = np.asarray(genpoly, np.int64)[::-1]  # high-degree first
    r = len(g) - 1
    work = np.concatenate([np.asarray(msg, np.int64), np.zeros(r, np.int64)])
    for i in range(len(msg)):
        if work[i]:
            work[i:i + len(g)] ^= g
    return np.concatenate([np.asarray(msg, np.int64), work[len(msg):]])


def decode_np(r_bits, m, t, n):
    """Hard-decision BCH decode of one frame.

    Returns (corrected [n], n_errors, ok).
    """
    gf = GfTab(m)
    n_parent = gf.size
    r_bits = np.asarray(r_bits, np.int64)
    degs = n - 1 - np.arange(n)

    # syndromes S_j = r(alpha^j), j = 1..2t
    S = []
    for j in range(1, 2 * t + 1):
        acc = 0
        for i in range(n):
            if r_bits[i]:
                acc ^= gf.exp[(degs[i] * j) % n_parent]
        S.append(int(acc))
    if not any(S):
        return r_bits.copy(), 0, True

    # classic Berlekamp-Massey (with inversion)
    C = [1] + [0] * (2 * t)   # connection polynomial
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

    # Chien search over the parent field: root at alpha^{-e} => error at
    # coefficient degree e
    err_degs = []
    for e in range(n_parent):
        acc = 0
        for k, lk in enumerate(lam):
            if lk:
                acc ^= gf.exp[(gf.log[lk] + (-e * k) % n_parent)
                              % n_parent]
        if acc == 0:
            err_degs.append(e)
    corrected = r_bits.copy()
    in_range = [e for e in err_degs if e < n]
    for e in in_range:
        corrected[n - 1 - e] ^= 1
    ok = (len(err_degs) == L) and (len(in_range) == len(err_degs))
    return corrected, len(in_range), ok
