r"""Independent NumPy golden reference for polar encode / SC / SCL decode.

Test-only. Written from the textbook definitions (Arikan 2009; LLR-based
SCL per Balatsoukas-Stimming et al. 2015) as a recursive/list reference,
deliberately structured differently from the iterative flat-buffer scan in
``commpy_tpu/ops/polar.py`` so agreement is meaningful.

All arithmetic is float32 so the min-sum / approx-PM configurations can be
compared bit-exactly against the XLA CPU backend (same IEEE-754 ops).

Conventions (must match ops/polar.py):
  * G = F^{\otimes n}, F = [[1,0],[1,1]], NO bit-reversal permutation.
  * u-domain index i's synthetic channel follows the MSB-first recursion
    (z_{2i} = degraded, z_{2i+1} = upgraded).
  * f pairing: element i of the first half with element i of the second.
  * LLR sign: llr = log P(x=0)/P(x=1); hard decision bit = (llr < 0).
  * SCL candidate index c = bit * P + parent; survivors kept in ascending
    path-metric rank order, ties by lower candidate index.
"""
import numpy as np

F32 = np.float32


def encode_np(u):
    r"""u [..., N] bits -> x = u @ F^{\otimes n} mod 2, via explicit kron."""
    N = u.shape[-1]
    n = int(np.log2(N))
    G = np.array([[1]], dtype=np.int64)
    F = np.array([[1, 0], [1, 1]], dtype=np.int64)
    for _ in range(n):
        G = np.kron(G, F)
    return (u.astype(np.int64) @ G) % 2


def f_minsum(a, b):
    return (np.sign(a) * np.sign(b) * np.minimum(np.abs(a), np.abs(b))).astype(F32)


def f_exact(a, b):
    # log((1 + e^{a+b}) / (e^a + e^b)) in stable form.
    return (np.logaddexp(F32(0.0), a + b) - np.logaddexp(a, b)).astype(F32)


def g_op(a, b, s):
    return (b + (F32(1.0) - F32(2.0) * s.astype(F32)) * a).astype(F32)


def _f(rule):
    return f_minsum if rule == "minsum" else f_exact


def sc_decode_np(llr, frozen, rule="minsum"):
    """Recursive SC decode of one frame. llr [N] f32, frozen [N] bool.

    Returns u_hat [N] (all decisions, frozen positions forced to 0).
    """
    llr = llr.astype(F32)
    f = _f(rule)

    def rec(alpha, fr):
        if alpha.shape[0] == 1:
            bit = np.int64(0) if fr[0] else np.int64(alpha[0] < 0)
            return np.array([bit]), np.array([bit])
        h = alpha.shape[0] // 2
        a, b = alpha[:h], alpha[h:]
        u1, b1 = rec(f(a, b), fr[:h])
        u2, b2 = rec(g_op(a, b, b1), fr[h:])
        return np.concatenate([u1, u2]), np.concatenate([b1 ^ b2, b2])

    u_hat, _ = rec(llr, frozen)
    return u_hat


def softplus_np(x):
    x = np.asarray(x, dtype=F32)
    return (np.maximum(x, F32(0.0)) + np.log1p(np.exp(-np.abs(x)))).astype(F32)


def pm_penalty_np(llr, bit, pm_rule):
    """Path-metric increment for deciding ``bit`` against LLR ``llr``."""
    llr = F32(llr)
    if pm_rule == "approx":
        # |llr| iff decision disagrees with the LLR sign, else 0.
        mismatch = (F32(1.0) - F32(2.0) * F32(bit)) * llr < 0
        return np.abs(llr) if mismatch else F32(0.0)
    return softplus_np(-(F32(1.0) - F32(2.0) * F32(bit)) * llr)


class _Path:
    __slots__ = ("alphas", "betas", "u", "pm")

    def __init__(self, alphas, betas, u, pm):
        self.alphas, self.betas, self.u, self.pm = alphas, betas, u, pm

    def clone(self):
        return _Path([a.copy() for a in self.alphas],
                     [b.copy() for b in self.betas],
                     self.u.copy(), self.pm)


def scl_decode_np(llr, frozen, list_size, rule="minsum", pm_rule="approx",
                  crc_check=None):
    """List-SC decode of one frame; returns (u_hat [N], pms [P], all_u [P,N]).

    ``crc_check``: optional callable bits[K_nonfrozen] -> bool; the winner is
    the lowest-PM path passing CRC, falling back to lowest PM overall.
    """
    llr = llr.astype(F32)
    N = llr.shape[0]
    n = int(np.log2(N))
    f = _f(rule)

    # Iterative flat-level formulation mirroring the hardware-style decoder:
    # alphas[l] holds the active node's LLRs at level l (2^l values, level n
    # = channel); betas[l] holds pending left partial sums at level l.
    def fresh():
        return _Path([np.zeros(1 << l, F32) for l in range(n)] + [llr.copy()],
                     [np.zeros(1 << l, np.int64) for l in range(n)],
                     np.zeros(N, np.int64), F32(0.0))

    paths = [fresh()]

    for phi in range(N):
        # LLR phase: g at level t (phi > 0), then f down to level 0.
        if phi == 0:
            t = n
        else:
            t = (phi & -phi).bit_length() - 1  # ntz(phi)
        for p in paths:
            if phi > 0:
                src = p.alphas[t + 1]
                h = 1 << t
                p.alphas[t] = g_op(src[:h], src[h:], p.betas[t])
            for l in range(min(t, n) - 1, -1, -1):
                src = p.alphas[l + 1]
                h = 1 << l
                p.alphas[l] = f(src[:h], src[h:])

        # Decision phase.
        if frozen[phi]:
            for p in paths:
                p.pm = F32(p.pm + pm_penalty_np(p.alphas[0][0], 0, pm_rule))
                p.u[phi] = 0
        else:
            cand = []  # (pm, candidate_index, parent, bit)
            for bit in (0, 1):
                for pi, p in enumerate(paths):
                    pm = F32(p.pm + pm_penalty_np(p.alphas[0][0], bit, pm_rule))
                    cand.append((pm, bit * list_size + pi, pi, bit))
            order = sorted(range(len(cand)), key=lambda i: (cand[i][0], cand[i][1]))
            keep = [cand[i] for i in order[:list_size]]
            new_paths = []
            for pm, _, parent, bit in keep:
                q = paths[parent].clone()
                q.pm = pm
                q.u[phi] = bit
                new_paths.append(q)
            paths = new_paths

        # Partial-sum phase.
        for p in paths:
            b = np.array([p.u[phi]], np.int64)
            l, psi = 0, phi
            while psi & 1:
                b = np.concatenate([p.betas[l] ^ b, b])
                l += 1
                psi >>= 1
            if l < n:
                p.betas[l] = b

    pms = np.array([p.pm for p in paths], F32)
    all_u = np.stack([p.u for p in paths])
    winner = int(np.argmin(pms))  # first occurrence on ties
    if crc_check is not None:
        info = ~np.asarray(frozen)
        passing = [i for i, p in enumerate(paths) if crc_check(p.u[info])]
        if passing:
            winner = min(passing, key=lambda i: (pms[i], i))
    return all_u[winner], pms, all_u


def crc_remainder_np(bits, poly_bits):
    """Bitwise long-division CRC (init=0): returns remainder [len(poly)-1]."""
    work = np.concatenate([np.asarray(bits, np.int64),
                           np.zeros(len(poly_bits) - 1, np.int64)])
    p = np.asarray(poly_bits, np.int64)
    for i in range(len(bits)):
        if work[i]:
            work[i:i + len(p)] ^= p
    return work[len(bits):]
