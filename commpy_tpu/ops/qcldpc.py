"""Quasi-cyclic LDPC codes: base-graph expansion, GF(2) systematic
encoding, and roll-based belief propagation that scales to production
codes.

The generic decoder (:mod:`commpy_tpu.ops.ldpc`) routes messages through a
dense edge->vnode incidence matmul — exact and fast for the shipped
WiMAX-size designs, but quadratic in code length (reference
commpy/channelcoding/ldpc.py:144-255 has the same capability ceiling in
sparse-matrix form).  Production codes (IEEE 802.11n/ac, 802.16e, 5G NR)
are all QUASI-CYCLIC: H is an [Mb x Nb] grid of Z x Z blocks, each either
zero or a cyclic shift P^s of the identity.  That structure turns every
message permutation into a lane **roll** (two slices + a concat on TPU —
no gathers, no incidence matrix, O(E) work):

* check (i, z) of block row i connects variable (j, (z + s) % Z) for each
  nonzero block (j, s) in row i -> v2c messages are ``roll(v[j], -s)``;
* the reverse scatter is ``roll(msg, +s)`` summed into block column j.

The edge tensor is ``[B, Mb, Z, K]`` (K = max nonzero blocks per row)
with Z on the sublane-friendly axis and the leave-one-out CN reductions
over the short K axis, so SPA/MSA check updates reuse the same two-pass
prefix/suffix tricks as the dense decoder.

Shipped base graphs: the full IEEE 802.11n (2009) Annex R matrix set —
n in {648, 1296, 1944} (Z in {27, 54, 81}) x rates {1/2, 2/3, 3/4, 5/6},
twelve configurations, reconstructed from the standard's published
tables (also printed as IEEE 802.11-2012 Annex F, Tables F-1..F-3).
``detect_qc_structure`` lifts any design-file code (e.g. the WiMAX
1440.720 asset) onto this path when its H is circulant.

DVB-S2 (ETSI EN 302 307-1) codes are handled by :mod:`.dvbs2` — the
accumulator/address-table machinery is implemented there; see its module
docstring for the provenance of the shipped tables.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "qc_code_params",
    "detect_qc_structure",
    "ieee80211n_params",
    "random_qc_params",
    "qc_girth",
    "qc_export_design",
    "qc_encode_device",
    "qc_bp_decode_device",
    "qc_bp_decode_sharded",
    "IEEE80211N_BASE",
]

_llr_max = 500.0  # match reference ldpc.py:11 clipping


# --------------------------------------------------------------------------
# IEEE 802.11n base matrices (Annex R), -1 = zero block
# --------------------------------------------------------------------------

_80211N_R12_Z27 = """
 0 -1 -1 -1  0  0 -1 -1  0 -1 -1  0  1  0 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1
22  0 -1 -1 17 -1  0  0 12 -1 -1 -1 -1  0  0 -1 -1 -1 -1 -1 -1 -1 -1 -1
 6 -1  0 -1 10 -1 -1 -1 24 -1  0 -1 -1 -1  0  0 -1 -1 -1 -1 -1 -1 -1 -1
 2 -1 -1  0 20 -1 -1 -1 25  0 -1 -1 -1 -1 -1  0  0 -1 -1 -1 -1 -1 -1 -1
23 -1 -1 -1  3 -1 -1 -1  0 -1  9 11 -1 -1 -1 -1  0  0 -1 -1 -1 -1 -1 -1
24 -1 23  1 17 -1  3 -1 10 -1 -1 -1 -1 -1 -1 -1 -1  0  0 -1 -1 -1 -1 -1
25 -1 -1 -1  8 -1 -1 -1  7 18 -1 -1  0 -1 -1 -1 -1 -1  0  0 -1 -1 -1 -1
13 24 -1 -1  0 -1  8 -1  6 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1  0  0 -1 -1 -1
 7 20 -1 16 22 10 -1 -1 23 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1  0  0 -1 -1
11 -1 -1 -1 19 -1 -1 -1 13 -1  3 17 -1 -1 -1 -1 -1 -1 -1 -1 -1  0  0 -1
25 -1  8 -1 23 18 -1 14  9 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1  0  0
 3 -1 -1 -1 16 -1 -1  2 25  5 -1 -1  1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1  0
"""

_80211N_R12_Z81 = """
57 -1 -1 -1 50 -1 11 -1 50 -1 79 -1  1  0 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1
 3 -1 28 -1  0 -1 -1 -1 55  7 -1 -1 -1  0  0 -1 -1 -1 -1 -1 -1 -1 -1 -1
30 -1 -1 -1 24 37 -1 -1 56 14 -1 -1 -1 -1  0  0 -1 -1 -1 -1 -1 -1 -1 -1
62 53 -1 -1 53 -1 -1  3 35 -1 -1 -1 -1 -1 -1  0  0 -1 -1 -1 -1 -1 -1 -1
40 -1 -1 20 66 -1 -1 22 28 -1 -1 -1 -1 -1 -1 -1  0  0 -1 -1 -1 -1 -1 -1
 0 -1 -1 -1  8 -1 42 -1 50 -1 -1  8 -1 -1 -1 -1 -1  0  0 -1 -1 -1 -1 -1
69 79 79 -1 -1 -1 56 -1 52 -1 -1 -1  0 -1 -1 -1 -1 -1  0  0 -1 -1 -1 -1
65 -1 -1 -1 38 57 -1 -1 72 -1 27 -1 -1 -1 -1 -1 -1 -1 -1  0  0 -1 -1 -1
64 -1 -1 -1 14 52 -1 -1 30 -1 -1 32 -1 -1 -1 -1 -1 -1 -1 -1  0  0 -1 -1
-1 45 -1 70  0 -1 -1 -1 77  9 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1  0  0 -1
 2 56 -1 57 35 -1 -1 -1 -1 -1 12 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1  0  0
24 -1 61 -1 60 -1 -1 27 51 -1 -1 16  1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1  0
"""


_80211N_R23_Z27 = """
25 26 14 -1 20 -1  2 -1  4 -1 -1  8 -1 16 -1 18  1  0 -1 -1 -1 -1 -1 -1
10  9 15 11 -1  0 -1  1 -1 -1 18 -1  8 -1 10 -1 -1  0  0 -1 -1 -1 -1 -1
16  2 20 26 21 -1  6 -1  1 26 -1  7 -1 -1 -1 -1 -1 -1  0  0 -1 -1 -1 -1
10 13  5  0 -1  3 -1  7 -1 -1 26 -1 -1 13 -1 16 -1 -1 -1  0  0 -1 -1 -1
23 14 24 -1 12 -1 19 -1 17 -1 -1 -1 20 -1 21 -1  0 -1 -1 -1  0  0 -1 -1
 6 22  9 20 -1 25 -1 17 -1  8 -1 14 -1 18 -1 -1 -1 -1 -1 -1 -1  0  0 -1
14 23 21 11 20 -1 24 -1 18 -1 19 -1 -1 -1 -1 22 -1 -1 -1 -1 -1 -1  0  0
17 11 11 20 -1 21 -1 26 -1  3 -1 -1 18 -1 26 -1  1 -1 -1 -1 -1 -1 -1  0
"""

_80211N_R34_Z27 = """
16 17 22 24  9  3 14 -1  4  2  7 -1 26 -1  2 -1 21 -1  1  0 -1 -1 -1 -1
25 12 12  3  3 26  6 21 -1 15 22 -1 15 -1  4 -1 -1 16 -1  0  0 -1 -1 -1
25 18 26 16 22 23  9 -1  0 -1  4 -1  4 -1  8 23 11 -1 -1 -1  0  0 -1 -1
 9  7  0  1 17 -1 -1  7  3 -1  3 23 -1 16 -1 -1 21 -1  0 -1 -1  0  0 -1
24  5 26  7  1 -1 -1 15 24 15 -1  8 -1 13 -1 13 -1 11 -1 -1 -1 -1  0  0
 2  2 19 14 24  1 15 19 -1 21 -1  2 -1 24 -1  3 -1  2  1 -1 -1 -1 -1  0
"""

_80211N_R56_Z27 = """
17 13  8 21  9  3 18 12 10  0  4 15 19  2  5 10 26 19 13 13  1  0 -1 -1
 3 12 11 14 11 25  5 18  0  9  2 26 26 10 24  7 14 20  4  2 -1  0  0 -1
22 16  4  3 10 21 12  5 21 14 19  5 -1  8  5 18 11  5  5 15  0 -1  0  0
 7  7 14 14  4 16 16 24 24 10  1  7 15  6 10 26  8 18 21 14  1 -1 -1  0
"""

_80211N_R12_Z54 = """
40 -1 -1 -1 22 -1 49 23 43 -1 -1 -1  1  0 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1
50  1 -1 -1 48 35 -1 -1 13 -1 30 -1 -1  0  0 -1 -1 -1 -1 -1 -1 -1 -1 -1
39 50 -1 -1  4 -1  2 -1 -1 -1 -1 49 -1 -1  0  0 -1 -1 -1 -1 -1 -1 -1 -1
33 -1 -1 38 37 -1 -1  4  1 -1 -1 -1 -1 -1 -1  0  0 -1 -1 -1 -1 -1 -1 -1
45 -1 -1 -1  0 22 -1 -1 20 42 -1 -1 -1 -1 -1 -1  0  0 -1 -1 -1 -1 -1 -1
51 -1 -1 48 35 -1 -1 -1 44 -1 18 -1 -1 -1 -1 -1 -1  0  0 -1 -1 -1 -1 -1
47 11 -1 -1 -1 17 -1 -1 51 -1 -1 -1  0 -1 -1 -1 -1 -1  0  0 -1 -1 -1 -1
 5 -1 25 -1  6 -1 45 -1 13 40 -1 -1 -1 -1 -1 -1 -1 -1 -1  0  0 -1 -1 -1
33 -1 -1 34 24 -1 -1 -1 23 -1 -1 46 -1 -1 -1 -1 -1 -1 -1 -1  0  0 -1 -1
 1 -1 27 -1  1 -1 -1 -1 38 -1 44 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1  0  0 -1
-1 18 -1 -1 23 -1 -1  8  0 35 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1  0  0
49 -1 17 -1 30 -1 -1 -1 34 -1 -1 19  1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1  0
"""

_80211N_R23_Z54 = """
39 31 22 43 -1 40  4 -1 11 -1 -1 50 -1 -1 -1  6  1  0 -1 -1 -1 -1 -1 -1
25 52 41  2  6 -1 14 -1 34 -1 -1 -1 24 -1 37 -1 -1  0  0 -1 -1 -1 -1 -1
43 31 29  0 21 -1 28 -1 -1  2 -1 -1  7 -1 17 -1 -1 -1  0  0 -1 -1 -1 -1
20 33 48 -1  4 13 -1 26 -1 -1 22 -1 -1 46 42 -1 -1 -1 -1  0  0 -1 -1 -1
45  7 18 51 12 25 -1 -1 -1 50 -1 -1  5 -1 -1 -1  0 -1 -1 -1  0  0 -1 -1
35 40 32 16  5 -1 -1 18 -1 -1 43 51 -1 32 -1 -1 -1 -1 -1 -1 -1  0  0 -1
 9 24 13 22 28 -1 -1 37 -1 -1 25 -1 -1 52 -1 13 -1 -1 -1 -1 -1 -1  0  0
32 22  4 21 16 -1 -1 -1 27 28 -1 38 -1 -1 -1  8  1 -1 -1 -1 -1 -1 -1  0
"""

_80211N_R34_Z54 = """
39 40 51 41  3 29  8 36 -1 14 -1  6 -1 33 -1 11 -1  4  1  0 -1 -1 -1 -1
48 21 47  9 48 35 51 -1 38 -1 28 -1 34 -1 50 -1 50 -1 -1  0  0 -1 -1 -1
30 39 28 42 50 39  5 17 -1  6 -1 18 -1 20 -1 15 -1 40 -1 -1  0  0 -1 -1
29  0  1 43 36 30 47 -1 49 -1 47 -1  3 -1 35 -1 34 -1  0 -1 -1  0  0 -1
 1 32 11 23 10 44 12  7 -1 48 -1  4 -1  9 -1 17 -1 16 -1 -1 -1 -1  0  0
13  7 15 47 23 16 47 -1 43 -1 29 -1 52 -1  2 -1 53 -1  1 -1 -1 -1 -1  0
"""

_80211N_R56_Z54 = """
48 29 37 52  2 16  6 14 53 31 34  5 18 42 53 31 45 -1 46 52  1  0 -1 -1
17  4 30  7 43 11 24  6 14 21  6 39 17 40 47  7 15 41 19 -1 -1  0  0 -1
 7  2 51 31 46 23 16 11 53 40 10  7 46 53 33 35 -1 25 35 38  0 -1  0  0
19 48 41  1 10  7 36 47  5 29 52 52 31 10 26  6  3  2 -1 51  1 -1 -1  0
"""

_80211N_R23_Z81 = """
61 75  4 63 56 -1 -1 -1 -1 -1 -1  8 -1  2 17 25  1  0 -1 -1 -1 -1 -1 -1
56 74 77 20 -1 -1 -1 64 24  4 67 -1  7 -1 -1 -1 -1  0  0 -1 -1 -1 -1 -1
28 21 68 10  7 14 65 -1 -1 -1 23 -1 -1 -1 75 -1 -1 -1  0  0 -1 -1 -1 -1
48 38 43 78 76 -1 -1 -1 -1  5 36 -1 15 72 -1 -1 -1 -1 -1  0  0 -1 -1 -1
40  2 53 25 -1 52 62 -1 20 -1 -1 44 -1 -1 -1 -1  0 -1 -1 -1  0  0 -1 -1
69 23 64 10 22 -1 21 -1 -1 -1 -1 -1 68 23 29 -1 -1 -1 -1 -1 -1  0  0 -1
12  0 68 20 55 61 -1 40 -1 -1 -1 52 -1 -1 -1 44 -1 -1 -1 -1 -1 -1  0  0
58  8 34 64 78 -1 -1 11 78 24 -1 -1 -1 -1 -1 58  1 -1 -1 -1 -1 -1 -1  0
"""

_80211N_R34_Z81 = """
48 29 28 39  9 61 -1 -1 -1 63 45 80 -1 -1 -1 37 32 22  1  0 -1 -1 -1 -1
 4 49 42 48 11 30 -1 -1 -1 49 17 41 37 15 -1 54 -1 -1 -1  0  0 -1 -1 -1
35 76 78 51 37 35 21 -1 17 64 -1 -1 -1 59  7 -1 -1 32 -1 -1  0  0 -1 -1
 9 65 44  9 54 56 73 34 42 -1 -1 -1 35 -1 -1 -1 46 39  0 -1 -1  0  0 -1
 3 62  7 80 68 26 -1 80 55 -1 36 -1 26 -1  9 -1 72 -1 -1 -1 -1 -1  0  0
26 75 33 21 69 59  3 38 -1 -1 -1 35 -1 62 36 26 -1 -1  1 -1 -1 -1 -1  0
"""

_80211N_R56_Z81 = """
13 48 80 66  4 74  7 30 76 52 37 60 -1 49 73 31 74 73 23 -1  1  0 -1 -1
69 63 74 56 64 77 57 65  6 16 51 -1 64 -1 68  9 48 62 54 27 -1  0  0 -1
51 15  0 80 24 25 42 54 44 71 71  9 67 35 -1 58 -1 29 -1 53  0 -1  0  0
16 29 36 41 44 56 59 37 50 24 -1 65  4 65 52 -1  4 -1 73 52  1 -1 -1  0
"""


def _parse_base(text: str) -> np.ndarray:
    rows = [r.split() for r in text.strip().splitlines()]
    return np.array([[int(v) for v in r] for r in rows], np.int32)


IEEE80211N_BASE = {
    (648, "1/2"): (_parse_base(_80211N_R12_Z27), 27),
    (648, "2/3"): (_parse_base(_80211N_R23_Z27), 27),
    (648, "3/4"): (_parse_base(_80211N_R34_Z27), 27),
    (648, "5/6"): (_parse_base(_80211N_R56_Z27), 27),
    (1296, "1/2"): (_parse_base(_80211N_R12_Z54), 54),
    (1296, "2/3"): (_parse_base(_80211N_R23_Z54), 54),
    (1296, "3/4"): (_parse_base(_80211N_R34_Z54), 54),
    (1296, "5/6"): (_parse_base(_80211N_R56_Z54), 54),
    (1944, "1/2"): (_parse_base(_80211N_R12_Z81), 81),
    (1944, "2/3"): (_parse_base(_80211N_R23_Z81), 81),
    (1944, "3/4"): (_parse_base(_80211N_R34_Z81), 81),
    (1944, "5/6"): (_parse_base(_80211N_R56_Z81), 81),
}


# --------------------------------------------------------------------------
# Parameter construction (host)
# --------------------------------------------------------------------------

def _gf2_parity_solver(H: np.ndarray, n_parity: int) -> np.ndarray:
    """Dense GF(2) encode matrix: parity = (P @ msg) % 2.

    H ``[M, N]`` with the message on the first N - n_parity columns.
    Solves Hp * p = Hi * m by Gauss-Jordan over GF(2) (host, int8).
    """
    M, N = H.shape
    k = N - n_parity
    A = np.concatenate([H[:, k:].astype(np.int8),
                        H[:, :k].astype(np.int8)], axis=1)  # [Hp | Hi]
    # eliminate on the first n_parity columns
    for col in range(n_parity):
        piv = col + np.argmax(A[col:, col] != 0)
        if A[piv, col] == 0:
            raise ValueError("parity part of H is singular over GF(2)")
        if piv != col:
            A[[col, piv]] = A[[piv, col]]
        hit = (A[:, col] == 1)
        hit[col] = False
        A[hit] ^= A[col]
    return A[:, n_parity:]  # [n_parity, k]: p = P m (mod 2)


def qc_code_params(base_matrix, Z: int, compute_encoder: bool = True) -> dict:
    """Build decode/encode parameters from a QC base matrix.

    base_matrix ``[Mb, Nb]`` of circulant shifts (-1 = zero block).
    The message occupies the first ``(Nb - Mb) * Z`` bits (standard QC
    systematic layout).
    """
    Bm = np.asarray(base_matrix, np.int32)
    Mb, Nb = Bm.shape
    blocks = [
        [(j, int(Bm[i, j])) for j in range(Nb) if Bm[i, j] >= 0]
        for i in range(Mb)
    ]
    K = max(len(b) for b in blocks)
    block_j = -np.ones((Mb, K), np.int32)
    block_s = np.zeros((Mb, K), np.int32)
    for i, row in enumerate(blocks):
        for k, (j, s) in enumerate(row):
            block_j[i, k] = j
            block_s[i, k] = s
    params = {
        "base_matrix": Bm,
        "Z": int(Z),
        "Mb": Mb,
        "Nb": Nb,
        "K": K,
        "block_j": block_j,
        "block_s": block_s,
        "n_vnodes": Nb * Z,
        "n_cnodes": Mb * Z,
        "k_bits": (Nb - Mb) * Z,
    }
    if compute_encoder:
        H = expand_base_matrix(Bm, Z)
        params["encode_matrix"] = _gf2_parity_solver(H, Mb * Z)
    return params


def expand_base_matrix(Bm: np.ndarray, Z: int) -> np.ndarray:
    """Dense H ``[Mb Z, Nb Z]`` int8 from the base matrix (host)."""
    Mb, Nb = Bm.shape
    H = np.zeros((Mb * Z, Nb * Z), np.int8)
    eye = np.eye(Z, dtype=np.int8)
    for i in range(Mb):
        for j in range(Nb):
            s = Bm[i, j]
            if s >= 0:
                # P^s: row z has its 1 at column (z + s) % Z
                H[i * Z:(i + 1) * Z, j * Z:(j + 1) * Z] = np.roll(
                    eye, s % Z, axis=1
                )
    return H


def detect_qc_structure(ldpc_code_params: dict, Z: int):
    """Lift a generic design-file code onto the QC path if possible.

    Partitions the code's H into Z x Z blocks and checks each is zero or
    a cyclic shift of the identity.  Returns qc params (without the
    encoder, which design files already provide) or None.
    """
    n_c = ldpc_code_params["n_cnodes"]
    n_v = ldpc_code_params["n_vnodes"]
    if n_c % Z or n_v % Z:
        return None
    Mb, Nb = n_c // Z, n_v // Z
    cd = ldpc_code_params["max_cnode_deg"]
    adj = ldpc_code_params["cnode_adj_list"].reshape(n_c, cd)
    H = np.zeros((n_c, n_v), np.int8)
    deg = ldpc_code_params["cnode_deg_list"]
    for c in range(n_c):
        H[c, adj[c, : deg[c]]] = 1
    Bm = -np.ones((Mb, Nb), np.int32)
    eye = np.eye(Z, dtype=np.int8)
    for i in range(Mb):
        for j in range(Nb):
            blk = H[i * Z:(i + 1) * Z, j * Z:(j + 1) * Z]
            nz = blk.sum()
            if nz == 0:
                continue
            if nz != Z:
                return None
            s = int(np.argmax(blk[0]))
            if not np.array_equal(blk, np.roll(eye, s, axis=1)):
                return None
            Bm[i, j] = s
    return qc_code_params(Bm, Z, compute_encoder=False)


def ieee80211n_params(n: int = 1944, rate: str = "1/2") -> dict:
    """IEEE 802.11n LDPC code parameters (Annex R base matrices).

    All twelve standard configurations are shipped: ``n`` in
    {648, 1296, 1944} x ``rate`` in {"1/2", "2/3", "3/4", "5/6"}.
    (The reference ships only Gallager/WiMAX design files,
    commpy/channelcoding/ldpc.py:51; these are the real production
    tables its text format was meant for.)
    """
    try:
        Bm, Z = IEEE80211N_BASE[(n, rate)]
    except KeyError:
        raise ValueError(
            f"no shipped 802.11n base matrix for (n={n}, rate={rate}); "
            f"available: {sorted(IEEE80211N_BASE)}"
        )
    return qc_code_params(Bm, Z)


def _has_6cycle_through(Bm: np.ndarray, Z: int, j: int,
                        rows, shifts) -> bool:
    """True if placing column ``j`` with ``(rows, shifts)`` closes a
    lifted 6-cycle against the columns already in ``Bm``.

    A 6-cycle through column j uses two of its entries (r_a, j),
    (r_b, j) plus a row r3 reached from r_b via column c2 and returning
    to r_a via column c3; it lifts to a real cycle iff the alternating
    shift sum vanishes mod Z (Fossorier 2004, Thm 2.1):
    (s[r_a,j]-s[r_b,j]) + (s[r_b,c2]-s[r3,c2]) + (s[r3,c3]-s[r_a,c3])
    ≡ 0 (mod Z).
    """
    Mb, Nb = Bm.shape
    cols_of = [np.nonzero(Bm[r] >= 0)[0] for r in range(Mb)]
    w = len(rows)
    for a in range(w):
        for b in range(w):
            if a == b:
                continue
            ra, rb = int(rows[a]), int(rows[b])
            d_ab = (int(shifts[a]) - int(shifts[b])) % Z
            for c2 in cols_of[rb]:
                if c2 == j:
                    continue
                r3s = np.nonzero(Bm[:, c2] >= 0)[0]
                for r3 in r3s:
                    r3 = int(r3)
                    if r3 == rb or r3 == ra:
                        continue
                    d_bc = (int(Bm[rb, c2]) - int(Bm[r3, c2])) % Z
                    for c3 in cols_of[r3]:
                        if c3 == j or c3 == c2 or Bm[ra, c3] < 0:
                            continue
                        d_ca = (int(Bm[r3, c3]) - int(Bm[ra, c3])) % Z
                        if (d_ab + d_bc + d_ca) % Z == 0:
                            return True
    return False


def qc_girth(base_matrix, Z: int, cap: int = 8) -> int:
    """Girth of the LIFTED Tanner graph, certified up to ``cap``.

    Returns 4, 6, or ``cap`` (meaning girth >= cap; only cap=8 is
    implemented).  Block-level cycle test (Fossorier 2004): a base-graph
    cycle lifts to a real cycle iff its alternating circulant-shift sum
    vanishes mod Z — so girth is decided entirely on the (tiny) base
    matrix, never on the expanded H.
    """
    if cap != 8:
        raise NotImplementedError("qc_girth certifies up to girth 8")
    Bm = np.asarray(base_matrix, np.int32)
    Mb, Nb = Bm.shape
    # 4-cycles: a row pair sharing >= 2 columns with equal shift diff
    for r1 in range(Mb):
        for r2 in range(r1 + 1, Mb):
            both = np.nonzero((Bm[r1] >= 0) & (Bm[r2] >= 0))[0]
            if both.size < 2:
                continue
            diffs = (Bm[r1, both] - Bm[r2, both]) % Z
            if np.unique(diffs).size < diffs.size:
                return 4
    # 6-cycles: reuse the incremental test column by column (checking
    # column j against columns < j covers every triple exactly once)
    for j in range(Nb):
        rows = np.nonzero(Bm[:, j] >= 0)[0]
        sub = Bm.copy()
        sub[:, j:] = -1  # only earlier columns participate as c2/c3
        if _has_6cycle_through(sub, Z, j, rows, Bm[rows, j]):
            return 6
    return cap


def qc_export_design(params: dict, file_path: str) -> None:
    """Write a designed QC code as a reference-format design file.

    Round-trips through the text format the reference defines
    (ldpc.py:55-61): ``get_ldpc_code_params`` reads it back and
    ``detect_qc_structure`` re-lifts it onto the QC decode path — so a
    designed code interoperates with any tool speaking that format.
    """
    from .ldpc import write_ldpc_params

    H = expand_base_matrix(params["base_matrix"], params["Z"])
    write_ldpc_params(H, file_path)


def random_qc_params(Mb: int, Nb: int, Z: int, *, col_weight: int = 3,
                     seed: int = 0, girth_tries: int = 200,
                     target_girth: int = 6) -> dict:
    """Synthesize a production-scale QC-LDPC code (IRA-style protograph).

    The reference decodes only shipped design files (its largest is
    WiMAX n=1440, ldpc.py:51); this constructor generates codes at
    DVB-S2-class sizes (e.g. ``Mb=25, Nb=45, Z=360`` -> n=16200) that
    the roll-based QC path decodes at O(E) per iteration:

    * information columns get ``col_weight`` entries in distinct random
      check rows, with circulant shifts rejection-sampled to avoid
      4-cycles (girth >= 6 whenever ``girth_tries`` suffices);
      ``target_girth=8`` additionally rejects lifted 6-cycles
      (Fossorier shift-sum test), for girth >= 8 codes — the error-
      floor lever production code designs use;
    * the parity part is block dual-diagonal with identity blocks (the
      DVB-S2/IRA accumulator structure), so encoding is a cumulative
      XOR of per-row info syndromes — O(n), no dense GF(2) solve.

    Returns the same params dict as :func:`qc_code_params`, with
    ``parity_structure='dual_diagonal'`` selecting the structured
    encoder in :func:`qc_encode_device`.  Audit the result with
    :func:`qc_girth`; export it to the reference's design-file format
    with :func:`qc_export_design`.
    """
    if target_girth not in (6, 8):
        raise ValueError("target_girth must be 6 or 8")
    kb = Nb - Mb
    if kb <= 0:
        raise ValueError("Nb must exceed Mb")
    if not 2 <= col_weight <= Mb:
        raise ValueError("col_weight must be in [2, Mb]")
    rng = np.random.RandomState(seed)
    Bm = -np.ones((Mb, Nb), np.int32)
    # accumulator chain: row i checks parity blocks i-1 and i (shift 0)
    for i in range(Mb):
        Bm[i, kb + i] = 0
        if i > 0:
            Bm[i, kb + i - 1] = 0
    # 4-cycle bookkeeping: two columns sharing a row pair (r1, r2) form
    # a length-4 cycle iff their shift differences agree mod Z
    seen = {(i, i + 1): {0} for i in range(Mb - 1)}  # parity chain pairs
    for j in range(kb):
        for _ in range(girth_tries):
            rows = np.sort(rng.choice(Mb, col_weight, replace=False))
            shifts = rng.randint(0, Z, col_weight)
            pairs = [
                ((int(rows[a]), int(rows[b])),
                 int(shifts[a] - shifts[b]) % Z)
                for a in range(col_weight) for b in range(a + 1, col_weight)
            ]
            if not all(d not in seen.get(p, ()) for p, d in pairs):
                continue
            if target_girth >= 8 and _has_6cycle_through(
                    Bm, Z, j, rows, shifts):
                continue
            break
        for p, d in pairs:
            seen.setdefault(p, set()).add(d)
        Bm[rows, j] = shifts
    params = qc_code_params(Bm, Z, compute_encoder=False)
    params["parity_structure"] = "dual_diagonal"
    return params


# --------------------------------------------------------------------------
# Encoding
# --------------------------------------------------------------------------

def qc_encode_device(message_bits, qc_params: dict):
    """Systematic QC encode ``[..., k] -> [..., n]`` (parity appended).

    Dense 0/1 matmul on the MXU; f32 accumulation is exact (k < 2^24).
    Dual-diagonal (IRA) codes from :func:`random_qc_params` take the
    structured O(n) path instead: per-row info syndromes are circulant
    rolls and the accumulator chain is one cumulative XOR — no
    ``[n_parity, k]`` dense matrix at DVB-S2 sizes.
    """
    m = jnp.asarray(message_bits)
    if qc_params.get("parity_structure") == "dual_diagonal":
        Bm = np.asarray(qc_params["base_matrix"])
        Mb, Nb, Z = qc_params["Mb"], qc_params["Nb"], qc_params["Z"]
        kb = Nb - Mb
        mB = m.reshape(m.shape[:-1] + (kb, Z)).astype(jnp.float32)
        rows = []
        for i in range(Mb):
            acc = jnp.zeros(m.shape[:-1] + (Z,), jnp.float32)
            for j in range(kb):
                s = int(Bm[i, j])
                if s >= 0:
                    acc = acc + jnp.roll(mB[..., j, :], -s, axis=-1)
            rows.append(acc)
        s_rows = jnp.stack(rows, axis=-2)  # [..., Mb, Z]
        # accumulator: p_i = p_{i-1} xor s_i  (exact in f32: sums < 2^24)
        parity = jnp.mod(jnp.cumsum(s_rows, axis=-2), 2.0)
        parity = parity.reshape(m.shape[:-1] + (Mb * Z,))
    else:
        P = jnp.asarray(qc_params["encode_matrix"], jnp.float32)
        parity = jnp.mod(
            jnp.einsum("pk,...k->...p", P, m.astype(jnp.float32)), 2.0
        )
    return jnp.concatenate(
        [m.astype(jnp.int8), parity.astype(jnp.int8)], axis=-1
    )


# --------------------------------------------------------------------------
# Decoding
# --------------------------------------------------------------------------

def _loo_prod(x, mask):
    """Leave-one-out product over the last axis (prefix/suffix, exact)."""
    xm = jnp.where(mask, x, 1.0)
    deg = xm.shape[-1]
    one = jnp.ones_like(xm[..., :1])
    prefix = [one]
    for j in range(1, deg):
        prefix.append(prefix[-1] * xm[..., j - 1:j])
    suffix = [one]
    for j in range(deg - 2, -1, -1):
        suffix.append(suffix[-1] * xm[..., j + 1:j + 2])
    suffix.reverse()
    out = jnp.concatenate([prefix[j] * suffix[j] for j in range(deg)], -1)
    return jnp.where(mask, out, 0.0)


def _loo_min(mag, mask):
    """Leave-one-out min over the last axis (prefix/suffix mins)."""
    m = jnp.where(mask, mag, jnp.inf)
    deg = m.shape[-1]
    big = jnp.full_like(m[..., :1], jnp.inf)
    pref = [big]
    for j in range(1, deg):
        pref.append(jnp.minimum(pref[-1], m[..., j - 1:j]))
    suf = [big]
    for j in range(deg - 2, -1, -1):
        suf.append(jnp.minimum(suf[-1], m[..., j + 1:j + 2]))
    suf.reverse()
    return jnp.concatenate(
        [jnp.minimum(pref[j], suf[j]) for j in range(deg)], -1
    )


@partial(jax.jit,
         static_argnames=("block_s_t", "algorithm", "n_iters", "meta",
                          "msa_scale", "msa_offset", "schedule"))
def _qc_bp_core(llr, block_s_t, algorithm: str, n_iters: int, meta,
                msa_scale: float = 1.0, msa_offset: float = 0.0,
                schedule: str = "flooding", pos_mask=None):
    """BP over the QC edge tensor ``[B, Mb, Z, K]``.

    meta = (Mb, Nb, Z, K, block_j as nested tuple, valid mask tuple).
    All message routing is cyclic rolls on the Z axis — no gathers, no
    incidence matrices; work and memory are O(E) per iteration.
    ``schedule="layered"`` updates the running totals after every check
    block row (serial schedule) — same fixed point, ~half the
    iterations at equal BER; this is the path for codes too large for
    the VMEM-resident kernel.
    ``pos_mask``: optional [Mb, Z, K] bool — False kills individual
    edge POSITIONS inside a nonzero circulant block (DVB-S2's
    bit-accumulator wrap block is a shift circulant minus one edge).
    """
    Mb, Nb, Z, K, block_j, valid = meta
    B = llr.shape[0]
    vshape = (B, Nb, Z)
    mask = jnp.asarray(np.asarray(valid), bool)[None, :, None, :]
    if pos_mask is not None:
        mask = mask & jnp.asarray(pos_mask, bool)[None]

    sj = np.asarray(block_s_t)  # [Mb, K] shifts (host constants)
    bj = np.asarray(block_j)

    def to_edges(v):  # v [B, Nb, Z] -> [B, Mb, Z, K]
        cols = []
        for k in range(K):
            col = jnp.stack(
                [
                    jnp.roll(v[:, bj[i][k]], -int(sj[i][k]), axis=-1)
                    if bj[i][k] >= 0
                    else jnp.zeros((B, Z), v.dtype)
                    for i in range(Mb)
                ],
                axis=1,
            )  # [B, Mb, Z]
            cols.append(col)
        return jnp.stack(cols, axis=-1)

    def to_vnodes(e):  # e [B, Mb, Z, K] -> [B, Nb, Z]
        acc = [jnp.zeros((B, Z), e.dtype) for _ in range(Nb)]
        for i in range(Mb):
            for k in range(K):
                j = bj[i][k]
                if j < 0:
                    continue
                acc[j] = acc[j] + jnp.roll(e[:, i, :, k], int(sj[i][k]),
                                           axis=-1)
        return jnp.stack(acc, axis=1)

    def cn_update(v2c, m=mask):
        if algorithm == "SPA":
            t = jnp.tanh(v2c * 0.5)
            prod = _loo_prod(t, m)
            msg = 2.0 * jnp.arctanh(jnp.clip(prod, -1.0, 1.0))
            return jnp.clip(msg, -_llr_max, _llr_max)
        sign = _loo_prod(jnp.sign(v2c), m)
        loo = _loo_min(jnp.abs(v2c), m)
        # normalized/offset min-sum: plain MSA at (1, 0) exactly
        mag = jnp.maximum(msa_scale * loo - msa_offset, 0.0)
        return jnp.where(m, sign * mag, 0.0)

    def total_llr(c2v):
        return llr + to_vnodes(jnp.where(mask, c2v, 0.0))

    def syndrome_ok(dec):
        par = jnp.sum(
            jnp.where(mask, to_edges(dec.astype(jnp.float32)), 0.0),
            axis=-1,
        )  # [B, Mb, Z]
        return jnp.all(jnp.mod(par, 2.0) == 0, axis=(-2, -1))

    dec0 = jnp.signbit(llr).astype(jnp.int8)
    c2v0 = jnp.zeros((B, Mb, Z, K), jnp.float32)
    act0 = ~syndrome_ok(dec0)  # [B]; carried so each iteration computes
    # the O(E) syndrome once (frozen lanes stay frozen: their dec never
    # changes once the syndrome is satisfied)

    def cond(state):
        it, _, _, _, act = state
        return jnp.logical_and(it < n_iters, jnp.any(act))

    def body(state):
        it, c2v, out_llr, dec, act = state
        v2c = to_edges(total_llr(c2v))
        v2c = jnp.where(mask, v2c - c2v, 0.0)
        new_c2v = cn_update(v2c)
        new_total = total_llr(new_c2v)
        new_dec = jnp.signbit(new_total).astype(jnp.int8)
        sel3 = act[:, None, None, None]
        c2v = jnp.where(sel3, new_c2v, c2v)
        out_llr = jnp.where(act[:, None, None], new_total, out_llr)
        dec = jnp.where(act[:, None, None], new_dec, dec)
        act = jnp.logical_and(act, ~syndrome_ok(dec))
        return it + 1, c2v, out_llr, dec, act

    def body_layered(state):
        # serial schedule: totals update after EVERY check block row;
        # frozen lanes contribute zero deltas, so tot/dec latch
        it, c2v, tot, dec, act = state
        for i in range(Mb):
            cols = []
            for k in range(K):
                j = bj[i][k]
                cols.append(
                    jnp.roll(tot[:, j], -int(sj[i][k]), axis=-1)
                    if j >= 0 else jnp.zeros((B, Z), jnp.float32)
                )
            v2c = jnp.stack(cols, axis=-1) - c2v[:, i]  # [B, Z, K]
            mrow = mask[0, i][None]  # [1, 1, K]
            new_row = cn_update(jnp.where(mrow, v2c, 0.0), mrow)
            new_row = jnp.where(act[:, None, None], new_row, c2v[:, i])
            delta = jnp.where(mrow, new_row - c2v[:, i], 0.0)
            for k in range(K):
                j = bj[i][k]
                if j >= 0:
                    tot = tot.at[:, j].add(
                        jnp.roll(delta[..., k], int(sj[i][k]), axis=-1)
                    )
            c2v = c2v.at[:, i].set(new_row)
        new_dec = jnp.signbit(tot).astype(jnp.int8)
        dec = jnp.where(act[:, None, None], new_dec, dec)
        act = jnp.logical_and(act, ~syndrome_ok(dec))
        return it + 1, c2v, tot, dec, act

    _, _, out_llr, dec, _ = jax.lax.while_loop(
        cond, body_layered if schedule == "layered" else body,
        (0, c2v0, llr, dec0, act0)
    )
    return dec.reshape(B, Nb * Z), out_llr.reshape(B, Nb * Z)


def _dist_roll(x, r: int, Z: int, D: int, axis_name: str):
    """Global cyclic roll by ``r`` of a Z axis sharded across ``D``
    devices (local length ``Zl = Z/D``), inside shard_map.

    ``out[z] = x_global[(z + r) % Z]``.  With r = q*Zl + t, device d's
    slice needs elements from shards d+q and d+q+1: two static
    ``ppermute`` rotations of the local tile plus a static local
    re-split — the circulant structure turns into pure neighbor
    communication over ICI (one ppermute when t == 0).  x: ``[..., Zl]``.
    """
    Zl = Z // D
    q, t = divmod(r % Z, Zl)
    perm_a = [(s, (s - q) % D) for s in range(D)]
    a = jax.lax.ppermute(x, axis_name, perm_a) if q % D else x
    if t == 0:
        return a
    perm_b = [(s, (s - q - 1) % D) for s in range(D)]
    b = jax.lax.ppermute(x, axis_name, perm_b)
    return jnp.concatenate([a[..., t:], b[..., :t]], axis=-1)


def qc_bp_decode_sharded(llr, qc_params: dict, decoder_algorithm: str,
                         n_iters: int, mesh, axis_name: str = "dp",
                         msa_scale: float = 1.0, msa_offset: float = 0.0):
    """Tensor-parallel QC BP: ONE Tanner graph sharded over the mesh
    along the circulant (Z) axis.

    The generic edge-sharded decoder (:func:`.ldpc.ldpc_bp_decode_sharded`)
    partitions check rows but carries a dense incidence matrix — it
    cannot reach DVB-S2 sizes.  Here the natural QC axis is split
    instead: every message tensor holds ``Z/D`` circulant positions per
    device (memory and CN work are E/D each), variable-node totals are
    positionwise on Z so they need NO collective at all, and each
    circulant roll becomes at most two static ``ppermute`` neighbor
    rotations over ICI (:func:`_dist_roll`).  The only reduction is the
    per-iteration convergence flag (one psum of a [B] byte).

    Flooding schedule only (the layered sweep is serial across block
    rows by construction); requires ``Z % n_devices == 0``.  Outputs
    match :func:`qc_bp_decode_device` (backend='xla',
    schedule='flooding') exactly up to float summation order.
    """
    from ..parallel.mesh import P, shard_map

    if decoder_algorithm not in ("SPA", "MSA"):
        raise NameError(
            'Please input a valid decoder_algorithm string '
            '(meanning "SPA" or "MSA").'
        )
    if (msa_scale, msa_offset) != (1.0, 0.0) and decoder_algorithm != "MSA":
        raise ValueError("msa_scale/msa_offset apply to MSA only")
    Mb, Nb = qc_params["Mb"], qc_params["Nb"]
    Z, K = qc_params["Z"], qc_params["K"]
    D = mesh.shape[axis_name]
    if Z % D:
        raise ValueError(
            f"Z-sharded decode needs Z % n_devices == 0 (Z={Z}, D={D}); "
            "shard the batch axis instead for this code"
        )
    Zl = Z // D
    bj = np.asarray(qc_params["block_j"])
    sj = np.asarray(qc_params["block_s"])
    valid = bj >= 0

    x = jnp.asarray(llr, jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    lead = x.shape[:-1]
    x = jnp.clip(x.reshape(-1, Nb, Z), -_llr_max, _llr_max)
    B = x.shape[0]

    pm_full = np.ones((Mb, Z, K), np.float32)
    for (i, k, excluded) in qc_params.get("pos_masks", ()):
        pm_full[i, list(excluded), k] = 0.0
    for i in range(Mb):
        for k in range(K):
            if not valid[i, k]:
                pm_full[i, :, k] = 0.0

    def local(xs, pm):
        # xs [B, Nb, Zl]; pm [Mb, Zl, K] — this device's Z slice
        m = pm[None].astype(bool)  # [1, Mb, Zl, K]

        def to_edges(v):  # [B, Nb, Zl] -> [B, Mb, Zl, K]
            cols = []
            for k in range(K):
                col = jnp.stack(
                    [
                        _dist_roll(v[:, bj[i][k]], int(sj[i][k]) % Z,
                                   Z, D, axis_name)
                        if valid[i][k]
                        else jnp.zeros((B, Zl), v.dtype)
                        for i in range(Mb)
                    ],
                    axis=1,
                )
                cols.append(col)
            return jnp.stack(cols, axis=-1)

        def to_vnodes(e):  # [B, Mb, Zl, K] -> [B, Nb, Zl]
            acc = [jnp.zeros((B, Zl), e.dtype) for _ in range(Nb)]
            for i in range(Mb):
                for k in range(K):
                    if not valid[i][k]:
                        continue
                    acc[bj[i][k]] = acc[bj[i][k]] + _dist_roll(
                        e[:, i, :, k], -int(sj[i][k]) % Z, Z, D, axis_name
                    )
            return jnp.stack(acc, axis=1)

        def cn_update(v2c):
            if decoder_algorithm == "SPA":
                t = jnp.tanh(v2c * 0.5)
                prod = _loo_prod(t, m)
                msg = 2.0 * jnp.arctanh(jnp.clip(prod, -1.0, 1.0))
                return jnp.clip(msg, -_llr_max, _llr_max)
            sign = _loo_prod(jnp.sign(v2c), m)
            loo = _loo_min(jnp.abs(v2c), m)
            mag = jnp.maximum(msa_scale * loo - msa_offset, 0.0)
            return jnp.where(m, sign * mag, 0.0)

        def total_llr(c2v):
            return xs + to_vnodes(jnp.where(m, c2v, 0.0))

        def act_from(dec):
            par = jnp.sum(
                jnp.where(m, to_edges(dec.astype(jnp.float32)), 0.0),
                axis=-1,
            )  # [B, Mb, Zl] — check positions of THIS shard
            bad = jnp.any(jnp.mod(par, 2.0) != 0, axis=(-2, -1))  # [B]
            # a lane is active while ANY shard still sees a violation
            return jax.lax.psum(bad.astype(jnp.float32), axis_name) > 0

        dec0 = jnp.signbit(xs).astype(jnp.int8)
        c2v0 = jnp.zeros((B, Mb, Zl, K), jnp.float32)
        act0 = act_from(dec0)

        def cond(state):
            it, _, _, _, act = state
            return jnp.logical_and(it < n_iters, jnp.any(act))

        def body(state):
            it, c2v, out_llr, dec, act = state
            v2c = to_edges(total_llr(c2v))
            v2c = jnp.where(m, v2c - c2v, 0.0)
            new_c2v = cn_update(v2c)
            new_total = total_llr(new_c2v)
            new_dec = jnp.signbit(new_total).astype(jnp.int8)
            sel3 = act[:, None, None, None]
            c2v = jnp.where(sel3, new_c2v, c2v)
            out_llr = jnp.where(act[:, None, None], new_total, out_llr)
            dec = jnp.where(act[:, None, None], new_dec, dec)
            act = jnp.logical_and(act, act_from(dec))
            return it + 1, c2v, out_llr, dec, act

        _, _, out_llr, dec, _ = jax.lax.while_loop(
            cond, body, (0, c2v0, xs, dec0, act0)
        )
        return dec, out_llr

    dec, out_llr = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, axis_name), P(None, axis_name, None)),
        out_specs=(P(None, None, axis_name), P(None, None, axis_name)),
        check_vma=False,
    )(x, jnp.asarray(pm_full))
    dec = dec.reshape(lead + (Nb * Z,))
    out_llr = out_llr.reshape(lead + (Nb * Z,))
    if squeeze:
        return dec[0], out_llr[0]
    return dec, out_llr


def qc_bp_decode_device(llr, qc_params: dict, decoder_algorithm: str,
                        n_iters: int, backend: str = "auto",
                        schedule: str = "flooding",
                        msa_scale: float = 1.0, msa_offset: float = 0.0,
                        msg_io: str = "auto"):
    """Batched QC-LDPC BP decode: ``[..., n]`` LLRs -> (dec int8, llr).

    Same output conventions as :func:`ldpc.ldpc_bp_decode_device` (hard
    word via signbit, posterior LLRs, converged blocks frozen).
    ``backend``: "pallas" runs every iteration VMEM-resident
    (`kernels/qc_bp.py` — the XLA path streams the edge tensor through
    HBM several times per iteration); "pallas-streamed" keeps only the
    running totals in VMEM and streams each layer's c2v tiles from HBM
    (layered-only — for codes past the resident kernel's budget, e.g.
    DVB-S2 n=16200); "xla" keeps the roll-based XLA core; "auto" picks
    the resident kernel on TPU backends, falling back to streamed
    (layered) then XLA by footprint.
    ``schedule``: "flooding" matches the reference BP exactly;
    "layered" updates totals after every check block row — the serial
    schedule converges in roughly half the iterations at equal BER (no
    reference counterpart); available on both backends.
    ``msa_scale``/``msa_offset``: normalized/offset min-sum correction
    (check message magnitude ``max(scale*min - offset, 0)``) — the
    standard production compensation for MSA's overestimate vs SPA
    (Chen & Fossorier 2002); (1, 0) is plain MSA exactly.  MSA only.
    ``msg_io``: 'bf16' stores the streamed kernel's c2v messages
    bfloat16 in HBM — halves its dominant traffic (the kernel is
    HBM-bound, ~53-63% of peak at DVB-S2 size; 2.4x measured speedup);
    decisions can differ from f32 near ties, BER-neutral
    (test_qcldpc.py).  'auto' (default) resolves to 'f32' on every
    backend — parity-sensitive callers get full-precision messages
    without passing anything; opt into the bf16 speedup explicitly with
    msg_io='bf16' on the streamed kernel.
    """
    if decoder_algorithm not in ("SPA", "MSA"):
        raise NameError(
            'Please input a valid decoder_algorithm string '
            '(meanning "SPA" or "MSA").'
        )
    if schedule not in ("flooding", "layered"):
        raise ValueError('schedule must be "flooding" or "layered"')
    if (msa_scale, msa_offset) != (1.0, 0.0) and decoder_algorithm != "MSA":
        raise ValueError("msa_scale/msa_offset apply to MSA only")
    if msg_io not in ("auto", "f32", "bf16"):
        raise ValueError("msg_io must be 'auto', 'f32', or 'bf16'")
    if msg_io == "bf16" and backend not in ("pallas-streamed", "auto"):
        raise ValueError(
            "msg_io='bf16' applies to the HBM-streamed kernel only "
            "(backend='pallas-streamed'); the other paths keep messages "
            "on-chip in f32"
        )
    Mb, Nb = qc_params["Mb"], qc_params["Nb"]
    Z, K = qc_params["Z"], qc_params["K"]
    x = jnp.asarray(llr, jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    lead = x.shape[:-1]
    if backend == "auto":
        backend = (
            "pallas"
            if (jax.default_backend() in ("tpu", "axon")
                or schedule == "layered")
            else "xla"
        )
        if backend == "pallas":
            # codes whose c2v store exceeds the VMEM-resident kernel's
            # budget (the batch lane axis pads to 128, so a smaller
            # chunk cannot save them) stream it from HBM instead —
            # layered only, the row-sequential schedule IS the
            # streaming unit; flooding at that size keeps the XLA core
            from ..kernels.qc_bp import (_STREAMED_VMEM_LIMIT, _VMEM_BUDGET,
                                         streamed_vmem_bytes,
                                         vmem_bytes_per_lane)

            bj_np = np.asarray(qc_params["block_j"])
            nz = int(np.sum(bj_np >= 0))
            k_max = int(np.max(np.sum(bj_np >= 0, axis=1)))
            has_pos_masks = bool(qc_params.get("pos_masks"))
            if (128 * vmem_bytes_per_lane(Nb * Z, Z, nz) > _VMEM_BUDGET
                    or has_pos_masks):
                # per-position edge masks (DVB-S2 wrap block) are
                # implemented on the streamed kernel and the XLA core
                # only; the resident kernel never fits those codes
                fits_streamed = (
                    streamed_vmem_bytes(Nb * Z, Z, k_max)
                    + 4 * 128 * Nb * Z <= _STREAMED_VMEM_LIMIT
                )
                backend = (
                    "pallas-streamed"
                    if (schedule == "layered" and fits_streamed)
                    else "xla"
                )

    if msg_io == "bf16" and backend != "pallas-streamed":
        # auto-resolution landed off the streamed kernel: an explicit
        # bf16 request cannot be honored there — fail, don't ignore
        raise ValueError(
            f"msg_io='bf16' requested but the backend resolved to "
            f"{backend!r}; only 'pallas-streamed' stores messages in HBM"
        )
    if backend in ("pallas", "pallas-streamed"):
        from ..kernels.qc_bp import qc_bp_pallas, qc_bp_pallas_streamed

        bs_t, bj_t = qc_params["block_s"], qc_params["block_j"]
        rows = tuple(
            tuple(
                (int(bj_t[i][k]), int(bs_t[i][k]))
                for k in range(K) if bj_t[i][k] >= 0
            )
            for i in range(Mb)
        )
        xf = jnp.clip(x.reshape(-1, Nb * Z), -_llr_max, _llr_max)
        if backend == "pallas-streamed":
            if schedule != "layered":
                raise ValueError(
                    "the HBM-streamed kernel is layered-only; use "
                    "schedule='layered' or backend='xla'"
                )
            dec, out = qc_bp_pallas_streamed(
                xf, decoder_algorithm, int(n_iters), (Z, Nb, rows),
                msa_scale=float(msa_scale), msa_offset=float(msa_offset),
                pos_masks=qc_params.get("pos_masks", ()),
                msg_io="f32" if msg_io == "auto" else msg_io)
        else:
            if qc_params.get("pos_masks"):
                raise NotImplementedError(
                    "per-position edge masks need backend="
                    "'pallas-streamed' or 'xla'"
                )
            dec, out = qc_bp_pallas(xf, decoder_algorithm, int(n_iters),
                                    (Z, Nb, rows), schedule=schedule,
                                    msa_scale=float(msa_scale),
                                    msa_offset=float(msa_offset))
    else:
        bj = qc_params["block_j"]
        meta = (
            Mb, Nb, Z, K,
            tuple(tuple(int(v) for v in row) for row in bj),
            tuple(tuple(bool(v >= 0) for v in row) for row in bj),
        )
        pos_mask = None
        if qc_params.get("pos_masks"):
            # params with masks keep valid slots contiguous from k=0,
            # so the (i, k) coordinates match both backends
            pm = np.ones((Mb, Z, K), bool)
            for (i, k, excluded) in qc_params["pos_masks"]:
                pm[i, list(excluded), k] = False
            pos_mask = jnp.asarray(pm)
        xc = jnp.clip(x.reshape(-1, Nb, Z), -_llr_max, _llr_max)
        dec, out = _qc_bp_core(
            xc,
            tuple(tuple(int(v) for v in row) for row in
                  qc_params["block_s"]),
            decoder_algorithm, int(n_iters), meta,
            msa_scale=float(msa_scale), msa_offset=float(msa_offset),
            schedule=schedule, pos_mask=pos_mask,
        )
    dec = dec.reshape(lead + (Nb * Z,))
    out = out.reshape(lead + (Nb * Z,))
    if squeeze:
        return dec[0], out[0]
    return dec, out
