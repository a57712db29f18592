"""Interleaved same-process A/B: g-major vs btg decision-tensor handoff.

The Pallas decode path hands the packed-decision tensor from the ACS
forward kernel to the traceback kernel; layout='gmaj' (one [T,G,B] ->
[G,B,T] transpose) replaces the btg route ([T,G,B] -> [B,T,G] ->
[G,B,T], an extra full HBM round trip of ~T*G*B*4 bytes).  Interleaved
in ONE process because the remote TPU service drifts +-20-40% between
processes.

Usage: python scripts/viterbi_layout_ab.py [L] [B]
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from commpy_tpu.ops.trellis import Trellis
from commpy_tpu.kernels.viterbi_acs import acs_forward_pallas, traceback_pallas

L = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
B = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

trellis = Trellis(np.array([6]), np.array([[0o133, 0o171]]))
S = trellis.number_states
tb_depth = 30
rng = np.random.RandomState(0)
r = rng.randn(B, L, 2).astype(np.float32) * 3


def decode(x, layout):
    dec, best = acs_forward_pallas(x, trellis, "soft", layout=layout)
    return traceback_pallas(dec, best, S, tb_depth, layout=layout)


def make(layout, rep):
    def chained(x):
        def body(c, _):
            bits = decode(c, layout)
            return c.at[0, 0, 0].add(
                jnp.sum(bits).astype(c.dtype) * 1e-12), ()
        c, _ = jax.lax.scan(body, x, None, length=rep)
        return jnp.sum(c[0, :4, 0])
    return jax.jit(chained)


# correctness: identical bits
b_old = np.asarray(jax.jit(lambda x: decode(x, "btg"))(r))
b_new = np.asarray(jax.jit(lambda x: decode(x, "gmaj"))(r))
print(f"bit mismatch btg vs gmaj: {(b_old != b_new).sum()}")

REP_HI, REP_LO, OUTER, ROUNDS = 40, 10, 2, 9
fns = {}
for lay in ("btg", "gmaj"):
    fns[lay] = {rep: make(lay, rep) for rep in (REP_HI, REP_LO)}
    for f in fns[lay].values():
        _ = float(f(r))

res = {"btg": [], "gmaj": []}
for rnd in range(ROUNDS):
    for lay in ("btg", "gmaj"):
        ts = {}
        for rep in (REP_HI, REP_LO):
            t0 = time.perf_counter()
            for _ in range(OUTER):
                _ = float(fns[lay][rep](r))
            ts[rep] = (time.perf_counter() - t0) / OUTER
        dt = (ts[REP_HI] - ts[REP_LO]) / (REP_HI - REP_LO)
        res[lay].append(dt)
        print(f"round {rnd} {lay}: {dt*1e3:.2f} ms/decode "
              f"({B*L/dt/1e9:.2f} Gbit/s)")

for lay in ("btg", "gmaj"):
    med = float(np.median(res[lay]))
    print(f"MEDIAN {lay}: {med*1e3:.2f} ms/decode "
          f"({B*L/med/1e9:.2f} Gbit/s)")
print(f"SPEEDUP gmaj: {np.median(res['btg']) / np.median(res['gmaj']):.3f}x")
