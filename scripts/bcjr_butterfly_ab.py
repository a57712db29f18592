"""Interleaved same-process A/B: butterfly vs plain BCJR kernel.

The butterfly kernel (kernels/bcjr.py:_bcjr_butterfly_kernel) halves the
sequential step count of a MAP pass (T counter-propagating iterations
instead of T forward + T backward); this script ranks it against the
plain kernel inside ONE process because the remote TPU service's
throughput drifts +-20-40% between processes.

Usage: python scripts/bcjr_butterfly_ab.py [T] [R]
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from commpy_tpu.ops.trellis import Trellis
from commpy_tpu.kernels.bcjr import bcjr_appdiff_pallas

T = int(sys.argv[1]) if len(sys.argv) > 1 else 256
R = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

trt = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
rng = np.random.RandomState(0)
syn = rng.randn(T, R).astype(np.float32) * 2
pan = rng.randn(T, R).astype(np.float32) * 2
li = rng.randn(T, R).astype(np.float32)


def make(butterfly, rep):
    def chained(s, p, l):
        def body(c, _):
            e = bcjr_appdiff_pallas(s + c * 1e-12, p, l, trt,
                                    butterfly=butterfly)
            return jnp.sum(e[0, :4]), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=rep)
        return c
    return jax.jit(chained)


# correctness first: identical outputs
e_plain = np.asarray(jax.jit(
    lambda s, p, l: bcjr_appdiff_pallas(s, p, l, trt, butterfly=False)
)(syn, pan, li))
e_bfly = np.asarray(jax.jit(
    lambda s, p, l: bcjr_appdiff_pallas(s, p, l, trt, butterfly=True)
)(syn, pan, li))
err = np.max(np.abs(e_plain - e_bfly) / (np.abs(e_plain) + 1e-3))
print(f"max rel diff plain vs butterfly: {err:.3e}")

REP_HI, REP_LO, OUTER, ROUNDS = 400, 100, 2, 5
fns = {}
for bf in (False, True):
    fns[bf] = {r: make(bf, r) for r in (REP_HI, REP_LO)}
    for f in fns[bf].values():
        _ = float(f(syn, pan, li))  # compile + warmup

res = {False: [], True: []}
for rnd in range(ROUNDS):
    for bf in (False, True):
        ts = {}
        for r in (REP_HI, REP_LO):
            t0 = time.perf_counter()
            for _ in range(OUTER):
                _ = float(fns[bf][r](syn, pan, li))
            ts[r] = (time.perf_counter() - t0) / OUTER
        dt = (ts[REP_HI] - ts[REP_LO]) / (REP_HI - REP_LO)
        res[bf].append(dt)
        print(f"round {rnd} butterfly={bf}: {dt*1e6:.1f} us/pass "
              f"({T*R/dt/1e9:.2f} Gsym/s)")

for bf in (False, True):
    med = float(np.median(res[bf]))
    print(f"MEDIAN butterfly={bf}: {med*1e6:.1f} us/pass")
print(f"SPEEDUP: {np.median(res[False]) / np.median(res[True]):.3f}x")
