"""Same-process A/B: BCJR kernel lane-chunk depth C=8 vs C=16.

The BCJR recursions are dependent-op-issue bound (r4 roofline: 14-15%
of either throughput wall).  Deepening each grid step's tiles from
[S*8, 128] to [S*16, 128] doubles the data per vector op without
changing the dependent-op count — if issue cost dominates, throughput
rises toward 2x.  VMEM forces configs: T=128/f32 compares cleanly
(both astride=1); T=256/bf16 pits C=16+astride2 (25% extra backward
work) against C=8+astride1.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from commpy_tpu.kernels.bcjr import bcjr_appdiff_pallas
from commpy_tpu.ops.trellis import Trellis

trt = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
rng = np.random.RandomState(0)


def timed(body, x0, rep=12):
    def run(r):
        def chained(x):
            def step(c, _):
                return body(c), ()
            x, _ = jax.lax.scan(step, x, None, length=r)
            return x, jnp.sum(x.reshape(-1)[:4])
        f = jax.jit(chained)
        x, s = f(x0)
        _ = float(s)
        t0 = time.perf_counter()
        for _ in range(3):
            x, s = f(x)
            _ = float(s)
        return (time.perf_counter() - t0) / 3
    return (run(rep) - run(rep // 4)) / (rep - rep // 4)


def bench(T, R, io, rep=12):
    syn = jnp.asarray(rng.randn(T, R).astype(np.float32))
    pan = jnp.asarray(rng.randn(T, R).astype(np.float32))
    li0 = jnp.asarray(rng.randn(T, R).astype(np.float32))

    # correctness: identical outputs (f32 exact; bf16 same rounding)
    a = np.asarray(bcjr_appdiff_pallas(syn, pan, li0, trt,
                                       io_dtype=io, lane_chunk=1024))
    b = np.asarray(bcjr_appdiff_pallas(syn, pan, li0, trt,
                                       io_dtype=io, lane_chunk=2048))
    print(f"T={T} R={R} io={io}: outputs equal "
          f"{np.array_equal(a, b)} (maxdiff {np.abs(a-b).max():.2e})",
          flush=True)

    res = {}
    for p in range(2):
        for lc in (1024, 2048):
            def body(c, lc=lc):
                e = bcjr_appdiff_pallas(syn, pan, c, trt, io_dtype=io,
                                        lane_chunk=lc)
                return c + e * 1e-9
            dt = timed(body, li0, rep)
            res.setdefault(lc, []).append(dt)
            print(f"  pass {p} C={lc//128:2d}: {dt*1e3:7.3f} ms/pass "
                  f"({T*R/dt/1e6:8.1f} Msym/s)", flush=True)
    m8, m16 = np.median(res[1024]), np.median(res[2048])
    print(f"T={T} R={R} io={io}: C16/C8 speedup {m8/m16:.2f}x", flush=True)


bench(128, 8192, "f32")
bench(256, 4096, "bf16")
