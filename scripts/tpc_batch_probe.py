"""TPC throughput vs batch size (same-process, interleaved).

The r5 roofline puts the Chase-Pyndiah decode at 1.0% of the VPU wall —
op-count-bound on tiny (31,21) tiles — so batch is the only lever.
Measures decoded info bits/s at several B to pick the bench/production
batch.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from commpy_tpu.ops.bch import bch_construct
from commpy_tpu.ops.tpc import make_tpc_decoder, tpc_encode

code = bch_construct(5, 2)
k2 = code.k * code.k
dec = make_tpc_decoder(code, code, iterations=4, p=4)
rng = np.random.default_rng(0)


def timed(x0, rep):
    def run(r):
        def chained(x):
            def body(c, _):
                d, _h = dec(c)
                return c.at[0, 0, 0].add(
                    jnp.sum(d).astype(c.dtype) * 1e-12), ()
            x, _ = jax.lax.scan(body, x, None, length=r)
            return x, jnp.sum(x.reshape(-1)[:4])
        g = jax.jit(chained)
        x, s = g(x0)
        _ = float(s)
        t0 = time.perf_counter()
        for _ in range(3):
            x, s = g(x)
            _ = float(s)
        return (time.perf_counter() - t0) / 3
    return (run(rep) - run(max(1, rep // 4))) / (rep - max(1, rep // 4))


inputs = {}
for B in (64, 256, 1024):
    data = rng.integers(0, 2, (B, code.k, code.k))
    cw = np.asarray(tpc_encode(code, code, jnp.asarray(data)))
    llr = (1.0 - 2.0 * cw) * 4.0 + rng.normal(0, 1.4, cw.shape)
    inputs[B] = jnp.asarray(llr.astype(np.float32))

res = {}
for p in range(2):
    for B in (64, 256, 1024):
        rep = max(4, 512 // B)
        dt = timed(inputs[B], rep)
        thr = B * k2 / dt
        res.setdefault(B, []).append(thr)
        print(f"pass {p} B={B:5d}: {thr/1e6:7.2f} Mbit/s "
              f"({dt*1e3:7.2f} ms/decode)", flush=True)
print("--- medians ---")
for B in (64, 256, 1024):
    print(f"B={B:5d}: {np.median(res[B])/1e6:7.2f} Mbit/s")
