"""Unrolled-SCL throughput vs list size P (same-process, interleaved).

The statically-unrolled decoder's per-prune cost grows as P^2 (rank
compare matrix, permutation contractions); this probe records the
measured scaling at N=1024/K=512+CRC11 so list-size choices are
priced.  CPU golden identity for P=16 is covered by the scan-builder
equivalence test; here outputs are spot-compared on device.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from commpy_tpu.ops.polar import (make_polar_scl_decoder,
                                  make_polar_scl_decoder_unrolled,
                                  polar_construct)

code = polar_construct(1024, 512, crc="crc11", design_snr_db=2.0)
rng = np.random.RandomState(0)
B = 1024
x0 = jnp.asarray(rng.randn(B, 1024).astype(np.float32) * 3)


def timed(scl, rep):
    def run(r):
        def chained(x):
            def body(c, _):
                dec = scl(c)
                return c.at[0, 0].add(
                    jnp.sum(dec).astype(c.dtype) * 1e-12), ()
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


decs = {P: make_polar_scl_decoder_unrolled(code, list_size=P,
                                           rule="minsum",
                                           pm_rule="approx")
        for P in (4, 8, 16)}

# device identity spot check at P=16 vs the scan builder
scan16 = make_polar_scl_decoder(code, list_size=16, rule="minsum",
                                pm_rule="approx")
a = np.asarray(scan16(x0[:4]))
b = np.asarray(decs[16](x0[:4]))
print("P=16 device outputs equal:", np.array_equal(a, b), flush=True)

res = {}
for p in range(2):
    for P in (4, 8, 16):
        rep = 48 if P <= 8 else 24
        dt = timed(decs[P], rep)
        thr = B * 512 / dt
        res.setdefault(P, []).append(thr)
        print(f"pass {p} P={P:2d}: {thr/1e6:7.1f} Mbit/s "
              f"({dt*1e3:6.2f} ms/decode)", flush=True)
print("--- medians ---")
for P in (4, 8, 16):
    print(f"P={P:2d}: {np.median(res[P])/1e6:7.1f} Mbit/s")
