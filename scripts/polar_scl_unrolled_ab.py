"""Same-process A/B: scan SCL vs statically-unrolled SCL on device.

Usage: python scripts/polar_scl_unrolled_ab.py
"""
import sys
import time
t_start = time.time()

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from commpy_tpu.ops.polar import (make_polar_scl_decoder,
                                  make_polar_scl_decoder_unrolled,
                                  polar_construct)

code = polar_construct(1024, 512, crc="crc11", design_snr_db=2.0)
rng = np.random.RandomState(0)


def timed(scl, x0, rep):
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
        print(f"  [t={time.time()-t_start:.0f}s] compiled chain r={r}",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(3):
            x, s = g(x)
            _ = float(s)
        return (time.perf_counter() - t0) / 3
    return (run(rep) - run(max(1, rep // 4))) / (rep - max(1, rep // 4))


unr = make_polar_scl_decoder_unrolled(code, list_size=8, rule="minsum",
                                      pm_rule="approx")
scan = make_polar_scl_decoder(code, list_size=8, rule="minsum",
                              pm_rule="approx")

x1k = jnp.asarray(rng.randn(1024, 1024).astype(np.float32) * 3)
# (bit-identity at B=256 already device-verified in the first A/B run)

x4k = jnp.asarray(rng.randn(4096, 1024).astype(np.float32) * 3)
for p in range(2):
    t_scan = timed(scan, x1k, rep=4)
    t_u1 = timed(unr, x1k, rep=48)
    t_u4 = timed(unr, x4k, rep=16)
    print(f"pass {p}: scan B=1024 {1024*512/t_scan/1e6:8.1f} Mbit/s | "
          f"unrolled B=1024 {1024*512/t_u1/1e6:8.1f} Mbit/s "
          f"({t_scan/t_u1:.1f}x) | unrolled B=4096 "
          f"{4096*512/t_u4/1e6:8.1f} Mbit/s", flush=True)
