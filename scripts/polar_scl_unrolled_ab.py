"""Same-process A/B: scan SCL vs statically-unrolled SCL on device.

Usage: python scripts/polar_scl_unrolled_ab.py [B1,B2,...]
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

Bs = [int(b) for b in (sys.argv[1].split(",") if len(sys.argv) > 1
                       else ["256", "1024"])]
code = polar_construct(1024, 512, crc="crc11", design_snr_db=2.0)
rng = np.random.RandomState(0)


def timed(scl, x0, rep=4):
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
    return (run(rep) - run(1)) / (rep - 1)


for B in Bs:
    x0 = jnp.asarray(rng.randn(B, 1024).astype(np.float32) * 3)
    scan_d = make_polar_scl_decoder(code, list_size=8, rule="minsum",
                                    pm_rule="approx")
    unr_d = make_polar_scl_decoder_unrolled(code, list_size=8,
                                            rule="minsum",
                                            pm_rule="approx")
    # device equivalence spot check at this batch
    a = np.asarray(scan_d(x0[:8]))
    b = np.asarray(unr_d(x0[:8]))
    print(f"B={B}: device outputs equal: {np.array_equal(a, b)}",
          flush=True)
    for p in range(2):
        t_scan = timed(scan_d, x0, rep=4)
        t_unr = timed(unr_d, x0, rep=64)
        print(f"pass {p} B={B:5d}: scan {B*512/t_scan/1e6:8.2f} Mbit/s "
              f"({t_scan*1e3:.2f} ms) | unrolled "
              f"{B*512/t_unr/1e6:8.2f} Mbit/s ({t_unr*1e3:.2f} ms) | "
              f"{t_scan/t_unr:.2f}x", flush=True)
