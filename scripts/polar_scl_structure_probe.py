"""Attribute SCL decode cost: prune path vs skeleton.

Runs the real SCL decoder at N=1024/P=8/B=256 with three frozen masks:
the bench code (523 info leaves), all-info (1024 prunes), and K=1
(1 prune — measures the scan/refresh/deferred-permute skeleton).
Per-prune cost = slope between the three; skeleton = intercept.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from commpy_tpu.ops.polar import (PolarCode, make_polar_scl_decoder,
                                  polar_construct)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.randn(B, 1024).astype(np.float32) * 3)


def timed(scl, rep=4):
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


cases = {}
codec = polar_construct(1024, 512, crc="crc11", design_snr_db=2.0)
cases["bench (523 info)"] = (codec, 523)
all_info = polar_construct(1024, 1024, design_snr_db=2.0)
cases["all-info (1024)"] = (all_info, 1024)
k1 = polar_construct(1024, 1, design_snr_db=2.0)
cases["K=1 (1 prune)"] = (k1, 1)

res = {}
for p in range(2):
    for name, (code, n_info) in cases.items():
        scl = make_polar_scl_decoder(code, list_size=8, rule="minsum",
                                     pm_rule="approx")
        dt = timed(scl)
        res.setdefault(name, []).append(dt)
        print(f"pass {p} {name:18s}: {dt*1e3:7.2f} ms/decode", flush=True)

print("--- medians ---")
meds = {}
for name, (code, n_info) in cases.items():
    meds[name] = float(np.median(res[name]))
    print(f"{name:18s}: {meds[name]*1e3:7.2f} ms")
sk = meds["K=1 (1 prune)"]
per_prune = (meds["all-info (1024)"] - sk) / 1023
print(f"skeleton ~{sk*1e3:.2f} ms; per-prune ~{per_prune*1e6:.1f} us; "
      f"bench predicted {1e3*(sk + 523*per_prune):.2f} ms vs measured "
      f"{meds['bench (523 info)']*1e3:.2f} ms")
