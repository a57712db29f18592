"""Same-process SCL throughput sweep over batch size (and block_exp).

The r4 SCL row was measured at B=256 only.  The decoder is a chain of
~500 sequential info-leaf prunes whose per-leaf tensors are tiny
([Wb, P, B]); if each leaf is op-dispatch-latency-bound rather than
VPU-bound, throughput scales with B until the tensors become
compute-bound.  This probe measures that scaling honestly (interleaved,
chain-differenced, single process — ROADMAP timing rules).

Usage: python scripts/polar_scl_batch_sweep.py [B1,B2,...] [block_exp]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from commpy_tpu.ops.polar import make_polar_scl_decoder, polar_construct

Bs = [int(b) for b in (sys.argv[1].split(",") if len(sys.argv) > 1
                       else ["256", "512", "1024", "2048"])]
bexp = int(sys.argv[2]) if len(sys.argv) > 2 else 5

code = polar_construct(1024, 512, crc="crc11", design_snr_db=2.0)
rng = np.random.RandomState(0)


def timed_chain(f, x0, rep, outer=3):
    rep_lo = max(1, rep // 4)

    def run(r):
        def chained(x):
            def body(c, _):
                return f(c), ()
            x, _ = jax.lax.scan(body, x, None, length=r)
            return x, jnp.sum(x.reshape(-1)[:4])
        g = jax.jit(chained)
        x, s = g(x0)
        _ = float(s)
        t0 = time.perf_counter()
        for _ in range(outer):
            x, s = g(x)
            _ = float(s)
        return (time.perf_counter() - t0) / outer

    return (run(rep) - run(rep_lo)) / (rep - rep_lo)


decoders = {}
inputs = {}
for B in Bs:
    decoders[B] = make_polar_scl_decoder(code, list_size=8, rule="minsum",
                                         pm_rule="approx", block_exp=bexp)
    inputs[B] = jnp.asarray(rng.randn(B, 1024).astype(np.float32) * 3)

# Interleave measurements across B values (two passes) so a service
# drift window cannot masquerade as a batch-scaling effect.
results = {B: [] for B in Bs}
for p in range(2):
    for B in Bs:
        scl = decoders[B]

        def body(c, scl=scl):
            dec = scl(c)
            return c.at[0, 0].add(jnp.sum(dec).astype(c.dtype) * 1e-12)

        dt = timed_chain(body, inputs[B], rep=4)
        thr = B * 512 / dt
        results[B].append(thr)
        print(f"pass {p} B={B:5d} block_exp={bexp}: {thr/1e6:8.2f} Mbit/s "
              f"({dt*1e3:.2f} ms/decode)", flush=True)

print("--- medians ---")
for B in Bs:
    med = float(np.median(results[B]))
    print(f"B={B:5d}: {med/1e6:8.2f} Mbit/s")
