"""Interleaved same-process A/B bench of QC-LDPC decode configurations.

Usage: python scripts/qcldpc_ab.py

Ranks, in ONE process (service throughput drifts +-20-40% between
processes — sequential runs cannot rank variants):

  80211n-1944: pallas-flooding-15  vs  xla-flooding-15  vs  layered-8
  dvbs2-16200: xla-flooding-15     vs  xla-layered-8

(Codes past the kernel's 128-lane VMEM budget can only run the XLA
core — the lane axis pads to 128, so there is no reduced-chunk kernel;
the dvbs2 row ranks the two XLA schedules at equal-BER iteration
counts.)
"""
import sys as _s; _s.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from commpy_tpu.ops.qcldpc import (
    ieee80211n_params, qc_bp_decode_device, random_qc_params,
)

rng = np.random.RandomState(0)


def make_runner(params, B, rep, info_bits, n_iters=15, **decode_kw):
    x0 = jnp.asarray(
        rng.randn(B, params["n_vnodes"]).astype(np.float32) * 2)

    def body_fn(c):
        dec, out = qc_bp_decode_device(c, params, "MSA", n_iters,
                                       **decode_kw)
        return c + out * 1e-9

    def chained(x, r):
        def body(c, _):
            return body_fn(c), ()
        x, _ = jax.lax.scan(body, x, None, length=r)
        return x, jnp.sum(x.reshape(-1)[:4])

    reps = (rep, max(1, rep // 4))
    fs = {r: jax.jit(lambda x, _r=r: chained(x, _r)) for r in reps}
    for f in fs.values():
        _, s = f(x0); _ = float(s)  # compile + warmup

    def measure(outer=3):
        times = {}
        for r, f in fs.items():
            x = x0
            t0 = time.perf_counter()
            for _ in range(outer):
                x, s = f(x); _ = float(s)
            times[r] = (time.perf_counter() - t0) / outer
        dt = (times[reps[0]] - times[reps[1]]) / (reps[0] - reps[1])
        return B * info_bits / dt

    return measure


if __name__ == "__main__":
    p11n = ieee80211n_params(1944, "1/2")
    variants_11n = {
        "pallas-flood15": dict(backend="pallas"),
        "xla-flood15": dict(backend="xla"),
        "layered8": dict(backend="pallas", schedule="layered",
                         n_iters=8),
    }
    # layered-8 ~= flooding-15 BER (tests), so bits/s are comparable
    runners = {
        k: make_runner(p11n, 256, 12, 972, **kw)
        for k, kw in variants_11n.items()
    }
    for trial in range(4):
        vals = {k: r() for k, r in runners.items()}
        print("80211n-1944 trial", trial,
              {k: f"{v/1e6:.0f} Mb/s" for k, v in vals.items()},
              flush=True)

    pdvb = random_qc_params(25, 45, 360, col_weight=3, seed=0)
    runners = {
        "xla-flood15": make_runner(pdvb, 64, 6, 7200, backend="xla"),
        "xla-layered8": make_runner(pdvb, 64, 6, 7200, backend="xla",
                                    schedule="layered", n_iters=8),
    }
    for trial in range(4):
        vals = {k: r() for k, r in runners.items()}
        print("dvbs2-16200 trial", trial,
              {k: f"{v/1e6:.0f} Mb/s" for k, v in vals.items()},
              flush=True)
