"""Dependent-chain latency model for the BCJR kernel (VERDICT r4 #3).

The r4 roofline shows bcjr_map_pass at 14-15% of every THROUGHPUT wall;
the claim "irreducible dependent chain" gets its quantitative backing
here, the same treatment the Viterbi kernels got:

1. CALIBRATE the per-op cost of a dependent vector-op chain at the
   kernel's own tile shape ([S*8, 128] f32) with a Pallas microkernel:
   time fori_loop(T) bodies of k dependent mul-adds for k in {4, 8, 16}
   and fit the slope -> lambda (ns per dependent op incl. issue).
2. COUNT the ops the BCJR recursion executes per trellis step (from
   kernels/bcjr.py's step functions; independent subtrees like g_rows
   still execute on the same VPU, so total issued ops is the model —
   issue-bound, not chain-latency-bound).
3. PREDICT pass time = total_ops * lambda and compare to the measured
   pass (both max-log and exact log-MAP), reporting measured/model %.

Emits JSON rows appended to benchmarks/roofline_latest.jsonl by
benchmarks/roofline.py's next run or pasted into docs/performance.md.
"""
import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from commpy_tpu.kernels.bcjr import bcjr_appdiff_pallas
from commpy_tpu.ops.trellis import Trellis

SC, LANE = 32, 128  # the BCJR state tile [S*8, 128] for S=4
T_STEPS = 4096


def _cal_kernel(x_ref, o_ref, *, k_ops, n_steps, n_chains=1):
    """Chain of k_ops NON-FOLDABLE dependent op-units per loop step.

    One unit = sub + max (2 VPU primitives); an affine chain
    (x*c + d) constant-folds to a single op and measures nothing.
    ``n_chains > 1`` interleaves independent chains (ILP) to bound the
    pipelined-issue cost from below.
    """
    x = x_ref[...]
    h = x.shape[0] // n_chains
    xs = [x[i * h:(i + 1) * h] * (1.0 + 1e-6 * i) for i in range(n_chains)]

    def step(t, xs):
        for _ in range(k_ops):
            xs = tuple(jnp.maximum(v, 0.1 - v) for v in xs)
        return xs

    xs = jax.lax.fori_loop(0, n_steps, step, tuple(xs))
    o_ref[...] = jnp.concatenate(list(xs), axis=0)


def cal_time(k_ops, n_steps=T_STEPS, rep=32, n_chains=1):
    f = pl.pallas_call(
        partial(_cal_kernel, k_ops=k_ops, n_steps=n_steps,
                n_chains=n_chains),
        in_specs=[pl.BlockSpec((SC, LANE), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SC, LANE), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SC, LANE), jnp.float32),
    )
    x0 = jnp.asarray(np.random.RandomState(0).randn(SC, LANE)
                     .astype(np.float32))

    def run(r):
        def chained(x):
            def body(c, _):
                return f(c), ()
            x, _ = jax.lax.scan(body, x, None, length=r)
            return x, jnp.sum(x[:2, :2])
        g = jax.jit(chained)
        x, s = g(x0)
        _ = float(s)
        t0 = time.perf_counter()
        for _ in range(3):
            x, s = g(x)
            _ = float(s)
        return (time.perf_counter() - t0) / 3

    dt = (run(rep) - run(rep // 4)) / (rep - rep // 4)
    return dt / n_steps  # seconds per loop body of k_ops


print("calibration (sub+max units on [32, 128] f32):", flush=True)
ks = (8, 32)
lams = {}
for n_chains, nm in ((1, "dependent"), (4, "independent x4")):
    ts = {}
    for p in range(3):
        for k in ks:
            ts.setdefault(k, []).append(cal_time(k, n_chains=n_chains))
    meds = {k: float(np.median(ts[k])) for k in ks}
    # slope removes the loop's fixed overhead; /2: 2 primitives per unit
    lam = (meds[32] - meds[8]) / (32 - 8) / 2
    lams[n_chains] = lam
    print(f"  {nm:15s}: k=8 {meds[8]*1e9:7.1f} ns/step, k=32 "
          f"{meds[32]*1e9:7.1f} ns/step -> {lam*1e9:5.2f} ns/primitive",
          flush=True)
lam = lams[1]
lam_ind = lams[4]
fixed = 0.0

# ---- op counts per trellis step (hand-counted from kernels/bcjr.py,
# S=4, [32, 128] tiles unless noted) ----
# g_rows: 2 rowt loads + li row (3 small [8,128] ~ 1/4-cost each) and
#   per (u, s) tile: sign-pick + concat -> ~8 selects + 2 concats + 2
#   li adds ~ 12 ops but at [8, 128] (1/4 cost) -> ~3 equivalent ops
# fwd step: 2 picks (S slices + concat ~ 2 eq-ops each) + 2 adds +
#   lse2 (maxlog: 1; exact: max+sub+abs+exp+log1p+add ~ 6) + history
#   store (~1)
# bwd step: 2 adds (beta+g) + 2 picks + lse2 + APP: 2 adds + 2
#   reduce_s (2 lse2 stages at [16],[8] ~ 1 eq-op each) + store
OPS = {
    "maxlog": {"fwd": 3 + 2 + 2 + 1 + 1, "bwd": 3 + 2 + 2 + 1 + 2 + 2 + 2 + 1},
    "exact": {"fwd": 3 + 2 + 2 + 6 + 1, "bwd": 3 + 2 + 2 + 6 + 2 + 2 + 12 + 1},
}

trt = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
rng = np.random.RandomState(0)
T, R = 256, 4096
n_blocks = R // 1024
syn = jnp.asarray(rng.randn(T, R).astype(np.float32))
pan = jnp.asarray(rng.randn(T, R).astype(np.float32))
li0 = jnp.asarray(rng.randn(T, R).astype(np.float32))


def pass_time(max_log, rep=192):
    def body(c):
        e = bcjr_appdiff_pallas(syn, pan, c, trt, max_log=max_log)
        return c + e * 1e-9

    def run(r):
        def chained(x):
            def step(c, _):
                return body(c), ()
            x, _ = jax.lax.scan(step, x, None, length=r)
            return x, jnp.sum(x.reshape(-1)[:4])
        g = jax.jit(chained)
        x, s = g(li0)
        _ = float(s)
        t0 = time.perf_counter()
        for _ in range(3):
            x, s = g(x)
            _ = float(s)
        return (time.perf_counter() - t0) / 3
    return (run(rep) - run(rep // 4)) / (rep - rep // 4)


for mode, ml in (("maxlog", True), ("exact", False)):
    meas = []
    for p in range(3):
        meas.append(pass_time(ml))
    m = float(np.median(meas))
    ops = OPS[mode]
    steps = T * n_blocks
    total_ops = steps * (ops["fwd"] + ops["bwd"])
    hi = total_ops * lam       # fully serialized dependent chain
    lo = total_ops * lam_ind   # perfectly pipelined independent issue
    row = {
        "kernel": f"bcjr_latency_model T{T} R{R} {mode}",
        "measured_ms": round(m * 1e3, 3),
        "model_lo_ms": round(lo * 1e3, 3),
        "model_hi_ms": round(hi * 1e3, 3),
        "position_pct_of_serial_bound": round(100 * m / hi, 1),
        "lambda_dep_ns": round(lam * 1e9, 2),
        "lambda_indep_ns": round(lam_ind * 1e9, 2),
        "ops_per_fwd_step": ops["fwd"],
        "ops_per_bwd_step": ops["bwd"],
        "note": ("latency model: pass time bracketed by total_ops x "
                 "lambda(independent) and x lambda(dependent) at the "
                 "kernel's own [32,128] tile — the recursions are "
                 "issue/latency-bound, not throughput-bound"),
    }
    print(json.dumps(row), flush=True)
