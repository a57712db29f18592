"""Same-process sweep of windowed-turbo (chunk, warmup) configurations.

The Pallas BCJR kernel's lane-block width BC is VMEM-capped by the
state-metric history scratch [T, P*S, BC] with T = C + 2W, so the
sequential kernel-step count per MAP pass scales ~ (C + 2W)^2 / C —
minimized at C = 2W, NOT at large C.  This sweep measures real
throughput per config in ONE process (the remote service drifts
+-20-40% between processes).

Usage: python scripts/turbo_window_ab.py [L] [B]
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from commpy_tpu.channelcoding import RandInterlv
from commpy_tpu.ops.trellis import Trellis
from commpy_tpu.ops.turbo import turbo_decode_device

L = int(sys.argv[1]) if len(sys.argv) > 1 else 6144
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256

# (window, io, init)
CONFIGS = [((256, 32), "f32", "warmup"), ((128, 32), "f32", "warmup"),
           ((64, 32), "f32", "warmup"), ((64, 32), "bf16", "warmup"),
           ((128, 32), "bf16", "warmup"), ((256, 32), "bf16", "warmup"),
           ((64, 0), "f32", "nii"), ((64, 0), "bf16", "nii"),
           ((128, 0), "bf16", "nii"), ((256, 0), "bf16", "nii"),
           ((96, 0), "bf16", "nii")]

trt = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
interlv = RandInterlv(L, 0)
rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.randn(B, L).astype(np.float32))

REP_HI, REP_LO, OUTER, ROUNDS = 6, 2, 2, 4


def make(cfg, rep):
    window, io, init = cfg
    def chained(x):
        def body(c, _):
            d = turbo_decode_device(c, c, c, trt, 0.5, 8, interlv.p_array,
                                    window=window, kernel_io=io,
                                    backend="pallas", window_init=init)
            return c + d.astype(c.dtype).sum() * 1e-12, ()
        c, _ = jax.lax.scan(body, x, None, length=rep)
        return c, jnp.sum(c[0, :4])
    return jax.jit(chained)


fns = {}
for w in CONFIGS:
    fns[w] = {r: make(w, r) for r in (REP_HI, REP_LO)}
    for f in fns[w].values():
        _, s = f(x0)
        _ = float(s)
    print(f"compiled {w}", flush=True)

res = {w: [] for w in CONFIGS}
for rnd in range(ROUNDS):
    for w in CONFIGS:
        ts = {}
        for r in (REP_HI, REP_LO):
            t0 = time.perf_counter()
            for _ in range(OUTER):
                _, s = fns[w][r](x0)
                _ = float(s)
            ts[r] = (time.perf_counter() - t0) / OUTER
        dt = (ts[REP_HI] - ts[REP_LO]) / (REP_HI - REP_LO)
        res[w].append(dt)
        print(f"round {rnd} window={w}: {dt*1e3:.1f} ms/decode "
              f"({B*L/dt/1e6:.0f} Mbit/s)", flush=True)

print()
for w in CONFIGS:
    med = float(np.median(res[w]))
    print(f"MEDIAN window={w}: {med*1e3:.1f} ms ({B*L/med/1e6:.0f} Mbit/s)")
