"""Measure per-step cost of BCJR-shaped Pallas loops on the real TPU.

Variants:
  slice : candidate assembly by static sublane slices + concat (exact f32)
  mxu   : candidate assembly by one-hot [8,S]@[S,BC] matmul (DEFAULT prec)
  mxuh  : same with HIGHEST precision

Each runs a fori_loop of L steps over [8, BC] tensors doing the
max-log alpha recursion shape (pick + add + max + store), repeated for
several BC widths.  A tiny carrier input chains repetitions so XLA
cannot CSE the pallas_call, while the big g input stays constant (no
spurious elementwise passes contaminating the timing).  Prints ns/step.
"""
import sys as _s; _s.path.insert(0, "/root/repo")
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, I = 4, 2
PERM = [0, 2, 1, 3, 2, 0, 3, 1]  # fake predecessor rows, [I*S]


def kernel(c_ref, g_ref, Q_ref, out_ref, acc_ref, *, L, variant):
    acc_ref[:, :] = jnp.zeros_like(acc_ref) + c_ref[0, 0] * 1e-20

    def step(t, alpha):
        g = g_ref[t, :, :]  # [I*S, BC]
        if variant == "slice":
            cand = jnp.concatenate([alpha[i:i + 1] for i in PERM], 0) + g
        else:
            prec = (jax.lax.Precision.HIGHEST if variant == "mxuh"
                    else jax.lax.Precision.DEFAULT)
            cand = jax.lax.dot_general(
                Q_ref[:, :], alpha,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec) + g
        a = jnp.maximum(cand[0:S], cand[S:2 * S])
        m = jnp.max(a, axis=0, keepdims=True)
        return a - m

    alpha = acc_ref[0:S, :]
    alpha = jax.lax.fori_loop(0, L, step, alpha)
    out_ref[:, :] = alpha


def run(variant, L, BC):
    Qnp = np.zeros((I * S, S), np.float32)
    for r, p in enumerate(PERM):
        Qnp[r, p] = 1.0
    Q = jnp.asarray(Qnp)
    g = jnp.asarray(np.random.RandomState(0).randn(L, I * S, BC),
                    jnp.float32)
    kfn = partial(kernel, L=L, variant=variant)
    f = pl.pallas_call(
        kfn,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((L, I * S, BC), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((I * S, S), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, BC), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, BC), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2 * S, BC), jnp.float32)],
    )

    def chained(c0, reps):
        def body(c, _):
            y = f(c.reshape(1, 1), g, Q)
            return y[0, 0], ()
        c, _ = jax.lax.scan(body, c0, None, length=reps)
        return c

    out = {}
    pair = (1024, 256)
    for reps in pair:
        fr = jax.jit(lambda c, _r=reps: chained(c, _r))
        s = fr(jnp.float32(0.0)); _ = float(s)
        t0 = time.perf_counter()
        for _ in range(3):
            s = fr(s); _ = float(s)
        out[reps] = (time.perf_counter() - t0) / 3
    dt = (out[pair[0]] - out[pair[1]]) / (pair[0] - pair[1])
    return dt / L * 1e9  # ns per step


if __name__ == "__main__":
    for variant in ("slice", "mxu", "mxuh"):
        for BC, L in ((1024, 256), (2048, 128), (4096, 64)):
            ns = run(variant, L=L, BC=BC)
            print(f"{variant:6s} BC={BC:5d} L={L:4d}: {ns:7.1f} ns/step",
                  flush=True)
