"""Ablate the SCL decoder's per-leaf cost components on-device.

Times dependent chains of each primitive the in-block leaf machinery
executes (stacked permute, top_k ranking, local LLR refresh f/g, big
deferred permute) at the bench shape (N=1024, P=8, Wb=32), to attribute
the measured ~11 ms/decode (B=256) before optimizing.  Counts per
decode: 523 info-leaf prunes, 1024 leaf refreshes, 16 deferred big
permutes.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
P, Wb, N = 8, 32, 1024
rng = np.random.RandomState(0)


def timed(f, x0, n_steps, label, work_per_decode):
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
        for _ in range(3):
            x, s = g(x)
            _ = float(s)
        return (time.perf_counter() - t0) / 3

    # chain-differenced: fixed dispatch/RTT cancels in the slope
    per_step = (run(n_steps) - run(max(1, n_steps // 4))) / (
        n_steps - max(1, n_steps // 4))
    print(f"{label:34s}: {per_step*1e6:8.2f} us/step x {work_per_decode:4d}"
          f" = {per_step*work_per_decode*1e3:7.3f} ms/decode", flush=True)
    return per_step


# 1. stacked local permute: [5*Wb, P, B] x onehot [P, P, B]
st = jnp.asarray(rng.randn(5 * Wb, P, B).astype(np.float32))


def perm(x):
    onehot = (x[:P, :, :1] == x[:P, :, :1]).astype(jnp.float32) * \
        jnp.eye(P, dtype=jnp.float32)[:, :, None]
    out = (x[:, :, None, :] * onehot[None]).sum(axis=1)
    return out + 1e-9


timed(perm, st, 64, "stacked permute [160,8,B]", 523)

# 2. top_k over [B, 2P]
pm = jnp.asarray(rng.randn(P, B).astype(np.float32))


def prune(pm):
    cand = jnp.concatenate([pm, pm + 0.5], axis=0)
    neg_top, idx = jax.lax.top_k(-cand.T, P)
    return (-neg_top).T + 1e-9


timed(prune, pm, 64, "top_k [B,16]->8", 523)

# 3. f/g refresh at the mean local level (rows ~ Wb)
a = jnp.asarray(rng.randn(Wb, P, B).astype(np.float32))


def fg(a):
    h = Wb // 2
    x, y = a[:h], a[h:]
    f = jnp.sign(x) * jnp.sign(y) * jnp.minimum(jnp.abs(x), jnp.abs(y))
    g = y + x
    return jnp.concatenate([f, g], axis=0) * 0.999 + 1e-9


timed(fg, a, 128, "local f/g refresh [32,8,B]", 1024)

# 4. big deferred permute: [2N, P, B] x [P, P, B]
big = jnp.asarray(rng.randn(2 * N, P, B).astype(np.float32))


def bigperm(x):
    onehot = jnp.eye(P, dtype=jnp.float32)[:, :, None] * \
        (1.0 + x[0, 0, 0] * 1e-20)
    return (x[:, :, None, :] * onehot[None]).sum(axis=1) + 1e-9


timed(bigperm, big, 16, "big permute [2048,8,B]", 16)

# 5. lax.cond dispatch cost: cond on a traced scalar around a tiny op
c0 = jnp.asarray(rng.randn(P, B).astype(np.float32))


def conded(x):
    return jax.lax.cond(x[0, 0] > 0, lambda v: v * 1.0001 + 1e-9,
                        lambda v: v * 0.9999 - 1e-9, x)


timed(conded, c0, 256, "lax.cond tiny [8,B]", 1024)
