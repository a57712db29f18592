"""A/B: lax.top_k vs stable-rank selection for the SCL prune.

The SCL prune needs the P smallest of 2P candidates per batch element,
with STABLE tie-breaking (lower candidate index wins) — exactly what
lax.top_k(-cand) gives.  Stable rank r_i = #{j: c_j < c_i} +
#{j < i: c_j == c_i} computes the same selection with pure
elementwise/reduce ops on a [2P, 2P, B] compare tensor (no cross-lane
sort).  Verifies bit-identity, then times dependent chains of both.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
P = 8
rng = np.random.RandomState(0)


def topk_prune(pm):
    # current path: candidates [2P, B] -> top_k over transposed lanes
    cand = jnp.concatenate([pm * 1.0001, pm * 0.9999 + 0.1], axis=0)
    neg_top, idx = jax.lax.top_k(-cand.T, P)  # [B, P]
    pm_new = (-neg_top).T
    parent = (idx % P).T
    bit = (idx // P).T.astype(jnp.float32)
    onehot = (parent[None] == jnp.arange(P)[:, None, None]).astype(
        jnp.float32)
    return pm_new + 1e-9, bit, onehot


def rank_prune(pm):
    cand = jnp.concatenate([pm * 1.0001, pm * 0.9999 + 0.1], axis=0)
    M = cand.shape[0]  # 2P
    ci = cand[:, None, :]
    cj = cand[None, :, :]
    lower_j = (jnp.arange(M)[None, :, None] < jnp.arange(M)[:, None, None])
    # stable rank of candidate i among all candidates
    r = jnp.sum((cj < ci) | ((cj == ci) & lower_j), axis=1)  # [2P, B] int
    oh = (r[:, None, :] == jnp.arange(P)[None, :, None]).astype(
        jnp.float32)  # [2P, P, B]: candidate i -> new path p
    pm_new = jnp.sum(cand[:, None, :] * oh, axis=0)  # [P, B] exact
    bit = jnp.sum(oh[P:], axis=0)  # [P, B] (1 iff the kept cand had u=1)
    onehot = oh[:P] + oh[P:]  # [P_old, P_new, B] parent permutation
    return pm_new + 1e-9, bit, onehot


x0 = jnp.asarray(rng.randn(P, B).astype(np.float32))

# bit-identity check (including engineered ties)
pm_t = jnp.asarray(
    np.array([[1.0, 2.0, 1.0, 3.0, 2.0, 1.0, 0.5, 0.5]] * B,
             np.float32).T)
for probe in (x0, pm_t):
    a = [np.asarray(v) for v in topk_prune(probe)]
    b = [np.asarray(v) for v in rank_prune(probe)]
    for u, v, nm in zip(a, b, ("pm", "bit", "onehot")):
        assert np.array_equal(u, v), (nm, u, v)
print("bit-identical (incl. ties) OK", flush=True)


def timed(f, n_steps, label):
    def run(r):
        def chained(x):
            def body(c, _):
                pm_new, bit, onehot = f(c)
                return pm_new + 1e-7 * bit[:, :1], ()
            x, _ = jax.lax.scan(body, x, None, length=r)
            return x, jnp.sum(x.reshape(-1)[:4])

        g = jax.jit(chained)
        x, s = g(x0)
        _ = float(s)
        t0 = time.perf_counter()
        for _ in range(4):
            x, s = g(x)
            _ = float(s)
        return (time.perf_counter() - t0) / 4

    per = (run(n_steps) - run(n_steps // 4)) / (n_steps - n_steps // 4)
    print(f"{label:14s}: {per*1e6:8.2f} us/prune", flush=True)
    return per


for p in range(2):
    t1 = timed(topk_prune, 16384, "top_k")
    t2 = timed(rank_prune, 16384, "rank-select")
    print(f"pass {p}: rank-select speedup {t1/t2:.2f}x", flush=True)
