"""Attribute the Chase SISO's wall (the TPC decode's inner element).

Times, as dependent chains at the TPC bench shape (B=1984 rows of
n=31): (a) the full Chase SISO; (b) the hard decoder on the 16-pattern
batch; (c) the front-end alone (argsort ranking + flip construction —
contains a fancy-indexing gather, the known TPU trap); (d) the
front-end with the gather replaced by a one-hot contraction.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from commpy_tpu.ops.bch import (bch_construct, make_bch_chase_soft,
                                make_bch_decoder)

code = bch_construct(5, 2)
n, p = code.n, 4
n_pat = 1 << p
B = 1984
rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.randn(B, n).astype(np.float32) * 2)
pat_np = ((np.arange(n_pat)[:, None] >> np.arange(p)[None, :]) & 1
          ).astype(np.float32)

siso = make_bch_chase_soft(code, p=p)
hard = make_bch_decoder(code)


def timed(f, x0, rep, label):
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
    dt = (run(rep) - run(max(1, rep // 4))) / (rep - max(1, rep // 4))
    print(f"{label:28s}: {dt*1e3:8.3f} ms", flush=True)
    return dt


def full(c):
    soft, hardb = siso(c)
    return c + soft * 1e-9


def harddec(c):
    rx = (c < 0).astype(jnp.int8)
    big = jnp.broadcast_to(rx[:, None, :], (B, n_pat, n)).reshape(
        B * n_pat, n)
    corr, ne, ok = hard(big)
    return c + jnp.sum(corr.astype(jnp.float32)) * 1e-12


def frontend_gather(c):
    rel = jnp.abs(c)
    order = jnp.argsort(rel, axis=-1)
    rank = jnp.argsort(order, axis=-1)
    in_lru = rank < p
    rank_c = jnp.clip(rank, 0, p - 1)
    flip = jnp.asarray(pat_np)[:, rank_c] * in_lru[None].astype(
        jnp.float32)
    return c + jnp.sum(flip) * 1e-12


def frontend_onehot(c):
    rel = jnp.abs(c)
    order = jnp.argsort(rel, axis=-1)
    rank = jnp.argsort(order, axis=-1)
    in_lru = rank < p
    rank_c = jnp.clip(rank, 0, p - 1)
    oh = (rank_c[..., None] == jnp.arange(p)[None, None, :]).astype(
        jnp.float32)  # [B, n, p]
    flip = jnp.einsum("qp,bnp->qbn", jnp.asarray(pat_np), oh) * \
        in_lru[None].astype(jnp.float32)
    return c + jnp.sum(flip) * 1e-12


for pss in range(2):
    timed(full, x0, 64, "full chase SISO")
    timed(harddec, x0, 64, "hard_dec x16 patterns")
    timed(frontend_gather, x0, 256, "frontend (fancy gather)")
    timed(frontend_onehot, x0, 256, "frontend (one-hot matmul)")
