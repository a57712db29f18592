"""Split the (31,21) hard decoder's cost: syndrome vs BM vs Chien.

Shapes at the Chase/TPC inner batch ([31744, 31]).  Also re-times the
full Chase SISO after the one-hot frontend fix.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from commpy_tpu.ops.bch import (_mod2, _syndrome_table, bch_construct,
                                chien_tables, make_bch_chase_soft,
                                make_bch_decoder)
from commpy_tpu.ops.gf2m import bm_inversionless, gf_reduce_matrix

code = bch_construct(5, 2)
m, t, n = code.m, code.t, code.n
B = 31744
rng = np.random.RandomState(0)
bits0 = jnp.asarray(rng.randint(0, 2, (B, n)).astype(np.float32))

S_tab = jnp.asarray(_syndrome_table(code), jnp.float32)
R_mat = jnp.asarray(gf_reduce_matrix(m), jnp.float32)
D = min(512, code.n_parent)
em, sm = chien_tables(m, t, code.n_parent, D)
eval_mat = jnp.asarray(em, jnp.float32)
step_mat = jnp.asarray(sm, jnp.float32)
n_blocks = -(-code.n_parent // D)


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
    print(f"{label:24s}: {dt*1e3:8.3f} ms", flush=True)
    return dt


def synd_only(c):
    synd = _mod2(c @ S_tab)
    return c + jnp.sum(synd) * 1e-12


def synd_bm(c):
    synd = _mod2(c @ S_tab).reshape(B, 2 * t, m)
    lam, Lr = bm_inversionless(synd, t, m, R_mat)
    return c + jnp.sum(lam) * 1e-12


def synd_bm_chien(c):
    synd = _mod2(c @ S_tab).reshape(B, 2 * t, m)
    lam, Lr = bm_inversionless(synd, t, m, R_mat)
    mu0 = lam.reshape(B, (t + 1) * m)

    def chien_step(mu, _):
        vals = _mod2(mu @ eval_mat).reshape(B, D, m)
        is_root = ~jnp.any(vals > 0, axis=-1)
        mu = _mod2(mu @ step_mat)
        return mu, is_root

    _, roots = lax.scan(chien_step, mu0, None, length=n_blocks)
    return c + jnp.sum(roots.astype(jnp.float32)) * 1e-12


hard = make_bch_decoder(code)


def full_hard(c):
    corr, ne, ok = hard(c.astype(jnp.int8))
    return c + jnp.sum(ne).astype(jnp.float32) * 1e-12


siso = make_bch_chase_soft(code, p=4)
llr0 = jnp.asarray(rng.randn(1984, n).astype(np.float32) * 2)


def full_siso(c):
    soft, hb = siso(c)
    return c + soft * 1e-9


for p in range(2):
    timed(synd_only, bits0, 128, "syndrome matmul")
    timed(synd_bm, bits0, 64, "syndrome + BM")
    timed(synd_bm_chien, bits0, 64, "synd + BM + chien")
    timed(full_hard, bits0, 64, "full hard decode")
    timed(full_siso, llr0, 64, "chase SISO (post-fix)")
