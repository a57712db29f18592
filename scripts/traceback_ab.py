"""Real-TPU interleaved A/B: traceback walk, per-step roll vs last-column
broadcast emission (r4 kernel change).

The r4 roofline showed the traceback is now the LARGER half of Viterbi
decode (1.05 ms vs 0.80 ms forward at K=7 B=2048).  Each non-final depth
step of the old walk rolled the whole [BC, T] `inp` tile by -d just to
emit ONE position; the r4 kernel broadcasts the static last column
instead and keeps a single roll for the final step.  This script times
BOTH variants in one process (service drift makes sequential runs
unrankable) on the bench shape and checks bit identity.
"""
import json
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from commpy_tpu.kernels.viterbi_acs import (
    _traceback_kernel, acs_forward_pallas, traceback_pallas,
)
from commpy_tpu.ops.trellis import Trellis


def _traceback_kernel_old(dec_ref, best_ref, out_ref, *, T, S, tb_depth):
    """The r3 walk: per-step pltpu.roll of the inp tile."""
    G32 = dec_ref.shape[0]
    BC = dec_ref.shape[1]
    half_mask = S // 2 - 1
    msb_shift = max(S.bit_length() - 2, 0)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (BC, T), 1)
    rolled = [dec_ref[g] for g in range(G32)]
    cur = best_ref[:, :]
    out = jnp.zeros((BC, T), jnp.int32)
    for d in range(max(tb_depth - 1, 1)):
        pos = cur & 31
        w = rolled[0]
        if G32 > 1:
            cur_g = cur >> 5
            for g in range(1, G32):
                w = jnp.where(cur_g == g, rolled[g], w)
        j = (w >> pos) & 1
        inp = cur >> msb_shift
        cur = ((cur & half_mask) << 1) | j
        emit = (t_iota <= T - 1 - d) & (
            (d == tb_depth - 2) | (t_iota == T - 1 - d)
        )
        inp_pos = pltpu.roll(inp, (T - d) % T, axis=1) if d else inp
        out = jnp.where(emit, inp_pos, out)
        if d + 1 < max(tb_depth - 1, 1):
            rolled = [pltpu.roll(x, 1, axis=1) for x in rolled]
    out_ref[:, :] = out.astype(jnp.int8)


def run_tb(kernel_fn, dec_gmaj, best, S, tb_depth, BC):
    G, B, T = dec_gmaj.shape
    n_chunks = -(-B // BC)
    kernel = partial(kernel_fn, T=T, S=S, tb_depth=int(tb_depth))
    return pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((G, BC, T), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BC, T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BC, T), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T), jnp.int8),
    )(dec_gmaj, best)


def main():
    assert jax.default_backend() in ("tpu", "axon")
    t7 = Trellis(np.array([6]), np.array([[0o133, 0o171]]))
    B, L = 2048, 1024
    S, tb = 64, 30
    rng = np.random.RandomState(0)
    r = jnp.asarray(rng.randn(B, (L + 6) // 1 - 1, 2).astype(np.float32))
    dec_gmaj, best = acs_forward_pallas(r, t7, "soft", layout="gmaj")
    dec_gmaj = jax.block_until_ready(dec_gmaj)
    T = dec_gmaj.shape[2]
    BC = 64

    # bit identity first
    o_old = np.asarray(run_tb(_traceback_kernel_old, dec_gmaj, best, S, tb, BC))
    o_new = np.asarray(run_tb(_traceback_kernel, dec_gmaj, best, S, tb, BC))
    ident = bool((o_old == o_new).all())

    def timed(fn, rep=64):
        @partial(jax.jit, static_argnums=1)
        def chained(d0, r_):
            def body(c, _):
                o = run_tb(fn, c, best, S, tb, BC)
                c = c.at[0, 0, 0].add(
                    jnp.sum(o.astype(jnp.int32)) % 2)
                return c, ()
            c, _ = jax.lax.scan(body, d0, None, length=r_)
            return c, jnp.sum(c[0, 0, :4])
        ts = {}
        for r_ in (rep // 4, rep):
            _, s = chained(dec_gmaj, r_)
            _ = float(s)
            t0 = time.perf_counter()
            _, s = chained(dec_gmaj, r_)
            _ = float(s)
            ts[r_] = time.perf_counter() - t0
        return (ts[rep] - ts[rep // 4]) / (rep - rep // 4)

    res = {"old": [], "new": []}
    for _ in range(3):
        res["old"].append(timed(_traceback_kernel_old))
        res["new"].append(timed(_traceback_kernel))
    t_old = float(np.median(res["old"]))
    t_new = float(np.median(res["new"]))
    print(json.dumps({
        "probe": "traceback_ab", "B": B, "T": T, "BC": BC,
        "identical": ident,
        "old_ms": round(t_old * 1e3, 4),
        "new_ms": round(t_new * 1e3, 4),
        "speedup": round(t_old / t_new, 3),
        "decoded_bits_per_s_tbonly": round(B * L / t_new, 1),
    }, ), flush=True)


if __name__ == "__main__":
    main()
