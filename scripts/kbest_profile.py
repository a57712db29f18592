"""Device profile: where does kbest_device spend its time?

Interleaved same-process A/B (service throughput drifts between
processes): times the full K-best against ablated variants to attribute
cost between top_k (sort), the candidate gathers, the residual updates,
and the Cholesky QR.  Ablations change RESULTS (not valid decodes) —
they only isolate op cost.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from commpy_tpu.ops.mimo import _chol_qr_batched
from commpy_tpu.ops.modem import qam_constellation

B, NT, K = 4096, 4, 16
const_np = qam_constellation(16).astype(np.complex64)
rng = np.random.RandomState(0)
hr = rng.randn(2, B, NT, NT).astype(np.float32) / np.sqrt(2)
yr = rng.randn(2, B, NT).astype(np.float32)


def beam(y, h, constellation, mode):
    """One batched beam search; mode ablates stages."""
    nt = h.shape[-1]
    m = constellation.shape[0]
    r, yt = _chol_qr_batched(h, y)

    def one(yi, hi, ri, yti):
        X = jnp.zeros((nt, 1), constellation.dtype)
        d = yti[:, None]
        d_tot = jnp.zeros((1,), jnp.float32)
        nb_can = 1
        for lvl, coor in enumerate(range(nt - 1, -1, -1)):
            nb_hyp = nb_can * m
            X = jnp.tile(X, (1, m))
            d = jnp.tile(d, (1, m))
            d_tot_h = jnp.tile(d_tot, m)
            hyp = jnp.repeat(constellation, nb_can)
            X = X.at[coor].set(hyp)
            d = d.at[coor].add(-ri[coor, coor] * hyp)
            d_tot_h = d_tot_h + jnp.abs(d[coor]) ** 2
            keep = min(nb_hyp, K)
            if mode == "no_topk":
                sel = jnp.arange(keep)
            else:
                _, sel = jax.lax.top_k(-d_tot_h, keep)
            if mode == "no_gather":
                X = X[:, :keep]
                d = d[:, :keep]
                d_tot = d_tot_h[:keep]
                hyp_sel = hyp[:keep]
            else:
                X = X[:, sel]
                d = d[:, sel]
                d_tot = d_tot_h[sel]
                hyp_sel = hyp[sel]
            if mode != "no_resid":
                d = d.at[:coor].add(-ri[:coor, coor, None] * hyp_sel)
            nb_can = keep
        return X[:, 0]

    return jax.vmap(one)(y, h, r, yt)


def timed(mode, rep=12, outer=3):
    y0 = (jnp.asarray(yr[0]), jnp.asarray(yr[1]))

    def run(r):
        def chained_r(c):
            # complex operands built in-trace from NUMPY constants: a
            # device-resident complex closure forces a complex64
            # readback during constant embedding, which the axon TPU
            # backend cannot do (same issue as bench_all.sec_kbest)
            h = jax.lax.complex(jnp.asarray(hr[0]), jnp.asarray(hr[1]))
            c16 = jnp.asarray(const_np)

            def body(carry, _):
                re, im = carry
                y = jax.lax.complex(re, im)
                sym = beam(y, h, c16, mode)
                return (re + jnp.real(sym[:, 0:1]) * 1e-12, im), ()
            c, _ = jax.lax.scan(body, c, None, length=r)
            return c, jnp.sum(c[0][:4])
        f = jax.jit(chained_r)
        c, s = f(y0)
        _ = float(s)
        t0 = time.perf_counter()
        for _ in range(outer):
            c, s = f(c)
            _ = float(s)
        return (time.perf_counter() - t0) / outer

    lo = max(1, rep // 4)
    dt = (run(rep) - run(lo)) / (rep - lo)
    return dt


def main():
    assert jax.default_backend() in ("tpu", "axon")
    modes = ["full", "no_topk", "no_gather", "no_resid"]
    results = {}
    # interleave: 2 rounds over all modes, keep the min
    for _ in range(2):
        for mode in modes:
            dt = timed(mode)
            results[mode] = min(results.get(mode, 1e9), dt)
    for mode in modes:
        print(json.dumps({
            "probe": "kbest_stage_profile", "mode": mode,
            "ms_per_batch": round(results[mode] * 1e3, 3),
            "vectors_per_s": round(B / results[mode], 0),
        }), flush=True)


if __name__ == "__main__":
    main()
