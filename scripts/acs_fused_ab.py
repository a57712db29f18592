"""Real-TPU interleaved A/B: ACS forward kernel, two matmuls per step
vs one fused [Q|C] @ [pm; r_t] stacked matmul per step.

The r4 roofline puts the forward pass at 34.5% of the VPU wall with a
per-step dependent chain of 2 MXU ops + compare/select/pack/argmin;
fusing the branch-metric matmul into the permutation matmul halves the
dependent MXU chain.  The fused pass changes the f32 accumulation
grouping, so decision identity vs the unfused kernel is also measured
(expected: equal except near-ties at the usual bf16-default rate).
"""
import json
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from commpy_tpu.kernels.viterbi_acs import acs_forward_pallas
from commpy_tpu.ops.trellis import Trellis


def main():
    assert jax.default_backend() in ("tpu", "axon")
    t7 = Trellis(np.array([6]), np.array([[0o133, 0o171]]))
    B, T = 2048, 1029
    rng = np.random.RandomState(0)
    r = jnp.asarray(rng.randn(B, T, 2).astype(np.float32))

    d0, b0 = acs_forward_pallas(r, t7, "soft", layout="gmaj")
    d1, b1 = acs_forward_pallas(r, t7, "soft", layout="gmaj",
                                fuse_bm=True)
    mism_dec = int((np.asarray(d0) != np.asarray(d1)).sum())
    mism_best = int((np.asarray(b0) != np.asarray(b1)).sum())

    def timed(fuse, rep=48):
        @partial(jax.jit, static_argnums=1)
        def chained(x, rp):
            def body(c, _):
                dec, best = acs_forward_pallas(c, t7, "soft",
                                               layout="gmaj",
                                               fuse_bm=fuse)
                c = c.at[0, 0, 0].add(
                    jnp.sum(best).astype(c.dtype) * 1e-12)
                return c, ()
            x, _ = jax.lax.scan(body, x, None, length=rp)
            return x, jnp.sum(x.reshape(-1)[:4])
        ts = {}
        for rp in (rep // 4, rep):
            _, s = chained(r, rp)
            _ = float(s)
            t0 = time.perf_counter()
            _, s = chained(r, rp)
            _ = float(s)
            ts[rp] = time.perf_counter() - t0
        return (ts[rep] - ts[rep // 4]) / (rep - rep // 4)

    res = {"unfused": [], "fused": []}
    for _ in range(3):
        res["unfused"].append(timed(False))
        res["fused"].append(timed(True))
    tu = float(np.median(res["unfused"]))
    tf = float(np.median(res["fused"]))
    print(json.dumps({
        "probe": "acs_fused_ab", "B": B, "T": T,
        "dec_mismatch_bits": mism_dec, "best_mismatch": mism_best,
        "total_bits": int(np.asarray(d0).size * 32),
        "unfused_ms": round(tu * 1e3, 4),
        "fused_ms": round(tf * 1e3, 4),
        "speedup": round(tu / tf, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
