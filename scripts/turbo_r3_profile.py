"""Round-3 turbo limiter hunt: attribute the standard-bench MAP-pass
time between the Pallas recursion itself and the XLA glue around it
(per-pass slot-major transposes + interleaver gathers).

All variants are timed in ONE process with the chain-differencing
methodology (see benchmarks/bench_all.py) so service drift cannot rank
them falsely.

Usage: python scripts/turbo_r3_profile.py [rep]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from commpy_tpu.channelcoding import RandInterlv
    from commpy_tpu.kernels.bcjr import bcjr_appdiff_pallas
    from commpy_tpu.ops.trellis import Trellis
    from commpy_tpu.ops.turbo import turbo_decode_device

    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    rng = np.random.RandomState(0)
    tr = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
    L, B = 256, 4096
    T = L + tr.total_memory  # what the decoder feeds the kernel
    interlv = RandInterlv(L, 0)

    def timed_chain(make_body, x0, rep, outer=3,
                    score=lambda x: jnp.sum(x.reshape(-1)[:4])):
        rep_lo = max(1, rep // 4)

        def run(r):
            def chained(x):
                def body(c, _):
                    return make_body(c), ()
                x, _ = jax.lax.scan(body, x, None, length=r)
                return x, score(x)
            f = jax.jit(chained)
            x, s = f(x0)
            _ = float(s)
            t0 = time.perf_counter()
            for _ in range(outer):
                x, s = f(x)
                _ = float(s)
            return (time.perf_counter() - t0) / outer

        dt = (run(rep) - run(rep_lo)) / (rep - rep_lo)
        assert dt > 0, "jitter exceeded chain delta; raise rep"
        return dt

    # 1. full standard bench config ------------------------------------
    x0 = jnp.asarray(rng.randn(B, L).astype(np.float32))

    def full(c):
        d = turbo_decode_device(c, c, c, tr, 0.5, 8, interlv.p_array)
        return c + d.astype(c.dtype).sum() * 1e-12

    dt_full = timed_chain(full, x0, rep=rep)
    print(f"turbo_8it full:      {dt_full*1e6:9.1f} us  "
          f"({B*L/dt_full/1e6:7.1f} Mbit/s)", flush=True)

    # 2. one raw kernel pass, [T, R] layout in/out (what the loop pays
    #    per MAP pass today: includes slot3 transposes either side) ----
    y0 = jnp.asarray(rng.randn(T, B).astype(np.float32))

    def one_pass(c):
        e = bcjr_appdiff_pallas(c, c, c, tr)
        return c + e * 1e-12

    dt_pass = timed_chain(one_pass, y0, rep=rep * 4)
    print(f"kernel pass [T,R]:   {dt_pass*1e6:9.1f} us  "
          f"(x16 = {dt_pass*16e6:9.1f} us, "
          f"{100*16*dt_pass/dt_full:5.1f}% of full)", flush=True)

    # 3. interleaver gather cost at [T, R] ------------------------------
    p = jnp.asarray(np.asarray(interlv.p_array), jnp.int32)
    pad = jnp.zeros((T - L, B), jnp.float32)

    def gathers(c):
        g = jnp.concatenate([jnp.take(c[:L], p, axis=0), pad]) * 1.0000001
        return g.at[0, 0].add(c[1, 1] * 1e-9)

    dt_g = timed_chain(gathers, y0, rep=rep * 8)
    print(f"interleave gather:   {dt_g*1e6:9.1f} us  "
          f"(x16 = {dt_g*16e6:9.1f} us)", flush=True)


if __name__ == "__main__":
    main()
