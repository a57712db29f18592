"""Interleaved same-process A/B bench of two turbo.py variants.

Usage: python scripts/turbo_ab.py {short|long} OLD.py NEW.py

Loads both files as commpy_tpu.ops submodules and alternates
chain-differenced timings in ONE process — the remote TPU service's
throughput drifts +-20% between processes, so sequential bench runs
cannot rank two variants; interleaving in one connection can.
"""
import sys as _s; _s.path.insert(0, "/root/repo")
import importlib.util, sys, time
import numpy as np, jax, jax.numpy as jnp
from commpy_tpu.ops.trellis import Trellis
from commpy_tpu.ops.interleave import RandInterlv


def load(tag, path):
    spec = importlib.util.spec_from_file_location(
        f"commpy_tpu.ops.turbo_{tag}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


trt = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
rng = np.random.RandomState(0)


def make_runner(mod, Lt, Bt, window, rep):
    interlv = RandInterlv(Lt, 0)
    x0 = jnp.asarray(rng.randn(Bt, Lt).astype(np.float32))

    def body_fn(c):
        kw = {} if window is None else {"window": window}
        d = mod.turbo_decode_device(c, c, c, trt, 0.5, 8,
                                    interlv.p_array, **kw)
        return c + d.astype(c.dtype).sum() * 1e-12

    def chained(x, r):
        def body(c, _):
            return body_fn(c), ()
        x, _ = jax.lax.scan(body, x, None, length=r)
        return x, jnp.sum(x.reshape(-1)[:4])

    reps = (rep, max(1, rep // 4))
    fs = {r: jax.jit(lambda x, _r=r: chained(x, _r)) for r in reps}
    for f in fs.values():
        _, s = f(x0); _ = float(s)  # compile + warmup

    def measure(outer=3):
        times = {}
        for r, f in fs.items():
            x = x0
            t0 = time.perf_counter()
            for _ in range(outer):
                x, s = f(x); _ = float(s)
            times[r] = (time.perf_counter() - t0) / outer
        dt = (times[reps[0]] - times[reps[1]]) / (reps[0] - reps[1])
        return Bt * Lt / dt

    return measure


if __name__ == "__main__":
    name = sys.argv[1]
    m_a = load("a", sys.argv[2])
    m_b = load("b", sys.argv[3])
    Lt, Bt, window = {"short": (256, 4096, None),
                      "long": (6144, 256, (256, 32))}[name]
    run_a = make_runner(m_a, Lt, Bt, window, rep=3)
    run_b = make_runner(m_b, Lt, Bt, window, rep=3)
    for trial in range(4):
        a = run_a(); b = run_b()
        print(f"{name} trial {trial}: A={a/1e6:8.1f} B={b/1e6:8.1f} Mb/s"
              f"  B/A={b/a:.3f}", flush=True)
