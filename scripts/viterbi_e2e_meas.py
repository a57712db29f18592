"""E2e Viterbi decode timing + device backend parity (r3 traceback work)."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from commpy_tpu.ops.trellis import Trellis
from commpy_tpu.ops.viterbi import viterbi_decode_device
assert jax.default_backend() in ("tpu", "axon")
tr = Trellis(np.array([6]), np.array([[0o133, 0o171]]))
B, L = 2048, 1024
rng = np.random.RandomState(0)
llrs = jnp.asarray(rng.randn(B, 2*L).astype(np.float32) * 3)

def chain(body, x0, rep, outer=3):
    def run(r):
        def chained(x):
            def b(c, _):
                return body(c), ()
            x, _ = jax.lax.scan(b, x, None, length=r)
            return x, jnp.sum(x.reshape(-1)[:4])
        f = jax.jit(chained)
        x, s = f(x0); _ = float(s)
        t0 = time.perf_counter()
        for _ in range(outer):
            x, s = f(x); _ = float(s)
        return (time.perf_counter() - t0)/outer
    return (run(rep) - run(max(1, rep//4))) / (rep - max(1, rep//4))

def b_full(c):
    dec = viterbi_decode_device(c, tr, 30, "soft", L=L, backend="pallas")
    return c.at[0, 0].add(jnp.sum(dec).astype(c.dtype)*1e-12)

d_p = np.asarray(viterbi_decode_device(llrs, tr, 30, "soft", L=L, backend="pallas"))
d_x = np.asarray(viterbi_decode_device(llrs, tr, 30, "soft", L=L, backend="xla"))
print(json.dumps({"parity_mismatches": int((d_p != d_x).sum())}), flush=True)
best = 9e9
for _ in range(3):
    best = min(best, chain(b_full, llrs, 18))
print(json.dumps({"e2e_ms": round(best*1e3,3), "bits_per_s": round(B*L/best, 0)}), flush=True)
