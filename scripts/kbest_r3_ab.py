"""Same-process A/B: r3-pinned K-best vs current K-best (VERDICT r4 #4).

r3's ROADMAP claimed ~3.8M vectors/s for the batched K-best rewrite;
every r4 window measured 833-906k.  This script loads BOTH code
versions into one process (the r3 tree from a pinned git worktree, the
current tree from the repo) and interleaves chain-differenced timings
of the exact bench workload (B=4096, 4x4 16-QAM, K=16, hard) — if the
two versions measure the same in the same window, the r3 number was
service-window drift and the ROADMAP/docs claims must be corrected to
same-process ratios.

Setup:  git worktree add /tmp/r3repo <r3-final-commit>
Run:    python scripts/kbest_r3_ab.py
"""
import sys
import time

import numpy as np

R3 = "/tmp/r3repo"

# --- load the r3 package in isolation ---
sys.path.insert(0, R3)
import commpy_tpu.ops.mimo as _m3  # noqa: E402
import commpy_tpu.ops.modem as _mod3  # noqa: E402

kbest_r3 = _m3.kbest_device
qam_r3 = _mod3.qam_constellation
r3_mods = {k: sys.modules.pop(k) for k in list(sys.modules)
           if k == "commpy_tpu" or k.startswith("commpy_tpu.")}
sys.path.remove(R3)
sys.path.insert(0, ".")

import commpy_tpu.ops.mimo as _mnow  # noqa: E402
import commpy_tpu.ops.modem as _modnow  # noqa: E402

kbest_now = _mnow.kbest_device
qam_now = _modnow.qam_constellation
assert _mnow is not _m3

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

rng = np.random.RandomState(0)
const = qam_now(16).astype(np.complex64)
assert np.array_equal(const, qam_r3(16).astype(np.complex64))
Bk = 4096
hr = rng.randn(2, Bk, 4, 4).astype(np.float32) / np.sqrt(2)
yr = rng.randn(2, Bk, 4).astype(np.float32)
y0 = (jnp.asarray(yr[0]), jnp.asarray(yr[1]))


def make_body(kbest):
    def body(c):
        yre, yim = c
        y = jax.lax.complex(yre, yim)
        h = jax.lax.complex(jnp.asarray(hr[0]), jnp.asarray(hr[1]))
        sym = kbest(y, h, jnp.asarray(const), 16)
        return (yre + jnp.real(sym[:, 0:1]) * 1e-12, yim)
    return body


def timed_chain(body, rep=12, outer=3):
    def run(r):
        def chained(x):
            def step(c, _):
                return body(c), ()
            x, _ = jax.lax.scan(step, x, None, length=r)
            return x, jnp.sum(x[0][:4])
        f = jax.jit(chained)
        x, s = f(y0)
        _ = float(s)
        t0 = time.perf_counter()
        for _ in range(outer):
            x, s = f(x)
            _ = float(s)
        return (time.perf_counter() - t0) / outer
    return (run(rep) - run(rep // 4)) / (rep - rep // 4)


# output equivalence first (device-side compare: the axon tunnel lacks
# complex device->host readback, so only a scalar crosses)
@jax.jit
def _eq(yre, yim):
    y = jax.lax.complex(yre, yim)
    h = jax.lax.complex(jnp.asarray(hr[0]), jnp.asarray(hr[1]))
    a = kbest_r3(y, h, jnp.asarray(const), 16)
    b = kbest_now(y, h, jnp.asarray(const), 16)
    return jnp.sum(jnp.abs(a - b))

print("outputs equal:", float(_eq(*y0)) == 0.0, flush=True)

res = {"r3": [], "now": []}
for p in range(3):
    for name, kb in (("r3", kbest_r3), ("now", kbest_now)):
        dt = timed_chain(make_body(kb))
        res[name].append(Bk / dt)
        print(f"pass {p} {name:4s}: {Bk/dt/1e3:8.1f}k vectors/s",
              flush=True)

print("--- medians ---")
for name in ("r3", "now"):
    print(f"{name:4s}: {np.median(res[name])/1e3:.1f}k vectors/s")
print(f"ratio now/r3: "
      f"{np.median(res['now'])/np.median(res['r3']):.3f}")
