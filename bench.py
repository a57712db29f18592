"""Headline benchmark: decoded info bits/s/chip, soft Viterbi K=7.

Runs the flagship decode path (the reference's hottest loop,
convcode.py:590-657) as a batched device program and reports throughput
against the reference NumPy/CPU implementation measured by
benchmarks/measure_reference.py.

Timing methodology (remote-TPU-safe): REP decodes are chained INSIDE one
jitted program through a data dependency that cannot be constant-folded,
and the host synchronizes on a scalar transfer — so neither async
dispatch nor XLA dead-code elimination can distort the number.  Per-call
host overhead (the remote tunnel here has a ~30 ms round trip — at
REP=30 leaving it in would understate throughput ~35%) is removed by
DIFFERENCING: the same body is timed at two chain lengths and the
throughput comes from the slope (t_hi - t_lo) / (rep_hi - rep_lo), so
any fixed dispatch/sync latency cancels exactly.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import os
import time

import numpy as np


_METRIC = "viterbi_k7_soft_decoded_info_bits_per_s_per_chip"


def main():
    import jax
    import jax.numpy as jnp

    from commpy_tpu.ops.trellis import Trellis
    from commpy_tpu.ops.viterbi import viterbi_decode_device

    # K=7 (133,171) soft Viterbi — the wifi80211 decoder configuration.
    trellis = Trellis(np.array([6]), np.array([[0o133, 0o171]]))
    L = 1024  # message bits per frame
    B = 2048  # frames per batch (sweet spot: the traceback kernel amortizes
    # best here; 1024 and 4096 both measure ~35% lower)
    tb_depth = 30
    REP_LO, REP_HI = 10, 40  # two chain lengths; throughput = the slope

    rng = np.random.RandomState(0)
    llrs = jnp.asarray(rng.randn(B, 2 * L).astype(np.float32) * 3)

    def make_fn(rep):
        def chained(x):
            def body(c, _):
                dec = viterbi_decode_device(
                    c, trellis, tb_depth, "soft", L=L, backend="auto"
                )
                c = c.at[0, 0].add(jnp.sum(dec).astype(c.dtype) * 1e-12)
                return c, ()
            x, _ = jax.lax.scan(body, x, None, length=rep)
            return x, jnp.sum(x[0, :4])
        return jax.jit(chained)

    fn_lo, fn_hi = make_fn(REP_LO), make_fn(REP_HI)

    def timed(fn, iters=3):
        x, s = fn(llrs)
        _ = float(s)  # compile + warmup with real sync
        t0 = time.perf_counter()
        for _ in range(iters):
            x, s = fn(x)
            _ = float(s)
        return (time.perf_counter() - t0) / iters

    # Remote-service throughput drifts between calls; measure the slope
    # several times interleaved (lo, hi, lo, hi, ...) and take the
    # median of the positive samples so one jittered window cannot
    # produce a nonsensical (or negative) headline number.
    slopes = []
    for _ in range(5):
        t_lo, t_hi = timed(fn_lo), timed(fn_hi)
        per_decode = (t_hi - t_lo) / (REP_HI - REP_LO)
        if per_decode > 0:
            slopes.append(per_decode)
    if not slopes:
        raise RuntimeError(
            "host-link jitter exceeded the chain-length delta in every "
            "round; rerun (the remote TPU service has flaky windows)"
        )
    per_decode = float(np.median(slopes))
    bits_per_s = B * L / per_decode

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks",
        "reference_cpu.json",
    )
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        vs = bits_per_s / ref["viterbi_k7_soft_bits_per_s"]

    _measured.set()  # a real result is about to print; watchdog stands down
    print(
        json.dumps(
            {
                "metric": _METRIC,
                "value": round(bits_per_s, 1),
                "unit": "bits/s",
                "vs_baseline": round(vs, 2) if vs is not None else None,
            }
        )
    )


import threading

_measured = threading.Event()


def _watchdog(seconds: int = 540):
    """Emit an explanatory JSON line if the remote TPU service hangs.

    During a service outage even ``jax.devices()`` blocks forever inside
    a native RPC (so signal handlers never run and the driver's timeout
    would record NOTHING).  A daemon thread turns that into one
    diagnostic line, so an outage is distinguishable from a broken
    benchmark.  540 s sits just under the driver's own 560 s timeout:
    a slow-but-healthy run that long was getting killed either way, and
    ``_measured`` guards the race where the real result prints as the
    timer fires (no contradictory second line).
    """
    def fire():
        if _measured.is_set():
            return
        print(json.dumps({
            "metric": _METRIC,
            "value": 0,
            "unit": "bits/s",
            "vs_baseline": None,
            "error": f"TPU backend unreachable for {seconds}s "
                     "(remote service outage); no measurement taken",
        }), flush=True)
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


if __name__ == "__main__":
    _wd = _watchdog()
    main()
    _wd.cancel()
