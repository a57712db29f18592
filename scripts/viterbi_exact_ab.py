"""Real-TPU A/B: pricing device bit-exactness for soft/unquantized Viterbi.

VERDICT r3 item 3: make the device default bit-exact or price it
honestly.  Three candidate ACS precision modes:

  default — operands bf16-rounded per MXU pass (fastest; ~0.02% of
            near-tie decisions flip vs CPU f32 ground truth);
  split   — 3-term bf16 operand split, DEFAULT passes (exploits that
            Q/C matrices are bf16-exact: 3 passes reconstruct the f32
            product; see kernels/viterbi_acs._dot_split3);
  highest — Precision.HIGHEST (both operands split; the r2/r3 exact
            path, measured 2.1x forward cost).

Measures, in ONE process (interleaved, remote-drift-safe):
  1. bit-identity vs CPU f32 ground truth per (code, decoding type);
  2. end-to-end decode throughput at the bench shape (B=2048, L=1024,
     soft K=7) for all three modes, interleaved.

Writes one JSON line per result; paste the summary into
benchmarks/device_probes/viterbi_exact.jsonl and docs/parity.md.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from commpy_tpu.ops.convcode import encode_scan
from commpy_tpu.ops.trellis import Trellis
from commpy_tpu.ops.viterbi import viterbi_decode_device


def make_rx(trellis, dec_type, B, L, sigma, seed):
    rng = np.random.RandomState(seed)
    msg = rng.randint(0, 2, (B, L)).astype(np.int8)
    coded = np.asarray(encode_scan(jnp.asarray(msg), trellis)[0]).astype(
        np.int8
    )
    if dec_type == "hard":
        flips = rng.rand(*coded.shape) < sigma
        rx = (coded ^ flips).astype(np.float32)
    elif dec_type == "soft":
        bpsk = 1.0 - 2.0 * coded
        noisy = bpsk + sigma * rng.randn(*coded.shape)
        rx = (-2.0 * noisy / sigma**2).astype(np.float32)
    else:  # unquantized
        bpsk = -(1.0 - 2.0 * coded)
        rx = (bpsk + sigma * rng.randn(*coded.shape)).astype(np.float32)
    return msg, rx


def cpu_truth():
    """Phase 1 (run with JAX_PLATFORMS=cpu in its OWN process — the
    axon plugin slows in-process CPU execution 25-140x): write the f32
    ground-truth decodes to /tmp/viterbi_truth_*.npy."""
    t7 = Trellis(np.array([6]), np.array([[0o133, 0o171]]))
    t3 = Trellis(np.array([2]), np.array([[5, 7]]))
    B, L = 64, 1024
    for name, tr in (("k7", t7), ("k3", t3)):
        for dec_type, sig in (("soft", 0.8), ("unquantized", 0.8)):
            msg, rx = make_rx(tr, dec_type, B, L, sig, seed=0)
            d = np.asarray(viterbi_decode_device(
                jnp.asarray(rx), tr, tb_depth=30,
                decoding_type=dec_type, L=L, backend="xla"))
            np.save(f"/tmp/viterbi_truth_{name}_{dec_type}.npy", d)
    print("truth written")


def main():
    assert jax.default_backend() in ("tpu", "axon")
    t7 = Trellis(np.array([6]), np.array([[0o133, 0o171]]))
    t3 = Trellis(np.array([2]), np.array([[5, 7]]))

    # ---- 1. bit-identity vs CPU f32 ----
    B, L = 64, 1024
    for name, tr in (("k7", t7), ("k3", t3)):
        for dec_type, sig in (("soft", 0.8), ("unquantized", 0.8)):
            msg, rx = make_rx(tr, dec_type, B, L, sig, seed=0)
            kw = dict(tb_depth=30, decoding_type=dec_type, L=L)
            d_cpu = np.load(f"/tmp/viterbi_truth_{name}_{dec_type}.npy")
            rx_j = jnp.asarray(rx)
            outs = {}
            for mode, ex in (("default", False), ("split", "split"),
                             ("highest", "highest")):
                outs[mode] = np.asarray(
                    viterbi_decode_device(rx_j, tr, backend="pallas",
                                          exact=ex, **kw))
            print(json.dumps({
                "probe": "viterbi_exact_modes",
                "code": name, "decoding_type": dec_type,
                "bits_compared": int(d_cpu.size),
                "default_vs_cpu": int((outs["default"] != d_cpu).sum()),
                "split_vs_cpu": int((outs["split"] != d_cpu).sum()),
                "highest_vs_cpu": int((outs["highest"] != d_cpu).sum()),
                "ber_cpu": round(float((d_cpu != msg).mean()), 6),
                "ber_split": round(float((outs["split"] != msg).mean()), 6),
            }), flush=True)

    # ---- 2. interleaved e2e throughput at the bench shape ----
    Bb, Lb = 2048, 1024
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(Bb, 2 * Lb).astype(np.float32) * 3)

    def timed(ex, rep):
        def chained(x, r):
            def body(c, _):
                d = viterbi_decode_device(c, t7, 30, "soft", L=Lb,
                                          backend="pallas", exact=ex)
                c = c.at[0, 0].add(jnp.sum(d).astype(c.dtype) * 1e-12)
                return c, ()
            x, _ = jax.lax.scan(body, x, None, length=r)
            return x, jnp.sum(x.reshape(-1)[:4])

        f = jax.jit(chained, static_argnums=1)
        ts = {}
        for r in (rep // 4, rep):
            _, s = f(x0, r)
            _ = float(s)
            t0 = time.perf_counter()
            _, s = f(x0, r)
            _ = float(s)
            ts[r] = time.perf_counter() - t0
        dt = (ts[rep] - ts[rep // 4]) / (rep - rep // 4)
        if dt <= 0:
            raise RuntimeError("non-positive differenced time")
        return dt

    # interleave A/B/A/B to ride out service drift
    reps = {"default": [], "split": [], "highest": []}
    for _ in range(3):
        for mode, ex in (("default", False), ("split", "split"),
                         ("highest", "highest")):
            reps[mode].append(timed(ex, 24))
    out = {"probe": "viterbi_exact_e2e_ab", "B": Bb, "L": Lb}
    base = np.median(reps["default"])
    for mode in reps:
        dt = float(np.median(reps[mode]))
        out[mode + "_bits_per_s"] = round(Bb * Lb / dt, 1)
        out[mode + "_cost_vs_default"] = round(dt / base - 1, 4)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "truth":
        cpu_truth()
    else:
        main()
