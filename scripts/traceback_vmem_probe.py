"""Real-TPU probe: traceback VMEM cap model at a second G (ADVICE r3).

The `_traceback_batch_cap` byte model was calibrated at G=2 (K=7) with
the G slope widened to 16G on advice.  This probe runs the Pallas
decode at G=4 (S=128, a K=8 code) and at the longest K=7 block the cap
still admits, right at the model's predicted edge — if the 16G slope
undershot reality, these compile-OOM; if they run and decode matches
XLA, the model holds.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from commpy_tpu.kernels.viterbi_acs import _traceback_batch_cap
from commpy_tpu.ops.trellis import Trellis
from commpy_tpu.ops.viterbi import viterbi_decode_device


def run(name, tr, B, L):
    S = tr.number_states
    G = -(-S // 32)
    T = L + tr.total_memory - 1
    cap = _traceback_batch_cap(T, G)
    rng = np.random.RandomState(0)
    rx = jnp.asarray(rng.randn(B, 2 * L).astype(np.float32))
    kw = dict(tb_depth=30, decoding_type="soft", L=L)
    try:
        d_pl = np.asarray(
            viterbi_decode_device(rx, tr, backend="pallas", **kw))
        d_xl = np.asarray(
            viterbi_decode_device(rx, tr, backend="xla", **kw))
        print(json.dumps({
            "probe": "traceback_vmem_g", "code": name, "S": S, "G": G,
            "T": T, "B": B, "cap": cap,
            "pallas_vs_xla_mismatch": int((d_pl != d_xl).sum()),
            "ok": True,
        }), flush=True)
    except Exception as e:  # noqa: BLE001 — report, don't crash the probe
        print(json.dumps({
            "probe": "traceback_vmem_g", "code": name, "S": S, "G": G,
            "T": T, "B": B, "cap": cap, "ok": False,
            "error": f"{type(e).__name__}: {str(e)[:200]}",
        }), flush=True)


def main():
    assert jax.default_backend() in ("tpu", "axon")
    # G=4: K=8 constraint-length code (memory 7), S=128
    t8 = Trellis(np.array([7]), np.array([[0o515, 0o677]]))
    run("k8_g4", t8, 512, 1024)
    # G=2 at the longest block the cap admits (cap >= 32 edge):
    # 13e6 / (T * 168) >= 32  ->  T <= ~2417; L = 2300 -> T = 2305
    t7 = Trellis(np.array([6]), np.array([[0o133, 0o171]]))
    run("k7_longT", t7, 128, 2300)
    # and one past the edge: auto-resolution must route to XLA (no OOM)
    run("k7_pastedge", t7, 128, 4000)


if __name__ == "__main__":
    main()
