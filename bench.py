"""Headline benchmark: decoded info bits/s/chip, soft Viterbi K=7 link.

Runs the flagship 802.11-style decode path (the reference's hottest loop,
convcode.py:590-657) as a batched device program and reports throughput
against the reference NumPy/CPU implementation measured by
benchmarks/measure_reference.py.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from commpy_tpu.ops.trellis import Trellis
    from commpy_tpu.ops.viterbi import viterbi_decode_device

    # K=7 (133,171) soft Viterbi — the wifi80211 decoder configuration.
    trellis = Trellis(np.array([6]), np.array([[133, 171]]))
    L = 1024  # message bits per frame
    B = 256  # frames per batch
    tb_depth = 30

    rng = np.random.RandomState(0)
    llrs = rng.randn(B, 2 * L).astype(np.float32) * 3
    llrs = jnp.asarray(llrs)

    # Chain a data dependency through iterations so async dispatch cannot
    # overlap calls — wall-clock then reflects true sequential decode time.
    def step(x):
        dec = viterbi_decode_device(x, trellis, tb_depth, "soft", L=L,
                                    backend="xla")
        return x + (jnp.sum(dec) * 0).astype(x.dtype)

    fn = jax.jit(step)
    x = fn(llrs)
    x.block_until_ready()  # compile + warmup

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    x.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    bits_per_s = B * L / dt

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

    print(
        json.dumps(
            {
                "metric": "viterbi_k7_soft_decoded_info_bits_per_s_per_chip",
                "value": round(bits_per_s, 1),
                "unit": "bits/s",
                "vs_baseline": round(vs, 2) if vs is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
