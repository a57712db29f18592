"""DVB-T outer protection chain: RS(204,188) + Forney convolutional
interleaver vs burst errors.

Demonstrates the algebraic-codec subsystem end to end: a 90-symbol
channel burst (more than 11x the per-frame correction power t=8) is
spread by the I=12/M=17 interleaver to at most t symbols per RS frame
and fully corrected.  DVB-T chose M = 204/12 so the interleaver delay
is exactly 11 RS frames.

Run:  python examples/dvbt_outer_chain.py            (TPU if attached)
      JAX_PLATFORMS=cpu python examples/dvbt_outer_chain.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import _cpu_env  # noqa: F401

import jax.numpy as jnp

from commpy_tpu.ops.interleave import (conv_deinterleave, conv_interleave,
                                       conv_interleaver_delay)
from commpy_tpu.ops.rs import rs_construct, rs_decode, rs_encode


def main():
    code = rs_construct(8, 8, shorten=51, fcr=0)  # RS(204,188)
    I, M = 12, 17
    D = conv_interleaver_delay(I, M)
    print(f"RS({code.n},{code.k}) t={code.t}, Forney I={I} M={M}, "
          f"delay {D} symbols = {D // code.n} frames")

    rng = np.random.default_rng(0)
    F = 40
    msg = rng.integers(0, 256, (F, code.k))
    stream = np.asarray(rs_encode(code, msg)).reshape(-1)
    tx = np.asarray(conv_interleave(stream, I, M))

    rx = tx.copy()
    burst0, burst_len = 8 * code.n, 90
    rx[burst0:burst0 + burst_len] ^= rng.integers(1, 256, burst_len)
    print(f"channel burst: {burst_len} consecutive corrupted symbols "
          f"(>{burst_len // code.t}x the per-frame budget)")

    de = np.asarray(conv_deinterleave(jnp.asarray(rx), I, M))
    frames = de.reshape(F, code.n)[D // code.n:]
    corrected, nerr, ok = (np.asarray(a) for a in rs_decode(code, frames))
    want = np.asarray(rs_encode(code, msg))[:F - D // code.n]
    print(f"after deinterleaving: max {nerr.max()} symbol errors per "
          f"frame (t={code.t}), total {nerr.sum()}")
    print(f"all frames decoded: {bool(ok.all())}; "
          f"payload exact: {np.array_equal(corrected, want)}")

    # without the interleaver the same burst is fatal
    rx2 = stream.copy()
    rx2[burst0:burst0 + burst_len] ^= rng.integers(1, 256, burst_len)
    _, _, ok2 = (np.asarray(a) for a in
                 rs_decode(code, rx2.reshape(F, code.n)))
    print(f"same burst WITHOUT interleaving: "
          f"{int((~ok2).sum())} unrecoverable frames")


if __name__ == "__main__":
    main()
