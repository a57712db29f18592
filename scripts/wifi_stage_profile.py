"""Stage-level timing of the 802.11 MCS-4 link step (one process).

Times three chained variants — full link, link-without-Viterbi, and
Viterbi alone — with the slope method, so the decode/frontend split of
the wifi_mcs4_full_link bench number is measured, not guessed.

Usage: python scripts/wifi_stage_profile.py [F]
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from commpy_tpu.ops import modem as M
from commpy_tpu.ops.convcode import depuncture_device, encode_scan, \
    puncture_mask
from commpy_tpu.ops.trellis import Trellis
from commpy_tpu.ops.viterbi import viterbi_decode_device
from commpy_tpu.models.device_links import _frame_crandn, _gen_bits

F = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
LBITS = 1200
trellis = Trellis(np.array([6]), np.array([[0o133, 0o171]]))
const = M.qam_constellation(16).astype(np.complex64)
keep = puncture_mask([1, 1, 1, 0, 0, 1], 2 * LBITS)
noise_std = 0.25
rng = np.random.RandomState(0)
keys0 = jax.random.split(jax.random.PRNGKey(0), F)


def frontend(keys):
    bits = _gen_bits(keys, LBITS)
    coded, _ = encode_scan(bits, trellis)
    coded = coded[:, np.where(np.asarray(keep))[0]]
    symbols = M.modulate(coded, const, 4)
    y = symbols + _frame_crandn(keys, symbols.shape[1:], 1) * (
        noise_std * 0.5)
    rx = M.demodulate_soft(y, const, 4, noise_std**2)
    return depuncture_device(rx, keep), bits


def full(keys):
    rx, bits = frontend(keys)
    dec = viterbi_decode_device(rx, trellis, 30, "soft", L=LBITS)
    return jnp.sum(jnp.bitwise_xor(dec, bits).astype(jnp.int32))


def front_only(keys):
    rx, bits = frontend(keys)
    return jnp.sum(rx) + jnp.sum(bits)


rx0 = np.asarray(jax.jit(frontend)(keys0)[0])


def vit_only(rx):
    dec = viterbi_decode_device(rx, trellis, 30, "soft", L=LBITS)
    return jnp.sum(dec.astype(jnp.int32))


def chain_keys(fn, rep):
    def chained(k):
        def body(c, _):
            out = fn(c)
            # fold the scalar result back into the keys so the chain
            # cannot be parallelized or constant-folded
            c = c.at[0, 0].add(out.astype(c.dtype) % 2)
            return c, ()
        k, _ = jax.lax.scan(body, k, None, length=rep)
        return k, jnp.sum(k[:2, :])
    return jax.jit(chained)


def chain_rx(fn, rep):
    def chained(x):
        def body(c, _):
            out = fn(c)
            c = c.at[0, 0].add(out.astype(c.dtype) * 1e-12)
            return c, ()
        x, _ = jax.lax.scan(body, x, None, length=rep)
        return x, jnp.sum(x[0, :4])
    return jax.jit(chained)


REP_HI, REP_LO, OUTER = 20, 5, 2
cases = {
    "full_link": (chain_keys(full, REP_HI), chain_keys(full, REP_LO), keys0),
    "frontend_only": (chain_keys(front_only, REP_HI),
                      chain_keys(front_only, REP_LO), keys0),
    "viterbi_only": (chain_rx(vit_only, REP_HI),
                     chain_rx(vit_only, REP_LO),
                     jnp.asarray(rx0.astype(np.float32))),
}

for name, (hi, lo, x0) in cases.items():
    _, s = hi(x0); _ = float(s)
    _, s = lo(x0); _ = float(s)

for rnd in range(4):
    for name, (hi, lo, x0) in cases.items():
        ts = {}
        for tag, f in (("hi", hi), ("lo", lo)):
            t0 = time.perf_counter()
            for _ in range(OUTER):
                _, s = f(x0)
                _ = float(s)
            ts[tag] = (time.perf_counter() - t0) / OUTER
        dt = (ts["hi"] - ts["lo"]) / (REP_HI - REP_LO)
        print(f"round {rnd} {name}: {dt*1e3:.2f} ms "
              f"({F*LBITS/dt/1e6:.0f} Mbit/s info)", flush=True)
