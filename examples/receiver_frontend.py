"""Receiver front-end walkthrough: CRC framing, scrambling, CFO sync,
and pilot-based channel estimation.

The pieces the classic textbook BER curve hides: a frame gets a CRC
(`ops/crc.py`), is scrambled (`ops/scramble.py`), rides an OFDM waveform
through a multipath channel WITH a carrier frequency offset, and the
receiver must (1) estimate and remove the CFO from the cyclic prefix,
(2) estimate the channel from comb pilots, (3) equalize, descramble, and
check the CRC — all as batched device ops.

Run:  python examples/receiver_frontend.py           (TPU if attached)
      JAX_PLATFORMS=cpu python examples/receiver_frontend.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import _cpu_env  # noqa: F401

import jax
import jax.numpy as jnp

from commpy_tpu.ops import modem as M
from commpy_tpu.ops.crc import CrcSpec, make_crc_attach, make_crc_check
from commpy_tpu.ops.impairments import add_frequency_offset
from commpy_tpu.ops.ofdm import make_comb_estimator, ofdm_rx, ofdm_tx, subcarrier_bins
from commpy_tpu.ops.scramble import descramble, scramble
from commpy_tpu.ops.sync import cfo_correct, cfo_estimate_cp

NFFT, NSC, CP = 64, 48, 16
N_TAPS = 4
PILOT_SLOTS = np.arange(0, NSC, 4)      # comb raster, 12 pilots
DATA_SLOTS = np.setdiff1d(np.arange(NSC), PILOT_SLOTS)
BPS = 2                                  # QPSK
N_SYM = 8                                # OFDM symbols per frame
FRAMES = 256
SEED = 0x5D

crc = CrcSpec.named("crc16")
K = len(DATA_SLOTS) * BPS * N_SYM - crc.length  # payload bits per frame


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    const = M.qam_constellation(4).astype(np.complex64)
    pilot_vals = (1.0 - 2.0 * (PILOT_SLOTS % 2)).astype(np.complex64)
    attach = make_crc_attach(crc, K)
    check = make_crc_check(crc, K + crc.length)
    estimate = make_comb_estimator(NFFT, NSC, PILOT_SLOTS, N_TAPS)

    bits = jnp.asarray(rng.randint(0, 2, (FRAMES, K)), jnp.int32)

    @jax.jit
    def transmit(bits, g_r, g_i, n_r, n_i):
        framed = attach(bits)                       # +CRC16
        tx_bits = scramble(framed, seed=SEED)       # whiten
        syms = M.modulate(tx_bits, const, BPS)      # QPSK
        grid = jnp.zeros((FRAMES, NSC, N_SYM), jnp.complex64)
        grid = grid.at[:, DATA_SLOTS, :].set(
            syms.reshape(FRAMES, N_SYM, -1).transpose(0, 2, 1))
        grid = grid.at[:, PILOT_SLOTS, :].set(pilot_vals[None, :, None])
        wave = ofdm_tx(grid, NFFT, NSC, CP)
        g = g_r + 1j * g_i                          # multipath
        rx = jnp.zeros_like(wave)
        for tap in range(N_TAPS):
            sh = wave if tap == 0 else jnp.pad(
                wave, ((0, 0), (tap, 0)))[:, :wave.shape[1]]
            rx = rx + g[:, tap:tap + 1] * sh
        rx = add_frequency_offset(rx, Fs=NFFT, delta_f=0.23)  # CFO!
        return rx + 0.008 * (n_r + 1j * n_i)

    @jax.jit
    def receive(rx):
        eps = cfo_estimate_cp(rx, NFFT, CP, n_symbols=N_SYM)   # (1) CFO
        fixed = cfo_correct(rx, eps, NFFT)
        grid = ofdm_rx(fixed, NFFT, NSC, CP)
        h = estimate(grid[:, PILOT_SLOTS, 0] / pilot_vals)     # (2) channel
        # (2b) common-phase tracking: residual CFO error integrates into a
        # per-symbol rotation; the comb pilots measure it every symbol
        ref = h[:, PILOT_SLOTS, None] * pilot_vals[None, :, None]
        cpe = jnp.sum(grid[:, PILOT_SLOTS, :] * jnp.conj(ref), axis=1)
        rot = jnp.exp(1j * jnp.angle(cpe))                     # [F, N_SYM]
        z = grid[:, DATA_SLOTS, :] / h[:, DATA_SLOTS, None] / rot[:, None, :]
        syms = z.transpose(0, 2, 1).reshape(FRAMES, -1)
        rx_bits = M.demodulate_hard(syms, const, BPS)          # (3) detect
        framed = descramble(rx_bits.astype(jnp.int32), seed=SEED)
        return eps, framed, check(framed)

    # exponential power-delay profile with a dominant first tap (mild
    # frequency selectivity; a flat-power Rayleigh line would put uncoded
    # QPSK at ~2% BER from deep fades alone — add FEC for that regime)
    pdp = np.sqrt(np.array([0.85, 0.08, 0.05, 0.02]) / 2)
    g = ((rng.randn(FRAMES, N_TAPS) + 1j * rng.randn(FRAMES, N_TAPS))
         * pdp[None, :]).astype(np.complex64)
    n = (rng.randn(FRAMES, N_SYM * (NFFT + CP)),
         rng.randn(FRAMES, N_SYM * (NFFT + CP)))
    rx = transmit(bits, g.real.copy(), g.imag.copy(),
                  n[0].astype(np.float32), n[1].astype(np.float32))
    eps, framed, ok = receive(rx)

    ber = float(jnp.mean(jnp.not_equal(framed[:, :K], bits)))
    print(f"CFO estimates (true 0.23): "
          f"{np.asarray(eps)[:4].round(4)} ...")
    print(f"payload BER after sync+est+descramble: {ber:.5f}")
    print(f"CRC pass rate: {float(jnp.mean(ok.astype(jnp.float32))):.3f} "
          f"({int(jnp.sum(ok))}/{FRAMES} frames)")
    assert np.allclose(np.asarray(eps), 0.23, atol=0.05)


if __name__ == "__main__":
    main()
