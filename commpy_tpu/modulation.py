"""Reference-compatible modulation module (commpy.modulation API).

``Modem`` / ``PSKModem`` / ``QAMModem`` keep the reference class surface
(commpy/modulation.py:39-262) while dispatching to the batched device
kernels in :mod:`commpy_tpu.ops.modem`.  OFDM and the MIMO detectors are
re-exported from their ops modules.
"""
from __future__ import annotations

import numpy as np

from .ops import modem as _m
from .ops.mimo import (
    best_first_detector,
    bit_lvl_repr,
    kbest,
    max_log_approx,
    mimo_ml,
)
from .ops.ofdm import ofdm_rx as _ofdm_rx_device
from .ops.ofdm import ofdm_tx as _ofdm_tx_device

__all__ = [
    "Modem",
    "PSKModem",
    "QAMModem",
    "ofdm_tx",
    "ofdm_rx",
    "mimo_ml",
    "kbest",
    "best_first_detector",
    "bit_lvl_repr",
    "max_log_approx",
]


class Modem:
    """Custom-constellation modem (reference modulation.py:39-172)."""

    def __init__(self, constellation, reorder_as_gray=True):
        if reorder_as_gray:
            self.constellation = _m.gray_reorder(np.asarray(constellation))
        else:
            self.constellation = constellation

    def modulate(self, input_bits):
        """Map bits to symbols (batched gather on device)."""
        bits = np.asarray(input_bits)
        n = (bits.size // self.num_bits_symbol) * self.num_bits_symbol
        return np.asarray(
            _m.modulate(bits[:n], self._constellation, self.num_bits_symbol)
        )

    def demodulate(self, input_symbols, demod_type, noise_var=0):
        """Hard (min-distance) or soft (exact LLR) demapping."""
        symbols = np.atleast_1d(np.asarray(input_symbols))
        if demod_type == "hard":
            out = _m.demodulate_hard(
                symbols, self._constellation, self.num_bits_symbol
            )
            return np.asarray(out).astype(np.int8)
        elif demod_type == "soft":
            out = _m.demodulate_soft(
                symbols, self._constellation, self.num_bits_symbol, noise_var
            )
            return np.asarray(out, dtype=float)
        raise ValueError('demod_type must be "hard" or "soft"')

    def plot_constellation(self):
        import matplotlib.pyplot as plt

        plt.scatter(self.constellation.real, self.constellation.imag)
        for symb in self.constellation:
            plt.text(symb.real + 0.2, symb.imag, self.demodulate(symb, "hard"))
        plt.title("Constellation")
        plt.grid()
        plt.show()

    @property
    def constellation(self):
        return self._constellation

    @constellation.setter
    def constellation(self, value):
        num_bits_symbol = np.log2(len(value))
        if num_bits_symbol != int(num_bits_symbol):
            raise ValueError("Constellation length must be a power of 2.")
        self._constellation = np.array(value)
        self.Es = float(np.mean(np.abs(self._constellation) ** 2))
        self.m = self._constellation.size
        self.num_bits_symbol = int(num_bits_symbol)


class PSKModem(Modem):
    """m-PSK modem (reference modulation.py:175-211)."""

    def __init__(self, m):
        num_bits_symbol = np.log2(m)
        if num_bits_symbol != int(num_bits_symbol):
            raise ValueError("Constellation length must be a power of 2.")
        super().__init__(
            np.exp(1j * np.arange(0, 2 * np.pi, 2 * np.pi / m))
        )


class QAMModem(Modem):
    """Square m-QAM modem (reference modulation.py:213-262)."""

    def __init__(self, m):
        num_symb_pam = np.sqrt(m)
        if num_symb_pam != int(num_symb_pam):
            raise ValueError("m must lead to a square QAM.")
        num_symb_pam = int(num_symb_pam)
        pam = np.arange(-num_symb_pam + 1, num_symb_pam, 2)
        constellation = (
            np.tile(np.hstack((pam, pam[::-1])), num_symb_pam // 2) * 1j
            + pam.repeat(num_symb_pam)
        )
        super().__init__(constellation)


def ofdm_tx(x, nfft, nsc, cp_length):
    """OFDM transmit (reference modulation.py:265-282; int-index fixed)."""
    return np.asarray(
        _ofdm_tx_device(np.asarray(x), int(nfft), int(nsc), int(cp_length))
    )


def ofdm_rx(y, nfft, nsc, cp_length):
    """OFDM receive (reference modulation.py:285-296; int-index fixed)."""
    return np.asarray(
        _ofdm_rx_device(np.asarray(y), int(nfft), int(nsc), int(cp_length))
    )
