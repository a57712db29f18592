"""Modem tests: tier-1 goldens + tier-2 theory BER (reference
commpy/tests/test_modulation.py structure)."""
from itertools import product

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal
from scipy.special import erf

import jax
from commpy_tpu.modulation import Modem, PSKModem, QAMModem, max_log_approx
from commpy_tpu.ops import modem as M


def Qfunc(x):
    return 0.5 - 0.5 * erf(x / np.sqrt(2))


QAM_MODEMS = [QAMModem(4), QAMModem(16), QAMModem(64)]
PSK_MODEMS = [PSKModem(4), PSKModem(16), PSKModem(64)]


def test_mod_hard_demod_identity():
    custom = [
        re + im * 1j for re, im in product((-3.5, -0.5, 0.5, 3.5), repeat=2)
    ]
    for modem in QAM_MODEMS + PSK_MODEMS + [Modem(custom)]:
        for bits in product(*((0, 1),) * modem.num_bits_symbol):
            out = modem.demodulate(modem.modulate(np.array(bits)), "hard")
            assert_array_equal(np.array(bits), out)


def test_es_values():
    for modem in QAM_MODEMS:
        assert_allclose(modem.Es, 2 * (modem.m - 1) / 3)
    for modem in PSK_MODEMS:
        assert_allclose(modem.Es, 1)
    custom = [
        re + im * 1j for re, im in product((-3.5, -0.5, 0.5, 3.5), repeat=2)
    ]
    assert_allclose(Modem(custom).Es, 12.5)


def test_constellation_setter_raises():
    q = QAMModem(16)
    with pytest.raises(ValueError):
        q.constellation = (0, 0, 0)
    with pytest.raises(ValueError):
        QAMModem(32)  # non-square
    with pytest.raises(ValueError):
        PSKModem(12)


def test_max_log_approx_goldens():
    # reference test_modulation.py:67-85
    x = np.array((-1, -1, 1))
    H = np.array(((-0.33, 0.66, 0.03), (1.25, 0.2, -0.4), (0.05, 1.3, 1.4)))
    y = H.dot(x)
    noise = np.array((0.45, 1, -1.7))
    pts_list = np.array(((-1, -1, 1), (-1, 1, 1), (1, 1, 1)))

    def decode(pt):
        return QAMModem(4).demodulate(pt, "hard")

    LLR = max_log_approx(y + noise, H, 1, pts_list, decode)
    assert_allclose(
        LLR, (9.45, np.inf, 7.75, np.inf, -np.inf, np.inf), atol=0.1
    )
    LLR = max_log_approx(y, H, 0, pts_list, decode)
    assert_allclose(
        LLR, (np.inf, np.inf, np.inf, np.inf, -np.inf, np.inf)
    )


def _hard_ber_device(modem, ebn0_db_arr, n_bits=120_000, seed=0):
    """Uncoded hard-demod BER over AWGN using the batched device kernels."""
    const = np.asarray(modem.constellation)
    bps = modem.num_bits_symbol
    Es = modem.Es
    n_bits = (n_bits // bps) * bps
    key = jax.random.PRNGKey(seed)
    bers = []
    for ebn0 in ebn0_db_arr:
        snr_db = ebn0 + 10 * np.log10(bps)
        noise_std = float(np.sqrt(2 * Es / (10 ** (snr_db / 10))))
        k1, k2, key = jax.random.split(key, 3)
        bits = np.asarray(
            jax.random.bernoulli(k1, 0.5, (n_bits,)).astype(np.int8)
        )
        sym = M.modulate(bits, const, bps)
        kr, ki = jax.random.split(k2)
        y = sym + (
            jax.random.normal(kr, sym.shape)
            + 1j * jax.random.normal(ki, sym.shape)
        ) * (noise_std * 0.5)
        dec = np.asarray(M.demodulate_hard(y, const, bps))
        bers.append(np.mean(dec != bits))
    return np.array(bers)


def test_qam_hard_ber_theory():
    for modem in QAM_MODEMS:
        ebn0 = np.arange(8, 17, 4)
        npam = np.sqrt(modem.m)
        expected = (
            2 * (1 - 1 / npam) / np.log2(npam)
            * Qfunc(
                np.sqrt(
                    3 * np.log2(npam) / (npam**2 - 1) * (2 * 10 ** (ebn0 / 10))
                )
            )
        )
        bers = _hard_ber_device(modem, ebn0)
        assert_allclose(bers, expected, rtol=0.15, atol=2e-4)


def test_psk_hard_ber_theory():
    for modem in PSK_MODEMS:
        ebn0 = np.arange(10, 15, 4)
        sers = 2 * Qfunc(
            np.sqrt(2 * modem.num_bits_symbol * 10 ** (ebn0 / 10))
            * np.sin(np.pi / modem.m)
        )
        expected = sers / modem.num_bits_symbol
        bers = _hard_ber_device(modem, ebn0, n_bits=200_000)
        # only compare where statistics are meaningful
        mask = expected > 5e-5
        assert_allclose(bers[mask], expected[mask], rtol=0.2, atol=5e-5)


def test_soft_demod_matches_reference_formula():
    """Exact-LLR soft demod vs a direct NumPy evaluation of the formula."""
    modem = QAMModem(16)
    const = np.asarray(modem.constellation)
    rng = np.random.RandomState(3)
    y = rng.randn(40) + 1j * rng.randn(40)
    noise_var = 0.7
    llr = modem.demodulate(y, "soft", noise_var)
    # direct formula (reference modulation.py:125-137)
    expect = np.zeros(40 * 4)
    for i, cy in enumerate(y):
        for bit_index in range(4):
            num = den = 0.0
            for b, s in enumerate(const):
                if (b >> bit_index) & 1:
                    num += np.exp(-abs(cy - s) ** 2 / noise_var)
                else:
                    den += np.exp(-abs(cy - s) ** 2 / noise_var)
            expect[i * 4 + 3 - bit_index] = np.log(num / den)
    assert_allclose(llr, expect, rtol=2e-4, atol=1e-4)


def test_soft_demod_separable_fast_path():
    # Square Gray QAM factorizes per axis; the fast path must agree with
    # the joint logsumexp to f32 noise, at every order, incl. per-symbol
    # noise variances.  Non-grid constellations must fall back cleanly.
    from commpy_tpu.ops.modem import _separable_qam_plan

    rng = np.random.RandomState(9)
    y = (rng.randn(300) + 1j * rng.randn(300)).astype(np.complex64)
    for m in (4, 16, 64, 256):
        const = M.qam_constellation(m).astype(np.complex64)
        bps = int(np.log2(m))
        assert _separable_qam_plan(const, bps) is not None
        joint = np.asarray(M.demodulate_soft(y, const, bps, 0.5,
                                             method="joint"))
        sep = np.asarray(M.demodulate_soft(y, const, bps, 0.5,
                                           method="separable"))
        assert_allclose(sep, joint, rtol=2e-4, atol=2e-4)
    # per-symbol noise variance broadcast
    const = M.qam_constellation(64).astype(np.complex64)
    nv = (0.2 + rng.rand(300)).astype(np.float32)
    joint = np.asarray(M.demodulate_soft(y, const, 6, nv, method="joint"))
    sep = np.asarray(M.demodulate_soft(y, const, 6, nv, method="separable"))
    assert_allclose(sep, joint, rtol=2e-4, atol=2e-4)
    # 8-PSK is not a product grid: no plan, auto == joint exactly
    psk = M.psk_constellation(8).astype(np.complex64)
    assert _separable_qam_plan(psk, 3) is None
    a = np.asarray(M.demodulate_soft(y, psk, 3, 0.5, method="auto"))
    b = np.asarray(M.demodulate_soft(y, psk, 3, 0.5, method="joint"))
    assert np.array_equal(a, b)
    # max-log takes the same factorization (per-axis maxes, exact)
    for m in (16, 64):
        const = M.qam_constellation(m).astype(np.complex64)
        bps = int(np.log2(m))
        joint = np.asarray(M.demodulate_maxlog(y, const, bps, 0.5,
                                               method="joint"))
        sep = np.asarray(M.demodulate_maxlog(y, const, bps, 0.5,
                                             method="separable"))
        assert_allclose(sep, joint, rtol=1e-5, atol=1e-5)


def test_maxlog_demod_close_to_exact_at_high_snr():
    modem = QAMModem(16)
    const = np.asarray(modem.constellation)
    rng = np.random.RandomState(4)
    bits = rng.randint(0, 2, 400)
    sym = np.asarray(M.modulate(bits, const, 4))
    y = sym + (rng.randn(100) + 1j * rng.randn(100)) * 0.05
    exact = np.asarray(M.demodulate_soft(y, const, 4, 0.005))
    maxlog = np.asarray(M.demodulate_maxlog(y, const, 4, 0.005))
    assert np.array_equal(exact > 0, maxlog > 0)
