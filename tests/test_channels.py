"""Channel model tests: invariants, contracts, calibration (reference
commpy/tests/test_channels.py tiers)."""
import numpy as np
import pytest
from numpy.testing import assert_allclose

from commpy_tpu.channels import MIMOFlatChannel, SISOFlatChannel, awgn, bec, bsc


def test_siso_fading_param_invariant():
    with pytest.raises(ValueError):
        SISOFlatChannel(fading_param=(1, 1))  # |p0|^2 + p1 != 1
    ch = SISOFlatChannel(fading_param=(0.5 + 0.5j, 0.5))
    assert ch.isComplex
    assert_allclose(ch.k_factor, 1)


def test_siso_real_channel_rejects_complex():
    ch = SISOFlatChannel(noise_std=0.1, fading_param=(1, 0))
    with pytest.raises(TypeError):
        ch.propagate(np.array([1 + 1j, 0 + 0j]))


def test_siso_noise_std_unset_assertion():
    ch = SISOFlatChannel(fading_param=(1 + 0j, 0))
    with pytest.raises(AssertionError):
        ch.propagate(np.ones(8, complex))


def test_snr_calibration():
    ch = SISOFlatChannel(fading_param=(1 + 0j, 0))
    ch.set_SNR_dB(10, 0.5, 2.0)
    assert_allclose(ch.noise_std, np.sqrt(2 * 2.0 / (0.5 * 10)))
    ch.set_SNR_lin(10, 0.5, 2.0)
    assert_allclose(ch.noise_std, np.sqrt(2 * 2.0 / (0.5 * 10)))
    mimo = MIMOFlatChannel(4, 3)
    mimo.uncorr_rayleigh_fading(complex)
    mimo.set_SNR_dB(0)
    assert_allclose(mimo.noise_std, np.sqrt(2 * 4))


def test_siso_energy_conservation():
    np.random.seed(17121996)
    ch = SISOFlatChannel(fading_param=(0, 1))  # real Rayleigh
    ch.noise_std = 0.0
    msg = np.random.choice([-1.0, 1.0], 40_000)
    out = ch.propagate(msg)
    assert_allclose(np.mean(out**2), 1.0, rtol=0.2)
    # complex Rayleigh
    ch = SISOFlatChannel(fading_param=(0j, 1))
    ch.noise_std = 0.0
    out = ch.propagate(msg.astype(complex))
    assert_allclose(np.mean(np.abs(out) ** 2), 1.0, rtol=0.2)


@pytest.mark.parametrize("nb_tx,nb_rx", [(8, 8), (4, 8), (8, 4), (1, 8),
                                         (8, 1), (1, 1)])
def test_mimo_shapes_padding(nb_tx, nb_rx):
    ch = MIMOFlatChannel(nb_tx, nb_rx)
    ch.uncorr_rayleigh_fading(complex)
    ch.set_SNR_dB(10)
    msg = np.random.choice([1, -1], 47).astype(complex)  # forces padding
    out = ch.propagate(msg)
    nb_vect = int(np.ceil(47 / nb_tx))
    assert out.shape == (nb_vect, nb_rx)
    assert ch.channel_gains.shape == (nb_vect, nb_rx, nb_tx)
    assert ch.noises.shape == (nb_vect, nb_rx)
    assert ch.unnoisy_output.shape == (nb_vect, nb_rx)


def test_mimo_fading_invariants():
    ch = MIMOFlatChannel(4, 4)
    # bad param: energy not normalized
    with pytest.raises(ValueError):
        ch.fading_param = (
            np.ones((4, 4)), np.identity(4), np.identity(4)
        )
    ch.uncorr_rician_fading(np.ones((4, 4), complex), 3.0)
    assert_allclose(ch.k_factor, 3.0)
    # invariant tr(Rt^T kron Rr) + sum|mean|^2 == nb_tx*nb_rx
    mean, rt, rr = ch.fading_param
    total = np.trace(np.kron(rt.T, rr)) + np.sum(np.abs(mean) ** 2)
    assert_allclose(total, 16, rtol=1e-10)


def test_mimo_expo_corr_reconstruction():
    np.random.seed(17121996)
    ch = MIMOFlatChannel(4, 4)
    t, r = np.exp(-1j * np.pi / 5), np.exp(1j * np.pi / 7)
    ch.expo_corr_rayleigh_fading(t, r)
    with pytest.raises(ValueError):
        ch.expo_corr_rayleigh_fading(2.0, r)
    ch.set_SNR_dB(1000)
    msg = np.random.choice([1, -1], 4 * 10_000).astype(complex)
    ch.propagate(msg)
    # empirical correlation of H entries reconstructs kron(Rr, Rt):
    # E[h_{rt} conj(h_{r't'})] = Rr[r,r'] Rt[t,t'] under row-major (r,t)
    H = ch.channel_gains.reshape(ch.channel_gains.shape[0], -1)
    emp = np.einsum("ni,nj->ij", H, H.conj()) / H.shape[0]
    expect = np.kron(ch.fading_param[2], ch.fading_param[1])
    assert np.abs(emp - expect).max() < 0.12


def test_mimo_gains_statistics():
    np.random.seed(8071996)
    ch = MIMOFlatChannel(8, 8)
    ch.uncorr_rayleigh_fading(complex)
    ch.set_SNR_dB(50)
    msg = np.random.choice([1, -1], 8 * 5000).astype(complex)
    ch.propagate(msg)
    assert abs(ch.channel_gains.mean()) < 0.02
    assert_allclose(ch.channel_gains.var(), 1.0, rtol=0.05)


def test_specular_compo():
    ch = MIMOFlatChannel(3, 2)
    H = ch.specular_compo(0.3, 0.5, 0.8, 0.4)
    assert H.shape == (2, 3)
    assert_allclose(np.abs(H), np.ones((2, 3)))
    with pytest.raises(ValueError):
        ch.specular_compo(0.3, -0.5, 0.8, 0.4)


def test_bec_bsc_awgn():
    np.random.seed(0)
    bits = np.random.randint(0, 2, 10_000)
    out = bec(bits, 0.3)
    frac = np.mean(out == -1)
    assert 0.25 < frac < 0.35
    out = bsc(bits, 0.2)
    assert 0.17 < np.mean(out != bits) < 0.23
    sig = np.random.choice([-1.0, 1.0], 10_000)
    noisy = awgn(sig, 10.0)
    # real path: noise power = avg_energy / (rate * snr)  (channels.py:696)
    snr_emp = 1.0 / np.var(noisy - sig)
    assert 9 < 10 * np.log10(snr_emp) < 11
