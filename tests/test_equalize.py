"""MMSE / zero-forcing FIR equalizers for ISI channels."""
import numpy as np
import pytest

import jax.numpy as jnp

from commpy_tpu.ops.equalize import (
    equalize,
    equalizer_delay,
    mmse_fir_taps,
    zf_fir_taps,
)

H3 = (np.array([1.0, 0.45, -0.2]) + 1j * np.array([0.1, -0.3, 0.05])
      ).astype(np.complex64)


def _qpsk(rng, n):
    return (((rng.integers(0, 2, n) * 2 - 1) +
             1j * (rng.integers(0, 2, n) * 2 - 1)) / np.sqrt(2)
            ).astype(np.complex64)


def test_zf_matches_least_squares_bound():
    # The closed-form design must achieve the data least-squares optimum.
    rng = np.random.default_rng(0)
    x = _qpsk(rng, 4000)
    y = np.convolve(x, H3)[:4000]
    Lw = 31
    d = equalizer_delay(Lw, len(H3))
    w = np.asarray(zf_fir_taps(H3, Lw))
    z = np.asarray(equalize(jnp.asarray(y), jnp.asarray(w), d))
    resid = np.sqrt(np.mean(np.abs(z[50:3900] - x[50:3900]) ** 2))
    # brute-force LS on the same data
    rows = [y[n - Lw + 1:n + 1][::-1] for n in range(Lw, 4000)]
    targ = [x[n - d] for n in range(Lw, 4000)]
    w_ls, *_ = np.linalg.lstsq(np.array(rows), np.array(targ), rcond=None)
    pred = np.array(rows) @ w_ls
    ls_resid = np.sqrt(np.mean(np.abs(pred - np.array(targ)) ** 2))
    assert resid < max(2.0 * ls_resid, 0.02), (resid, ls_resid)


def test_mmse_beats_zf_in_noise_and_converges_to_zf():
    rng = np.random.default_rng(1)
    x = _qpsk(rng, 6000)
    y = np.convolve(x, H3)[:6000]
    sigma2 = 0.3
    noise = ((rng.normal(size=6000) + 1j * rng.normal(size=6000))
             * np.sqrt(sigma2 / 2)).astype(np.complex64)
    yn = y + noise
    Lw = 25
    d = equalizer_delay(Lw, len(H3))
    w_m = np.asarray(mmse_fir_taps(H3, sigma2, Lw))
    w_z = np.asarray(zf_fir_taps(H3, Lw))

    def mse(w):
        z = np.asarray(equalize(jnp.asarray(yn), jnp.asarray(w), d))
        return np.mean(np.abs(z[50:5900] - x[50:5900]) ** 2)

    assert mse(w_m) < mse(w_z)  # ZF amplifies noise; MMSE balances
    # noise -> 0: MMSE taps converge to ZF taps
    w_m0 = np.asarray(mmse_fir_taps(H3, 1e-6, Lw))
    np.testing.assert_allclose(w_m0, w_z, rtol=1e-3, atol=1e-4)


def test_equalized_qpsk_ber_improves():
    rng = np.random.default_rng(2)
    n = 20000
    x = _qpsk(rng, n)
    sigma2 = 0.05
    y = np.convolve(x, H3)[:n] + (
        (rng.normal(size=n) + 1j * rng.normal(size=n))
        * np.sqrt(sigma2 / 2)).astype(np.complex64)
    Lw = 21
    d = equalizer_delay(Lw, len(H3))
    w = np.asarray(mmse_fir_taps(H3, sigma2, Lw))
    z = np.asarray(equalize(jnp.asarray(y), jnp.asarray(w), d))

    def ser(est):
        hard = np.sign(est.real) + 1j * np.sign(est.imag)
        return np.mean(hard[100:n - 100] != (np.sign(x.real) +
                                             1j * np.sign(x.imag))[100:n - 100])

    assert ser(z) < 0.01
    assert ser(y) > 5 * max(ser(z), 1e-4)  # raw ISI is far worse


def test_batched_channel_tap_design():
    rng = np.random.default_rng(3)
    hb = (rng.normal(size=(5, 4)) + 1j * rng.normal(size=(5, 4))
          ).astype(np.complex64)
    hb[:, 0] += 3.0  # keep channels minimum-phase-ish / well conditioned
    w = np.asarray(mmse_fir_taps(hb, 0.1, 15))
    assert w.shape == (5, 15)
    for b in range(5):
        wb = np.asarray(mmse_fir_taps(hb[b], 0.1, 15))
        np.testing.assert_allclose(w[b], wb, rtol=2e-4, atol=2e-5)


def test_isi_conv_link_end_to_end():
    # Conv-coded QPSK over a 3-tap ISI channel: the MMSE front end is
    # what makes the link work (measured at 8 dB: 26 vs 3855 bit errors
    # with a 1-tap receiver).
    import jax
    from commpy_tpu.models import make_isi_conv_link
    from commpy_tpu.ops.trellis import Trellis

    tr = Trellis(np.array([2]), np.array([[5, 7]]))
    link = make_isi_conv_link(trellis=tr, channel_taps=H3, frame_bits=500)
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    assert int(link.link_step(keys, link.noise_std_fn(25.0))) == 0
    assert int(link.link_step(keys, link.noise_std_fn(2.0))) > 0
    one_tap = make_isi_conv_link(trellis=tr, channel_taps=H3,
                                 frame_bits=500, n_eq_taps=1)
    e_eq = int(link.link_step(keys, link.noise_std_fn(8.0)))
    e_no = int(one_tap.link_step(keys, one_tap.noise_std_fn(8.0)))
    assert e_eq * 10 < e_no


def test_lms_converges_to_wiener():
    from commpy_tpu.ops.equalize import lms_equalize

    rng = np.random.default_rng(0)
    B, n = 4, 8000
    x = _qpsk(rng, B * n).reshape(B, n)
    sigma2 = 0.05
    y = np.stack([np.convolve(x[b], H3)[:n] for b in range(B)]) + (
        (rng.normal(size=(B, n)) + 1j * rng.normal(size=(B, n)))
        * np.sqrt(sigma2 / 2)).astype(np.complex64)
    Lw = 15
    d = equalizer_delay(Lw, len(H3))
    z, w, mse = lms_equalize(jnp.asarray(y), jnp.asarray(x), Lw,
                             mu=0.01, delay=d, block=32)
    mse = np.asarray(mse)
    # Wiener floor for this channel/noise (measured 0.072); LMS settles
    # just above it (measured 0.078) from a cold start (measured 0.75)
    wm = np.asarray(mmse_fir_taps(H3, sigma2, Lw))
    zm = np.asarray(equalize(jnp.asarray(y[0]), jnp.asarray(wm), d))
    wiener = np.mean(np.abs(zm[100:n - 100] - x[0, 100:n - 100]) ** 2)
    assert mse[0] > 5 * wiener
    assert mse[-10:].mean() < 1.5 * wiener
    assert np.max(np.abs(np.asarray(w)[0] - wm)) < 0.1


def test_lms_tracks_channel_switch():
    from commpy_tpu.ops.equalize import lms_equalize

    rng = np.random.default_rng(1)
    B, n = 2, 8000
    x = _qpsk(rng, B * n).reshape(B, n)
    sigma2 = 0.05
    h2 = (np.array([1.0, -0.5, 0.3]) +
          1j * np.array([-0.2, 0.1, 0.15])).astype(np.complex64)
    y = np.empty((B, n), np.complex64)
    for b in range(B):
        y1 = np.convolve(x[b], H3)[:n]
        y2 = np.convolve(x[b], h2)[:n]
        y[b, :n // 2] = y1[:n // 2]
        y[b, n // 2:] = y2[n // 2:]
    y += ((rng.normal(size=(B, n)) + 1j * rng.normal(size=(B, n)))
          * np.sqrt(sigma2 / 2)).astype(np.complex64)
    d = equalizer_delay(15, 3)
    _, _, mse = lms_equalize(jnp.asarray(y), jnp.asarray(x), 15,
                             mu=0.01, delay=d, block=32)
    mse = np.asarray(mse)
    half = len(mse) // 2
    pre = mse[half - 5:half].mean()
    spike = mse[half:half + 3].mean()
    settled = mse[-10:].mean()
    assert spike > 4 * pre  # the switch is visible
    assert settled < 2 * pre  # and re-converged


def test_delay_validation():
    with pytest.raises(ValueError):
        mmse_fir_taps(H3, 0.1, 9, delay=20)
    with pytest.raises(ValueError):
        equalize(np.zeros(8, np.complex64),
                 np.zeros((2, 3), np.complex64), 1)
