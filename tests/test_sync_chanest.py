"""Synchronization (CFO/timing) + OFDM channel-estimation tests.

The CFO estimators are closed-loop tested against the framework's own
impairment injector (`ops.impairments.add_frequency_offset`), which is
itself parity-tested vs the reference — estimator and injector are
independent code paths (correlation vs direct rotation).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from commpy_tpu.ops.impairments import add_frequency_offset
from commpy_tpu.ops.ofdm import (
    delay_subspace_matrix,
    make_comb_estimator,
    ofdm_rx,
    ofdm_tx,
    subcarrier_bins,
)
from commpy_tpu.ops.sync import (
    cfo_correct,
    cfo_estimate_cp,
    integer_cfo_estimate,
    schmidl_cox_estimate,
    schmidl_cox_metric,
    schmidl_cox_preamble,
)

NFFT, NSC, CP = 64, 52, 16


def _ofdm_burst(rng, n_sym, F=3):
    grids = (
        rng.randn(F, NSC, n_sym) + 1j * rng.randn(F, NSC, n_sym)
    ).astype(np.complex64) / np.sqrt(2)
    return ofdm_tx(grids, NFFT, NSC, CP), grids


# ---------------------------------------------------------------------------
# CP-based CFO
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("eps_true", [-0.37, 0.02, 0.45])
def test_cfo_cp_estimate_noiseless(eps_true):
    rng = np.random.RandomState(0)
    tx, _ = _ofdm_burst(rng, n_sym=6)
    rx = add_frequency_offset(tx, Fs=NFFT, delta_f=eps_true)
    eps_hat = np.asarray(cfo_estimate_cp(rx, NFFT, CP, n_symbols=6))
    assert eps_hat.shape == (3,)
    assert np.allclose(eps_hat, eps_true, atol=2e-3)


def test_cfo_cp_estimate_noisy_and_correct_roundtrip():
    rng = np.random.RandomState(1)
    tx, grids = _ofdm_burst(rng, n_sym=8)
    eps_true = 0.21
    rx = add_frequency_offset(tx, Fs=NFFT, delta_f=eps_true)
    # time-domain noise is FFT-amplified ~sqrt(nfft) in the grid domain;
    # 0.01 here is ~0.11 mean grid error (the unnormalized-FFT convention
    # of ofdm_rx)
    rx = rx + 0.01 * (
        rng.randn(*rx.shape) + 1j * rng.randn(*rx.shape)
    ).astype(np.complex64)
    eps_hat = cfo_estimate_cp(rx, NFFT, CP, n_symbols=8)
    assert np.allclose(np.asarray(eps_hat), eps_true, atol=0.02)
    # correction restores the subcarrier grid (ICI gone): demod error
    # with correction must be far below without
    fixed = cfo_correct(rx, eps_hat, NFFT)
    err_fixed = np.abs(
        np.asarray(ofdm_rx(fixed, NFFT, NSC, CP)) - grids
    ).mean()
    err_raw = np.abs(np.asarray(ofdm_rx(rx, NFFT, NSC, CP)) - grids).mean()
    # estimated correction helps, but residual eps error accumulates a
    # common-phase ramp across the burst (receivers track it per symbol)
    assert err_fixed < 0.6 * err_raw
    # exact correction restores the grid to the noise floor
    err_true = np.abs(
        np.asarray(ofdm_rx(cfo_correct(rx, eps_true, NFFT), NFFT, NSC, CP))
        - grids
    ).mean()
    assert err_true < 0.15 * err_raw


def test_cfo_correct_inverts_injector():
    rng = np.random.RandomState(2)
    x = (rng.randn(2, 200) + 1j * rng.randn(2, 200)).astype(np.complex64)
    y = add_frequency_offset(x, Fs=NFFT, delta_f=0.3)
    back = np.asarray(cfo_correct(y, 0.3, NFFT))
    assert np.allclose(back, x, atol=1e-5)


def test_integer_plus_fractional_cfo_recovery():
    """eps=3.3 subcarriers: CP estimator resolves the 0.3, the
    differential spectrum correlation the +3 — the full offset comes
    back through a 2-tap channel."""
    rng = np.random.RandomState(10)
    # known symbol: QPSK on every loaded bin of the ofdm_tx map
    grid = np.zeros((4, NSC, 1), np.complex64)
    qpsk = ((rng.randint(0, 2, (4, NSC)) * 2 - 1)
            + 1j * (rng.randint(0, 2, (4, NSC)) * 2 - 1)) / np.sqrt(2)
    grid[:, :, 0] = qpsk
    tx = np.asarray(ofdm_tx(grid, NFFT, NSC, CP))
    # reference bin loading of frame 0's known symbol
    ref = np.zeros(NFFT, np.complex64)
    half = NSC // 2
    ref[1: half + 1] = qpsk[0, half:]
    ref[NFFT - half:] = qpsk[0, :half]
    # same known symbol on every frame for the integer search
    tx = np.broadcast_to(tx[0], tx.shape).copy()
    # mild 2-tap channel + noise + composite CFO
    h = np.array([1.0, 0.35 * np.exp(1j * 0.7)], np.complex64)
    rx = h[0] * tx
    rx[:, 1:] += h[1] * tx[:, :-1]
    rx = np.array(add_frequency_offset(rx, Fs=NFFT, delta_f=3.3))
    rx += 0.02 * (rng.randn(*rx.shape) + 1j * rng.randn(*rx.shape))
    frac = cfo_estimate_cp(rx, NFFT, CP, n_symbols=1)
    assert np.allclose(np.asarray(frac), 0.3, atol=0.03)
    fixed = cfo_correct(rx, frac, NFFT)
    k = np.asarray(integer_cfo_estimate(fixed[:, CP:], ref, max_shift=6))
    assert (k == 3).all()
    total = np.asarray(frac) + k
    assert np.allclose(total, 3.3, atol=0.03)


def test_integer_cfo_zero_and_negative():
    rng = np.random.RandomState(11)
    ref = np.zeros(NFFT, np.complex64)
    loaded = np.r_[1:27, NFFT - 26:NFFT]
    ref[loaded] = np.exp(2j * np.pi * rng.rand(loaded.size))
    x = np.fft.ifft(ref) * NFFT
    for k_true in (0, -4):
        rx = np.array(cfo_correct(x[None], -float(k_true), NFFT))
        rx += 0.01 * (rng.randn(*rx.shape) + 1j * rng.randn(*rx.shape))
        k = int(np.asarray(integer_cfo_estimate(rx, ref, max_shift=6))[0])
        assert k == k_true, (k, k_true)


# ---------------------------------------------------------------------------
# Schmidl-Cox
# ---------------------------------------------------------------------------

def test_schmidl_cox_locates_preamble_and_cfo():
    rng = np.random.RandomState(3)
    pre = schmidl_cox_preamble(NFFT, seed=7)
    assert np.allclose(pre[: NFFT // 2], pre[NFFT // 2:], atol=1e-6)
    F, gap = 4, 37
    noise = 0.03 * (
        rng.randn(F, gap + NFFT + 300) + 1j * rng.randn(F, gap + NFFT + 300)
    ).astype(np.complex64)
    payload = (rng.randn(F, 300) + 1j * rng.randn(F, 300)).astype(
        np.complex64
    ) / np.sqrt(2)
    stream = np.asarray(noise)
    stream[:, gap: gap + NFFT] += pre[None, :]
    stream[:, gap + NFFT:] += payload
    eps_true = 0.6  # beyond the CP estimator's +-0.5 range
    rx = add_frequency_offset(stream, Fs=NFFT, delta_f=eps_true)
    d_hat, eps_hat, m = schmidl_cox_estimate(rx, NFFT)
    # M ~= 1 on the preamble (can exceed 1 slightly in noise: R measures
    # only the second-half energy), tiny elsewhere
    assert 0.9 < np.asarray(m).max() < 1.1
    # argmax lands on the metric plateau at the preamble (no CP here, so
    # the plateau is a single peak region around `gap`)
    assert np.all(np.abs(np.asarray(d_hat) - gap) <= 4)  # noise tremor
    assert np.allclose(np.asarray(eps_hat), eps_true, atol=0.02)
    # derotating with the estimate makes the two halves coherent again
    fixed = cfo_correct(rx, eps_hat, NFFT)
    seg = np.asarray(fixed)[:, gap: gap + NFFT]
    coh = np.abs(
        (np.conj(seg[:, : NFFT // 2]) * seg[:, NFFT // 2:]).sum(-1)
    ) / (np.abs(seg[:, : NFFT // 2]) ** 2).sum(-1)
    assert (coh > 0.95).all()


def test_schmidl_cox_metric_shapes_jit():
    rng = np.random.RandomState(4)
    w = (rng.randn(2, 256) + 1j * rng.randn(2, 256)).astype(np.complex64)
    m, p = jax.jit(lambda x: schmidl_cox_metric(x, NFFT))(w)
    assert m.shape == p.shape == (2, 256 - NFFT + 1)


# ---------------------------------------------------------------------------
# Delay-subspace channel estimation
# ---------------------------------------------------------------------------

def _true_channel(rng, n_taps, F=6):
    g = (rng.randn(F, n_taps) + 1j * rng.randn(F, n_taps)).astype(
        np.complex64
    ) * np.sqrt(0.5 / n_taps)
    bins = subcarrier_bins(NFFT, NSC)
    w = np.exp(
        -2j * np.pi * bins[:, None] * np.arange(n_taps)[None, :] / NFFT
    )
    return g, (g @ w.T).astype(np.complex64)  # [F, NSC]


def test_delay_subspace_smoothing_preserves_true_channel():
    rng = np.random.RandomState(5)
    _, h = _true_channel(rng, n_taps=4)
    s = delay_subspace_matrix(NFFT, NSC, n_taps=4)
    assert np.allclose(h @ s.T, h, atol=1e-3)


def test_delay_subspace_smoothing_cuts_ls_noise():
    rng = np.random.RandomState(6)
    n_taps = 4
    _, h = _true_channel(rng, n_taps)
    sigma = 0.3
    h_ls = h + sigma * (
        rng.randn(*h.shape) + 1j * rng.randn(*h.shape)
    ).astype(np.complex64) / np.sqrt(2)
    s = delay_subspace_matrix(NFFT, NSC, n_taps)
    mse_ls = np.mean(np.abs(h_ls - h) ** 2)
    mse_sm = np.mean(np.abs(h_ls @ s.T - h) ** 2)
    # projection keeps ~n_taps/NSC of the noise power
    assert mse_sm < 2.5 * (n_taps / NSC) * mse_ls
    assert mse_sm < 0.25 * mse_ls


@pytest.mark.parametrize("spacing", [4, 6])
def test_comb_estimator_exact_when_determined(spacing):
    rng = np.random.RandomState(7)
    n_taps = 4
    _, h = _true_channel(rng, n_taps)
    pilots = np.arange(0, NSC, spacing)
    assert pilots.size >= n_taps
    est = make_comb_estimator(NFFT, NSC, pilots, n_taps, reg=1e-6)
    h_full = np.asarray(est(jnp.asarray(h[:, pilots])))
    assert np.allclose(h_full, h, atol=1e-2)


def test_comb_estimator_noisy_beats_nothing():
    rng = np.random.RandomState(8)
    n_taps = 3
    _, h = _true_channel(rng, n_taps)
    pilots = np.arange(0, NSC, 4)
    est = make_comb_estimator(NFFT, NSC, pilots, n_taps)
    h_p = h[:, pilots] + 0.2 * (
        rng.randn(h.shape[0], pilots.size)
        + 1j * rng.randn(h.shape[0], pilots.size)
    ).astype(np.complex64) / np.sqrt(2)
    h_full = np.asarray(est(jnp.asarray(h_p)))
    assert np.mean(np.abs(h_full - h) ** 2) < 0.01


# ---------------------------------------------------------------------------
# Link integration: csi="smooth"
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("csi", ["ls", "smooth"])
def test_ofdm_link_csi_modes_clean_at_high_snr(csi):
    from commpy_tpu.models.device_links import make_ofdm_qcldpc_link
    from commpy_tpu.ops.qcldpc import ieee80211n_params

    link = make_ofdm_qcldpc_link(
        qc_params=ieee80211n_params(648, "1/2"),
        modulation_m=4, nfft=NFFT, nsc=54, csi=csi, n_taps=4,
    )
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    errs = int(jax.jit(link.link_step)(
        keys, jnp.float32(link.noise_std_fn(30.0))
    ))
    assert errs == 0


def test_ofdm_link_smooth_beats_ls_at_waterfall():
    from commpy_tpu.models.device_links import make_ofdm_qcldpc_link
    from commpy_tpu.ops.qcldpc import ieee80211n_params

    errs = {}
    for csi in ("ls", "smooth"):
        link = make_ofdm_qcldpc_link(
            qc_params=ieee80211n_params(648, "1/2"),
            modulation_m=4, nfft=NFFT, nsc=54, csi=csi, n_taps=4,
        )
        step = jax.jit(link.link_step)
        keys = jax.random.split(jax.random.PRNGKey(1), 48)
        ns = jnp.float32(link.noise_std_fn(6.0))
        errs[csi] = int(step(keys, ns))
    assert errs["smooth"] <= errs["ls"]


def test_ofdm_link_blind_cfo_sync():
    """CFO in the channel, CP-sync + LS pilot in the receiver: fully
    blind receiver decodes clean where the uncorrected one collapses."""
    from commpy_tpu.models.device_links import make_ofdm_qcldpc_link
    from commpy_tpu.ops.qcldpc import ieee80211n_params

    def build(correct):
        return make_ofdm_qcldpc_link(
            qc_params=ieee80211n_params(648, "1/2"),
            modulation_m=4, nfft=NFFT, nsc=54, n_taps=4, csi="smooth",
            cfo=0.31, cfo_correction=correct,
        )

    keys = jax.random.split(jax.random.PRNGKey(2), 8)
    errs = {}
    for correct in (True, False):
        link = build(correct)
        errs[correct] = int(jax.jit(link.link_step)(
            keys, jnp.float32(link.noise_std_fn(30.0))
        ))
    assert errs[True] == 0
    # a fractional CFO without correction shifts/rotates every
    # subcarrier: the codeword is essentially random
    assert errs[False] > 8 * 648 * 0.05


def test_ofdm_link_rejects_bad_csi():
    from commpy_tpu.models.device_links import make_ofdm_qcldpc_link
    from commpy_tpu.ops.qcldpc import ieee80211n_params

    with pytest.raises(ValueError):
        make_ofdm_qcldpc_link(
            qc_params=ieee80211n_params(648, "1/2"), csi="genie",
        )
