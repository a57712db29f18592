"""Device IDD loop parity vs the reference ``idd_decoder`` closure.

VERDICT r4 item 5: (a) the batched device loop must reach the SAME
extrinsic fixed point as the reference closure (commpy/links.py:345-407)
on matched detector/decoder stubs; (b) a device-IDD acceptance curve at
the reference test_links.py:82-86 anchor (tests/test_links.py keeps the
one-pass variant; here the K-best-soft <-> WiMAX-LDPC IDD loop runs it).
"""
import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

from commpy_tpu.models.idd import idd_decoder_device
from commpy_tpu.ops import modem as M
from commpy_tpu.ops.mimo import kbest_device


def _ref_idd_decoder():
    from commpy.links import idd_decoder
    return idd_decoder


def test_idd_loop_parity_vs_reference_closure():
    """Matched deterministic stubs through both loops -> identical
    extrinsic fixed point and identical decisions, for several n_it.

    The stub detector mixes y, h, noise_var and the a_priori (so the
    extrinsic exchange actually matters); the stub decoder couples bits
    ACROSS vectors (so a wrong loop order/extrinsic subtraction would
    diverge immediately).
    """
    rng = np.random.RandomState(42)
    V, nr, nt, bps = 5, 3, 2, 2
    bpv = nt * bps  # bits per vector
    y = (rng.randn(V, nr) + 1j * rng.randn(V, nr)).astype(np.complex128)
    h = (rng.randn(V, nr, nt) + 1j * rng.randn(V, nr, nt))
    noise_var = 0.3
    a0 = rng.randn(V * bpv)
    W = rng.randn(bpv, 2 * nr)  # detector mixing matrix
    D = np.eye(V * bpv) * 1.1 + 0.2 * np.roll(np.eye(V * bpv), 1, axis=1)

    # reference-side stubs (per-vector detector, whole-frame decoder)
    def det_ref(yv, hv, constellation, nv, a_priori):
        g = np.concatenate([np.real(hv.conj().T @ yv),
                            np.imag(hv.conj().T @ yv)])
        return (W[:, :bpv] @ np.tanh(a_priori)) * 0.5 + \
            (W @ np.concatenate([np.real(yv), np.imag(yv)])) / (1 + nv)

    def dec_ref(llrs):
        return D @ np.tanh(llrs) + llrs

    def decision_ref(llrs):
        return (llrs < 0).astype(np.int64)

    # device-side stubs: the SAME math, batched
    Wj = jnp.asarray(W)
    Dj = jnp.asarray(D)

    def det_dev(yb, hb, nv, a_priori):
        yr = jnp.concatenate([jnp.real(yb), jnp.imag(yb)], axis=-1)
        return (jnp.tanh(a_priori) @ Wj[:, :bpv].T) * 0.5 + \
            (yr @ Wj.T) / (1 + nv)

    def dec_dev(llrs):
        return Dj @ jnp.tanh(llrs) + llrs

    def decision_dev(llrs):
        return (llrs < 0).astype(jnp.int8)

    ref_build = _ref_idd_decoder()
    for n_it in (1, 2, 4):
        ref_decode = ref_build(det_ref, dec_ref, decision_ref, n_it)
        out_ref = ref_decode(y, h, None, noise_var, a0.copy(), bpv)
        dev_decode = idd_decoder_device(det_dev, dec_dev, decision_dev,
                                        n_it)
        out_dev = np.asarray(dev_decode(
            jnp.asarray(y), jnp.asarray(h), noise_var, jnp.asarray(a0)))
        np.testing.assert_array_equal(out_ref, out_dev,
                                      err_msg=f"n_it={n_it}")

    # and the fixed-point LLRs themselves (not just signs): rebuild the
    # reference loop by hand to expose its final total LLRs
    n_it = 3
    a_dec = a0.copy()
    for _ in range(n_it):
        a_det = dec_ref(a_dec) - a_dec
        for i in range(V):
            a_dec[i * bpv:(i + 1) * bpv] = det_ref(
                y[i], h[i], None, noise_var, a_det[i * bpv:(i + 1) * bpv])
        a_dec -= a_det
    total_ref = a_dec + a_det

    dev_total = idd_decoder_device(det_dev, dec_dev, lambda l: l, n_it)
    total_dev = np.asarray(dev_total(
        jnp.asarray(y), jnp.asarray(h), noise_var, jnp.asarray(a0)))
    # device math is f32 (reference f64): same fixed point to f32 noise
    assert_allclose(total_dev, total_ref, rtol=2e-5, atol=2e-5)


def test_kbest_a_priori_zero_matches_no_prior():
    """a_priori=0 must reproduce the plain soft K-best bit-for-bit."""
    rng = np.random.RandomState(3)
    B, nr, nt, m, bps = 6, 4, 4, 16, 4
    const = M.qam_constellation(m).astype(np.complex64)
    y = (rng.randn(B, nr) + 1j * rng.randn(B, nr)).astype(np.complex64)
    h = (rng.randn(B, nr, nt) + 1j * rng.randn(B, nr, nt)).astype(
        np.complex64) * np.sqrt(0.5)
    plain = np.asarray(kbest_device(y, h, const, 8, 0.5, "soft", bps))
    zerop = np.asarray(kbest_device(
        y, h, const, 8, 0.5, "soft", bps,
        a_priori=jnp.zeros((B, nt * bps), jnp.float32)))
    np.testing.assert_array_equal(plain, zerop)


def test_kbest_a_priori_steers_posterior():
    """A strong correct prior must fix a vector the noisy channel alone
    gets wrong, and the prior term must enter with the right SIGN
    (positive LLR <-> bit 0, the detector's own output convention)."""
    rng = np.random.RandomState(11)
    nr = nt = 4
    m, bps = 16, 4
    const_np = M.qam_constellation(m).astype(np.complex64)
    bits = rng.randint(0, 2, nt * bps)
    sym = np.asarray(M.modulate(jnp.asarray(bits), const_np, bps))
    h = ((rng.randn(nr, nt) + 1j * rng.randn(nr, nt))
         * np.sqrt(0.5)).astype(np.complex64)
    noise = (rng.randn(nr) + 1j * rng.randn(nr)) * 0.6
    y = (h @ sym + noise).astype(np.complex64)[None]
    hb = h[None]
    nv = 0.72
    no_prior = np.asarray(kbest_device(y, hb, const_np, 8, nv, "soft",
                                       bps))[0]
    hard_no_prior = (no_prior < 0).astype(int)
    # genie prior: +-8 toward the true bits
    la = (1 - 2.0 * bits) * 8.0
    with_prior = np.asarray(kbest_device(
        y, hb, const_np, 8, nv, "soft", bps,
        a_priori=jnp.asarray(la, jnp.float32)[None]))[0]
    hard_prior = (with_prior < 0).astype(int)
    assert (hard_prior != bits).sum() <= (hard_no_prior != bits).sum()
    assert np.array_equal(hard_prior, bits)
    # posterior must move toward the prior wherever both are finite
    # (max-log LLRs are +-inf when every survivor agrees on a bit, and
    # inf - inf is meaningless — compare only the finite pairs, and
    # require any infinite with-prior LLR to agree with the prior sign)
    fin = np.isfinite(with_prior) & np.isfinite(no_prior)
    assert np.all((with_prior - no_prior)[fin] * np.sign(la)[fin] > -1e-4)
    inf_p = ~np.isfinite(with_prior)
    assert np.all(np.sign(with_prior[inf_p]) == np.sign(la[inf_p]))


def test_kbest_a_priori_requires_soft():
    const = M.qam_constellation(4).astype(np.complex64)
    y = jnp.zeros((1, 2), jnp.complex64)
    h = jnp.eye(2, dtype=jnp.complex64)[None]
    with pytest.raises(ValueError, match="a_priori"):
        kbest_device(y, h, const, 4, 0.1, "hard",
                     a_priori=jnp.zeros((1, 4), jnp.float32))


@pytest.mark.slow
def test_idd_device_acceptance_curve_kbest_ldpc():
    """Tier-3 acceptance through the DEVICE IDD loop (VERDICT r4 item
    5b): K-best-soft <-> WiMAX LDPC(1440,720) MSA-15
    with one extrinsic exchange, at the reference anchor SNRs
    {17,18,19} dB, within rtol 2 of the reference curve
    (1.7e-1, 1e-1, 2.5e-3) — and never worse than the one-pass chain's
    own acceptance band (n_it=1 measurably improves on one-pass; see
    make_idd_kbest_ldpc_mimo_link's docstring for why more undamped
    exchanges are not the default)."""
    import os

    from commpy_tpu.models.device_links import make_idd_kbest_ldpc_mimo_link
    from commpy_tpu.ops.ldpc import get_ldpc_code_params
    from commpy_tpu.parallel import make_mesh, montecarlo_ber

    design = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "commpy_tpu", "designs", "ldpc", "wimax", "1440.720.txt",
    )
    params = get_ldpc_code_params(design, True)
    link = make_idd_kbest_ldpc_mimo_link(ldpc_params=params, beam=16,
                                         n_it=1)
    snrs = np.arange(17, 20, 1.0)
    res = montecarlo_ber(
        link.link_step, snrs, link.noise_std_fn, link.frame_bits,
        jax.random.PRNGKey(5), frames_per_round=16, max_rounds=40,
        err_min=200, mesh=make_mesh(8),
    )
    desired = (1.7e-1, 1e-1, 2.5e-3)
    assert_allclose(res.bers, desired, rtol=2)
    assert np.all(res.bers <= np.asarray(desired) * 1.5)
