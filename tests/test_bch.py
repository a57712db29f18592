"""BCH codec vs classic anchors and the independent NumPy golden."""
import numpy as np
import pytest

import jax.numpy as jnp

from commpy_tpu.ops.bch import (
    bch_construct,
    bch_decode,
    bch_encode,
    bch_genpoly,
    make_bch_decoder,
)

import bch_ref


def _poly_int(coeffs):
    return sum(int(c) << i for i, c in enumerate(coeffs))


# ---------------------------------------------------------------------------
# Construction anchors
# ---------------------------------------------------------------------------

def test_genpoly_classic_anchors():
    # (15,7) t=2: g = x^8+x^7+x^6+x^4+1 (0o721)
    assert _poly_int(bch_genpoly(4, 2)) == 0b111010001
    # (15,5) t=3: g = x^10+x^8+x^5+x^4+x^2+x+1
    assert _poly_int(bch_genpoly(4, 3)) == 0b10100110111
    # (15,11) t=1 is the Hamming code: g = x^4+x+1 (the primitive poly)
    assert _poly_int(bch_genpoly(4, 1)) == 0b10011
    # (31,21) t=2: g = x^10+x^9+x^8+x^6+x^5+x^3+1
    assert _poly_int(bch_genpoly(5, 2)) == 0b11101101001


def test_genpoly_in_cyclic_code_genpoly_family():
    # The BCH generator must be a valid (n, k) cyclic-code generator.
    from commpy_tpu.ops.algebraic import cyclic_code_genpoly

    g = _poly_int(bch_genpoly(4, 2))
    fam = cyclic_code_genpoly(15, 7)
    assert g in set(int(x) for x in np.atleast_1d(fam))


def test_construct_shapes_and_validation():
    code = bch_construct(4, 2)
    assert (code.n, code.k) == (15, 7)
    short = bch_construct(6, 3, shorten=13)
    assert (short.n, short.k) == (50, 32)  # (63,45) t=3 parent
    with pytest.raises(ValueError):
        bch_construct(4, 2, shorten=7)  # no message bits left
    with pytest.raises(ValueError):
        bch_construct(1, 1)


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("m,t", [(4, 2), (5, 3), (6, 5), (8, 4)])
def test_encode_matches_golden(m, t):
    code = bch_construct(m, t)
    rng = np.random.default_rng(m * 10 + t)
    msg = rng.integers(0, 2, (6, code.k))
    got = np.asarray(bch_encode(code, msg))
    for b in range(6):
        want = bch_ref.encode_np(msg[b], code.genpoly, code.n)
        assert np.array_equal(got[b], want)
    # systematic: message rides in front
    assert np.array_equal(got[:, :code.k], msg)


def test_encode_codewords_have_zero_syndromes():
    code = bch_construct(6, 4)
    rng = np.random.default_rng(3)
    msg = rng.integers(0, 2, (8, code.k))
    cw = np.asarray(bch_encode(code, msg))
    corrected, nerr, ok = (np.asarray(a) for a in bch_decode(code, cw))
    assert np.array_equal(corrected, cw)
    assert not nerr.any()
    assert ok.all()


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("m,t,shorten", [(4, 2, 0), (5, 3, 0), (6, 5, 0),
                                         (8, 4, 0), (6, 3, 20)])
def test_decode_corrects_up_to_t_errors(m, t, shorten):
    code = bch_construct(m, t, shorten=shorten)
    rng = np.random.default_rng(m * 100 + t)
    B = 24
    msg = rng.integers(0, 2, (B, code.k))
    cw = np.asarray(bch_encode(code, msg))
    rx = cw.copy()
    nflip = rng.integers(0, t + 1, B)
    for b in range(B):
        pos = rng.choice(code.n, nflip[b], replace=False)
        rx[b, pos] ^= 1
    corrected, nerr, ok = (np.asarray(a) for a in bch_decode(code, rx))
    assert ok.all()
    assert np.array_equal(nerr, nflip)
    assert np.array_equal(corrected, cw)


@pytest.mark.parametrize("m,t", [(4, 2), (5, 3), (6, 5)])
def test_decode_matches_golden_beyond_t(m, t):
    # Past t errors behavior (fail flag or miscorrection) must agree
    # with the textbook decoder exactly.
    code = bch_construct(m, t)
    rng = np.random.default_rng(m * 7 + t)
    B = 16
    msg = rng.integers(0, 2, (B, code.k))
    cw = np.asarray(bch_encode(code, msg))
    rx = cw.copy()
    for b in range(B):
        pos = rng.choice(code.n, min(t + 1 + (b % 3), code.n),
                         replace=False)
        rx[b, pos] ^= 1
    corrected, nerr, ok = (np.asarray(a) for a in bch_decode(code, rx))
    for b in range(B):
        w_corr, w_nerr, w_ok = bch_ref.decode_np(rx[b], m, t, code.n)
        assert bool(ok[b]) == w_ok, b
        assert int(nerr[b]) == w_nerr, b
        assert np.array_equal(corrected[b], w_corr), b


def test_decode_fuzz_matches_golden():
    code = bch_construct(5, 2)
    rng = np.random.default_rng(55)
    B = 40
    rx = rng.integers(0, 2, (B, code.n))  # arbitrary words
    corrected, nerr, ok = (np.asarray(a) for a in bch_decode(code, rx))
    for b in range(B):
        w_corr, w_nerr, w_ok = bch_ref.decode_np(rx[b], 5, 2, code.n)
        assert bool(ok[b]) == w_ok, b
        assert int(nerr[b]) == w_nerr, b
        assert np.array_equal(corrected[b], w_corr), b


def test_concatenated_bch_ldpc_chain():
    # The DVB-S2 structure: BCH outer + LDPC inner.  Payload -> BCH ->
    # LDPC encode -> BPSK/AWGN -> LDPC BP decode (dvbs2_decode_device:
    # the QC-domain parity permutation + accumulator-wrap masks — plain
    # qc_bp_decode_device on standard-order LLRs decodes garbage) ->
    # BCH decode.  Asserted NON-vacuously: BP residuals must stay
    # within the outer budget (<= t) and every frame must come back ok
    # with the exact payload.  (Near this sigma BP exhibits stuck
    # single-bit residuals on some noise draws — the trapping-set
    # behavior the outer BCH exists to clean.)
    from commpy_tpu.ops.dvbs2 import (dvbs2_decode_device,
                                      dvbs2_encode_device,
                                      dvbs2_qc_params,
                                      synthetic_address_table)

    tab = synthetic_address_table(16200, "1/2", seed=0)
    params = dvbs2_qc_params(tab, 16200, "1/2")
    kldpc = params["k_bits"]  # 7200 (short FECFRAME '1/2' identifier)
    outer = bch_construct(16, 12, shorten=(1 << 16) - 1 - kldpc)
    assert outer.n == kldpc
    rng = np.random.default_rng(5)
    B = 8
    payload = rng.integers(0, 2, (B, outer.k))
    inner_msg = np.asarray(bch_encode(outer, payload))
    cw = np.asarray(dvbs2_encode_device(jnp.asarray(inner_msg), params))
    sigma = 0.88  # near the cliff: BP converges but can leak a few bits
    y = (1.0 - 2.0 * cw) + sigma * rng.normal(size=cw.shape)
    llr = (2.0 / sigma**2) * y
    dec, _ = dvbs2_decode_device(jnp.asarray(llr.astype(np.float32)),
                                 params, "MSA", 30, msa_scale=0.75)
    inner_hat = np.asarray(dec)[:, :kldpc]
    per_frame = (inner_hat != inner_msg).sum(axis=1)
    assert per_frame.max() <= 12, per_frame  # within the BCH budget
    corrected, nerr, ok = (np.asarray(a) for a in
                           bch_decode(outer, inner_hat))
    assert ok.all()
    assert np.array_equal(corrected[:, :outer.k], payload)
    assert np.array_equal(nerr, per_frame)


def test_chase_soft_decoding_beats_hard_beyond_t():
    # Chase-2 in its design regime: t+1 errors, all at low-reliability
    # bits -> the flip pattern covering them leaves a decodable word and
    # the true codeword wins the soft-discrepancy selection.
    from commpy_tpu.ops.bch import bch_chase_decode

    code = bch_construct(5, 2)  # (31,21) t=2
    rng = np.random.default_rng(0)
    wins = hard_ok = 0
    T = 25
    for _ in range(T):
        msg = rng.integers(0, 2, (1, code.k))
        cw = np.asarray(bch_encode(code, msg))
        rx = cw.copy()
        pos = rng.choice(code.n, 3, replace=False)
        rx[0, pos] ^= 1
        rel = np.full((1, code.n), 10.0, np.float32)
        rel[0, pos] = rng.uniform(0.1, 1.0, 3)
        c, n, ok = (np.asarray(a) for a in bch_chase_decode(code, rx, rel))
        if ok[0] and np.array_equal(c, cw):
            wins += 1
        _, _, okh = (np.asarray(a) for a in bch_decode(code, rx))
        hard_ok += int(okh[0])
    assert wins == T  # measured 30/30 at these reliabilities
    assert hard_ok < T


def test_chase_uniform_reliability_matches_hard_within_t():
    from commpy_tpu.ops.bch import bch_chase_decode

    code = bch_construct(6, 3)
    rng = np.random.default_rng(5)
    B = 10
    msg = rng.integers(0, 2, (B, code.k))
    cw = np.asarray(bch_encode(code, msg))
    rx = cw.copy()
    for b in range(B):
        pos = rng.choice(code.n, b % 4, replace=False)
        rx[b, pos] ^= 1
    rel = np.ones((B, code.n), np.float32)
    c, n, ok = (np.asarray(a) for a in bch_chase_decode(code, rx, rel))
    assert ok.all()
    assert np.array_equal(c, cw)


def test_dvbs2_concat_link_waterfall():
    # Full DVB-S2-structure link model: BCH outer + accumulator LDPC
    # inner over QPSK/AWGN.  Sharp cliff measured: BER 0.108 at snr 4.0
    # -> 0 at snr 4.5+ (8 frames).
    import jax
    from commpy_tpu.models import make_dvbs2_concat_link
    from commpy_tpu.ops.dvbs2 import dvbs2_qc_params, \
        synthetic_address_table

    tab = synthetic_address_table(16200, "1/2", seed=0)
    params = dvbs2_qc_params(tab, 16200, "1/2")
    link = make_dvbs2_concat_link(qc_params=params)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    assert int(link.link_step(keys, link.noise_std_fn(5.0))) == 0
    assert int(link.link_step(keys, link.noise_std_fn(1.0))) > 0


def test_bch_awgn_link_high_vs_low_snr():
    import jax
    from commpy_tpu.models import make_bch_awgn_link

    code = bch_construct(6, 3, shorten=13)
    link = make_bch_awgn_link(code=code, modulation_m=2)
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    assert int(link.link_step(keys, link.noise_std_fn(12.0))) == 0
    assert int(link.link_step(keys, link.noise_std_fn(0.0))) > 0
    with pytest.raises(ValueError):
        make_bch_awgn_link(code=code, decoder="nope")


def test_bch_chase_link_beats_hard_link():
    # Measured at (31,21) 4 dB: hard BER 1.1e-2 vs Chase 1.5e-3 (~7x,
    # the classic ~1.5-2 dB Chase-2 soft gain), error-free at 5 dB
    # where hard still fails.
    import jax
    from commpy_tpu.models import make_bch_awgn_link

    code = bch_construct(5, 2)
    hard = make_bch_awgn_link(code=code, decoder="hard")
    chase = make_bch_awgn_link(code=code, decoder="chase")
    keys = jax.random.split(jax.random.PRNGKey(0), 400)
    eh = int(hard.link_step(keys, hard.noise_std_fn(4.0)))
    ec = int(chase.link_step(keys, chase.noise_std_fn(4.0)))
    assert eh > 3 * ec > 0


def test_dvbs2_class_outer_code_scale():
    # DVB-S2's outer code is a t=12 BCH over GF(2^16) shortened to the
    # LDPC payload length.  Same structure here at the short-frame size
    # (honest labeling: our GF(2^16) primitive poly, not the ETSI
    # tables' — see ops/dvbs2.py provenance note).
    code = bch_construct(16, 12, shorten=(1 << 16) - 1 - 16200)
    assert code.n == 16200 and code.n_parity == 192
    rng = np.random.default_rng(9)
    msg = rng.integers(0, 2, (2, code.k))
    cw = np.asarray(bch_encode(code, msg))
    rx = cw.copy()
    for b in range(2):
        pos = rng.choice(code.n, 12, replace=False)
        rx[b, pos] ^= 1
    dec = make_bch_decoder(code)
    corrected, nerr, ok = (np.asarray(a) for a in dec(jnp.asarray(rx)))
    assert ok.all() and (nerr == 12).all()
    assert np.array_equal(corrected, cw)


def test_quad_locator_matches_bm():
    """r5: the closed-form t=2 locator (Lambda' = [S1, S1^2, S3+S1^3],
    scale-invariant for Chien) against the generic BM scan — identical
    corrections/ok/n_err for every error weight 0..2, and consistent
    failure flags beyond t (the BM scan is ~94% of the (31,21) hard
    decode the Chase/TPC loop runs 128x per codeword —
    scripts/bch_split_probe.py)."""
    import jax.numpy as jnp

    from commpy_tpu.ops.bch import bch_construct, bch_encode, \
        make_bch_decoder

    for (m, sh) in [(5, 0), (4, 0), (6, 10)]:
        code = bch_construct(m, 2, shorten=sh)
        bm = make_bch_decoder(code, locator="bm")
        qd = make_bch_decoder(code, locator="quad")
        rng = np.random.RandomState(7)
        B = 256
        msg = rng.randint(0, 2, (B, code.k))
        cw = np.asarray(bch_encode(code, jnp.asarray(msg)))
        for ne in (0, 1, 2, 3):
            rx = cw.copy()
            for b in range(B):
                if ne:
                    pos = rng.choice(code.n, ne, replace=False)
                    rx[b, pos] ^= 1
            a = [np.asarray(x) for x in bm(jnp.asarray(rx, jnp.int8))]
            b_ = [np.asarray(x) for x in qd(jnp.asarray(rx, jnp.int8))]
            if ne <= 2:
                for u, v in zip(a, b_):
                    assert np.array_equal(u, v), (m, sh, ne)
                assert a[2].all()
            else:
                # garbage regime: both paths must FLAG failures; exact
                # flag agreement observed 1024/1024 in the r5 fuzz
                assert (a[2] == b_[2]).mean() > 0.99


def test_quad_locator_validation():
    from commpy_tpu.ops.bch import bch_construct, make_bch_decoder

    with pytest.raises(ValueError, match="t=2"):
        make_bch_decoder(bch_construct(5, 3), locator="quad")
    with pytest.raises(ValueError, match="locator"):
        make_bch_decoder(bch_construct(5, 2), locator="x")
