"""Polar codes: construction, encoder, SC/SCL decoders vs NumPy goldens."""
import numpy as np
import pytest

import jax.numpy as jnp

from commpy_tpu.ops.polar import (
    CRC_POLYNOMIALS,
    CrcSpec,
    PolarCode,
    crc_check_table,
    crc_encode_table,
    make_polar_sc_decoder,
    make_polar_scl_decoder,
    polar_construct,
    polar_encode,
    polar_sc_decode,
    polar_scl_decode,
)

import polar_ref


def _random_code(rng, N, K, crc=None):
    frozen = np.ones(N, bool)
    frozen[rng.choice(N, K + (CrcSpec.named(crc).length if crc else 0),
                      replace=False)] = False
    return PolarCode(N=N, K=K, frozen=tuple(frozen.tolist()),
                     crc=CrcSpec.named(crc) if crc else None)


# ---------------------------------------------------------------------------
# Construction
# ---------------------------------------------------------------------------

def test_construction_known_n8():
    # For N=8 both constructions must pick the classic {3,5,6,7} info set.
    for method in ("bhattacharyya", "ga"):
        code = polar_construct(8, 4, method=method, design_snr_db=0.0)
        assert sorted(code.info_positions.tolist()) == [3, 5, 6, 7], method


def test_construction_monotone_nesting():
    # Higher-K codes must contain the lower-K info sets (fixed reliability
    # order => nested designs).
    for method in ("bhattacharyya", "ga"):
        prev = set()
        for K in (16, 32, 64, 100):
            code = polar_construct(128, K, method=method, design_snr_db=1.0)
            cur = set(code.info_positions.tolist())
            assert prev <= cur
            prev = cur


def test_construction_ga_bhatt_agree_at_matched_design():
    # At a matched design point the two constructions select nearly the
    # same info set (measured SC BER is equal within MC noise; see the
    # polar_construct docstring for the mismatch sensitivity).
    from commpy_tpu.ops.polar import (_bhattacharyya_reliability,
                                      _ga_reliability)
    ga = _ga_reliability(10, -0.5)
    bh = _bhattacharyya_reliability(10, -0.5)
    A_ga = set(np.argsort(-ga)[:512].tolist())
    A_bh = set(np.argsort(-bh)[:512].tolist())
    assert len(A_ga & A_bh) >= 500
    # GA mean LLRs must be positive, finite, and monotone under 'plus'
    assert np.all(np.isfinite(ga)) and np.all(ga > 0)


def test_construction_validation():
    with pytest.raises(ValueError):
        polar_construct(100, 10)
    with pytest.raises(ValueError):
        polar_construct(64, 65)
    with pytest.raises(ValueError):
        polar_construct(64, 32, method="nope")
    with pytest.raises(ValueError):
        PolarCode(N=8, K=5, frozen=(True,) * 4 + (False,) * 4)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("N,K", [(2, 1), (8, 4), (64, 30), (256, 200)])
def test_encoder_matches_kron_golden(N, K):
    rng = np.random.default_rng(7 + N)
    code = _random_code(rng, N, K)
    msg = rng.integers(0, 2, (5, K))
    x = np.asarray(polar_encode(code, msg))
    u = np.zeros((5, N), np.int64)
    u[:, code.info_positions] = msg
    assert np.array_equal(x, polar_ref.encode_np(u))


def test_encoder_linearity_and_involution():
    # F^{\otimes n} is an involution over GF(2): encoding twice on the full
    # u-domain is the identity.
    rng = np.random.default_rng(3)
    code = PolarCode(N=64, K=64, frozen=(False,) * 64)
    msg = rng.integers(0, 2, (4, 64))
    twice = polar_encode(code, polar_encode(code, msg))
    assert np.array_equal(np.asarray(twice), msg)


# ---------------------------------------------------------------------------
# SC decoder
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("N,K", [(2, 1), (4, 2), (8, 4), (32, 16),
                                 (128, 77), (256, 128)])
def test_sc_matches_golden_minsum_bitexact(N, K):
    rng = np.random.default_rng(11 + N)
    code = _random_code(rng, N, K)
    B = 6
    llr = rng.normal(size=(B, N)).astype(np.float32) * 3.0
    dec = make_polar_sc_decoder(code, rule="minsum", full=True)
    got = np.asarray(dec(jnp.asarray(llr)))
    for b in range(B):
        want = polar_ref.sc_decode_np(llr[b], code.frozen_mask, "minsum")
        assert np.array_equal(got[b], want), f"frame {b}"


def test_sc_matches_golden_exact_rule():
    rng = np.random.default_rng(5)
    code = _random_code(rng, 64, 40)
    llr = rng.normal(size=(4, 64)).astype(np.float32) * 2.0
    dec = make_polar_sc_decoder(code, rule="exact", full=True)
    got = np.asarray(dec(jnp.asarray(llr)))
    for b in range(4):
        want = polar_ref.sc_decode_np(llr[b], code.frozen_mask, "exact")
        assert np.array_equal(got[b], want)


def test_sc_noiseless_roundtrip():
    code = polar_construct(256, 120, design_snr_db=2.0)
    rng = np.random.default_rng(9)
    msg = rng.integers(0, 2, (8, code.K))
    x = np.asarray(polar_encode(code, msg))
    llr = (1.0 - 2.0 * x) * 20.0  # strong correct LLRs
    out = np.asarray(polar_sc_decode(code, llr))
    assert np.array_equal(out, msg)


def test_sc_bf16_state_ber_parity():
    # bf16 LLR state: not bit-exact, but BER must track f32 closely.
    code = polar_construct(256, 128, design_snr_db=2.0)
    rng = np.random.default_rng(23)
    msg = rng.integers(0, 2, (512, code.K))
    x = np.asarray(polar_encode(code, msg))
    esno = 10 ** (3.0 / 10.0) * code.rate
    sigma = 1.0 / np.sqrt(2.0 * esno)
    y = (1.0 - 2.0 * x) + sigma * rng.normal(size=x.shape)
    llr = ((2.0 / sigma**2) * y).astype(np.float32)
    dec32 = make_polar_sc_decoder(code)
    dec16 = make_polar_sc_decoder(code, dtype="bf16")
    ber32 = np.mean(np.asarray(dec32(jnp.asarray(llr))) != msg)
    ber16 = np.mean(np.asarray(dec16(jnp.asarray(llr))) != msg)
    assert ber16 < max(3.0 * ber32, 5e-3), (ber16, ber32)


def test_sc_frozen_positions_forced_zero():
    rng = np.random.default_rng(21)
    code = _random_code(rng, 32, 10)
    llr = rng.normal(size=(3, 32)).astype(np.float32)
    full = np.asarray(make_polar_sc_decoder(code, full=True)(jnp.asarray(llr)))
    assert not full[:, code.frozen_mask].any()


# ---------------------------------------------------------------------------
# SCL decoder
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("N,K,P", [(8, 4, 2), (32, 20, 4), (64, 32, 8),
                                   (128, 64, 4)])
def test_scl_matches_golden_bitexact(N, K, P):
    rng = np.random.default_rng(31 + N + P)
    code = _random_code(rng, N, K)
    B = 4
    llr = rng.normal(size=(B, N)).astype(np.float32) * 2.5
    dec = make_polar_scl_decoder(code, list_size=P, rule="minsum",
                                 pm_rule="approx", full=True)
    payload, pms, u_all = (np.asarray(a) for a in dec(jnp.asarray(llr)))
    for b in range(B):
        want_u, want_pms, want_all = polar_ref.scl_decode_np(
            llr[b], code.frozen_mask, P, rule="minsum", pm_rule="approx")
        active = want_pms < 1e20
        assert np.array_equal(u_all[b][active], want_all[active]), f"frame {b}"
        assert np.array_equal(pms[b][active].astype(np.float32),
                              want_pms[active]), f"frame {b}"
        assert np.array_equal(payload[b],
                              want_u[~code.frozen_mask][:K]), f"frame {b}"


@pytest.mark.parametrize("N,K,P", [(8, 4, 2), (32, 20, 4), (64, 32, 8),
                                   (128, 64, 4)])
def test_scl_unrolled_matches_golden_bitexact(N, K, P):
    """The statically-unrolled SCL (r5 TPU path) against the SAME NumPy
    golden as the scan decoder — payload, path metrics, and full list,
    bit-exact."""
    from commpy_tpu.ops.polar import make_polar_scl_decoder_unrolled

    rng = np.random.default_rng(31 + N + P)
    code = _random_code(rng, N, K)
    B = 4
    llr = rng.normal(size=(B, N)).astype(np.float32) * 2.5
    dec = make_polar_scl_decoder_unrolled(code, list_size=P, rule="minsum",
                                          pm_rule="approx", full=True)
    payload, pms, u_all = (np.asarray(a) for a in dec(jnp.asarray(llr)))
    for b in range(B):
        want_u, want_pms, want_all = polar_ref.scl_decode_np(
            llr[b], code.frozen_mask, P, rule="minsum", pm_rule="approx")
        active = want_pms < 1e20
        assert np.array_equal(u_all[b][active], want_all[active]), f"frame {b}"
        assert np.array_equal(pms[b][active].astype(np.float32),
                              want_pms[active]), f"frame {b}"
        assert np.array_equal(payload[b],
                              want_u[~code.frozen_mask][:K]), f"frame {b}"


@pytest.mark.parametrize(
    "N,K,crc,systematic,P,rule,pm_rule",
    [(64, 32, None, False, 8, "minsum", "approx"),
     (64, 28, "crc11", False, 4, "minsum", "approx"),
     (128, 80, None, True, 8, "minsum", "exact"),
     (128, 64, "crc11", True, 8, "exact", "approx"),
     (64, 64, None, False, 8, "minsum", "approx"),   # all-info
     (64, 1, None, False, 8, "minsum", "approx")])   # near-all-frozen
def test_scl_unrolled_bitidentical_to_scan(N, K, crc, systematic, P, rule,
                                           pm_rule):
    """Scan and unrolled SCL builders are the same decoder: payload, pm,
    and full path list bit-identical across CRC/systematic/rule/pm-rule
    configurations (the unrolled builder only restructures dispatch:
    static frozen masks, rank-select prune, hierarchical deferred
    permutation, level-parallel frozen cascades)."""
    from commpy_tpu.ops.polar import make_polar_scl_decoder_unrolled

    rng = np.random.default_rng(7 + N + K + P)
    code = polar_construct(N, K, crc=crc, systematic=systematic,
                           design_snr_db=2.0)
    llr = jnp.asarray(rng.normal(size=(5, N)).astype(np.float32) * 2)
    a = make_polar_scl_decoder(code, list_size=P, rule=rule,
                               pm_rule=pm_rule, full=True)(llr)
    b = make_polar_scl_decoder_unrolled(code, list_size=P, rule=rule,
                                        pm_rule=pm_rule, full=True)(llr)
    for x, y, nm in zip(a, b, ("payload", "pm", "u_all")):
        if nm == "pm" and (rule == "exact" or pm_rule == "exact"):
            # transcendental ops (logaddexp/softplus) round differently
            # under XLA's program-dependent fusion — path metrics agree
            # to ~1 ULP, decisions exactly
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-6, atol=1e-6)
        else:
            assert np.array_equal(np.asarray(x), np.asarray(y)), nm


def test_scl_exact_pm_close_to_golden():
    rng = np.random.default_rng(17)
    code = _random_code(rng, 64, 40)
    P = 4
    llr = rng.normal(size=(3, 64)).astype(np.float32) * 2.0
    dec = make_polar_scl_decoder(code, list_size=P, rule="minsum",
                                 pm_rule="exact", full=True)
    payload, pms, _ = (np.asarray(a) for a in dec(jnp.asarray(llr)))
    for b in range(3):
        want_u, want_pms, _ = polar_ref.scl_decode_np(
            llr[b], code.frozen_mask, P, rule="minsum", pm_rule="exact")
        np.testing.assert_allclose(np.sort(pms[b]), np.sort(want_pms),
                                   rtol=1e-5, atol=1e-5)
        assert np.array_equal(payload[b], want_u[~code.frozen_mask][:code.K])


def test_scl_list1_equals_sc():
    rng = np.random.default_rng(41)
    code = _random_code(rng, 128, 70)
    llr = rng.normal(size=(5, 128)).astype(np.float32) * 2.0
    sc = np.asarray(polar_sc_decode(code, llr))
    scl = np.asarray(polar_scl_decode(code, llr, list_size=1))
    assert np.array_equal(sc, scl)


def test_scl_noiseless_roundtrip_with_crc():
    code = polar_construct(128, 60, crc="crc11", design_snr_db=2.0)
    rng = np.random.default_rng(13)
    msg = rng.integers(0, 2, (6, code.K))
    x = np.asarray(polar_encode(code, msg))
    llr = (1.0 - 2.0 * x) * 20.0
    out = np.asarray(polar_scl_decode(code, llr, list_size=4))
    assert np.array_equal(out, msg)


def test_scl_crc_rescues_wrong_best_path():
    # At moderate noise, collect frames where SC fails but some list path is
    # correct: CRC-aided SCL must recover strictly more frames than plain
    # best-metric selection on those.
    code = polar_construct(128, 48, crc="crc11", design_snr_db=1.0)
    nocrc = PolarCode(N=128, K=code.k_total, frozen=code.frozen)
    rng = np.random.default_rng(101)
    B = 400
    msg = rng.integers(0, 2, (B, code.K))
    x = np.asarray(polar_encode(code, msg))
    snr_db = -1.0
    sigma = 1.0 / np.sqrt(2.0 * 10 ** (snr_db / 10.0))
    y = (1.0 - 2.0 * x) + sigma * rng.normal(size=x.shape)
    llr = (2.0 / sigma**2) * y
    with_crc = np.asarray(polar_scl_decode(code, llr, list_size=8))
    plain = np.asarray(polar_scl_decode(nocrc, llr, list_size=8))[:, :code.K]
    fer_crc = np.mean(np.any(with_crc != msg, axis=1))
    fer_plain = np.mean(np.any(plain != msg, axis=1))
    # Measured at this operating point: plain best-metric FER ~3%, CRC-aided 0.
    assert fer_plain > 0.01
    assert fer_crc < fer_plain


# ---------------------------------------------------------------------------
# Link model + sharded Monte-Carlo integration
# ---------------------------------------------------------------------------

def test_polar_link_high_vs_low_snr():
    import jax
    from commpy_tpu.models import make_polar_awgn_link

    code = polar_construct(256, 128, crc="crc11", design_snr_db=2.0)
    for decoder in ("sc", "scl"):
        link = make_polar_awgn_link(code=code, decoder=decoder, list_size=4)
        keys = jax.random.split(jax.random.PRNGKey(0), 16)
        hi = int(link.link_step(keys, link.noise_std_fn(35.0)))
        lo = int(link.link_step(keys, link.noise_std_fn(0.0)))
        assert hi == 0 < lo, (decoder, hi, lo)


def test_polar_link_qam16():
    import jax
    from commpy_tpu.models import make_polar_awgn_link

    code = polar_construct(256, 128, design_snr_db=2.0)
    link = make_polar_awgn_link(code=code, decoder="sc", modulation_m=16,
                                use_psk=False)
    keys = jax.random.split(jax.random.PRNGKey(1), 16)
    assert int(link.link_step(keys, link.noise_std_fn(35.0))) == 0
    assert int(link.link_step(keys, link.noise_std_fn(2.0))) > 0


def test_polar_link_validation():
    from commpy_tpu.models import make_polar_awgn_link

    code = polar_construct(64, 32)
    with pytest.raises(ValueError):
        make_polar_awgn_link(code=code, decoder="nope")


def test_polar_montecarlo_sharded():
    # Full engine path: polar SCL link sharded over the 8-device CPU mesh,
    # psum'd tallies; BER must fall with SNR and hit ~0 at the top point.
    import jax
    from commpy_tpu.models import make_polar_awgn_link
    from commpy_tpu.parallel import make_mesh, montecarlo_ber

    code = polar_construct(128, 64, crc="crc11", design_snr_db=2.0)
    link = make_polar_awgn_link(code=code, decoder="scl", list_size=4)
    snrs = np.array([0.0, 3.0, 8.0])
    res = montecarlo_ber(
        link.link_step, snrs, link.noise_std_fn, link.frame_bits,
        jax.random.PRNGKey(3), frames_per_round=32, max_rounds=4,
        err_min=10**9, mesh=make_mesh(8),
    )
    assert res.bers[0] > res.bers[2]
    assert res.bers[2] < 1e-3


# ---------------------------------------------------------------------------
# Systematic encoding
# ---------------------------------------------------------------------------

def test_systematic_payload_visible_in_codeword():
    code = polar_construct(128, 60, crc="crc11", design_snr_db=2.0,
                           systematic=True)
    rng = np.random.default_rng(15)
    msg = rng.integers(0, 2, (6, code.K))
    x = np.asarray(polar_encode(code, msg))
    assert np.array_equal(x[:, code.info_positions[:code.K]], msg)
    # still a valid codeword of the same code: frozen u-domain is zero
    u = polar_ref.encode_np(x)  # involution: u = x G
    assert not u[:, code.frozen_mask].any()


def test_systematic_noisy_roundtrip_sc_scl():
    code = polar_construct(256, 120, crc="crc11", design_snr_db=2.0,
                           systematic=True)
    rng = np.random.default_rng(19)
    msg = rng.integers(0, 2, (8, code.K))
    x = np.asarray(polar_encode(code, msg))
    llr = ((1.0 - 2.0 * x) * 14.0 +
           rng.normal(size=x.shape) * 1.0).astype(np.float32)
    assert np.array_equal(np.asarray(polar_sc_decode(code, llr)), msg)
    assert np.array_equal(
        np.asarray(polar_scl_decode(code, llr, list_size=4)), msg)


def test_systematic_ber_not_worse_than_nonsystematic():
    sys = polar_construct(256, 128, design_snr_db=2.0, systematic=True)
    plain = polar_construct(256, 128, design_snr_db=2.0)
    rng = np.random.default_rng(33)
    B = 1500
    msg = rng.integers(0, 2, (B, 128))
    esno = 10 ** (2.5 / 10.0) * 0.5
    sigma = 1.0 / np.sqrt(2 * esno)
    noise = rng.normal(size=(B, 256))
    bers = {}
    for name, code in (("sys", sys), ("plain", plain)):
        x = np.asarray(polar_encode(code, msg))
        llr = ((2 / sigma**2) * ((1 - 2.0 * x) + sigma * noise)
               ).astype(np.float32)
        bers[name] = np.mean(np.asarray(polar_sc_decode(code, llr)) != msg)
    # classic systematic-polar result: payload BER strictly improves
    assert bers["sys"] < bers["plain"], bers


def test_systematic_with_rate_match():
    code = polar_construct(128, 64, E=100, design_snr_db=2.0,
                           systematic=True)
    from commpy_tpu.ops.polar import polar_rate_match, polar_rate_recover
    rng = np.random.default_rng(44)
    msg = rng.integers(0, 2, (5, 64))
    tx = np.asarray(polar_rate_match(code, polar_encode(code, msg)))
    llr_e = ((1.0 - 2.0 * tx) * 15.0).astype(np.float32)
    out = np.asarray(polar_sc_decode(code, polar_rate_recover(
        code, jnp.asarray(llr_e))))
    assert np.array_equal(out, msg)


# ---------------------------------------------------------------------------
# Rate matching
# ---------------------------------------------------------------------------

def test_rate_match_mode_selection_and_validation():
    from commpy_tpu.ops.polar import polar_rate_match

    hi = polar_construct(128, 80, E=100)  # K/E = 0.8 > 7/16
    lo = polar_construct(128, 30, E=100)
    assert hi.rm == ("shorten", 100) and lo.rm == ("puncture", 100)
    assert hi.E == 100 and hi.rate == 0.8
    rep = polar_construct(128, 64, E=200)
    assert rep.rm == ("repeat", 200)
    with pytest.raises(ValueError):
        polar_construct(128, 90, E=80)  # K > E
    with pytest.raises(ValueError):
        polar_construct(128, 64, E=200, rm_mode="shorten")
    # shortened codeword bits must actually be zero (G lower triangular)
    rng = np.random.default_rng(3)
    x = np.asarray(polar_encode(hi, rng.integers(0, 2, (6, hi.K))))
    assert not x[:, 100:].any()
    assert np.asarray(polar_rate_match(hi, jnp.asarray(x))).shape == (6, 100)


@pytest.mark.parametrize("E,K,mode", [(96, 60, "shorten"), (96, 30, "puncture"),
                                      (200, 64, "repeat")])
def test_rate_match_roundtrip_all_modes(E, K, mode):
    from commpy_tpu.ops.polar import polar_rate_match, polar_rate_recover

    code = polar_construct(128, K, E=E, rm_mode=mode, design_snr_db=2.0)
    assert code.rm == (mode, E)
    rng = np.random.default_rng(7 + E)
    msg = rng.integers(0, 2, (8, K))
    tx = np.asarray(polar_rate_match(code, polar_encode(code, msg)))
    assert tx.shape == (8, E)
    llr_e = ((1.0 - 2.0 * tx) * 12.0 +
             rng.normal(size=tx.shape) * 0.5).astype(np.float32)
    llr = polar_rate_recover(code, jnp.asarray(llr_e))
    out = np.asarray(polar_sc_decode(code, llr))
    assert np.array_equal(out, msg)
    out_l = np.asarray(polar_scl_decode(code, llr, list_size=4))
    assert np.array_equal(out_l, msg)


def test_rate_matched_link_end_to_end():
    import jax
    from commpy_tpu.models import make_polar_awgn_link

    code = polar_construct(256, 100, crc="crc11", E=200, design_snr_db=2.0)
    link = make_polar_awgn_link(code=code, decoder="scl", list_size=4)
    keys = jax.random.split(jax.random.PRNGKey(2), 16)
    assert int(link.link_step(keys, link.noise_std_fn(35.0))) == 0
    assert int(link.link_step(keys, link.noise_std_fn(-1.0))) > 0


@pytest.mark.slow
def test_acceptance_ca_scl_waterfall_n512():
    """Tier-3 acceptance: CA-SCL-8 FER curve at N=512, R~1/2.

    Published CA-SCL-8 (CRC-11) performance for N=512, R=1/2 reaches
    FER 1e-2 near 2 dB Eb/N0; measured here (2000 frames, fixed seed):
    1.5 dB: 9.6e-2 / 2.0 dB: 1.4e-2 / 2.5 dB: 2.0e-3, with plain SC at
    4.0e-1 / 1.5e-1 / 3.8e-2 — the classic ~1 dB list gain.  Bounds are
    set at ~5x the measured points so Monte-Carlo noise can't flake.
    """
    code = polar_construct(512, 256, crc="crc11", design_snr_db=2.0)
    plain = polar_construct(512, 256, design_snr_db=2.0)
    dec = make_polar_scl_decoder(code, list_size=8)
    dsc = make_polar_sc_decoder(plain)
    rng = np.random.default_rng(1)
    B = 2000
    msg = rng.integers(0, 2, (B, code.K))
    x = np.asarray(polar_encode(code, msg))
    xp = np.asarray(polar_encode(plain, msg))
    fers, fers_sc = [], []
    for ebno in (1.5, 2.0, 2.5):
        esno = 10 ** (ebno / 10.0) * code.rate
        sigma = 1.0 / np.sqrt(2 * esno)
        noise = rng.normal(size=x.shape)
        llr = ((2 / sigma**2) * ((1 - 2.0 * x) + sigma * noise)
               ).astype(np.float32)
        llrp = ((2 / sigma**2) * ((1 - 2.0 * xp) + sigma * noise)
                ).astype(np.float32)
        out = np.asarray(dec(jnp.asarray(llr)))
        outp = np.asarray(dsc(jnp.asarray(llrp)))
        fers.append(np.mean(np.any(out != msg, axis=1)))
        fers_sc.append(np.mean(np.any(outp != msg, axis=1)))
    assert fers[0] > fers[1] > fers[2]  # monotone waterfall
    assert fers[1] < 5e-2  # 2.0 dB (measured 1.4e-2)
    assert fers[2] < 1e-2  # 2.5 dB (measured 2.0e-3)
    assert fers_sc[1] > 2 * fers[1]  # list gain over SC


# ---------------------------------------------------------------------------
# CRC tables
# ---------------------------------------------------------------------------

def test_crc16_ccitt_external_anchor():
    # CRC-16/XMODEM (poly 0x1021, init 0, no reflection — our exact
    # convention): check value of ASCII "123456789" is 0x31C3.
    from commpy_tpu.ops.polar import _crc_remainder

    bits = []
    for ch in b"123456789":
        bits.extend((ch >> (7 - i)) & 1 for i in range(8))
    rem = _crc_remainder(bits, CRC_POLYNOMIALS["crc16"])
    value = int("".join(str(int(b)) for b in rem), 2)
    assert value == 0x31C3, hex(value)


@pytest.mark.parametrize("name", sorted(CRC_POLYNOMIALS))
def test_crc_table_matches_long_division(name):
    crc = CrcSpec.named(name)
    rng = np.random.default_rng(59)
    for k in (5, 24, 40):
        tab = crc_encode_table(crc, k)
        for _ in range(5):
            m = rng.integers(0, 2, k)
            want = polar_ref.crc_remainder_np(m, crc.poly)
            assert np.array_equal((m @ tab) % 2, want)
        h = crc_check_table(crc, k + crc.length)
        m = rng.integers(0, 2, k)
        word = np.concatenate([m, (m @ tab) % 2])
        assert not ((word @ h) % 2).any()
        word[0] ^= 1
        assert ((word @ h) % 2).any()


# ---------------------------------------------------------------------------
# End-to-end BER sanity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("decoder", ["sc", "scl"])
def test_ber_beats_uncoded(decoder):
    code = polar_construct(128, 64, design_snr_db=2.0)
    rng = np.random.default_rng(77)
    B = 600
    msg = rng.integers(0, 2, (B, code.K))
    x = np.asarray(polar_encode(code, msg))
    ebno_db = 4.0
    esno = 10 ** (ebno_db / 10.0) * code.rate
    sigma = 1.0 / np.sqrt(2.0 * esno)
    y = (1.0 - 2.0 * x) + sigma * rng.normal(size=x.shape)
    llr = (2.0 / sigma**2) * y
    if decoder == "sc":
        out = np.asarray(polar_sc_decode(code, llr))
    else:
        out = np.asarray(polar_scl_decode(code, llr, list_size=4))
    ber = np.mean(out != msg)
    # Uncoded BPSK at Eb/N0 = 4 dB: Q(sqrt(2*10^0.4)) ~ 1.2e-2; measured
    # here: SC 8.3e-4, SCL-4 6.3e-4.
    assert ber < 5e-3, ber
