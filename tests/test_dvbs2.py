"""DVB-S2 LDPC subsystem tests (ops/dvbs2.py).

The reference library has no DVB-S2 support (its largest decodable
asset is WiMAX n=1440, commpy/channelcoding/ldpc.py:51) — these tests
validate the standard-exact machinery (EN 302 307-1 §5.3.2 accumulator,
Annex-format tables, QC-domain isomorphism) against first principles:
H·c = 0, decode round trips at operating SNRs, and per-position mask
parity between the XLA core and the streamed Pallas kernel.
"""
import numpy as np
import pytest

from commpy_tpu.ops import dvbs2 as D


def test_frame_params_standard_set():
    # every standard (frame, rate) pair resolves and q is integral
    for n, rates in ((64800, 11), (16200, 10)):
        seen = set()
        for rate in D._K_LDPC[n]:
            k, q = D.frame_params(n, rate)
            assert (n - k) == 360 * q
            assert 0 < k < n
            seen.add(rate)
        assert len(seen) == rates
    with pytest.raises(ValueError, match="no DVB-S2 code"):
        D.frame_params(16200, "9/10")  # 9/10 exists only at 64800
    with pytest.raises(ValueError, match="no DVB-S2 code"):
        D.frame_params(32400, "1/2")


def test_parse_address_table_annex_format():
    text = """
    # Annex-style table: one row of accumulator addresses per line
    54 9318 14392
    55, 7263, 4635, 2530
    56 24731
    """
    tab = D.parse_address_table(text)
    assert tab == ((54, 9318, 14392), (55, 7263, 4635, 2530), (56, 24731))
    with pytest.raises(ValueError, match="empty"):
        D.parse_address_table("# nothing\n\n")


@pytest.mark.parametrize("n,rate", [(16200, "1/2"), (16200, "3/4")])
def test_validate_address_table_accepts_wellformed(n, rate):
    """The validator (VERDICT r3 item 6) passes structure-exact tables
    and reports the §5.3.2 profile."""
    tab = D.synthetic_address_table(n, rate, seed=1)
    rep = D.validate_address_table(tab, n, rate)
    k, q = D.frame_params(n, rate)
    assert rep["rows"] == k // 360 and rep["q"] == q
    assert rep["syndrome_ok"] is True
    lo, hi = rep["check_row_weight"]
    assert hi - lo <= 1
    assert all(d >= 3 for d in rep["vn_degrees"])
    # declared row weight must match the measured one exactly
    with pytest.raises(ValueError, match="row_weight"):
        D.validate_address_table(tab, n, rate, row_weight=hi + 5)


def test_validate_address_table_rejects_corruption():
    n, rate = 16200, "1/2"
    tab = list(D.synthetic_address_table(n, rate, seed=1))
    k, q = D.frame_params(n, rate)
    M = n - k

    with pytest.raises(ValueError, match="rows"):
        D.validate_address_table(tab[:-1], n, rate)
    bad = list(tab)
    bad[3] = bad[3] + (M,)  # out of range
    with pytest.raises(ValueError, match="out of range"):
        D.validate_address_table(bad, n, rate)
    bad = list(tab)
    bad[3] = bad[3] + (bad[3][0],)  # duplicate address in a row
    with pytest.raises(ValueError, match="duplicate address"):
        D.validate_address_table(bad, n, rate)
    # a single mistyped address moves one edge between block rows; move
    # one from the least- to the most-loaded row so the degree spread
    # provably exceeds 1 — the check-regularity test catches it
    load = np.zeros(q, np.int64)
    for row in tab:
        for x in row:
            load[x % q] += 1
    a_min, a_max = int(np.argmin(load)), int(np.argmax(load))
    if a_min == a_max:  # perfectly uniform loads: any move breaks it
        a_max = (a_min + 1) % q
    bad = list(tab)
    for i, row in enumerate(bad):
        hit = [x for x in row if x % q == a_min]
        if hit:
            used_t = {x // q for x in row if x % q == a_max}
            t_new = next(t for t in range(M // q) if t not in used_t)
            row = list(row)
            row[row.index(hit[0])] = t_new * q + a_max
            bad[i] = tuple(row)
            break
    with pytest.raises(ValueError, match="not regular"):
        D.validate_address_table(bad, n, rate)


def test_validator_numpy_encoder_matches_device():
    """The validator's host encoder is the same map as the device one."""
    n, rate = 16200, "2/3"
    tab = D.synthetic_address_table(n, rate, seed=3)
    params = D.dvbs2_qc_params(tab, n, rate)
    k, q = D.frame_params(n, rate)
    rng = np.random.RandomState(0)
    msg = rng.randint(0, 2, k).astype(np.int8)
    host = D._np_encode(tab, q, msg)
    dev = np.asarray(D.dvbs2_encode_device(msg, params))
    assert np.array_equal(host % 2, dev % 2)


@pytest.mark.parametrize("n,rate", [(16200, "1/2"), (16200, "3/4"),
                                    (64800, "2/3")])
def test_encode_satisfies_parity_checks(n, rate):
    tab = D.synthetic_address_table(n, rate, seed=1)
    params = D.dvbs2_qc_params(tab, n, rate)
    k = params["k_bits"]
    rng = np.random.default_rng(0)
    msg = rng.integers(0, 2, (3, k)).astype(np.int8)
    cw = np.asarray(D.dvbs2_encode_device(msg, params))
    assert cw.shape == (3, n)
    np.testing.assert_array_equal(cw[:, :k], msg)  # systematic
    H = D.dvbs2_expand_h(params)
    assert (H @ cw.T % 2).sum() == 0
    # check degrees match the per-rate row-weight target within +-1
    # (the standard's tables fix them exactly; the synthetic generator
    # stratifies block-row load)
    rd = H.sum(axis=1)
    assert rd.min() >= D._ROW_DEG[rate] - 1
    assert rd.max() <= D._ROW_DEG[rate] + 1


@pytest.mark.parametrize("n,rate,ebn0", [(16200, "1/2", 1.8),
                                         (16200, "8/9", 5.5)])
def test_noisy_decode_round_trip(n, rate, ebn0):
    tab = D.synthetic_address_table(n, rate, seed=1)
    params = D.dvbs2_qc_params(tab, n, rate)
    k = params["k_bits"]
    r = k / n
    rng = np.random.default_rng(0)
    msg = rng.integers(0, 2, (2, k)).astype(np.int8)
    cw = np.asarray(D.dvbs2_encode_device(msg, params))
    ns = float(np.sqrt(1 / (2 * r * 10 ** (ebn0 / 10))))
    y = (1.0 - 2.0 * cw.astype(np.float32)) + ns * rng.standard_normal(
        cw.shape).astype(np.float32)
    dec, out = D.dvbs2_decode_device(2 * y / ns**2, params, "MSA", 25,
                                     backend="xla", msa_scale=0.75)
    np.testing.assert_array_equal(np.asarray(dec), cw)
    # posterior LLR order: standard order means info first, parity in
    # transmission order — signs agree with the decision everywhere
    assert (np.signbit(np.asarray(out)) == np.asarray(dec).astype(bool)).all()


def test_wrap_edge_mask_matters():
    # The accumulator wrap block is a shift circulant MINUS one edge.
    # Decoding with the mask dropped (full circulant) must change the
    # checks: the expanded H with masks passes H@c=0, without it fails.
    tab = D.synthetic_address_table(16200, "1/2", seed=2)
    params = D.dvbs2_qc_params(tab, 16200, "1/2")
    rng = np.random.default_rng(1)
    msg = rng.integers(0, 2, (1, params["k_bits"])).astype(np.int8)
    cw = np.asarray(D.dvbs2_encode_device(msg, params))
    H = D.dvbs2_expand_h(params)
    assert (H @ cw.T % 2).sum() == 0
    unmasked = dict(params, pos_masks=())
    H_full = D.dvbs2_expand_h(unmasked)
    assert (H_full @ cw.T % 2).sum() > 0


def test_pos_mask_parity_streamed_vs_xla():
    # Per-position edge masks flow identically through the XLA core and
    # the HBM-streamed kernel (interpret mode on CPU).  Exercised on a
    # small 802.11n code with an artificial mask so the interpret run
    # stays fast; the DVB-S2-size mask is device-validated separately.
    from commpy_tpu.ops.qcldpc import ieee80211n_params, qc_bp_decode_device

    params = dict(ieee80211n_params(648, "1/2"))
    # kill three positions of the first nonzero slot of block row 1
    params["pos_masks"] = ((1, 0, (0, 5, 26)),)
    rng = np.random.RandomState(9)
    llr = (rng.randn(8, 648) * 3).astype(np.float32)
    d_x, l_x = qc_bp_decode_device(llr, params, "MSA", 6, backend="xla",
                                   schedule="layered")
    d_s, l_s = qc_bp_decode_device(llr, params, "MSA", 6,
                                   backend="pallas-streamed",
                                   schedule="layered", msg_io="f32")
    np.testing.assert_array_equal(np.asarray(d_x), np.asarray(d_s))
    np.testing.assert_array_equal(np.asarray(l_x), np.asarray(l_s))
    # and the mask changes the result vs the unmasked graph
    d_u, _ = qc_bp_decode_device(llr, dict(params, pos_masks=()), "MSA", 6,
                                 backend="xla", schedule="layered")
    assert (np.asarray(d_u) != np.asarray(d_x)).any()


def test_duplicate_pair_rejected():
    # two identical (group, shift) addresses in one row cancel in GF(2)
    k, q = D.frame_params(16200, "1/2")
    tab = [[1, 2, 3] for _ in range(k // 360)]
    tab[0] = [7, 7 + 0]  # same address twice -> same (block, shift)
    with pytest.raises(ValueError, match="duplicate"):
        D.dvbs2_qc_params(tab, 16200, "1/2")
    with pytest.raises(ValueError, match="out of range"):
        D.dvbs2_qc_params([[16200 - k]] + [[1]] * (k // 360 - 1),
                          16200, "1/2")
