"""Reed-Solomon codec vs properties and the independent NumPy golden."""
import numpy as np
import pytest

import jax.numpy as jnp

from commpy_tpu.ops.rs import (
    rs_construct,
    rs_decode,
    rs_encode,
    rs_genpoly,
    make_rs_decoder,
)

import rs_ref
from bch_ref import GfTab


# ---------------------------------------------------------------------------
# Construction
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("m,t,fcr", [(3, 1, 1), (4, 2, 1), (8, 8, 0),
                                     (8, 16, 0)])
def test_genpoly_roots_are_consecutive_powers(m, t, fcr):
    g = rs_genpoly(m, t, fcr)
    assert len(g) == 2 * t + 1 and g[-1] == 1  # monic, degree 2t
    gf = GfTab(m)
    for j in range(fcr, fcr + 2 * t):
        assert rs_ref._poly_eval(gf, g, int(gf.exp[j])) == 0
    # one past the run must NOT be a root (g has exactly 2t roots)
    assert rs_ref._poly_eval(gf, g, int(gf.exp[fcr + 2 * t])) != 0


def test_construct_shapes_and_validation():
    code = rs_construct(8, 16)  # RS(255, 223), CCSDS shape
    assert (code.n, code.k) == (255, 223)
    dvbt = rs_construct(8, 8, shorten=51, fcr=0)  # RS(204,188) from (255,239)
    assert (dvbt.n, dvbt.k) == (204, 188)
    with pytest.raises(ValueError):
        rs_construct(4, 8)
    with pytest.raises(ValueError):
        rs_construct(8, 8, fcr=2)


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("m,t,fcr,shorten", [(3, 1, 1, 0), (4, 2, 1, 0),
                                             (8, 8, 0, 51), (8, 16, 1, 0)])
def test_encode_matches_golden(m, t, fcr, shorten):
    code = rs_construct(m, t, shorten=shorten, fcr=fcr)
    rng = np.random.default_rng(m + t)
    msg = rng.integers(0, 1 << m, (5, code.k))
    got = np.asarray(rs_encode(code, msg))
    for b in range(5):
        want = rs_ref.encode_np(msg[b], code.genpoly, code.n, m)
        assert np.array_equal(got[b], want), b
    assert np.array_equal(got[:, :code.k], msg)  # systematic


def test_encode_zero_syndromes():
    code = rs_construct(6, 4)
    rng = np.random.default_rng(3)
    msg = rng.integers(0, 64, (6, code.k))
    cw = np.asarray(rs_encode(code, msg))
    corrected, nerr, ok = (np.asarray(a) for a in rs_decode(code, cw))
    assert ok.all() and not nerr.any()
    assert np.array_equal(corrected, cw)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("m,t,fcr,shorten", [(4, 2, 1, 0), (5, 3, 1, 0),
                                             (8, 8, 0, 51), (8, 16, 1, 0),
                                             (6, 4, 0, 10)])
def test_decode_corrects_up_to_t_symbol_errors(m, t, fcr, shorten):
    code = rs_construct(m, t, shorten=shorten, fcr=fcr)
    rng = np.random.default_rng(m * 100 + t)
    B = 16
    msg = rng.integers(0, 1 << m, (B, code.k))
    cw = np.asarray(rs_encode(code, msg))
    rx = cw.copy()
    nflip = rng.integers(0, t + 1, B)
    for b in range(B):
        pos = rng.choice(code.n, nflip[b], replace=False)
        rx[b, pos] ^= rng.integers(1, 1 << m, nflip[b])  # nonzero deltas
    corrected, nerr, ok = (np.asarray(a) for a in rs_decode(code, rx))
    assert ok.all()
    assert np.array_equal(nerr, nflip)
    assert np.array_equal(corrected, cw)


@pytest.mark.parametrize("m,t,fcr", [(4, 2, 1), (5, 3, 0)])
def test_decode_matches_golden_beyond_t(m, t, fcr):
    code = rs_construct(m, t, fcr=fcr)
    rng = np.random.default_rng(m * 7 + t)
    B = 12
    msg = rng.integers(0, 1 << m, (B, code.k))
    cw = np.asarray(rs_encode(code, msg))
    rx = cw.copy()
    for b in range(B):
        nerr = min(t + 1 + (b % 3), code.n)
        pos = rng.choice(code.n, nerr, replace=False)
        rx[b, pos] ^= rng.integers(1, 1 << m, nerr)
    corrected, nerr, ok = (np.asarray(a) for a in rs_decode(code, rx))
    for b in range(B):
        w_corr, w_nerr, w_ok = rs_ref.decode_np(rx[b], m, t, code.n, fcr)
        assert bool(ok[b]) == w_ok, b
        if w_ok:
            assert int(nerr[b]) == w_nerr and \
                np.array_equal(corrected[b], w_corr), b
        else:
            assert np.array_equal(corrected[b], rx[b]), b


def test_decode_fuzz_matches_golden():
    code = rs_construct(4, 2)
    rng = np.random.default_rng(55)
    B = 40
    rx = rng.integers(0, 16, (B, code.n))
    corrected, nerr, ok = (np.asarray(a) for a in rs_decode(code, rx))
    for b in range(B):
        w_corr, w_nerr, w_ok = rs_ref.decode_np(rx[b], 4, 2, code.n)
        assert bool(ok[b]) == w_ok, b
        if w_ok:
            assert np.array_equal(corrected[b], w_corr), b


def test_errata_all_combos_within_capability():
    # Errors-and-erasures: every (e, f) with 2e + f <= 2t corrects.
    from commpy_tpu.ops.rs import rs_errata_decode

    code = rs_construct(4, 2)  # RS(15,11) t=2
    rng = np.random.default_rng(1)
    cases = [(e, f) for e in range(3) for f in range(5) if 2 * e + f <= 4]
    for e, f in cases:
        for _ in range(15):
            msg = rng.integers(0, 16, (1, code.k))
            cw = np.asarray(rs_encode(code, msg))
            rx = cw.copy()
            mask = np.zeros((1, code.n), bool)
            pos = rng.choice(code.n, e + f, replace=False)
            rx[0, pos[:e]] ^= rng.integers(1, 16, e)
            mask[0, pos[e:]] = True
            rx[0, pos[e:]] = rng.integers(0, 16, f)  # junk incl. correct
            c, n, ok = (np.asarray(a) for a in
                        rs_errata_decode(code, rx, mask))
            assert ok[0] and np.array_equal(c, cw), (e, f)


def test_errata_empty_mask_equals_plain_decode():
    from commpy_tpu.ops.rs import rs_errata_decode

    code = rs_construct(5, 3)
    rng = np.random.default_rng(8)
    B = 20
    msg = rng.integers(0, 32, (B, code.k))
    cw = np.asarray(rs_encode(code, msg))
    rx = cw.copy()
    for b in range(B):
        ne = b % 5  # incl. beyond-t (t=3): both paths must agree
        pos = rng.choice(code.n, ne, replace=False)
        rx[b, pos] ^= rng.integers(1, 32, ne)
    mask = np.zeros((B, code.n), bool)
    c1, n1, o1 = (np.asarray(a) for a in rs_errata_decode(code, rx, mask))
    c2, n2, o2 = (np.asarray(a) for a in rs_decode(code, rx))
    assert np.array_equal(c1, c2) and np.array_equal(n1, n2)
    assert np.array_equal(o1, o2)


def test_errata_ccsds_boundary():
    # RS(255,223): e=8 errors + f=16 erasures hits 2e+f = 2t exactly.
    from commpy_tpu.ops.rs import rs_errata_decode

    code = rs_construct(8, 16)
    rng = np.random.default_rng(12)
    msg = rng.integers(0, 256, (4, code.k))
    cw = np.asarray(rs_encode(code, msg))
    rx = cw.copy()
    mask = np.zeros((4, code.n), bool)
    for b in range(4):
        pos = rng.choice(code.n, 24, replace=False)
        rx[b, pos[:8]] ^= rng.integers(1, 256, 8)
        mask[b, pos[8:]] = True
        rx[b, pos[8:]] = rng.integers(0, 256, 16)
    c, n, ok = (np.asarray(a) for a in rs_errata_decode(code, rx, mask))
    assert ok.all()
    assert np.array_equal(c, cw)
    # one EXTRA error beyond the boundary must not decode cleanly:
    # corrupt a position that is neither erased nor already in error
    rx2 = rx.copy()
    touched = mask[0] | (rx[0] != cw[0])
    extra = int(np.flatnonzero(~touched)[0])
    rx2[0, extra] ^= 1
    c2, n2, ok2 = (np.asarray(a) for a in rs_errata_decode(code, rx2, mask))
    assert not (ok2[0] and np.array_equal(c2[0], cw[0]))


def test_rs_awgn_link_high_vs_low_snr():
    import jax
    from commpy_tpu.models import make_rs_awgn_link

    code = rs_construct(8, 8, shorten=51, fcr=0)  # RS(204,188), 256-QAM
    link = make_rs_awgn_link(code=code)
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    assert int(link.link_step(keys, link.noise_std_fn(40.0))) == 0
    assert int(link.link_step(keys, link.noise_std_fn(15.0))) > 0
    # gmd option runs (regime caveat in its docstring: on plain AWGN
    # reliabilities it does not beat hard decoding)
    gmd = make_rs_awgn_link(code=code, decoder="gmd")
    assert int(gmd.link_step(keys, gmd.noise_std_fn(40.0))) == 0
    with pytest.raises(ValueError):
        make_rs_awgn_link(code=code, decoder="nope")


def test_gmd_soft_decoding_beats_hard_beyond_t():
    # Forney GMD: t+1 batched erasure trials over the errata decoder.
    # With t+1 errors sitting at the least-reliable symbols, hard
    # decoding fails but GMD recovers (erasing them costs only f, not
    # 2e, in the 2e + f <= 2t budget).
    from commpy_tpu.ops.rs import rs_gmd_decode

    code = rs_construct(4, 2)  # t=2
    rng = np.random.default_rng(0)
    gmd_wins = hard_ok = 0
    T = 30
    for _ in range(T):
        msg = rng.integers(0, 16, (1, code.k))
        cw = np.asarray(rs_encode(code, msg))
        rx = cw.copy()
        pos = rng.choice(code.n, 3, replace=False)  # 3 > t errors
        rx[0, pos] ^= rng.integers(1, 16, 3)
        rel = np.full((1, code.n), 10.0, np.float32)
        rel[0, pos] = rng.uniform(0.1, 1.0, 3)
        c, n, ok = (np.asarray(a) for a in rs_gmd_decode(code, rx, rel))
        if ok[0] and np.array_equal(c, cw):
            gmd_wins += 1
        _, _, okh = (np.asarray(a) for a in rs_decode(code, rx))
        hard_ok += int(okh[0])
    assert gmd_wins == T  # measured 40/40 at these reliabilities
    assert hard_ok < T  # plain hard decoding cannot do this


def test_gmd_matches_hard_decode_within_t():
    # With uniform reliabilities and <= t errors, GMD must return the
    # hard-decoding result.
    from commpy_tpu.ops.rs import rs_gmd_decode

    code = rs_construct(5, 3)
    rng = np.random.default_rng(4)
    B = 12
    msg = rng.integers(0, 32, (B, code.k))
    cw = np.asarray(rs_encode(code, msg))
    rx = cw.copy()
    for b in range(B):
        pos = rng.choice(code.n, b % 4, replace=False)
        rx[b, pos] ^= rng.integers(1, 32, b % 4)
    rel = np.ones((B, code.n), np.float32)
    c, n, ok = (np.asarray(a) for a in rs_gmd_decode(code, rx, rel))
    assert ok.all()
    assert np.array_equal(c, cw)


def test_dvbt_rs204_burst():
    # DVB-T outer code: RS(204,188) t=8 fcr=0 — correct an 8-symbol burst.
    code = rs_construct(8, 8, shorten=51, fcr=0)
    rng = np.random.default_rng(7)
    msg = rng.integers(0, 256, (4, 188))
    cw = np.asarray(rs_encode(code, msg))
    rx = cw.copy()
    rx[:, 100:108] ^= rng.integers(1, 256, (4, 8))
    corrected, nerr, ok = (np.asarray(a) for a in rs_decode(code, rx))
    assert ok.all() and (nerr == 8).all()
    assert np.array_equal(corrected, cw)
