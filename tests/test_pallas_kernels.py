"""Pallas kernel equivalence tests (interpret mode on CPU)."""
import numpy as np

from commpy_tpu.ops.convcode import encode_scan
from commpy_tpu.ops.trellis import Trellis
from commpy_tpu.ops.viterbi import viterbi_decode_device


def _roundtrip(tr, B=4, L=300, noise=1.5, seed=0):
    rng = np.random.RandomState(seed)
    msgs = rng.randint(0, 2, (B, L))
    coded, _ = encode_scan(msgs, tr)
    llr = (2.0 * np.asarray(coded) - 1) * 4 + rng.randn(B, L * tr.n) * noise
    return msgs, llr


def test_pallas_acs_matches_xla_soft():
    for mem, g in ((np.array([2]), np.array([[5, 7]])),
                   (np.array([6]), np.array([[0o133, 0o171]])),
                   (np.array([8]), np.array([[0o561, 0o753]]))):
        tr = Trellis(mem, g)
        msgs, llr = _roundtrip(tr)
        a = np.asarray(viterbi_decode_device(llr, tr, 20, "soft",
                                             backend="xla"))
        b = np.asarray(viterbi_decode_device(llr, tr, 20, "soft",
                                             backend="pallas"))
        np.testing.assert_array_equal(a, b)


def test_pallas_acs_matches_xla_hard():
    tr = Trellis(np.array([6]), np.array([[0o133, 0o171]]))
    rng = np.random.RandomState(1)
    msgs = rng.randint(0, 2, (3, 200))
    coded, _ = encode_scan(msgs, tr)
    h = np.asarray(coded).astype(np.float32)
    flips = rng.rand(*h.shape) < 0.03
    h[flips] = 1 - h[flips]
    a = np.asarray(viterbi_decode_device(h, tr, 20, "hard", backend="xla"))
    b = np.asarray(viterbi_decode_device(h, tr, 20, "hard", backend="pallas"))
    np.testing.assert_array_equal(a, b)


def test_pallas_unquantized():
    tr = Trellis(np.array([2]), np.array([[5, 7]]))
    msgs, llr = _roundtrip(tr, noise=0.7)
    a = np.asarray(
        viterbi_decode_device(llr, tr, 15, "unquantized", backend="xla")
    )
    b = np.asarray(
        viterbi_decode_device(llr, tr, 15, "unquantized", backend="pallas")
    )
    np.testing.assert_array_equal(a, b)


def test_bcjr_kernel_matches_xla_core():
    # The fused kernel must emit the same prior-free APP differences as
    # the XLA lax.scan core — including odd T, odd lane counts (pad
    # path), max-log, and linear-log-MAP staying within its published
    # approximation error.
    import jax
    import jax.numpy as jnp
    from commpy_tpu.kernels.bcjr import bcjr_appdiff_pallas
    from commpy_tpu.ops.turbo import _log_bcjr

    tr = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
    rng = np.random.RandomState(3)
    nv = 0.5
    for T, R, max_log in ((64, 256, False), (33, 100, True)):
        syn, pan, li = (rng.randn(T, R).astype(np.float32) * 2
                        for _ in range(3))
        e = np.asarray(jax.jit(
            lambda s, p, l: bcjr_appdiff_pallas(
                s / nv, p / nv, l, tr, max_log=max_log)
        )(syn, pan, li))
        lappr, _ = _log_bcjr(syn.T, pan.T, li.T, jnp.float32(nv), tr,
                             compute_decode=False, max_log=max_log)
        np.testing.assert_allclose(e, np.asarray(lappr).T - li,
                                   rtol=2e-4, atol=2e-3)
    # linear-log-MAP: bounded deviation from exact log-MAP (the lse2
    # correction error is <= ~0.03 per reduction, a few times that
    # accumulated over the frame)
    T, R = 48, 128
    syn, pan, li = (rng.randn(T, R).astype(np.float32) * 2
                    for _ in range(3))
    e_exact = np.asarray(bcjr_appdiff_pallas(syn / nv, pan / nv, li, tr))
    e_lin = np.asarray(
        bcjr_appdiff_pallas(syn / nv, pan / nv, li, tr, lse="linear"))
    assert np.max(np.abs(e_exact - e_lin)) < 0.7
    assert np.mean(np.abs(e_exact - e_lin)) < 0.15


def test_bcjr_kernel_masked_matches_xla_core():
    # masked variant: halo positions pass through, exact-start vs
    # uniform-start rows — vs the _bcjr_masked XLA twin.
    import jax
    import jax.numpy as jnp
    from commpy_tpu.kernels.bcjr import bcjr_appdiff_pallas
    from commpy_tpu.ops.turbo import _bcjr_masked

    tr = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
    rng = np.random.RandomState(4)
    T, R, nv = 40, 256, 0.5
    syn, pan, li = (rng.randn(T, R).astype(np.float32) * 2
                    for _ in range(3))
    valid = np.ones((T, R), np.float32)
    valid[:4] = 0.0
    valid[-5:] = 0.0
    first = np.zeros((R,), bool)
    first[:128] = True
    e = np.asarray(jax.jit(
        lambda s, p, l, v, f: bcjr_appdiff_pallas(
            s / nv, p / nv, l, tr, valid=v, first=f)
    )(syn, pan, li, jnp.asarray(valid), jnp.asarray(first)))
    apps = np.asarray(_bcjr_masked(
        jnp.asarray(syn.T), jnp.asarray(pan.T), jnp.asarray(li.T),
        jnp.float32(nv), tr, jnp.asarray(valid.T),
        jnp.asarray(first), max_log=False))
    want = (apps[..., 1] - apps[..., 0]).T
    live = valid > 0.5
    np.testing.assert_allclose(e[live], want[live], rtol=2e-4, atol=2e-3)


def test_bcjr_kernel_s8_trellis():
    # LTE-style 8-state RSC (memory 3): exercises the P=1 sublane
    # layout (S=8 fills the tile exactly; no chunk stacking) in both
    # kernels and the NII boundary path.
    import jax
    from commpy_tpu.channelcoding import RandInterlv
    from commpy_tpu.ops import turbo as T

    np.random.seed(41)
    tr = Trellis(np.array([3]), np.array([[1, 15]]), 13, "rsc")
    assert tr.number_states == 8
    L = 256
    interlv = RandInterlv(L, 2)
    msg = np.random.randint(0, 2, (3, L))
    s, p1, p2 = T.turbo_encode_device(msg, tr, tr, interlv.p_array)
    sigma2 = 0.5
    noise = np.random.randn(3, 3, L) * np.sqrt(sigma2)
    sy = 2.0 * np.asarray(s) - 1 + noise[0]
    py1 = 2.0 * np.asarray(p1) - 1 + noise[1]
    py2 = 2.0 * np.asarray(p2) - 1 + noise[2]
    args = (sy, py1, py2, tr, sigma2, 3, interlv.p_array)
    d_x = np.asarray(T.turbo_decode_device(*args, backend="xla"))
    d_p = np.asarray(T.turbo_decode_device(*args, backend="pallas"))
    np.testing.assert_array_equal(d_x, d_p)
    d_n = np.asarray(T.turbo_decode_device(
        *args, backend="pallas", window=(64, 0), window_init="nii"))
    assert (d_n != msg).sum() == 0


def test_bcjr_kernel_boundary_matches_xla_core():
    # boundary (NII) handoff: same APPs and — up to the XLA twin's
    # per-lane normalization — the same final carries.
    import jax
    import jax.numpy as jnp
    from commpy_tpu.kernels.bcjr import bcjr_appdiff_pallas
    from commpy_tpu.ops.turbo import _bcjr_masked

    tr = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
    S = tr.number_states
    rng = np.random.RandomState(5)
    T, R, nv = 48, 256, 0.5
    syn, pan, li = (rng.randn(T, R).astype(np.float32) * 2
                    for _ in range(3))
    a0 = rng.randn(S, R).astype(np.float32)
    bT = rng.randn(S, R).astype(np.float32)
    e, af, bf = jax.jit(
        lambda s, p, l, a, b: bcjr_appdiff_pallas(
            s / nv, p / nv, l, tr, boundary=(a, b))
    )(syn, pan, li, a0, bT)
    apps, af_x, bf_x = _bcjr_masked(
        jnp.asarray(syn.T), jnp.asarray(pan.T), jnp.asarray(li.T),
        jnp.float32(nv), tr, jnp.ones((R, T), jnp.float32),
        jnp.zeros((R,), bool), max_log=False,
        alpha_init=jnp.asarray(a0.T), beta_init=jnp.asarray(bT.T),
        return_carries=True)
    want = np.asarray(apps[..., 1] - apps[..., 0]).T
    np.testing.assert_allclose(np.asarray(e), want, rtol=2e-4, atol=2e-3)
    # carries agree up to a per-lane additive shift
    for got, ref in ((af, af_x), (bf, bf_x)):
        g = np.asarray(got).T
        r = np.asarray(ref)
        g = g - g.max(axis=1, keepdims=True)
        r = r - r.max(axis=1, keepdims=True)
        np.testing.assert_allclose(g, r, rtol=2e-4, atol=2e-3)


def test_acs_forward_exact_precision_flag():
    # exact=True (Precision.HIGHEST metric matmuls) must keep decisions
    # identical to the default on backends without bf16 MXU rounding
    import jax.numpy as jnp
    import numpy as np

    from commpy_tpu.kernels.viterbi_acs import acs_forward_pallas
    from commpy_tpu.ops.trellis import Trellis

    tr = Trellis(np.array([6]), np.array([[0o133, 0o171]]))
    r = jnp.asarray(np.random.RandomState(0).randn(4, 96, 2)
                    .astype(np.float32))
    d0, b0 = acs_forward_pallas(r, tr, "soft")
    d1, b1 = acs_forward_pallas(r, tr, "soft", exact=True)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))


def test_pallas_guards_raise():
    # non-shift trellises and degenerate tb_depth raise loudly instead
    # of decoding garbage
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from commpy_tpu.kernels.viterbi_acs import acs_forward_pallas
    from commpy_tpu.ops.trellis import Trellis
    from commpy_tpu.ops.viterbi import viterbi_decode_device

    rsc = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
    from commpy_tpu.ops.viterbi import _is_shift_structured
    r = jnp.zeros((2, 32, 2), jnp.float32)
    if not _is_shift_structured(rsc):
        with pytest.raises(NotImplementedError):
            acs_forward_pallas(r, rsc, "soft")
    tr = Trellis(np.array([2]), np.array([[5, 7]]))
    with pytest.raises(ValueError, match="tb_depth"):
        viterbi_decode_device(np.zeros(64), tr, tb_depth=1)
