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


def test_bcjr_butterfly_matches_plain():
    # The counter-propagating butterfly kernel halves the sequential
    # chain (T iterations instead of 2T) but must emit the exact same
    # APP rows as the plain forward-then-backward kernel — including
    # odd T (the crossing slot), masked windows, and max-log.
    import jax
    import jax.numpy as jnp
    from commpy_tpu.kernels.bcjr import bcjr_appdiff_pallas

    tr = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
    rng = np.random.RandomState(3)
    for T, max_log in ((64, False), (33, True)):
        syn, pan, li = (rng.randn(T, 256).astype(np.float32) * 2
                        for _ in range(3))
        outs = [
            np.asarray(jax.jit(
                lambda s, p, l, bf=bf: bcjr_appdiff_pallas(
                    s, p, l, tr, max_log=max_log, butterfly=bf)
            )(syn, pan, li))
            for bf in (False, True)
        ]
        np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=2e-4)
    # masked variant: halo positions pass through, exact-start rows
    T = 40
    syn, pan, li = (rng.randn(T, 256).astype(np.float32) * 2
                    for _ in range(3))
    valid = np.ones((T, 256), np.float32)
    valid[:4] = 0.0
    valid[-5:] = 0.0
    first = np.zeros((256,), bool)
    first[:128] = True
    outs = [
        np.asarray(jax.jit(
            lambda s, p, l, v, f, bf=bf: bcjr_appdiff_pallas(
                s, p, l, tr, valid=v, first=f, butterfly=bf)
        )(syn, pan, li, jnp.asarray(valid), jnp.asarray(first)))
        for bf in (False, True)
    ]
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=2e-4)


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


def test_bcjr_butterfly_boundary_matches_plain():
    # boundary (NII) handoff composed with the butterfly schedule:
    # same APPs and final carries as the plain kernel.
    import jax
    import jax.numpy as jnp
    from commpy_tpu.kernels.bcjr import bcjr_appdiff_pallas

    tr = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
    S = tr.number_states
    rng = np.random.RandomState(5)
    T, R = 48, 256
    syn, pan, li = (rng.randn(T, R).astype(np.float32) * 2
                    for _ in range(3))
    a0 = rng.randn(S, R).astype(np.float32)
    bT = rng.randn(S, R).astype(np.float32)
    outs = []
    for bf in (False, True):
        outs.append(jax.jit(
            lambda s, p, l, a, b, bf=bf: bcjr_appdiff_pallas(
                s, p, l, tr, boundary=(a, b), butterfly=bf)
        )(syn, pan, li, a0, bT))
    for x, y in zip(outs[0], outs[1]):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-5, atol=2e-4)


def test_acs_forward_exact_precision_flag():
    # exact=True (Precision.HIGHEST metric matmuls) must keep decisions
    # identical to the default on backends without bf16 MXU rounding
    import jax.numpy as jnp
    import numpy as np

    from commpy_tpu.kernels.viterbi_acs import acs_forward_pallas
    from commpy_tpu.ops.trellis import Trellis

    tr = Trellis(np.array([6]), np.array([[133, 171]]))
    r = jnp.asarray(np.random.RandomState(0).randn(4, 96, 2)
                    .astype(np.float32))
    d0, b0 = acs_forward_pallas(r, tr, "soft")
    d1, b1 = acs_forward_pallas(r, tr, "soft", exact=True)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))


def test_acs_radix2_matches_radix1():
    # the 2-step fused ACS (radix=2) must reproduce radix-1 decisions
    # and argmin states exactly (interpret mode; real-Mosaic behavior
    # at S >= 64 is a known open issue, see the acs_forward_pallas doc)
    import jax.numpy as jnp
    import numpy as np

    from commpy_tpu.kernels.viterbi_acs import acs_forward_pallas
    from commpy_tpu.ops.trellis import Trellis

    for mem, g in ((2, [[5, 7]]), (6, [[133, 171]])):
        tr = Trellis(np.array([mem]), np.array(g))
        r = jnp.asarray(np.random.RandomState(1).randn(4, 64, 2)
                        .astype(np.float32))
        d1, b1 = acs_forward_pallas(r, tr, "soft", radix=1)
        d2, b2 = acs_forward_pallas(r, tr, "soft", radix=2)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


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
