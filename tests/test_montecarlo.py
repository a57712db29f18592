"""Monte-Carlo engine: checkpoint/resume, early stopping, determinism."""
import json
import os
import tempfile

import numpy as np
import jax

from commpy_tpu.models import make_conv_awgn_link
from commpy_tpu.ops.trellis import Trellis
from commpy_tpu.parallel import make_mesh, montecarlo_ber


def _link():
    tr = Trellis(np.array([2]), np.array([[5, 7]]))
    return make_conv_awgn_link(
        trellis=tr, modulation_m=2, frame_bits=200, decoding_type="hard"
    )


def test_checkpoint_resume_identical():
    link = _link()
    snrs = [2.0, 6.0]
    kw = dict(
        noise_std_fn=link.noise_std_fn, frame_bits=link.frame_bits,
        key=jax.random.PRNGKey(5), frames_per_round=16, max_rounds=6,
        err_min=10**9, mesh=make_mesh(8),
    )
    full = montecarlo_ber(link.link_step, snrs, **kw)

    with tempfile.TemporaryDirectory() as d:
        ckpt = os.path.join(d, "sweep.json")
        # run 3 rounds, "crash"
        montecarlo_ber(link.link_step, snrs, checkpoint_path=ckpt,
                       **{**kw, "max_rounds": 3})
        state = json.load(open(ckpt))
        assert state["round"] == 3
        # resume to 6 rounds
        resumed = montecarlo_ber(link.link_step, snrs,
                                 checkpoint_path=ckpt, **kw)
    np.testing.assert_array_equal(full.bit_errors, resumed.bit_errors)
    np.testing.assert_array_equal(full.bits_sent, resumed.bits_sent)


def test_early_stop_freezes_points():
    link = _link()
    res = montecarlo_ber(
        link.link_step, [0.0, 12.0], link.noise_std_fn, link.frame_bits,
        jax.random.PRNGKey(1), frames_per_round=16, max_rounds=8,
        err_min=50, mesh=make_mesh(8),
    )
    # low SNR hits err_min fast and freezes; high SNR keeps running
    assert res.bit_errors[0] >= 50
    assert res.bits_sent[0] <= res.bits_sent[1]


def test_round_fn_deterministic():
    from commpy_tpu.parallel import make_round_fn

    link = _link()
    stds = [float(link.noise_std_fn(s)) for s in (0.0, 4.0)]
    rf = make_round_fn(link.link_step, stds, 16, make_mesh(8))
    a = np.asarray(rf(jax.random.PRNGKey(3)))
    b = np.asarray(rf(jax.random.PRNGKey(3)))
    np.testing.assert_array_equal(a, b)
