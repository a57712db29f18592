"""IDD device path + Wifi80211 compat-class smoke tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from commpy_tpu.channels import MIMOFlatChannel
from commpy_tpu.models.idd import idd_decoder_device
from commpy_tpu.ops import modem as M
from commpy_tpu.ops.mimo import kbest_device
from commpy_tpu.wifi80211 import Wifi80211


def test_idd_device_improves_or_matches_single_pass():
    """IDD with an LDPC-free toy decoder must at least reproduce the
    detector output when the decoder is the identity."""
    rng = np.random.RandomState(0)
    nb, m, V = 2, 4, 8
    const = jnp.asarray(M.qam_constellation(m), jnp.complex64)
    bps = 2
    bits = rng.randint(0, 2, V * nb * bps)
    sym = np.asarray(M.modulate(jnp.asarray(bits), const, bps)).reshape(V, nb)
    h = (rng.randn(V, nb, nb) + 1j * rng.randn(V, nb, nb)) * np.sqrt(0.5)
    y = np.einsum("vrt,vt->vr", h, sym)
    y = y + (rng.randn(V, nb) + 1j * rng.randn(V, nb)) * 0.05
    noise_var = 0.01

    def detector(yv, hv, nv, a_priori):
        return kbest_device(yv, hv, const, 8, nv, "soft", bps)

    decode = idd_decoder_device(
        detector,
        decoder=lambda l: l,  # identity SISO decoder
        decision=lambda l: (l < 0).astype(jnp.int8),  # kbest LLR: + -> 0
        n_it=2,
    )
    out = np.asarray(
        decode(jnp.asarray(y), jnp.asarray(h), noise_var,
               jnp.zeros(V * nb * bps, jnp.float32))
    )
    assert np.array_equal(out, bits)


@pytest.mark.slow
def test_wifi80211_compat_class():
    """Reference-API Wifi80211 end-to-end (small Monte-Carlo budget)."""
    from commpy_tpu.channels import SISOFlatChannel

    np.random.seed(8071996)
    wifi = Wifi80211(mcs=1)
    channel = SISOFlatChannel(None, (1 + 0j, 0))
    BERs, BEs, CEs, NCs = wifi.link_performance(
        channel, SNRs=np.array([12.0]), tx_max=4, err_min=10, send_chunk=600
    )
    assert BERs.shape == (1,)
    assert BERs[0] < 0.05  # QPSK 1/2 at 12 dB decodes essentially clean
