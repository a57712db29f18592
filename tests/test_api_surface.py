"""API surface parity: every public symbol of every reference module must
exist (and be callable/instantiable where applicable) in the commpy_tpu
shims, so a CommPy user can switch imports unchanged."""
import importlib

import pytest

# reference module -> our module (same public surface expected)
MODULE_MAP = {
    "commpy.utilities": "commpy_tpu.utilities",
    "commpy.filters": "commpy_tpu.filters",
    "commpy.sequences": "commpy_tpu.sequences",
    "commpy.impairments": "commpy_tpu.impairments",
    "commpy.modulation": "commpy_tpu.modulation",
    "commpy.channels": "commpy_tpu.channels",
    "commpy.links": "commpy_tpu.links",
    "commpy.channelcoding": "commpy_tpu.channelcoding",
    "commpy.channelcoding.convcode": "commpy_tpu.channelcoding.convcode",
    "commpy.channelcoding.ldpc": "commpy_tpu.channelcoding.ldpc",
    "commpy.channelcoding.gfields": "commpy_tpu.channelcoding.gfields",
    "commpy.channelcoding.algcode": "commpy_tpu.channelcoding.algcode",
    "commpy.channelcoding.interleavers": "commpy_tpu.channelcoding.interleavers",
}


@pytest.mark.parametrize("ref_name,our_name", sorted(MODULE_MAP.items()))
def test_public_symbols_present(ref_name, our_name):
    ref = pytest.importorskip(ref_name)
    ours = importlib.import_module(our_name)
    public = getattr(ref, "__all__", None)
    if public is None:
        public = [n for n in dir(ref) if not n.startswith("_")]
    missing = [n for n in public if not hasattr(ours, n)]
    assert not missing, f"{our_name} missing reference symbols: {missing}"


def test_turbo_symbols_present():
    # reference turbo module has no __all__; check its de-facto API
    import commpy_tpu.channelcoding.turbo as ours

    for name in ("turbo_encode", "map_decode", "turbo_decode"):
        assert hasattr(ours, name)


def test_wifi80211_class_present():
    from commpy_tpu.wifi80211 import Wifi80211

    w = Wifi80211(mcs=3)
    assert w.get_modem().num_bits_symbol == 4
    assert w._get_coding() == (1, 2)


def test_top_level_star_exports():
    # reference commpy/__init__.py star-imports filters, modulation,
    # impairments, sequences, channels
    import commpy_tpu as ct

    for name in (
        "rcosfilter", "rrcosfilter", "QAMModem", "PSKModem", "ofdm_tx",
        "kbest", "mimo_ml", "add_frequency_offset", "pnsequence",
        "zcsequence", "SISOFlatChannel", "MIMOFlatChannel", "bec", "bsc",
        "awgn",
    ):
        assert hasattr(ct, name), name
