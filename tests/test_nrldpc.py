"""5G-NR-style QC-LDPC family (ops/nrldpc.py): structure, encode,
rate matching, decode through the generic QC machinery.

Reference scope anchor: CommPy's largest shipped LDPC is WiMAX n=1440
(commpy/channelcoding/ldpc.py:51); this family is beyond-reference,
provenance-labeled synthetic-NR-style (see the module docstring).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from commpy_tpu.ops.nrldpc import (
    NR_LIFTING_SETS, nr_base_graph, nr_code_params, nr_encode_device,
    nr_lifting_sizes, nr_rate_match, nr_rate_recover, nr_select_bg,
    parse_nr_base_graph, validate_nr_base_graph,
)
from commpy_tpu.ops.qcldpc import (
    expand_base_matrix, qc_bp_decode_device, qc_code_params, qc_girth,
)


def test_lifting_sets_standard():
    # 8 sets a*2^j <= 384 -> 51 distinct sizes, min 2, max 384
    assert set(NR_LIFTING_SETS) == {2, 3, 5, 7, 9, 11, 13, 15}
    zs = nr_lifting_sizes()
    assert len(zs) == 51 and zs[0] == 2 and zs[-1] == 384
    assert 384 in NR_LIFTING_SETS[3] and 208 in NR_LIFTING_SETS[13]
    with pytest.raises(ValueError, match="lifting size"):
        nr_base_graph(1, 100)  # 100 = 25*4: 25 is not a valid a


def test_select_bg_rule():
    assert nr_select_bg(100, 0.5) == 2     # tiny block
    assert nr_select_bg(3000, 0.5) == 2    # <=3824 and rate <= 0.67
    assert nr_select_bg(8000, 0.2) == 2    # low rate
    assert nr_select_bg(8000, 0.5) == 1


@pytest.mark.parametrize("bg,Z", [(1, 52), (2, 52), (2, 104)])
def test_structure_and_girth(bg, Z):
    Bm = np.asarray(nr_base_graph(bg, Z))
    validate_nr_base_graph(Bm, bg, Z)
    assert qc_girth(nr_base_graph(bg, Z), Z) >= 6
    # shape constants
    Mb, Nb = Bm.shape
    assert (Mb, Nb) == ((46, 68) if bg == 1 else (42, 52))
    kb = Nb - Mb
    # punctured columns carry the highest degree
    deg = (Bm >= 0).sum(axis=0)
    assert deg[0] > deg[2:kb].max() and deg[1] > deg[2:kb].max()


@pytest.mark.parametrize("bg,Z", [(2, 26), (1, 26)])
def test_structured_encoder_matches_dense_solve(bg, Z):
    """The O(edges) triangular encoder against the generic dense GF(2)
    parity solve on the same base matrix."""
    p = nr_code_params(bg, Z)
    dense = qc_code_params(np.asarray(p["base_matrix"]), Z,
                           compute_encoder=True)
    rng = np.random.RandomState(3)
    msg = jnp.asarray(rng.randint(0, 2, (5, p["k_bits"])), jnp.int8)
    a = np.asarray(nr_encode_device(msg, p))
    P = np.asarray(dense["encode_matrix"])
    par = (np.asarray(msg) @ P.T) % 2
    b = np.concatenate([np.asarray(msg), par.astype(np.int8)], axis=-1)
    assert np.array_equal(a, b)


@pytest.mark.parametrize("bg,Z", [(1, 52), (2, 104)])
def test_encode_syndrome_zero_and_noiseless_decode(bg, Z):
    p = nr_code_params(bg, Z)
    rng = np.random.RandomState(0)
    msg = jnp.asarray(rng.randint(0, 2, (4, p["k_bits"])), jnp.int8)
    cw = nr_encode_device(msg, p)
    H = expand_base_matrix(np.asarray(p["base_matrix"]), Z)
    assert ((H @ np.asarray(cw).T) % 2).sum() == 0
    llr = jnp.asarray((1.0 - 2.0 * np.asarray(cw, np.float32)) * 6.0)
    dec, _ = qc_bp_decode_device(llr, p, "MSA", 10, backend="xla")
    assert np.array_equal(np.asarray(dec), np.asarray(cw))
    # layered schedule too
    dec2, _ = qc_bp_decode_device(llr, p, "MSA", 6, backend="xla",
                                  schedule="layered")
    assert np.array_equal(np.asarray(dec2), np.asarray(cw))


def test_rate_match_shapes_and_recover():
    p = nr_code_params(2, 52)
    n, Z = p["n_vnodes"], p["Z"]
    rng = np.random.RandomState(1)
    cw = jnp.asarray(rng.randint(0, 2, (3, n)), jnp.int8)
    # transmit-all (E = n - 2Z): puncture region skipped exactly
    E = n - 2 * Z
    tx = nr_rate_match(p, cw, E)
    assert np.array_equal(np.asarray(tx), np.asarray(cw)[:, 2 * Z:])
    rec = np.asarray(nr_rate_recover(p, (1.0 - 2.0 * np.asarray(
        tx, np.float32)), E))
    assert (rec[:, :2 * Z] == 0).all()
    # repetition: E beyond the buffer wraps and ACCUMULATES
    E2 = E + 3 * Z
    tx2 = nr_rate_match(p, cw, E2)
    assert np.array_equal(np.asarray(tx2)[:, E:],
                          np.asarray(cw)[:, 2 * Z:2 * Z + 3 * Z])
    rec2 = np.asarray(nr_rate_recover(
        p, jnp.ones((3, E2), jnp.float32), E2))
    assert (rec2[:, 2 * Z:2 * Z + 3 * Z] == 2.0).all()
    assert (rec2[:, 2 * Z + 3 * Z:] == 1.0).all()
    with pytest.raises(ValueError, match="E="):
        nr_rate_recover(p, jnp.ones((3, 7)), 8)


def test_punctured_systematic_bits_recovered():
    """The defining NR property: the first 2Z SYSTEMATIC bits are never
    transmitted, yet the decoder recovers them from the parities (their
    columns carry the highest degree for exactly this purpose)."""
    p = nr_code_params(2, 52)
    n, k, Z = p["n_vnodes"], p["k_bits"], p["Z"]
    rng = np.random.RandomState(7)
    msg = jnp.asarray(rng.randint(0, 2, (8, k)), jnp.int8)
    cw = nr_encode_device(msg, p)
    E = n - 2 * Z
    tx = np.asarray(nr_rate_match(p, cw, E), np.float32)
    # clean channel, BPSK LLRs; punctured region contributes zeros
    llr = nr_rate_recover(p, (1.0 - 2.0 * tx) * 5.0, E)
    dec, _ = qc_bp_decode_device(llr, p, "MSA", 25, backend="xla")
    assert np.array_equal(np.asarray(dec)[:, :k], np.asarray(msg))


@pytest.mark.parametrize("bg,Z,snr_gap", [(2, 52, 4.0)])
def test_noisy_ber_beats_raw_channel(bg, Z, snr_gap):
    p = nr_code_params(bg, Z)
    n, k = p["n_vnodes"], p["k_bits"]
    rng = np.random.RandomState(5)
    msg = jnp.asarray(rng.randint(0, 2, (16, k)), jnp.int8)
    cw = np.asarray(nr_encode_device(msg, p), np.float32)
    sigma = 0.7  # ~3.1 dB Es/N0 BPSK
    y = (1.0 - 2.0 * cw) + rng.randn(*cw.shape) * sigma
    raw_ber = ((y < 0).astype(np.int8) != cw).mean()
    llr = jnp.asarray(2.0 * y / sigma**2)
    dec, _ = qc_bp_decode_device(llr, p, "MSA", 25, backend="xla")
    coded_ber = (np.asarray(dec) != cw).mean()
    assert raw_ber > 0.02  # the channel is genuinely noisy
    assert coded_ber < raw_ber / 10, (coded_ber, raw_ber)


def test_parse_and_validate_roundtrip():
    Bm = np.asarray(nr_base_graph(2, 52))
    lines = [f"{i} {j} {Bm[i, j]}" for i in range(Bm.shape[0])
             for j in range(Bm.shape[1]) if Bm[i, j] >= 0]
    txt = "# synthetic table\n" + "\n".join(lines) + "\n"
    parsed = parse_nr_base_graph(txt)
    assert np.array_equal(parsed, Bm)
    validate_nr_base_graph(parsed, 2, 52)
    with pytest.raises(ValueError, match="duplicate"):
        parse_nr_base_graph("0 0 1\n0 0 2")
    with pytest.raises(ValueError, match="row col shift"):
        parse_nr_base_graph("0 0\n")
    bad = Bm.copy()
    bad[5, Bm.shape[1] - 1] = 3  # break a degree-1 identity column
    with pytest.raises(ValueError, match="degree-1"):
        validate_nr_base_graph(bad, 2, 52)
    with pytest.raises(ValueError, match="shift >= Z"):
        validate_nr_base_graph(np.where(Bm >= 0, Bm + 52, -1), 2, 52)


def test_provenance_labels():
    p = nr_code_params(1, 52)
    assert p["provenance"] == "synthetic-nr-style"
    assert p["parity_structure"] == "nr_triangular"
