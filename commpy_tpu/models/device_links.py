"""Batched end-to-end link pipelines (the TPU-native "model zoo").

Each builder returns a :class:`DeviceLink` whose ``link_step(keys [F,2],
noise_std) -> bit_errors`` simulates a batch of frames entirely on device:
random bits -> FEC encode -> map -> channel -> demap -> decode -> xor-count.
These are the five BASELINE configurations plus the generic pieces they
compose from; the Monte-Carlo engine (`commpy_tpu.parallel.montecarlo`)
shards the frame axis over the mesh.

Conventions follow the reference link stack (links.py, wifi80211.py):
SNR_dB = (Eb/N0)_dB + 10 log10(Rc * Mc); complex AWGN noise std per
channels.py:52-74; Viterbi 'soft' consumes LLRs with positive => bit 1;
LDPC BP consumes LLRs with positive => bit 0 (ldpc.py signbit decision).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import modem as M
from ..ops import ofdm as OFDM
from ..ops.channel import snr_to_noise_std
from ..ops.convcode import depuncture_device, encode_scan, puncture_mask
from ..ops.ldpc import build_matrix, ldpc_encode_device
from ..ops.mimo import best_first_device, kbest_device
from ..ops.trellis import Trellis
from ..ops.turbo import turbo_decode_device, turbo_encode_device
from ..ops.viterbi import viterbi_decode_device

__all__ = [
    "DeviceLink",
    "make_conv_awgn_link",
    "make_rrc_conv_awgn_link",
    "make_turbo_awgn_link",
    "make_polar_awgn_link",
    "make_qcldpc_awgn_link",
    "make_ofdm_qcldpc_link",
    "make_ldpc_rayleigh_link",
    "make_kbest_mimo_link",
    "make_bestfirst_ldpc_mimo_link",
    "make_ofdm_mimo_conv_link",
]


@dataclass
class DeviceLink:
    """A jit-ready batched link simulation."""

    link_step: Callable  # (keys [F, 2], noise_std) -> bit errors (scalar)
    frame_bits: int
    noise_std_fn: Callable  # snr_db -> noise_std
    name: str = "link"
    extras: dict = field(default_factory=dict)


def _gen_bits(keys, n_bits):
    def one(k):
        return jax.random.bernoulli(k, 0.5, (n_bits,)).astype(jnp.int8)

    return jax.vmap(one)(keys)


def _frame_crandn(keys, shape, tag: int):
    """Per-frame complex normals: [F, *shape], keyed by fold_in(key_f, tag).

    Keying randomness per frame (not per batch) makes the simulation
    invariant to how the frame axis is sharded across devices.
    """

    def one(k):
        kk = jax.random.fold_in(k, tag)
        kr, ki = jax.random.split(kk)
        return jax.random.normal(kr, shape) + 1j * jax.random.normal(ki, shape)

    return jax.vmap(one)(keys)


def _frame_randn(keys, shape, tag: int):
    def one(k):
        return jax.random.normal(jax.random.fold_in(k, tag), shape)

    return jax.vmap(one)(keys)


# --------------------------------------------------------------------------
# Config 1 & 2: convolutional code over AWGN (BPSK hard / QAM soft)
# --------------------------------------------------------------------------

def make_conv_awgn_link(
    *,
    trellis: Trellis,
    modulation_m: int = 2,
    frame_bits: int = 1000,
    decoding_type: str = "soft",
    tb_depth: Optional[int] = None,
    puncture: Optional[list] = None,
    use_psk: bool = True,
    scramble_seed: Optional[int] = None,
    name: str = "conv-awgn",
) -> DeviceLink:
    """Conv-coded link over complex AWGN.

    BASELINE config 1: PSK(2), decoding_type='hard'/'unquantized'.
    BASELINE config 2 / wifi80211: QAM(m), decoding_type='soft'.

    ``scramble_seed`` (non-zero 7-bit int) inserts the 802.11 §17.3.5.5
    frame-synchronous scrambler between the source and the encoder, with
    the matching descrambler after the decoder — the full 802.11 data
    path.  Statistically a no-op on i.i.d. source bits (by design; the
    scrambler exists to whiten structured payloads), and a single fused
    XOR each way on device.
    """
    const_np = (
        M.psk_constellation(modulation_m)
        if use_psk
        else M.qam_constellation(modulation_m)
    )
    # Es computed on host BEFORE device transfer (device->host complex
    # readback is not supported on all backends)
    Es = float(np.mean(np.abs(const_np) ** 2))
    # NumPy closure: baked as an HLO literal at trace time. (A
    # device-resident complex closure would force a complex device->host
    # readback during jit constant embedding, which some TPU runtimes
    # don't implement.)
    const = const_np.astype(np.complex64)
    bps = int(np.log2(modulation_m))
    k, n = trellis.k, trellis.n
    n_coded = frame_bits * n // k
    if puncture is not None:
        keep = puncture_mask(puncture, n_coded)
        n_kept = int(keep.sum())
        rate = frame_bits / n_kept
    else:
        keep = None
        n_kept = n_coded
        rate = k / n
    assert n_kept % bps == 0, "frame size must fill whole symbols"
    if tb_depth is None:
        tb_depth = min(5 * trellis.total_memory, frame_bits)

    def link_step(keys, noise_std):
        bits = _gen_bits(keys, frame_bits)  # [F, L]
        if scramble_seed is not None:
            from ..ops.scramble import scramble

            tx = scramble(bits, seed=scramble_seed)
        else:
            tx = bits
        coded, _ = encode_scan(tx, trellis)  # [F, n_coded]
        if keep is not None:
            coded = coded[:, np.where(keep)[0]]
        symbols = M.modulate(coded, const, bps)  # [F, n_sym]
        y = symbols + _frame_crandn(keys, symbols.shape[1:], 1) * (
            noise_std * 0.5
        )
        noise_var = noise_std**2
        if decoding_type == "soft":
            rx = M.demodulate_soft(y, const, bps, noise_var)
        elif decoding_type == "hard":
            rx = M.demodulate_hard(y, const, bps).astype(jnp.float32)
        else:  # unquantized: BPSK only — bit b maps to symbol 1-2b
            assert modulation_m == 2
            rx = -y.real
        if keep is not None:
            rx = depuncture_device(rx, keep)
        dec = viterbi_decode_device(
            rx, trellis, tb_depth, decoding_type, L=frame_bits
        )
        if scramble_seed is not None:
            from ..ops.scramble import descramble

            dec = descramble(dec, seed=scramble_seed)
        return jnp.sum(jnp.bitwise_xor(dec, bits).astype(jnp.int32))

    def noise_std_fn(snr_db):
        return snr_to_noise_std(snr_db, code_rate=rate, Es=Es)

    return DeviceLink(link_step, frame_bits, noise_std_fn, name,
                      {"rate": rate, "Es": Es, "bps": bps})


def make_rrc_conv_awgn_link(
    *,
    trellis: Trellis,
    modulation_m: int = 16,
    frame_bits: int = 1200,
    sps: int = 4,
    rrc_span_symbols: int = 8,
    rrc_alpha: float = 0.35,
    decoding_type: str = "soft",
    use_maxlog: bool = True,
    name: str = "rrc-conv-awgn",
) -> DeviceLink:
    """Waveform-level conv-coded link (BASELINE config 2, full fidelity):

    bits -> conv encode -> QAM -> **upsample x sps + RRC pulse shaping**
    -> complex AWGN at sample rate -> **matched filter** -> symbol-spaced
    sampling -> max-log LLR demod -> soft Viterbi.

    The RRC taps are unit-energy so the matched-filter cascade is
    ISI-free Nyquist with unity gain; the symbol-level SNR calibration
    then matches the symbol-rate link exactly.
    """
    from ..ops.filters import rrcosfilter
    from ..ops.fir import fir_filter, upfirdn

    const_np = M.qam_constellation(modulation_m)
    Es = float(np.mean(np.abs(const_np) ** 2))
    const = const_np.astype(np.complex64)  # numpy closure (HLO literal)
    bps = int(np.log2(modulation_m))
    k, n = trellis.k, trellis.n
    rate = k / n
    n_coded = frame_bits * n // k
    assert n_coded % bps == 0
    n_sym = n_coded // bps
    tb_depth = min(5 * trellis.total_memory, frame_bits)

    # Even tap count: the reference's (arange(N) - N/2)/Fs grid then puts
    # the filter peak exactly ON a sample (index N/2), so the cascade
    # delay is an integer number of samples.
    n_taps = sps * rrc_span_symbols
    _, taps = rrcosfilter(n_taps, rrc_alpha, 1.0, float(sps))
    taps = taps / np.sqrt(np.sum(taps**2))  # unit energy
    taps_j = taps.astype(np.float32)  # numpy closure (HLO literal)
    delay = n_taps  # tx filter + matched filter group delay (samples)

    def link_step(keys, noise_std):
        bits = _gen_bits(keys, frame_bits)
        coded, _ = encode_scan(bits, trellis)
        symbols = M.modulate(coded, const, bps)  # [F, n_sym]
        wave = upfirdn(symbols, taps_j, up=sps)  # [F, (n_sym-1)*sps+T]
        # complex AWGN at the sample rate; matched-filter gain is unity,
        # so the per-sample noise std equals the target symbol-level std.
        noise = _frame_crandn(keys, wave.shape[1:], 1)
        y = wave + noise * (noise_std * 0.5)
        mf = fir_filter(y, taps_j, "full")
        sampled = mf[:, delay : delay + n_sym * sps : sps]
        noise_var = noise_std**2
        demod = M.demodulate_maxlog if use_maxlog else M.demodulate_soft
        llr = demod(sampled, const, bps, noise_var)
        dec = viterbi_decode_device(
            llr, trellis, tb_depth, decoding_type, L=frame_bits
        )
        return jnp.sum(jnp.bitwise_xor(dec, bits).astype(jnp.int32))

    def noise_std_fn(snr_db):
        return snr_to_noise_std(snr_db, code_rate=rate, Es=Es)

    return DeviceLink(link_step, frame_bits, noise_std_fn, name,
                      {"rate": rate, "Es": Es, "sps": sps})


# --------------------------------------------------------------------------
# Config 3: rate-1/3 turbo code, BPSK/AWGN
# --------------------------------------------------------------------------

def make_turbo_awgn_link(
    *,
    trellis: Trellis,
    frame_bits: int,
    p_array,
    n_iterations: int = 8,
    window=None,
    window_init: str = "warmup",
    kernel_io: str = "f32",
    name: str = "turbo-awgn",
) -> DeviceLink:
    """Rate-1/3 PCCC turbo link over real-BPSK AWGN (BASELINE config 3).

    ``window`` / ``window_init`` / ``kernel_io`` pass through to
    :func:`turbo_decode_device` — long production frames should run
    ``window=(128, 0), window_init='nii'`` (and optionally bf16 io).
    """
    rate = 1.0 / 3.0
    p_array = np.asarray(p_array, np.int32)
    assert p_array.size == frame_bits

    def link_step(keys, noise_std):
        bits = _gen_bits(keys, frame_bits)
        sys_b, par1_b, par2_b = turbo_encode_device(
            bits, trellis, trellis, p_array
        )
        tx = jnp.stack([sys_b, par1_b, par2_b], axis=-1).astype(jnp.float32)
        tx = 2.0 * tx - 1.0  # BPSK
        y = tx + _frame_randn(keys, tx.shape[1:], 1) * noise_std
        noise_var = noise_std**2
        dec = turbo_decode_device(
            y[..., 0], y[..., 1], y[..., 2], trellis, noise_var,
            n_iterations, p_array, window=window,
            window_init=window_init, kernel_io=kernel_io,
        )
        return jnp.sum(jnp.bitwise_xor(dec, bits).astype(jnp.int32))

    def noise_std_fn(snr_db):
        # real channel: noise_std = sqrt(Es / (rate * snr))
        return snr_to_noise_std(
            snr_db, code_rate=rate, Es=1.0, is_complex=False
        )

    return DeviceLink(link_step, frame_bits, noise_std_fn, name,
                      {"rate": rate})


def make_polar_awgn_link(
    *,
    code,
    decoder: str = "scl",
    list_size: int = 8,
    modulation_m: int = 2,
    use_psk: bool = True,
    rule: str = "minsum",
    name: str = "polar-awgn",
) -> DeviceLink:
    """Polar-coded link over complex AWGN (beyond the reference set).

    ``code`` is a :class:`~commpy_tpu.ops.polar.PolarCode` (build with
    :func:`~commpy_tpu.ops.polar.polar_construct`; give it a CRC for
    CRC-aided list decoding).  ``decoder``: 'sc' or 'scl'.  CRC parity
    bits are counted as rate overhead in the Eb/N0 accounting
    (rate = K_payload / N).
    """
    import jax

    from ..ops.polar import (
        make_polar_encoder, make_polar_sc_decoder, make_polar_scl_decoder,
        make_polar_scl_decoder_unrolled, polar_rate_match,
        polar_rate_recover,
    )

    if decoder not in ("sc", "scl"):
        raise ValueError(f"decoder must be 'sc' or 'scl', got {decoder!r}")
    const_np = (
        M.psk_constellation(modulation_m)
        if use_psk
        else M.qam_constellation(modulation_m)
    )
    Es = float(np.mean(np.abs(const_np) ** 2))
    const = const_np.astype(np.complex64)
    bps = int(np.log2(modulation_m))
    if code.E % bps:
        raise ValueError(f"E={code.E} must fill whole {bps}-bit symbols")
    rate = code.rate  # K / transmitted bits (CRC counted as overhead)
    encode = make_polar_encoder(code)
    if decoder == "sc":
        decode = make_polar_sc_decoder(code, rule=rule)
    elif jax.default_backend() in ("tpu", "axon"):
        # statically-unrolled SCL: bit-identical to the scan builder,
        # ~17x on TPU (ops/polar.py r5); CPU keeps the scan builder
        # (smaller compile units — XLA:CPU crash mitigation)
        decode = make_polar_scl_decoder_unrolled(code, list_size=list_size,
                                                 rule=rule)
    else:
        decode = make_polar_scl_decoder(code, list_size=list_size, rule=rule)

    def link_step(keys, noise_std):
        msg = _gen_bits(keys, code.K)  # [F, K]
        x = polar_rate_match(code, encode(msg))  # [F, E]
        symbols = M.modulate(x, const, bps)
        y = symbols + _frame_crandn(keys, symbols.shape[1:], 1) * (
            noise_std * 0.5
        )
        # polar convention: positive LLR => bit 0 (negated demapper out)
        llr = polar_rate_recover(
            code, -M.demodulate_soft(y, const, bps, noise_std**2))
        dec = decode(llr)
        return jnp.sum(jnp.bitwise_xor(dec.astype(msg.dtype), msg)
                       .astype(jnp.int32))

    def noise_std_fn(snr_db):
        return snr_to_noise_std(snr_db, code_rate=rate, Es=Es)

    return DeviceLink(link_step, code.K, noise_std_fn, name,
                      {"rate": rate, "Es": Es, "bps": bps,
                       "decoder": decoder})


def make_dvbs2_concat_link(
    *,
    qc_params: dict,
    t_bch: int = 12,
    modulation_m: int = 4,
    n_iterations: int = 30,
    name: str = "dvbs2-concat",
) -> DeviceLink:
    """The DVB-S2 concatenated structure: BCH outer + LDPC inner.

    payload -> shortened GF(2^16) t-error BCH -> accumulator LDPC ->
    PSK -> AWGN -> QC BP decode -> bit-sliced BCH decode -> payload bit
    errors.  The outer code removes the LDPC error floor / residual BP
    errors near the waterfall (EN 302 307-1 structure; honest labeling:
    synthetic "-class" LDPC tables and our GF(2^16) primitive poly, see
    ops/dvbs2.py provenance note).
    """
    from ..ops.bch import bch_construct, make_bch_decoder, make_bch_encoder
    from ..ops.dvbs2 import dvbs2_decode_device, dvbs2_encode_device

    kldpc = qc_params["k_bits"]
    outer = bch_construct(16, t_bch, shorten=(1 << 16) - 1 - kldpc)
    assert outer.n == kldpc
    const_np = M.psk_constellation(modulation_m)
    Es = float(np.mean(np.abs(const_np) ** 2))
    const = const_np.astype(np.complex64)
    bps = int(np.log2(modulation_m))
    n_ldpc = qc_params["n_vnodes"]
    if n_ldpc % bps:
        raise ValueError(f"n={n_ldpc} must fill whole {bps}-bit symbols")
    rate = outer.k / n_ldpc
    enc_bch = make_bch_encoder(outer)
    dec_bch = make_bch_decoder(outer)

    def link_step(keys, noise_std):
        payload = _gen_bits(keys, outer.k)
        inner_msg = enc_bch(payload)
        cw = dvbs2_encode_device(inner_msg.astype(jnp.float32), qc_params)
        symbols = M.modulate(cw.astype(jnp.int8), const, bps)
        y = symbols + _frame_crandn(keys, symbols.shape[1:], 1) * (
            noise_std * 0.5
        )
        # LDPC convention: positive LLR => bit 0; dvbs2_decode_device
        # handles the standard-order <-> QC-domain parity permutation
        # and the accumulator-wrap edge masks
        llr = -M.demodulate_soft(y, const, bps, noise_std**2)
        dec, _ = dvbs2_decode_device(llr, qc_params, "MSA", n_iterations,
                                     msa_scale=0.75)
        corrected, _, _ = dec_bch(dec[:, :kldpc].astype(jnp.int8))
        return jnp.sum(jnp.bitwise_xor(
            corrected[:, :outer.k].astype(payload.dtype), payload
        ).astype(jnp.int32))

    def noise_std_fn(snr_db):
        return snr_to_noise_std(snr_db, code_rate=rate, Es=Es)

    return DeviceLink(link_step, outer.k, noise_std_fn, name,
                      {"rate": rate, "Es": Es, "bps": bps,
                       "t_bch": t_bch})


def make_isi_conv_link(
    *,
    trellis: Trellis,
    channel_taps,
    n_eq_taps: int = 21,
    modulation_m: int = 4,
    frame_bits: int = 1000,
    tb_depth: Optional[int] = None,
    name: str = "isi-conv-awgn",
) -> DeviceLink:
    """Conv-coded PSK link over a static frequency-selective (ISI)
    channel with MMSE linear equalization (beyond the reference).

    bits -> conv encode -> PSK -> channel convolution + AWGN -> MMSE
    FIR equalizer (taps designed per noise level inside the jitted
    step; the Wiener MSE supplies the post-equalizer noise variance for
    exact-LLR demapping) -> soft Viterbi.
    """
    from ..ops.equalize import (_conv_matrix, equalize, equalizer_delay,
                                mmse_fir_taps)
    from ..ops.fir import fir_filter

    h_np = np.asarray(channel_taps, np.complex64)
    h_energy = float(np.sum(np.abs(h_np) ** 2))
    const_np = M.psk_constellation(modulation_m)
    Es = float(np.mean(np.abs(const_np) ** 2))
    const = const_np.astype(np.complex64)
    bps = int(np.log2(modulation_m))
    k, n = trellis.k, trellis.n
    n_coded = frame_bits * n // k
    assert n_coded % bps == 0, "frame size must fill whole symbols"
    rate = k / n
    if tb_depth is None:
        tb_depth = min(5 * trellis.total_memory, frame_bits)
    delay = equalizer_delay(n_eq_taps, len(h_np))

    def link_step(keys, noise_std):
        bits = _gen_bits(keys, frame_bits)
        coded, _ = encode_scan(bits, trellis)
        symbols = M.modulate(coded, const, bps)  # [F, n_sym]
        rx = fir_filter(symbols, jnp.asarray(h_np),
                        mode="full")[..., :symbols.shape[-1]]
        y = rx + _frame_crandn(keys, rx.shape[1:], 1) * (noise_std * 0.5)
        # MMSE design at this noise level (symbols are unit power for
        # PSK; noise_var is the complex variance)
        noise_var = noise_std**2
        w = mmse_fir_taps(jnp.asarray(h_np), noise_var, n_eq_taps)
        z = equalize(y, w, delay)
        # post-equalizer error variance = Wiener MSE (residual ISI +
        # enhanced noise), used as the demapper's noise variance:
        # mse = 1 - p^H u = 1 - Re(sum(p * w)) with u = conj(w)
        Hm = _conv_matrix(jnp.asarray(h_np), n_eq_taps)
        pvec = Hm[:, delay]
        mse = 1.0 - jnp.real(jnp.sum(pvec * w))
        mse = jnp.maximum(mse, noise_var * 1e-2)
        llr = M.demodulate_soft(z, const, bps, mse)
        dec = viterbi_decode_device(llr, trellis, tb_depth, "soft",
                                    L=frame_bits)
        return jnp.sum(jnp.bitwise_xor(dec, bits).astype(jnp.int32))

    def noise_std_fn(snr_db):
        # account the channel gain into Es
        return snr_to_noise_std(snr_db, code_rate=rate, Es=Es * h_energy)

    return DeviceLink(link_step, frame_bits, noise_std_fn, name,
                      {"rate": rate, "Es": Es, "bps": bps,
                       "channel_taps": h_np, "n_eq_taps": n_eq_taps})


def make_bch_awgn_link(
    *,
    code,
    modulation_m: int = 2,
    use_psk: bool = True,
    decoder: str = "hard",
    chase_p: int = 4,
    name: str = "bch-awgn",
) -> DeviceLink:
    """BCH link over complex AWGN (beyond the reference).

    bits -> systematic BCH -> PSK/QAM -> AWGN -> demod -> BCH decode ->
    payload bit errors.  ``decoder='hard'`` uses min-distance demod +
    bit-sliced hard decoding; ``'chase'`` feeds exact-LLR magnitudes as
    bit reliabilities into Chase-2 soft decoding (2^chase_p patterns) —
    worth ~1.5 dB at the (31,21) waterfall (see test_bch.py).
    """
    from ..ops.bch import (make_bch_chase_decoder, make_bch_decoder,
                           make_bch_encoder)

    if decoder not in ("hard", "chase"):
        raise ValueError(f"decoder must be 'hard' or 'chase', got "
                         f"{decoder!r}")
    const_np = (
        M.psk_constellation(modulation_m)
        if use_psk
        else M.qam_constellation(modulation_m)
    )
    Es = float(np.mean(np.abs(const_np) ** 2))
    const = const_np.astype(np.complex64)
    bps = int(np.log2(modulation_m))
    if code.n % bps:
        raise ValueError(f"n={code.n} must fill whole {bps}-bit symbols")
    rate = code.k / code.n
    encode = make_bch_encoder(code)
    decode = make_bch_decoder(code)
    if decoder == "chase":
        chase = make_bch_chase_decoder(code, p=chase_p)

    def link_step(keys, noise_std):
        msg = _gen_bits(keys, code.k)
        cw = encode(msg)
        symbols = M.modulate(cw, const, bps)
        y = symbols + _frame_crandn(keys, symbols.shape[1:], 1) * (
            noise_std * 0.5
        )
        if decoder == "chase":
            llr = M.demodulate_soft(y, const, bps, noise_std**2)
            hard = (llr > 0).astype(jnp.int8)  # positive -> bit 1
            corrected, _, _ = chase(hard, jnp.abs(llr))
        else:
            hard = M.demodulate_hard(y, const, bps)
            corrected, _, _ = decode(hard)
        return jnp.sum(jnp.bitwise_xor(
            corrected[:, :code.k].astype(msg.dtype), msg).astype(jnp.int32))

    def noise_std_fn(snr_db):
        return snr_to_noise_std(snr_db, code_rate=rate, Es=Es)

    return DeviceLink(link_step, code.k, noise_std_fn, name,
                      {"rate": rate, "Es": Es, "bps": bps})


def make_rs_awgn_link(
    *,
    code,
    modulation_m: int = None,
    decoder: str = "hard",
    name: str = "rs-awgn",
) -> DeviceLink:
    """Reed-Solomon link over complex AWGN.

    One QAM symbol per RS symbol by default (modulation order 2^m, the
    classic matched mapping, e.g. 256-QAM for GF(2^8)): symbol ints ->
    RS encode -> QAM -> AWGN -> demod -> RS decode -> message bit
    errors.  ``decoder='gmd'`` uses the per-symbol reliability (the
    minimum |LLR| over the symbol's bits) to drive GMD soft decoding —
    note GMD is designed for INFORMATIVE reliabilities (burst flags,
    fading nulls); on plain AWGN the |LLR| spread is weakly informative
    and 'hard' measures better (see rs_gmd_decode's docstring).
    """
    from ..ops.rs import (_bits_to_sym, _sym_to_bits, make_rs_decoder,
                          make_rs_encoder, make_rs_gmd_decoder)

    if decoder not in ("hard", "gmd"):
        raise ValueError(f"decoder must be 'hard' or 'gmd', got "
                         f"{decoder!r}")
    if modulation_m is None:
        modulation_m = 1 << code.m
    const_np = M.qam_constellation(modulation_m)
    Es = float(np.mean(np.abs(const_np) ** 2))
    const = const_np.astype(np.complex64)
    bps = int(np.log2(modulation_m))
    if (code.n * code.m) % bps:
        raise ValueError(
            f"n*m={code.n * code.m} coded bits must fill whole "
            f"{bps}-bit symbols")
    rate = code.k / code.n
    encode = make_rs_encoder(code)
    decode = make_rs_decoder(code)
    if decoder == "gmd":
        gmd = make_rs_gmd_decoder(code)

    def link_step(keys, noise_std):
        msg_bits = _gen_bits(keys, code.k * code.m)  # [F, k*m]
        msg = _bits_to_sym(
            msg_bits.reshape(-1, code.k, code.m).astype(jnp.float32),
            code.m)
        cw = encode(msg)  # [F, n] ints
        # map RS symbol bits onto modulation symbols (shared bit order
        # with the codec: ops/rs.py _sym_to_bits/_bits_to_sym)
        bits = _sym_to_bits(cw, code.m)
        bits = bits.reshape(bits.shape[0], -1).astype(jnp.int8)
        symbols = M.modulate(bits, const, bps)
        y = symbols + _frame_crandn(keys, symbols.shape[1:], 1) * (
            noise_std * 0.5
        )
        if decoder == "gmd":
            llr = M.demodulate_soft(y, const, bps, noise_std**2)
            hard = (llr > 0).astype(jnp.float32)
            rx = _bits_to_sym(hard.reshape(hard.shape[0], code.n, code.m),
                              code.m)
            rel = jnp.min(jnp.abs(llr).reshape(llr.shape[0], code.n,
                                               code.m), axis=-1)
            corrected, _, _ = gmd(rx, rel)
        else:
            hard = M.demodulate_hard(y, const, bps).astype(jnp.float32)
            rx = _bits_to_sym(hard.reshape(hard.shape[0], code.n, code.m),
                              code.m)
            corrected, _, _ = decode(rx)
        err_syms = jnp.bitwise_xor(corrected[:, :code.k], msg)
        err_bits = _sym_to_bits(err_syms, code.m)
        return jnp.sum(err_bits.astype(jnp.int32))

    def noise_std_fn(snr_db):
        return snr_to_noise_std(snr_db, code_rate=rate, Es=Es)

    return DeviceLink(link_step, code.k * code.m, noise_std_fn, name,
                      {"rate": rate, "Es": Es, "bps": bps})


# --------------------------------------------------------------------------
# QC-LDPC (802.11n-class) + QAM/PSK over AWGN
# --------------------------------------------------------------------------

def make_qcldpc_awgn_link(
    *,
    qc_params: dict,
    modulation_m: int = 4,
    algorithm: str = "MSA",
    n_iterations: int = 15,
    msa_scale: float = 1.0,
    msa_offset: float = 0.0,
    use_psk: bool = False,
    name: str = "qcldpc-awgn",
) -> DeviceLink:
    """QC-LDPC-coded QAM/PSK link over complex AWGN.

    One frame = one QC codeword through the roll-based BP decoder
    (`ops/qcldpc.py`) — the LDPC PHY the reference's application layer
    lacks (its wifi80211.py:29-216 is convolutional-only, and its LDPC
    decoder tops out at the shipped n=1440 designs).
    """
    from ..ops.qcldpc import qc_bp_decode_device, qc_encode_device

    n_v = qc_params["n_vnodes"]
    frame_bits = qc_params["k_bits"]
    const_np = (M.psk_constellation(modulation_m) if use_psk
                else M.qam_constellation(modulation_m))
    Es = float(np.mean(np.abs(const_np) ** 2))
    const = const_np.astype(np.complex64)  # numpy closure (HLO literal)
    bps = int(np.log2(modulation_m))
    rate = frame_bits / n_v
    if n_v % bps:
        raise ValueError(
            f"codeword length {n_v} must fill whole {bps}-bit symbols"
        )

    def link_step(keys, noise_std):
        bits = _gen_bits(keys, frame_bits)
        coded = qc_encode_device(bits, qc_params)  # [F, n_v]
        symbols = M.modulate(coded, const, bps)
        y = symbols + _frame_crandn(keys, symbols.shape[1:], 1) * (
            noise_std * 0.5
        )
        llr = -M.demodulate_soft(y, const, bps, noise_std**2)
        dec, _ = qc_bp_decode_device(llr, qc_params, algorithm,
                                     n_iterations, msa_scale=msa_scale,
                                     msa_offset=msa_offset)
        return jnp.sum(
            jnp.bitwise_xor(dec[..., :frame_bits], bits).astype(jnp.int32)
        )

    def noise_std_fn(snr_db):
        return snr_to_noise_std(snr_db, code_rate=rate, Es=Es)

    return DeviceLink(link_step, frame_bits, noise_std_fn, name,
                      {"rate": rate, "Es": Es, "n": n_v})


def make_ofdm_qcldpc_link(
    *,
    qc_params: dict,
    modulation_m: int = 4,
    nfft: int = 64,
    nsc: int = 54,
    cp_length: int = 16,
    n_taps: int = 4,
    algorithm: str = "MSA",
    n_iterations: int = 15,
    msa_scale: float = 1.0,
    csi: str = "perfect",
    cfo: float = 0.0,
    cfo_correction: bool = False,
    name: str = "ofdm-qcldpc",
) -> DeviceLink:
    """802.11n-style OFDM PHY with LDPC coding over a multipath channel.

    One frame = one QC codeword spread over an OFDM grid; the channel is
    an ``n_taps``-tap Rayleigh delay line (time-domain convolution, CP
    absorbs the delay spread), so subcarriers fade SELECTIVELY — the
    scenario OFDM exists for, and one the reference cannot express (its
    channels.py:101-627 models are frequency-flat only).  Per-subcarrier
    equalization with per-subcarrier effective noise variance into the
    exact-LLR demapper.

    ``csi``: "perfect" uses the true per-subcarrier response;
    "ls" prepends one known BPSK pilot OFDM symbol (the 802.11 long
    training field pattern) and least-squares-estimates
    ``H = rx_pilot / pilot`` — the receiver sees only the waveform;
    "smooth" additionally projects the LS estimate onto the n_taps
    delay subspace (`ops.ofdm.delay_subspace_matrix`, one matmul) —
    the estimator noise drops ~nsc/n_taps and the BER approaches the
    perfect-CSI curve (tested).

    ``cfo`` applies a normalized carrier frequency offset (subcarrier
    spacings) to the received waveform; ``cfo_correction=True`` runs the
    CP-correlation estimator (`ops.sync.cfo_estimate_cp`) and derotates
    before OFDM demodulation — with an estimated-CSI mode the pilot then
    absorbs the residual common phase, so the receiver is fully blind.
    A fractional CFO without correction is catastrophic (ICI + subcarrier
    rotation; tested).
    """
    from ..ops.qcldpc import qc_bp_decode_device, qc_encode_device

    n_v = qc_params["n_vnodes"]
    frame_bits = qc_params["k_bits"]
    const_np = M.qam_constellation(modulation_m)
    Es = float(np.mean(np.abs(const_np) ** 2))
    const = const_np.astype(np.complex64)  # numpy closure (HLO literal)
    bps = int(np.log2(modulation_m))
    rate = frame_bits / n_v
    n_sym = n_v // bps
    if n_v % bps or n_sym % nsc:
        raise ValueError(
            f"codeword ({n_v} bits, {n_sym} symbols) must fill whole "
            f"{bps}-bit symbols and whole {nsc}-subcarrier OFDM symbols"
        )
    n_ofdm = n_sym // nsc
    if n_taps > cp_length:
        raise ValueError("delay spread must fit inside the cyclic prefix")
    half = nsc // 2
    # subcarrier slot j <-> FFT bin (ofdm_tx map, reference
    # modulation.py:272-276): slots [0, half) ride the negative-frequency
    # bins, slots [half, nsc) the positive ones
    bins = np.concatenate(
        [np.arange(nfft - half, nfft), np.arange(1, half + 1)]
    )
    # DFT vectors for the mapped bins: H = W @ g  ([nsc, n_taps])
    W = np.exp(
        -2j * np.pi * bins[:, None] * np.arange(n_taps)[None, :] / nfft
    ).astype(np.complex64)
    nv_scale = float(nfft)  # unnormalized-FFT noise gain (see MIMO link)
    if csi not in ("perfect", "ls", "smooth"):
        raise ValueError('csi must be "perfect", "ls" or "smooth"')
    if csi == "smooth":
        smooth = OFDM.delay_subspace_matrix(nfft, nsc, n_taps)
    # BPSK pilot with the average data symbol energy (LS noise then
    # matches the data-symbol SNR)
    pilot = (np.sqrt(Es)
             * (1.0 - 2.0 * (np.arange(nsc) % 2))).astype(np.complex64)

    def link_step(keys, noise_std):
        bits = _gen_bits(keys, frame_bits)
        coded = qc_encode_device(bits, qc_params)
        symbols = M.modulate(coded, const, bps)  # [F, n_sym]
        F = symbols.shape[0]
        grids = jnp.moveaxis(
            symbols.reshape(F, n_ofdm, nsc), -1, -2
        )  # [F, nsc, n_ofdm]
        if csi in ("ls", "smooth"):
            pgrid = jnp.broadcast_to(
                jnp.asarray(pilot)[None, :, None], (F, nsc, 1)
            )
            grids = jnp.concatenate([pgrid, grids], axis=-1)
        tx = OFDM.ofdm_tx(grids, nfft, nsc, cp_length)  # [F, T]

        # n_taps-tap Rayleigh delay line, unit average energy
        g = _frame_crandn(keys, (n_taps,), 2) * jnp.sqrt(0.5 / n_taps)
        rx = jnp.zeros_like(tx)
        for tap in range(n_taps):  # static unroll: y[t] = sum g_l x[t-l]
            shifted = tx if tap == 0 else jnp.pad(
                tx, ((0, 0), (tap, 0))
            )[:, : tx.shape[1]]
            rx = rx + g[:, tap:tap + 1] * shifted
        if cfo:
            from ..ops.impairments import add_frequency_offset

            rx = add_frequency_offset(rx, Fs=float(nfft), delta_f=cfo)
        rx = rx + _frame_crandn(keys, rx.shape[1:], 1) * (noise_std * 0.5)
        if cfo_correction:
            from ..ops.sync import cfo_correct, cfo_estimate_cp

            n_sym_total = rx.shape[1] // (nfft + cp_length)
            eps = cfo_estimate_cp(rx, nfft, cp_length, n_sym_total)
            rx = cfo_correct(rx, eps, nfft)

        rx_grids = OFDM.ofdm_rx(rx, nfft, nsc, cp_length)  # [F, nsc, n_sym+?]
        if csi in ("ls", "smooth"):
            H = rx_grids[:, :, 0] / jnp.asarray(pilot)[None, :]  # LS
            if csi == "smooth":  # delay-subspace projection (one matmul)
                H = H @ jnp.asarray(smooth).T
            rx_grids = rx_grids[:, :, 1:]
        else:
            H = jnp.einsum("st,ft->fs", jnp.asarray(W), g)  # [F, nsc]
        z = rx_grids / H[:, :, None]
        noise_var = noise_std**2 * nv_scale
        nv_eff = noise_var / jnp.maximum(jnp.abs(H[:, :, None]) ** 2,
                                         1e-12)
        z = jnp.moveaxis(z, -1, -2).reshape(F, n_sym)
        nv_eff = jnp.moveaxis(
            jnp.broadcast_to(nv_eff, (F, nsc, n_ofdm)), -1, -2
        ).reshape(F, n_sym)
        llr = -M.demodulate_soft(z, const, bps, nv_eff)
        dec, _ = qc_bp_decode_device(llr, qc_params, algorithm,
                                     n_iterations, msa_scale=msa_scale)
        return jnp.sum(
            jnp.bitwise_xor(dec[..., :frame_bits], bits).astype(jnp.int32)
        )

    def noise_std_fn(snr_db):
        # per-subcarrier SNR calibration (reference channels.py:74);
        # time-domain std divided by sqrt(nfft) (FFT gain, see the OFDM
        # MIMO link), unit-energy delay line keeps the average intact
        return snr_to_noise_std(
            snr_db, code_rate=rate, Es=Es
        ) / np.sqrt(nfft)

    return DeviceLink(link_step, frame_bits, noise_std_fn, name,
                      {"rate": rate, "Es": Es, "n": n_v,
                       "n_ofdm_symbols": n_ofdm})


# --------------------------------------------------------------------------
# Config 4: LDPC + QAM over Rayleigh fading SISO
# --------------------------------------------------------------------------

def make_ldpc_rayleigh_link(
    *,
    ldpc_params: dict,
    modulation_m: int = 4,
    algorithm: str = "SPA",
    n_iterations: int = 50,
    fading: bool = True,
    name: str = "ldpc-rayleigh",
) -> DeviceLink:
    """LDPC-coded QAM link over (optionally Rayleigh-faded) SISO channel.

    One frame = one LDPC codeword; perfect CSI equalization at the
    receiver, per-symbol effective noise variance in the LLRs.
    """
    from ..ops.ldpc import ldpc_bp_decode_device

    if ldpc_params.get("generator_matrix") is None:
        build_matrix(ldpc_params)
    G = np.asarray(ldpc_params["generator_matrix"].todense()) % 2
    n_v = ldpc_params["n_vnodes"]
    n_c = ldpc_params["n_cnodes"]
    frame_bits = n_v - n_c
    const_np = M.qam_constellation(modulation_m)
    Es = float(np.mean(np.abs(const_np) ** 2))
    const = const_np.astype(np.complex64)  # numpy closure (HLO literal)
    bps = int(np.log2(modulation_m))
    rate = frame_bits / n_v
    assert n_v % bps == 0

    def link_step(keys, noise_std):
        bits = _gen_bits(keys, frame_bits)
        coded = ldpc_encode_device(bits, G)  # [F, n_v]
        symbols = M.modulate(coded, const, bps)
        if fading:
            h = _frame_crandn(keys, symbols.shape[1:], 2) * jnp.sqrt(0.5)
        else:
            h = jnp.ones_like(symbols)
        y = h * symbols + _frame_crandn(keys, symbols.shape[1:], 1) * (
            noise_std * 0.5
        )
        noise_var = noise_std**2
        # perfect-CSI equalization; effective per-symbol noise variance
        z = y / h
        nv_eff = noise_var / jnp.maximum(jnp.abs(h) ** 2, 1e-12)
        llr = -M.demodulate_soft(z, const, bps, nv_eff)
        dec, _ = ldpc_bp_decode_device(llr, ldpc_params, algorithm,
                                       n_iterations)
        return jnp.sum(
            jnp.bitwise_xor(dec[..., :frame_bits], bits).astype(jnp.int32)
        )

    def noise_std_fn(snr_db):
        return snr_to_noise_std(snr_db, code_rate=rate, Es=Es)

    return DeviceLink(link_step, frame_bits, noise_std_fn, name,
                      {"rate": rate, "Es": Es, "n": n_v})


# --------------------------------------------------------------------------
# K-best MIMO detection link (test_links.py:55-58 configuration)
# --------------------------------------------------------------------------

def make_kbest_mimo_link(
    *,
    nb_tx: int = 4,
    nb_rx: int = 4,
    modulation_m: int = 16,
    K: int = 16,
    vectors_per_frame: int = 32,
    name: str = "kbest-mimo",
) -> DeviceLink:
    """Uncoded K-best detection over uncorrelated Rayleigh MIMO."""
    const_np = M.qam_constellation(modulation_m)
    Es = float(np.mean(np.abs(const_np) ** 2))
    const = const_np.astype(np.complex64)  # numpy closure (HLO literal)
    bps = int(np.log2(modulation_m))
    frame_bits = vectors_per_frame * nb_tx * bps

    def link_step(keys, noise_std):
        bits = _gen_bits(keys, frame_bits)
        symbols = M.modulate(bits, const, bps)  # [F, nv*nt]
        F = symbols.shape[0]
        x = symbols.reshape(F, vectors_per_frame, nb_tx)
        h = _frame_crandn(
            keys, (vectors_per_frame, nb_rx, nb_tx), 2
        ) * jnp.sqrt(0.5)
        y = jnp.einsum("fvrt,fvt->fvr", h, x)
        y = y + _frame_crandn(keys, y.shape[1:], 1) * (noise_std * 0.5)
        xh = kbest_device(
            y.reshape(-1, nb_rx), h.reshape(-1, nb_rx, nb_tx), const, K
        )  # [F*nv, nt] symbols
        dec = M.demodulate_hard(xh.reshape(F, -1), const, bps)
        return jnp.sum(jnp.bitwise_xor(dec, bits).astype(jnp.int32))

    def noise_std_fn(snr_db):
        return snr_to_noise_std(snr_db, code_rate=1.0, Es=Es, nb_tx=nb_tx)

    return DeviceLink(link_step, frame_bits, noise_std_fn, name,
                      {"Es": Es, "bps": bps})


# --------------------------------------------------------------------------
# Tier-3 acceptance configuration (reference test_links.py:60-86):
# 4x4 Rayleigh MIMO, 16-QAM, soft best-first detection + WiMAX LDPC MSA
# --------------------------------------------------------------------------

def make_bestfirst_ldpc_mimo_link(
    *,
    ldpc_params: dict,
    nb_tx: int = 4,
    nb_rx: int = 4,
    modulation_m: int = 16,
    beam=32,
    llr_max: float = 500.0,
    algorithm: str = "MSA",
    n_iterations: int = 15,
    detector: str = "bestfirst",
    name: str = "bestfirst-ldpc-mimo",
) -> DeviceLink:
    """LDPC-coded MIMO link with batched soft detection.

    The TPU image of the reference's tier-3 acceptance model
    (test_links.py:60-86): WiMAX LDPC(1440,720) encode -> 16-QAM -> 4x4
    uncorrelated Rayleigh -> soft detector LLRs -> MSA-15 BP decode.
    One frame = one codeword.

    ``detector='bestfirst'`` uses ``best_first_device`` (unscaled metric
    differences, positive <=> bit 0 — MSA decisions are invariant to the
    missing 1/(2 sigma^2) scale, exactly as in the reference);
    ``detector='kbest'`` uses ``kbest_device``'s max-log soft output
    (``beam`` is K), replacing the reference's per-vector
    ``kbest``+``max_log_approx`` receive loop (links.py:320-326) with
    one batched search across every vector of every frame.
    """
    from ..ops.ldpc import ldpc_bp_decode_device

    if detector not in ("bestfirst", "kbest"):
        raise ValueError(f"unknown detector {detector!r}")
    if ldpc_params.get("generator_matrix") is None:
        build_matrix(ldpc_params)
    G = np.asarray(ldpc_params["generator_matrix"].todense()) % 2
    n_v = ldpc_params["n_vnodes"]
    frame_bits = n_v - ldpc_params["n_cnodes"]
    const_np = M.qam_constellation(modulation_m)
    Es = float(np.mean(np.abs(const_np) ** 2))
    const = const_np.astype(np.complex64)  # numpy closure (HLO literal)
    bps = int(np.log2(modulation_m))
    rate = frame_bits / n_v
    n_sym = n_v // bps
    assert n_sym % nb_tx == 0
    n_vec = n_sym // nb_tx

    def link_step(keys, noise_std):
        bits = _gen_bits(keys, frame_bits)
        coded = ldpc_encode_device(bits, G)  # [F, n_v]
        symbols = M.modulate(coded, const, bps)
        F = symbols.shape[0]
        x = symbols.reshape(F, n_vec, nb_tx)
        h = _frame_crandn(keys, (n_vec, nb_rx, nb_tx), 2) * jnp.sqrt(0.5)
        y = jnp.einsum("fvrt,fvt->fvr", h, x)
        y = y + _frame_crandn(keys, y.shape[1:], 1) * (noise_std * 0.5)
        if detector == "kbest":
            # max-log LLRs scaled by 1/(2 sigma^2); same sign convention
            llrs = kbest_device(
                y.reshape(-1, nb_rx), h.reshape(-1, nb_rx, nb_tx), const,
                int(beam) if np.ndim(beam) == 0 else int(beam[-1]),
                noise_std ** 2, "soft", bps,
            )
        else:
            llrs = best_first_device(
                y.reshape(-1, nb_rx), h.reshape(-1, nb_rx, nb_tx), const,
                beam=beam, llr_max=llr_max, bits_per_symbol=bps,
            )  # [F*n_vec, nt*bps], positive <=> bit 0
        llrs = llrs.reshape(F, n_v)
        dec, _ = ldpc_bp_decode_device(
            llrs, ldpc_params, algorithm, n_iterations
        )
        return jnp.sum(
            jnp.bitwise_xor(dec[..., :frame_bits], bits).astype(jnp.int32)
        )

    def noise_std_fn(snr_db):
        return snr_to_noise_std(snr_db, code_rate=rate, Es=Es, nb_tx=nb_tx)

    return DeviceLink(link_step, frame_bits, noise_std_fn, name,
                      {"rate": rate, "Es": Es, "bps": bps})


def make_idd_kbest_ldpc_mimo_link(
    *,
    ldpc_params: dict,
    nb_tx: int = 4,
    nb_rx: int = 4,
    modulation_m: int = 16,
    beam: int = 16,
    algorithm: str = "MSA",
    n_iterations: int = 15,
    n_it: int = 1,
    damping: float = 1.0,
    llr_clip: float = 50.0,
    name: str = "idd-kbest-ldpc-mimo",
) -> DeviceLink:
    """LDPC-coded MIMO link decoded through the DEVICE IDD loop.

    Same chain as :func:`make_bestfirst_ldpc_mimo_link` with
    ``detector='kbest'``, but the receive side is the iterative
    detection-and-decoding loop of :func:`commpy_tpu.models.idd.
    idd_decoder_device` (the batched image of the reference
    ``idd_decoder`` closure, commpy/links.py:345-407): the prior-aware
    K-best soft detector and the LDPC BP posterior exchange extrinsics
    ``n_it`` times, then a final BP decode hard-decides the total LLRs.
    One frame = one codeword.

    Measured behavior (honest defaults): ONE exchange (``n_it=1``)
    improves on the one-pass chain (18 dB, 8 frames: 0 vs 33 bit
    errors); further undamped exchanges OSCILLATE — the max-log K-best
    extrinsic overshoots and the loop (faithful to the reference
    closure, which CommPy itself never validates) has no damping.
    ``damping`` < 1 scales the decoder extrinsic fed back to the
    detector (implemented as a decoder wrapper, so the loop semantics
    stay reference-exact at ``damping=1``); 0.3 roughly halves the
    n_it>=2 degradation but still does not beat ``n_it=1`` in this
    configuration, hence the default.  ``llr_clip`` bounds the
    detector's max-log LLRs (they are +-inf when every survivor agrees
    on a bit — poison for the extrinsic subtraction); 50 measured best
    for the exchange (500, the reference detectors' clip, leaves
    saturated extrinsics that cost ~180 bit errors at 18 dB where 50
    costs 0).
    """
    from ..models.idd import idd_decoder_device
    from ..ops.ldpc import ldpc_bp_decode_device

    if ldpc_params.get("generator_matrix") is None:
        build_matrix(ldpc_params)
    G = np.asarray(ldpc_params["generator_matrix"].todense()) % 2
    n_v = ldpc_params["n_vnodes"]
    frame_bits = n_v - ldpc_params["n_cnodes"]
    const_np = M.qam_constellation(modulation_m)
    Es = float(np.mean(np.abs(const_np) ** 2))
    const = const_np.astype(np.complex64)  # numpy closure (HLO literal)
    bps = int(np.log2(modulation_m))
    rate = frame_bits / n_v
    n_sym = n_v // bps
    assert n_sym % nb_tx == 0
    n_vec = n_sym // nb_tx

    def link_step(keys, noise_std):
        bits = _gen_bits(keys, frame_bits)
        coded = ldpc_encode_device(bits, G)  # [F, n_v]
        symbols = M.modulate(coded, const, bps)
        F = symbols.shape[0]
        x = symbols.reshape(F, n_vec, nb_tx)
        h = _frame_crandn(keys, (n_vec, nb_rx, nb_tx), 2) * jnp.sqrt(0.5)
        y = jnp.einsum("fvrt,fvt->fvr", h, x)
        y = y + _frame_crandn(keys, y.shape[1:], 1) * (noise_std * 0.5)
        yf = y.reshape(-1, nb_rx)
        hf = h.reshape(-1, nb_rx, nb_tx)
        nv = noise_std ** 2

        def detector(yv, hv, noise_var, a_priori):
            return kbest_device(yv, hv, const, int(beam), noise_var,
                                "soft", bps, a_priori=a_priori,
                                llr_clip=float(llr_clip))

        def decoder(llrs_flat):
            _, post = ldpc_bp_decode_device(
                llrs_flat.reshape(F, n_v), ldpc_params, algorithm,
                n_iterations)
            post = post.reshape(-1)
            if damping != 1.0:
                # damp the EXTRINSIC the loop derives (post - input):
                # x + d*(post - x) makes a_det_new = d*(post - x)
                post = llrs_flat + damping * (post - llrs_flat)
            return post

        def decision(llrs_flat):
            dec, _ = ldpc_bp_decode_device(
                llrs_flat.reshape(F, n_v), ldpc_params, algorithm,
                n_iterations)
            return dec[..., :frame_bits]

        decode = idd_decoder_device(detector, decoder, decision, int(n_it))
        # first pass (zero priors) plays the reference's received_msg
        a0 = detector(yf, hf, nv, jnp.zeros((F * n_vec, nb_tx * bps),
                                            jnp.float32)).reshape(-1)
        dec = decode(yf, hf, nv, a0)
        return jnp.sum(
            jnp.bitwise_xor(dec, bits).astype(jnp.int32)
        )

    def noise_std_fn(snr_db):
        return snr_to_noise_std(snr_db, code_rate=rate, Es=Es, nb_tx=nb_tx)

    return DeviceLink(link_step, frame_bits, noise_std_fn, name,
                      {"rate": rate, "Es": Es, "bps": bps})


# --------------------------------------------------------------------------
# Config 5: OFDM + 2x2 MIMO K-best + conv coding
# --------------------------------------------------------------------------

def make_ofdm_mimo_conv_link(
    *,
    trellis: Trellis,
    modulation_m: int = 16,
    nb_tx: int = 2,
    nb_rx: int = 2,
    K: int = 8,
    nfft: int = 64,
    nsc: int = 48,
    cp_length: int = 16,
    n_ofdm_symbols: int = 4,
    name: str = "ofdm-mimo-conv",
) -> DeviceLink:
    """802.11ac-style link: conv code -> QAM -> OFDM -> 2x2 flat MIMO ->
    K-best soft detection -> soft Viterbi (BASELINE config 5).

    Block-fading: one channel matrix per frame, shared by all subcarriers
    (flat channel, as in the reference's MIMOFlatChannel).
    """
    const_np = M.qam_constellation(modulation_m)
    Es = float(np.mean(np.abs(const_np) ** 2))
    const = const_np.astype(np.complex64)  # numpy closure (HLO literal)
    bps = int(np.log2(modulation_m))
    k, n = trellis.k, trellis.n
    rate = k / n
    n_sym = nsc * n_ofdm_symbols * nb_tx  # QAM symbols per frame
    n_coded = n_sym * bps
    frame_bits = n_coded * k // n
    tb_depth = min(5 * trellis.total_memory, frame_bits)
    # FFT convention: ifft (1/N) at tx, fft at rx -> per-subcarrier noise
    # variance = nfft * time-domain variance.
    nv_scale = float(nfft)

    def link_step(keys, noise_std):
        bits = _gen_bits(keys, frame_bits)
        coded, _ = encode_scan(bits, trellis)
        symbols = M.modulate(coded, const, bps)  # [F, n_sym]
        F = symbols.shape[0]
        # [F, nb_tx, nsc, n_ofdm]
        grids = symbols.reshape(F, nb_tx, n_ofdm_symbols, nsc)
        grids = jnp.moveaxis(grids, -1, -2)
        tx_time = OFDM.ofdm_tx(grids, nfft, nsc, cp_length)  # [F, nt, T]

        h = _frame_crandn(keys, (nb_rx, nb_tx), 2) * jnp.sqrt(0.5)
        rx_time = jnp.einsum("frt,ftn->frn", h, tx_time)
        rx_time = rx_time + _frame_crandn(keys, rx_time.shape[1:], 1) * (
            noise_std * 0.5
        )

        rx_grids = OFDM.ofdm_rx(rx_time, nfft, nsc, cp_length)
        # [F, nb_rx, nsc, n_ofdm] -> per-subcarrier received vectors
        rx_vec = jnp.moveaxis(rx_grids, 1, -1)  # [F, nsc, n_ofdm, nb_rx]
        n_vec = nsc * n_ofdm_symbols
        h_rep = jnp.broadcast_to(
            h[:, None], (F, n_vec, nb_rx, nb_tx)
        )
        # Per-subcarrier noise power after the unnormalized FFT is
        # nfft * sigma_t^2 / 2; the reference's noise_var parameter is
        # noise_std^2 == twice the complex noise power.
        noise_var = noise_std**2 * nv_scale
        llrs = kbest_device(
            rx_vec.reshape(-1, nb_rx),
            h_rep.reshape(-1, nb_rx, nb_tx),
            const,
            K,
            noise_var,
            "soft",
            bps,
        )  # [F*n_vec, nt*bps]
        # undo the tx layout [nb_tx, n_ofdm, nsc]:
        llrs = llrs.reshape(F, nsc, n_ofdm_symbols, nb_tx, bps)
        llrs = jnp.transpose(llrs, (0, 3, 2, 1, 4))
        # max_log_approx follows the reference sign convention
        # (positive => bit 0, modulation.py:646); Viterbi 'soft' wants the
        # opposite, so negate.
        llrs = -llrs.reshape(F, -1)
        dec = viterbi_decode_device(
            llrs, trellis, tb_depth, "soft", L=frame_bits
        )
        return jnp.sum(jnp.bitwise_xor(dec, bits).astype(jnp.int32))

    def noise_std_fn(snr_db):
        # Calibrate the per-subcarrier SNR to the reference convention
        # (channels.py:74): noise_std_sc = sqrt(2 nb_tx Es / (rate snr));
        # the time-domain std is that divided by sqrt(nfft) (FFT gain).
        return snr_to_noise_std(
            snr_db, code_rate=rate, Es=Es, nb_tx=nb_tx
        ) / np.sqrt(nfft)

    return DeviceLink(link_step, frame_bits, noise_std_fn, name,
                      {"rate": rate, "Es": Es})
