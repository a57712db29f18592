"""Full benchmark suite: every hot path vs the reference CPU baseline.

Timing methodology (remote-TPU-safe): each workload is repeated inside one
jitted program with a non-foldable data dependency between repetitions,
and the host synchronizes on a scalar transfer — immune to async
dispatch, XLA dead-code elimination, and host-link round-trip jitter.

Prints one JSON object per line (metric, value, unit, vs_baseline).
Run on the target device:  python benchmarks/bench_all.py
Select sections (comma list, e.g. ``viterbi,turbo_long``) as argv[1] —
useful for running each section in a fresh process when the remote
compile service has flaky windows.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# Per-call host overhead (remote tunnel RTT ~30 ms) is removed by
# DIFFERENCING: each workload is timed at two chain lengths and the
# throughput comes from the slope, so fixed dispatch/sync latency
# cancels exactly (same methodology as bench.py).


def main():
    import jax
    import jax.numpy as jnp

    from commpy_tpu.channelcoding import RandInterlv
    from commpy_tpu.models.wifi80211_link import wifi80211_device_link
    from commpy_tpu.ops import modem as M
    from commpy_tpu.ops.ldpc import get_ldpc_code_params, ldpc_bp_decode_device
    from commpy_tpu.ops.trellis import Trellis
    from commpy_tpu.ops.turbo import turbo_decode_device
    from commpy_tpu.ops.viterbi import viterbi_decode_device

    here = os.path.dirname(os.path.abspath(__file__))
    ref_path = os.path.join(here, "reference_cpu.json")
    ref = json.load(open(ref_path)) if os.path.exists(ref_path) else {}
    rng = np.random.RandomState(0)

    def timed_chain(make_body, x0, rep, outer=3,
                    score=lambda x: jnp.sum(x.reshape(-1)[:4])):
        """Device seconds per body application, honestly measured.

        Times the rep-length and the (rep//4)-length chain and returns
        the slope, cancelling fixed per-call host overhead exactly.
        """
        rep_lo = max(1, rep // 4)

        def run(r):
            def chained(x):
                def body(c, _):
                    return make_body(c), ()
                x, _ = jax.lax.scan(body, x, None, length=r)
                return x, score(x)
            f = jax.jit(chained)
            x, s = f(x0)
            _ = float(s)  # compile + warmup, real sync
            t0 = time.perf_counter()
            for _ in range(outer):
                x, s = f(x)
                _ = float(s)
            return (time.perf_counter() - t0) / outer

        dt = (run(rep) - run(rep_lo)) / (rep - rep_lo)
        if dt <= 0:
            # Host-link jitter exceeded the chain-length delta — retry
            # once in-place with a 4x longer chain (amortizes the jitter
            # 4x better) before failing the section to guarded()'s
            # process-level retry.  (r4: sec_wifi tripped this once per
            # sweep at rep=24.)
            rep *= 4
            dt = (run(rep) - run(max(1, rep // 4))) / (rep - rep // 4)
        if dt <= 0:
            raise RuntimeError(
                f"non-positive chain-differenced time ({dt:.3e} s); "
                f"rep={rep} too small vs host-link jitter"
            )
        return dt

    def report(metric, value, unit, ref_key):
        vs = value / ref[ref_key] if ref_key in ref else None
        print(json.dumps({
            "metric": metric,
            "value": round(value, 2),
            "unit": unit,
            "vs_baseline": round(vs, 1) if vs else None,
        }), flush=True)

    only = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None

    def guarded(section):
        if only is not None and section.__name__.removeprefix("sec_") not in only:
            return
        # Retry once (the remote compile service has flaky windows), but
        # report EVERY failure loudly: full traceback to stderr plus a
        # JSON error line naming the section, so a section can never
        # silently vanish from the output.
        import traceback

        for attempt in (0, 1):
            try:
                section()
                return
            except Exception as e:  # pragma: no cover
                traceback.print_exc()
                print(
                    json.dumps({
                        "error": f"{section.__name__} attempt {attempt}: "
                                 f"{type(e).__name__}: {e}",
                    }),
                    flush=True,
                )

    # --- soft Viterbi K=7 ---
    def sec_viterbi():
        tr = Trellis(np.array([6]), np.array([[0o133, 0o171]]))
        B, L = 2048, 1024
        x0 = jnp.asarray(rng.randn(B, 2 * L).astype(np.float32) * 3)
        def body(c):
            dec = viterbi_decode_device(c, tr, 30, "soft", L=L,
                                        backend="auto")
            return c.at[0, 0].add(jnp.sum(dec).astype(c.dtype) * 1e-12)
        dt = timed_chain(body, x0, rep=30)
        report("viterbi_k7_soft", B * L / dt, "info bits/s",
               "viterbi_k7_soft_bits_per_s")
    guarded(sec_viterbi)

    # --- turbo 8 iterations ---
    def sec_turbo():
        trt = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
        Lt, Bt = 256, 4096
        interlv = RandInterlv(Lt, 0)
        x0 = jnp.asarray(rng.randn(Bt, Lt).astype(np.float32))
        def body(c):
            d = turbo_decode_device(c, c, c, trt, 0.5, 8, interlv.p_array)
            return c + d.astype(c.dtype).sum() * 1e-12
        dt = timed_chain(body, x0, rep=10)
        report("turbo_8it", Bt * Lt / dt, "info bits/s",
               "turbo_8it_bits_per_s")
    guarded(sec_turbo)

    # --- turbo, production frame length (LTE-size), windowed BCJR ---
    def sec_turbo_long():
        trt = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
        Lt, Bt = 6144, 256
        interlv = RandInterlv(Lt, 0)
        x0 = jnp.asarray(rng.randn(Bt, Lt).astype(np.float32))
        def body(c):
            d = turbo_decode_device(c, c, c, trt, 0.5, 8, interlv.p_array,
                                    window=(256, 32))
            return c + d.astype(c.dtype).sum() * 1e-12
        dt = timed_chain(body, x0, rep=6)
        report("turbo_8it_L6144_windowed", Bt * Lt / dt, "info bits/s",
               "turbo_8it_bits_per_s")
    guarded(sec_turbo_long)

    # --- turbo, LTE-size, NII windows + bf16 streams ---
    def sec_turbo_nii():
        trt = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
        Lt, Bt = 6144, 256
        interlv = RandInterlv(Lt, 0)
        x0 = jnp.asarray(rng.randn(Bt, Lt).astype(np.float32))
        def body(c):
            d = turbo_decode_device(c, c, c, trt, 0.5, 8, interlv.p_array,
                                    window=(128, 0), backend="pallas",
                                    window_init="nii", kernel_io="bf16")
            return c + d.astype(c.dtype).sum() * 1e-12
        dt = timed_chain(body, x0, rep=6)
        report("turbo_8it_L6144_nii_bf16", Bt * Lt / dt, "info bits/s",
               "turbo_8it_bits_per_s")
    guarded(sec_turbo_nii)

    # --- LDPC WiMAX 1440.720 MSA 15 iterations ---
    def sec_ldpc():
        design = os.path.join(
            here, "..", "commpy_tpu", "designs", "ldpc", "wimax",
            "1440.720.txt"
        )
        params = get_ldpc_code_params(design, True)
        Bl = 256
        x0 = jnp.asarray(rng.randn(Bl, 1440).astype(np.float32) * 2)
        def body(c):
            dec, out = ldpc_bp_decode_device(c, params, "MSA", 15)
            return c + out * 1e-9
        # the QC-lifted VMEM kernel decodes in ~0.3 ms: long chains or
        # the host-link jitter swamps the difference
        dt = timed_chain(body, x0, rep=24)
        report("ldpc_wimax_msa15", Bl * 720 / dt, "info bits/s",
               "ldpc_wimax_msa15_info_bits_per_s")
    guarded(sec_ldpc)

    # --- QC-LDPC 802.11n (1944, 972) MSA 15 iterations (roll-based BP) ---
    def sec_qcldpc():
        from commpy_tpu.ops.qcldpc import ieee80211n_params, qc_bp_decode_device

        params = ieee80211n_params(1944, "1/2")
        Bq = 256
        x0 = jnp.asarray(rng.randn(Bq, 1944).astype(np.float32) * 2)
        def body(c):
            dec, out = qc_bp_decode_device(c, params, "MSA", 15)
            return c + out * 1e-9
        dt = timed_chain(body, x0, rep=24)
        report("qcldpc_80211n_1944_msa15", Bq * 972 / dt, "info bits/s",
               "qcldpc_80211n_1944_msa15_info_bits_per_s")
    guarded(sec_qcldpc)

    # --- QC-LDPC 802.11n layered schedule (equal-BER at ~half the
    # iterations of flooding-15; see tests/test_qcldpc.py) ---
    def sec_qcldpc_layered():
        from commpy_tpu.ops.qcldpc import ieee80211n_params, \
            qc_bp_decode_device
        params = ieee80211n_params(1944, "1/2")
        Bq = 512
        x0 = jnp.asarray(
            rng.randn(Bq, 1944).astype(np.float32) * 2 + 1.0)
        def body(c):
            dec, out = qc_bp_decode_device(c, params, "MSA", 8,
                                           backend="pallas",
                                           schedule="layered")
            return c + out * 1e-9
        dt = timed_chain(body, x0, rep=24)
        report("qcldpc_80211n_layered8", Bq * 972 / dt, "info bits/s",
               "qcldpc_80211n_1944_msa15_info_bits_per_s")
    guarded(sec_qcldpc_layered)

    # --- QC-LDPC DVB-S2-class size (n=16200) MSA 15 iterations ---
    # Beyond the reference's reach: its largest shipped design is
    # n=1440 and its sparse decoder is single-threaded CPU
    # (reference ldpc.py:144-255).  Synthesized IRA-style QC code at the
    # DVB-S2 long-frame length; roll-based O(E) BP.
    def sec_qcldpc_dvbs2():
        # DVB-S2-class (synthetic address tables, standard-exact
        # structure incl. the bit-accumulator wrap edge — see
        # ops/dvbs2.py provenance note).  Random LLR input = no lane
        # ever early-exits, so this is the full-iteration worst case.
        from commpy_tpu.ops.dvbs2 import (
            dvbs2_qc_params, synthetic_address_table,
        )
        from commpy_tpu.ops.qcldpc import qc_bp_decode_device

        tab = synthetic_address_table(16200, "1/2", seed=0)
        params = dvbs2_qc_params(tab, 16200, "1/2")
        Bq = 512
        x0 = jnp.asarray(rng.randn(Bq, 16200).astype(np.float32) * 2)

        # layered-8 == flooding-15 BER (tests/test_qcldpc.py); the
        # layered schedule runs on the HBM-streamed Pallas kernel.
        # msg_io='bf16' halves the kernel's dominant HBM traffic (it is
        # HBM-bound; 2.4x measured; BER-parity tested) — an explicit
        # opt-in here since r5, when the library default reverted to
        # full-precision f32 message storage.
        def body_l(c):
            dec, out = qc_bp_decode_device(c, params, "MSA", 8,
                                           schedule="layered",
                                           msg_io="bf16")
            return c + out * 1e-9
        dt = timed_chain(body_l, x0, rep=8)
        report("qcldpc_dvbs2_16200_layered8", Bq * 7200 / dt,
               "info bits/s", "")

        # full-precision message streams, for comparison across rounds
        def body_lf(c):
            dec, out = qc_bp_decode_device(c, params, "MSA", 8,
                                           schedule="layered",
                                           backend="pallas-streamed",
                                           msg_io="f32")
            return c + out * 1e-9
        dt = timed_chain(body_lf, x0, rep=8)
        report("qcldpc_dvbs2_16200_layered8_f32msg", Bq * 7200 / dt,
               "info bits/s", "")

        # flooding-15 on the XLA roll core (the reference-shaped
        # schedule), kept so both schedules stay comparable across
        # rounds at equal BER
        Bf = 64
        xf = jnp.asarray(rng.randn(Bf, 16200).astype(np.float32) * 2)

        def body_f(c):
            dec, out = qc_bp_decode_device(c, params, "MSA", 15,
                                           schedule="flooding")
            return c + out * 1e-9
        dt = timed_chain(body_f, xf, rep=6)
        report("qcldpc_dvbs2_16200_msa15", Bf * 7200 / dt,
               "info bits/s", "")
    guarded(sec_qcldpc_dvbs2)

    # --- Polar codes (beyond reference: CommPy has no polar codec) ---
    # SC: blocked lax.scan over 2^k-leaf subtrees on value-major flat
    # state.  SCL-8+CRC11: path axis on sublanes, deferred per-block
    # path permutation as elementwise multiply-reduce (ops/polar.py).
    def sec_polar():
        from commpy_tpu.ops.polar import (
            make_polar_sc_decoder, make_polar_scl_decoder, polar_construct,
        )

        code = polar_construct(1024, 512, design_snr_db=2.0)
        Bp = 2048
        x0 = jnp.asarray(rng.randn(Bp, 1024).astype(np.float32) * 3)
        sc = make_polar_sc_decoder(code, rule="minsum")

        def body(c):
            dec = sc(c)
            return c.at[0, 0].add(jnp.sum(dec).astype(c.dtype) * 1e-12)
        dt = timed_chain(body, x0, rep=8)
        report("polar_sc_1024_512", Bp * 512 / dt, "info bits/s", "")

        codec = polar_construct(1024, 512, crc="crc11", design_snr_db=2.0)
        scl = make_polar_scl_decoder(codec, list_size=8, rule="minsum",
                                     pm_rule="approx")
        Bl = 256
        xl = jnp.asarray(rng.randn(Bl, 1024).astype(np.float32) * 3)

        def body_l(c):
            dec = scl(c)
            return c.at[0, 0].add(jnp.sum(dec).astype(c.dtype) * 1e-12)
        dt = timed_chain(body_l, xl, rep=4)
        report("polar_scl8_crc11_1024_512", Bl * 512 / dt,
               "info bits/s", "")

        # r5: statically-unrolled SCL (bit-identical decoder, no
        # scan/cond/switch dispatch — see make_polar_scl_decoder_unrolled)
        from commpy_tpu.ops.polar import make_polar_scl_decoder_unrolled
        sclu = make_polar_scl_decoder_unrolled(codec, list_size=8,
                                               rule="minsum",
                                               pm_rule="approx")
        Bu = 1024
        xu = jnp.asarray(rng.randn(Bu, 1024).astype(np.float32) * 3)

        def body_u(c):
            dec = sclu(c)
            return c.at[0, 0].add(jnp.sum(dec).astype(c.dtype) * 1e-12)
        dt = timed_chain(body_u, xu, rep=32)
        report("polar_scl8_crc11_1024_512_unrolled", Bu * 512 / dt,
               "info bits/s", "")
    guarded(sec_polar)

    # --- BCH hard-decision decode (beyond reference: CommPy has no
    # algebraic codec).  DVB-S2-class outer-code shape: t=12 over
    # GF(2^16), shortened to n=16200.  Bit-sliced syndromes/BM/Chien
    # (ops/bch.py). ---
    def sec_bch():
        from commpy_tpu.ops.bch import bch_construct, bch_encode, \
            make_bch_decoder

        code = bch_construct(16, 12, shorten=(1 << 16) - 1 - 16200)
        Bb = 256
        brng = np.random.default_rng(0)
        msg = brng.integers(0, 2, (Bb, code.k))
        cw = np.asarray(bch_encode(code, msg))
        rx = cw.copy()
        for b in range(Bb):
            pos = brng.choice(code.n, 12, replace=False)
            rx[b, pos] ^= 1
        dec = make_bch_decoder(code)
        x0 = jnp.asarray(rx.astype(np.float32))

        def body(c):
            _, ne, _ = dec(c.astype(jnp.int8))
            return c.at[0, 0].add(jnp.sum(ne).astype(c.dtype) * 1e-12)
        dt = timed_chain(body, x0, rep=8)
        report("bch_dvbs2_16200_t12", Bb * code.k / dt, "info bits/s", "")
    guarded(sec_bch)

    # --- 5G-NR-style QC-LDPC BG1 (synthetic-NR-style shifts, standard
    # structure; ops/nrldpc.py — VERDICT r4 item 8) ---
    def sec_nrldpc():
        from commpy_tpu.ops.nrldpc import nr_code_params, nr_encode_device
        from commpy_tpu.ops.qcldpc import qc_bp_decode_device

        p = nr_code_params(1, 208)  # n=14144, k=4576 (Z=13*16)
        Bn = 32
        nrng = np.random.default_rng(0)
        msg = nrng.integers(0, 2, (Bn, p["k_bits"]))
        cw = np.asarray(nr_encode_device(jnp.asarray(msg, jnp.int8), p),
                        np.float32)
        llr = (1.0 - 2.0 * cw) * 2.0 + nrng.normal(0, 0.8, cw.shape)
        x0 = jnp.asarray(llr.astype(np.float32))

        def body(c):
            dec, out = qc_bp_decode_device(c, p, "MSA", 8,
                                           schedule="layered")
            return c + out * 1e-9
        dt = timed_chain(body, x0, rep=8)
        report("nrldpc_bg1_z208_layered8", Bn * p["k_bits"] / dt,
               "info bits/s", "")
    guarded(sec_nrldpc)

    # --- Turbo product code (31,21)^2 Chase-Pyndiah (beyond reference;
    # VERDICT r4 weak #7: first on-chip throughput row for TPC) ---
    def sec_tpc():
        from commpy_tpu.ops.bch import bch_construct
        from commpy_tpu.ops.tpc import make_tpc_decoder, tpc_encode

        code = bch_construct(5, 2)  # (31,21) t=2; product rate 0.459
        Bt = 64
        trng = np.random.default_rng(0)
        data = trng.integers(0, 2, (Bt, code.k, code.k))
        cw = np.asarray(tpc_encode(code, code, jnp.asarray(data)))
        llr = (1.0 - 2.0 * cw) * 4.0 + trng.normal(
            0, 1.4, cw.shape)  # ~2 dB-ish soft input
        dec = make_tpc_decoder(code, code, iterations=4, p=4)
        x0 = jnp.asarray(llr.astype(np.float32))

        def body(c):
            d, _ = dec(c)
            return c.at[0, 0, 0].add(jnp.sum(d).astype(c.dtype) * 1e-12)
        dt = timed_chain(body, x0, rep=8)
        report("tpc_31_21_sq_chase4", Bt * code.k * code.k / dt,
               "info bits/s", "")
    guarded(sec_tpc)

    # --- MMSE equalizer: taps + filtering (beyond reference; VERDICT r4
    # weak #7: first on-chip throughput row for the equalizer family) ---
    def sec_equalize():
        from commpy_tpu.ops.equalize import (equalize, equalizer_delay,
                                             mmse_fir_taps)

        Be, n, Lh, T = 256, 4096, 5, 31
        erng = np.random.default_rng(0)
        # NumPy closures only: a device-resident complex closure forces
        # a complex64 readback during jit constant embedding, which the
        # axon backend cannot do (r5: this section UNIMPLEMENTED'd on a
        # jnp.asarray(h) closure)
        hr_ = (erng.normal(size=(Be, Lh)) * np.sqrt(0.5 / Lh)).astype(
            np.float32)
        hi_ = (erng.normal(size=(Be, Lh)) * np.sqrt(0.5 / Lh)).astype(
            np.float32)
        yr = erng.normal(size=(2, Be, n)).astype(np.float32)
        y0 = (jnp.asarray(yr[0]), jnp.asarray(yr[1]))
        delay = equalizer_delay(T, Lh)

        def body(c):
            yre, yim = c
            y = jax.lax.complex(yre, yim)
            h = jax.lax.complex(jnp.asarray(hr_), jnp.asarray(hi_))
            w = mmse_fir_taps(h, 0.05, T)  # per-batch taps [Be, T]
            z = jax.vmap(lambda yy, ww: equalize(yy, ww, delay))(y, w)
            return (yre + jnp.real(z[:, :1]) * 1e-12, yim)

        dt = timed_chain(body, y0, rep=16,
                         score=lambda c: jnp.sum(c[0][:4]))
        report("equalize_mmse_t31_l5", Be * n / dt / 1e6, "Msamples/s",
               "")
    guarded(sec_equalize)

    # --- Reed-Solomon RS(255,223) t=16 (CCSDS shape; beyond reference) ---
    def sec_rs():
        from commpy_tpu.ops.rs import rs_construct, rs_encode, \
            make_rs_decoder

        code = rs_construct(8, 16)
        Br = 2048  # throughput batch: BM is op-count-bound, amortizes
        rrng = np.random.default_rng(0)
        msg = rrng.integers(0, 256, (Br, code.k))
        cw = np.asarray(rs_encode(code, msg))
        rx = cw.copy()
        for b in range(Br):
            pos = rrng.choice(code.n, 16, replace=False)
            rx[b, pos] ^= rrng.integers(1, 256, 16)
        dec = make_rs_decoder(code)
        x0 = jnp.asarray(rx.astype(np.float32))

        def body(c):
            _, ne, _ = dec(c.astype(jnp.int32))
            return c.at[0, 0].add(jnp.sum(ne).astype(c.dtype) * 1e-12)
        dt = timed_chain(body, x0, rep=8)
        report("rs_255_223_t16", Br * code.k * 8 / dt, "info bits/s", "")
    guarded(sec_rs)

    # --- 16-QAM exact-LLR soft demod ---
    def sec_demod():
        const = M.qam_constellation(16).astype(np.complex64)
        Ns = 1 << 20
        re0 = jnp.asarray(rng.randn(Ns).astype(np.float32))
        im0 = jnp.asarray(rng.randn(Ns).astype(np.float32))

        # complex scan carries are not supported on every TPU runtime;
        # carry (re, im) float pairs instead.
        def body(c):
            r, i = c
            llr = M.demodulate_soft(jax.lax.complex(r, i), const, 4, 0.1)
            return (r + jnp.sum(llr) * 1e-20, i)

        dt = timed_chain(body, (re0, im0), rep=48,
                         score=lambda c: jnp.sum(c[0][:4]))
        report("qam16_soft_demod", Ns / dt / 1e6, "Msamples/s",
               "qam16_soft_demod_msamples_per_s")

        # 64-QAM: auto routes to the axis-separable exact-LLR fast path
        # (per-axis logsumexp factorization; 3.9x vs joint measured)
        const64 = M.qam_constellation(64).astype(np.complex64)

        def body64(c):
            r, i = c
            llr = M.demodulate_soft(jax.lax.complex(r, i), const64, 6, 0.1)
            return (r + jnp.sum(llr) * 1e-20, i)

        dt = timed_chain(body64, (re0, im0), rep=24,
                         score=lambda c: jnp.sum(c[0][:4]))
        report("qam64_soft_demod", Ns / dt / 1e6, "Msamples/s", "")
    guarded(sec_demod)

    # --- K-best (K=16) 4x4 16-QAM MIMO detection ---
    def sec_kbest():
        from commpy_tpu.ops.mimo import kbest_device
        from commpy_tpu.ops.modem import qam_constellation

        # NumPy on purpose: a device-resident complex closure forces a
        # complex64 readback during jit constant embedding, which the
        # axon TPU backend cannot do (same issue as commit 1028330).
        const = qam_constellation(16).astype(np.complex64)
        Bk = 4096
        hr = rng.randn(2, Bk, 4, 4).astype(np.float32) / np.sqrt(2)
        yr = rng.randn(2, Bk, 4).astype(np.float32)
        h0 = (hr[0], hr[1])
        y0 = (yr[0], yr[1])

        def body(c):
            yre, yim = c
            y = jax.lax.complex(yre, yim)
            h = jax.lax.complex(jnp.asarray(h0[0]), jnp.asarray(h0[1]))
            sym = kbest_device(y, h, const, 16)
            return (yre + jnp.real(sym[:, 0:1]) * 1e-12, yim)

        dt = timed_chain(body, y0, rep=12,
                         score=lambda c: jnp.sum(c[0][:4]))
        report("kbest16_4x4_16qam", Bk / dt, "vectors/s",
               "kbest16_4x4_16qam_vectors_per_s")

        def body_soft(c):
            yre, yim = c
            y = jax.lax.complex(yre, yim)
            h = jax.lax.complex(jnp.asarray(h0[0]), jnp.asarray(h0[1]))
            llrs = kbest_device(y, h, const, 16, 0.25, "soft", 4)
            return (yre + llrs[:, 0:1] * 1e-12, yim)

        dt = timed_chain(body_soft, y0, rep=12,
                         score=lambda c: jnp.sum(c[0][:4]))
        report("kbest16_4x4_16qam_soft", Bk / dt, "vectors/s", "")
    guarded(sec_kbest)

    # --- full 802.11 MCS-4 link step ---
    def sec_wifi():
        # F frames per step = the Viterbi batch; 2048 matches the
        # throughput regime every other section measures (the r4 stage
        # profile shows the link is the exact SUM of frontend+decoder
        # at this shape — scripts/wifi_stage_profile.py)
        link = wifi80211_device_link(mcs=4, frame_bits=1200)
        F = 2048
        ns = jnp.float32(link.noise_std_fn(12.0))
        x0 = jax.random.PRNGKey(0)
        def body(k0):
            errs = link.link_step(jax.random.split(k0, F), ns)
            return jax.random.fold_in(k0, errs)
        dt = timed_chain(body, x0, rep=24, score=jnp.sum)
        report("wifi_mcs4_full_link", F * 1200 / dt, "info bits/s", "")
    guarded(sec_wifi)

    # --- full 802.11n LDPC PHY link step (16-QAM + QC BP MSA-15) ---
    def sec_wifi_ldpc():
        from commpy_tpu.models.wifi80211_link import wifi80211n_ldpc_link

        link = wifi80211n_ldpc_link(n=1944, modulation_m=16)
        F = 512  # the QC BP bench batch
        ns = jnp.float32(link.noise_std_fn(10.0))
        x0 = jax.random.PRNGKey(0)
        def body(k0):
            errs = link.link_step(jax.random.split(k0, F), ns)
            return jax.random.fold_in(k0, errs)
        dt = timed_chain(body, x0, rep=12, score=jnp.sum)
        report("wifi80211n_ldpc1944_full_link", F * link.frame_bits / dt,
               "info bits/s", "")
    guarded(sec_wifi_ldpc)

    # --- OFDM multipath link with blind channel estimation in the loop ---
    # Full receiver realism: one pilot OFDM symbol, LS estimate projected
    # onto the delay subspace (csi="smooth"), per-subcarrier equalization
    # and noise weighting, QC BP decode.  The only full-link row whose
    # receiver estimates the channel instead of being handed it.
    def sec_ofdm():
        from commpy_tpu.models.device_links import make_ofdm_qcldpc_link
        from commpy_tpu.ops.qcldpc import ieee80211n_params

        link = make_ofdm_qcldpc_link(
            qc_params=ieee80211n_params(1944, "1/2"),
            modulation_m=4, nfft=64, nsc=54, n_taps=4, csi="smooth",
        )
        F = 256
        ns = jnp.float32(link.noise_std_fn(8.0))
        x0 = jax.random.PRNGKey(0)

        def body(k0):
            errs = link.link_step(jax.random.split(k0, F), ns)
            return jax.random.fold_in(k0, errs)

        dt = timed_chain(body, x0, rep=12, score=jnp.sum)
        report("ofdm_qcldpc_smoothcsi_full_link", F * link.frame_bits / dt,
               "info bits/s", "")
    guarded(sec_ofdm)

    # --- full MIMO links driven end to end (VERDICT r3 item 8) ---
    # The reference bar here is its per-vector Python receive loop
    # (links.py:320-326: one kbest() call per received vector); both
    # links below run every vector of every frame through ONE batched
    # search inside the jitted link step.
    def sec_mimo_link():
        from commpy_tpu.models.device_links import (
            make_bestfirst_ldpc_mimo_link, make_kbest_mimo_link,
        )
        from commpy_tpu.ops.ldpc import get_ldpc_code_params

        # (a) uncoded 4x4 16-QAM K-best(16) hard link: bits -> modulate
        # -> Rayleigh -> batched K-best -> demod -> xor count
        link = make_kbest_mimo_link(vectors_per_frame=32)
        F = 128  # 4096 vectors per step
        ns = jnp.float32(link.noise_std_fn(15.0))
        x0 = jax.random.PRNGKey(0)

        def body(k0):
            errs = link.link_step(jax.random.split(k0, F), ns)
            return jax.random.fold_in(k0, errs)

        dt = timed_chain(body, x0, rep=10, score=jnp.sum)
        report("kbest_mimo_full_link", F * 32 / dt, "vectors/s", "")

        # (b) the tier-3 coded model with the K-best soft detector:
        # WiMAX LDPC(1440,720) encode -> 16-QAM -> 4x4 Rayleigh ->
        # batched K-best max-log soft LLRs -> MSA-15 BP decode
        design = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..",
            "commpy_tpu", "designs", "ldpc", "wimax", "1440.720.txt",
        )
        params = get_ldpc_code_params(design, True)
        clink = make_bestfirst_ldpc_mimo_link(
            ldpc_params=params, detector="kbest", beam=16,
        )
        Fc = 64  # 64 codewords = 5760 vectors per step
        nsc = jnp.float32(clink.noise_std_fn(18.0))

        def body_c(k0):
            errs = clink.link_step(jax.random.split(k0, Fc), nsc)
            return jax.random.fold_in(k0, errs)

        dt = timed_chain(body_c, x0, rep=6, score=jnp.sum)
        n_vec = 1440 // 4 // 4  # n / bps / nb_tx
        report("kbest_ldpc_mimo_full_link", Fc * n_vec / dt,
               "vectors/s", "")
    guarded(sec_mimo_link)


if __name__ == "__main__":
    main()
