"""Per-kernel roofline: measured throughput vs v5e hardware walls.

VERDICT r2 item 7: bench numbers were only reported vs the reference
CPU (an easy 1e5-1e6x bar); nothing said how close each kernel sits to
the CHIP's own limits, so perf work was blind.  This script times every
headline kernel at its bench configuration, pairs the measurement with
an analytic work model (FLOPs by unit, HBM bytes — documented inline,
+-30% attribution estimates, not accounting identities), and reports
the fraction of each hardware peak plus the binding wall.

Peaks (TPU v5e, public datasheet / scaling-book numbers):
  MXU  197 TFLOP/s   bf16 operands (DEFAULT precision f32 rounds to
                     bf16, 1 pass -> same peak; HIGHEST ~ /6)
  VPU  ~3.9 TFLOP/s  f32 elementwise (8 sublanes x 128 lanes x 4 ALUs
                     x ~0.94 GHz)
  HBM  819 GB/s      16 GB

A kernel whose binding-wall fraction is low is LATENCY/ISSUE-bound:
its per-step dependent chain (sequential recursions, small grids)
dominates, not any throughput wall — the roofline calls that out
explicitly, because "make the ops bigger" (more batch) is then the
only lever.

Run on the target device:  python benchmarks/roofline.py
Writes benchmarks/roofline_latest.jsonl and prints a markdown table
(pasted into docs/performance.md by scripts/render_roofline? no —
copy the printed table; the JSONL is the artifact of record).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

PEAK_MXU = 197e12   # bf16-operand FLOP/s
PEAK_VPU = 3.9e12   # f32 elementwise FLOP/s
PEAK_HBM = 819e9    # bytes/s


def main():
    import jax
    import jax.numpy as jnp

    from commpy_tpu.channelcoding import RandInterlv
    from commpy_tpu.ops.trellis import Trellis

    assert jax.default_backend() in ("tpu", "axon"), (
        "rooflines are device measurements; run on the TPU"
    )
    rng = np.random.RandomState(0)
    rows = []

    def timed_chain(make_body, x0, rep, outer=3,
                    score=lambda x: jnp.sum(x.reshape(-1)[:4])):
        rep_lo = max(1, rep // 4)

        def run(r):
            def chained(x):
                def body(c, _):
                    return make_body(c), ()
                x, _ = jax.lax.scan(body, x, None, length=r)
                return x, score(x)
            f = jax.jit(chained)
            x, s = f(x0)
            _ = float(s)
            t0 = time.perf_counter()
            for _ in range(outer):
                x, s = f(x)
                _ = float(s)
            return (time.perf_counter() - t0) / outer

        for _ in range(4):  # host jitter can beat short chains; retry
            dt = (run(rep) - run(rep_lo)) / (rep - rep_lo)
            if dt > 0:
                return dt
        raise RuntimeError("non-positive chain-differenced time")

    def guarded(section):
        # one jitter-struck or service-struck section must not kill the
        # whole artifact; report and continue (r5)
        import traceback
        for attempt in (0, 1):
            try:
                section()
                return
            except Exception as e:  # pragma: no cover
                traceback.print_exc()
                print(json.dumps({"error": f"{section.__name__} attempt "
                                  f"{attempt}: {type(e).__name__}: {e}"}),
                      flush=True)

    def add(name, seconds, mxu_flops, vpu_flops, hbm_bytes, note):
        f_mxu = mxu_flops / seconds / PEAK_MXU
        f_vpu = vpu_flops / seconds / PEAK_VPU
        f_hbm = hbm_bytes / seconds / PEAK_HBM
        walls = {"MXU": f_mxu, "VPU": f_vpu, "HBM": f_hbm}
        wall = max(walls, key=walls.get)
        row = {
            "kernel": name,
            "ms": round(seconds * 1e3, 3),
            "mxu_tflops": round(mxu_flops / seconds / 1e12, 2),
            "vpu_gflops": round(vpu_flops / seconds / 1e9, 1),
            "hbm_gbps": round(hbm_bytes / seconds / 1e9, 1),
            "pct_mxu": round(100 * f_mxu, 1),
            "pct_vpu": round(100 * f_vpu, 1),
            "pct_hbm": round(100 * f_hbm, 1),
            "wall": wall,
            "pct_wall": round(100 * walls[wall], 1),
            "note": note,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # ---- Viterbi ACS forward kernel (K=7 soft, bench shape) ----
    def sec_acs():
        from commpy_tpu.kernels.viterbi_acs import acs_forward_pallas

        tr = Trellis(np.array([6]), np.array([[0o133, 0o171]]))
        B, L = 2048, 1024
        T = L + 5  # (L + tm)//k - 1
        S, n, G = 64, 2, 4
        x0 = jnp.asarray(rng.randn(B, T, n).astype(np.float32))

        def body(c):
            dec, best = acs_forward_pallas(c, tr, "soft", layout="gmaj")
            return c + best.astype(c.dtype).sum() * 1e-12

        dt = timed_chain(body, x0, rep=12)
        # per step: perm [2S,S]@[S,B], branch [2S,n]@[n,B], pack [G,S]@[S,B]
        mxu = T * 2 * (2 * S * S * B + 2 * S * n * B + G * S * B)
        vpu = T * 8 * S * B  # cand add/min/select/renorm/argmin
        hbm = (T * n * B + T * G * B + T * B) * 4
        add("viterbi_acs_fwd k7 B2048", dt, mxu, vpu, hbm,
            "sequential [128,64]@[64,2048] chain; 1 MXU op depth/step")
    guarded(sec_acs)

    # ---- Viterbi traceback kernel ----
    def sec_tb():
        from commpy_tpu.kernels.viterbi_acs import (acs_forward_pallas,
                                                    traceback_pallas)

        tr = Trellis(np.array([6]), np.array([[0o133, 0o171]]))
        B, L, tb = 2048, 1024, 30
        T = L + 5
        S, G = 64, 4
        x = jnp.asarray(rng.randn(B, T, 2).astype(np.float32))
        dec, best = acs_forward_pallas(x, tr, "soft", layout="gmaj")
        dec = jax.block_until_ready(dec)

        def body(c):
            bits = traceback_pallas(dec, c, S, tb, layout="gmaj")
            # the carry perturbation must be FLOAT-fed and non-zero: an
            # integer *0 constant-folds and DCE deletes the kernel (the
            # first version of this section measured an empty scan)
            return c + (bits.astype(jnp.float32).sum() * 1e-12).astype(
                c.dtype)

        dt = timed_chain(body, best, rep=12)
        vpu = B * T * tb * (3 * G + 12)  # word select + bit walk + emit
        hbm = (G * B * T + B * T) * 4 + B * T
        add("viterbi_traceback k7 tb30", dt, 0.0, vpu, hbm,
            "VPU-saturated: the analytic per-depth op count lands >100% "
            "of peak, i.e. Mosaic emits fewer ops than the jnp source "
            "(constant select chains hoisted across the unrolled loop)")
    guarded(sec_tb)

    # ---- BCJR MAP pass (standard turbo bench constituent) ----
    def sec_bcjr():
        from commpy_tpu.kernels.bcjr import bcjr_appdiff_pallas

        trt = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
        T, R = 256, 4096
        S, I = 4, 2
        syn = jnp.asarray(rng.randn(T, R).astype(np.float32))
        pan = jnp.asarray(rng.randn(T, R).astype(np.float32))

        def body(c):
            e = bcjr_appdiff_pallas(syn, pan, c, trt)
            return c + e * 1e-9

        li0 = jnp.asarray(rng.randn(T, R).astype(np.float32))
        dt = timed_chain(body, li0, rep=96)
        # alpha + beta recursions + APP: ~(2 recursions * S*I*3 + S*6) /step
        vpu = T * R * (2 * S * I * 3 + S * 6)
        hbm = (3 * T * R + T * R) * 4
        add("bcjr_map_pass T256 R4096", dt, 0.0, vpu, hbm,
            "2 sequential recursions, whole-tile picks; alpha VMEM-resident")
    guarded(sec_bcjr)

    # ---- QC BP resident kernel, 802.11n layered-8 ----
    def sec_qc():
        from commpy_tpu.ops.qcldpc import ieee80211n_params, qc_bp_decode_device

        p = ieee80211n_params(1944, "1/2")
        Z = p["Z"]
        E = int(np.sum(np.asarray(p["block_j"]) >= 0)) * Z  # edges
        B, n_it = 512, 8
        x0 = jnp.asarray(rng.randn(B, 1944).astype(np.float32) * 2)

        def body(c):
            dec, out = qc_bp_decode_device(c, p, "MSA", n_it,
                                           schedule="layered")
            return c + out * 1e-9

        dt = timed_chain(body, x0, rep=8)
        # per edge per iter: v2c assemble (2), roll, cn two-min (~6),
        # writeback (~4), syndrome (~3) -> ~18 VPU ops; + totals updates
        vpu = n_it * E * B * 18
        hbm = 3 * B * 1944 * 4  # in llr + out dec/llr (messages resident)
        add("qc_bp resident 80211n layered8 B512", dt, 0.0, vpu, hbm,
            "all 8 iterations VMEM-resident; random-LLR worst case")
    guarded(sec_qc)

    # ---- QC BP HBM-streamed kernel, DVB-S2-class layered-8 ----
    def sec_qcs():
        from commpy_tpu.ops.dvbs2 import (dvbs2_qc_params,
                                          synthetic_address_table)
        from commpy_tpu.ops.qcldpc import qc_bp_decode_device

        tab = synthetic_address_table(16200, "1/2", seed=0)
        p = dvbs2_qc_params(tab, 16200, "1/2")
        Z = p["Z"]
        E = int(np.sum(np.asarray(p["block_j"]) >= 0)) * Z
        B, n_it = 512, 8
        x0 = jnp.asarray(rng.randn(B, 16200).astype(np.float32) * 2)

        def body(c):
            dec, out = qc_bp_decode_device(c, p, "MSA", n_it,
                                           schedule="layered",
                                           backend="pallas-streamed")
            return c + out * 1e-9

        dt = timed_chain(body, x0, rep=6)
        vpu = n_it * E * B * 18
        # c2v tiles stream HBM->VMEM->HBM every iteration; the streamed
        # kernel stores them bf16 by default since r4 (2 bytes/message)
        hbm = n_it * 2 * E * B * 2 + 3 * B * 16200 * 4
        add("qc_bp streamed dvbs2class layered8 B512 bf16", dt, 0.0, vpu,
            hbm, "c2v store streamed bf16 from HBM per layer; totals "
            "resident f32")
    guarded(sec_qcs)

    # ---- 16-QAM exact-LLR soft demod ----
    def sec_demod():
        from commpy_tpu.ops import modem as M

        const = M.qam_constellation(16).astype(np.complex64)
        Ns = 1 << 20
        re0 = jnp.asarray(rng.randn(Ns).astype(np.float32))
        im0 = jnp.asarray(rng.randn(Ns).astype(np.float32))

        def body(c):
            r, i = c
            llr = M.demodulate_soft(jax.lax.complex(r, i),
                                    jnp.asarray(const), 4, 0.1)
            return (r + jnp.sum(llr) * 1e-20, i)

        dt = timed_chain(body, (re0, im0), rep=24,
                         score=lambda c: jnp.sum(c[0][:4]))
        m, bps = 16, 4
        vpu = Ns * (m * 6 + bps * 2 * m * 2)  # dists + per-bit logsumexp
        hbm = Ns * (8 + bps * 4)
        add("qam16_soft_demod 1M", dt, 0.0, vpu, hbm,
            "pure elementwise; XLA-fused")
    guarded(sec_demod)

    # ---- batched K-best ----
    def sec_kbest():
        from commpy_tpu.ops.mimo import kbest_device
        from commpy_tpu.ops.modem import qam_constellation

        const = qam_constellation(16).astype(np.complex64)
        Bk, nt, K, m = 4096, 4, 16, 16
        hr = rng.randn(2, Bk, nt, nt).astype(np.float32) / np.sqrt(2)
        yr = rng.randn(2, Bk, nt).astype(np.float32)
        y0 = (jnp.asarray(yr[0]), jnp.asarray(yr[1]))

        def body(c):
            yre, yim = c
            y = jax.lax.complex(yre, yim)
            h = jax.lax.complex(jnp.asarray(hr[0]), jnp.asarray(hr[1]))
            sym = kbest_device(y, h, jnp.asarray(const), K)
            return (yre + jnp.real(sym[:, 0:1]) * 1e-12, yim)

        dt = timed_chain(body, y0, rep=12,
                         score=lambda c: jnp.sum(c[0][:4]))
        CM = K * m
        # one-hot gathers (HIGHEST precision ~ /6 effective peak; fold 6x)
        mxu = nt * 2 * Bk * (K * CM * (4 * nt + 1)) * 6
        vpu = nt * Bk * CM * 10 + Bk * nt ** 3 * 8
        hbm = Bk * (nt * nt * 8 + nt * 8 + nt * 8)
        add("kbest16 4x4 16qam B4096", dt, mxu, vpu, hbm,
            "top_k sort + one-hot gathers; 4 sequential levels")
    guarded(sec_kbest)

    # ---- polar SC (bench shape: N=1024 K=512 B=2048, blocked scan) ----
    def sec_polar_sc():
        from commpy_tpu.ops.polar import make_polar_sc_decoder, \
            polar_construct

        code = polar_construct(1024, 512, design_snr_db=2.0)
        N, Bp = 1024, 2048
        sc = make_polar_sc_decoder(code, rule="minsum")
        x0 = jnp.asarray(rng.randn(Bp, N).astype(np.float32) * 3)

        def body(c):
            dec = sc(c)
            return c.at[0, 0].add(jnp.sum(dec).astype(c.dtype) * 1e-12)

        dt = timed_chain(body, x0, rep=8)
        lg = int(np.log2(N))
        # f/g tree: ~N log2 N values/frame, ~4 VPU flops each; carried
        # value-major [N*B] L/C buffers stream r+w per scan step (nb=2
        # at block_exp=9)
        vpu = N * lg * Bp * 4
        hbm = 2 * 2 * 2 * N * Bp * 4
        add("polar_sc N1024 B2048", dt, 0.0, vpu, hbm,
            "2^9-leaf blocked scan; in-block subtree unrolled; "
            "scan-step overhead amortized 512x")
    guarded(sec_polar_sc)

    # ---- polar SCL-8 statically unrolled (r5; N=1024 P=8 B=1024) ----
    def sec_polar_scl():
        from commpy_tpu.ops.polar import make_polar_scl_decoder_unrolled, \
            polar_construct

        code = polar_construct(1024, 512, crc="crc11", design_snr_db=2.0)
        N, P, Bl = 1024, 8, 1024
        scl = make_polar_scl_decoder_unrolled(code, list_size=P,
                                              rule="minsum",
                                              pm_rule="approx")
        x0 = jnp.asarray(rng.randn(Bl, N).astype(np.float32) * 3)

        def body(c):
            dec = scl(c)
            return c.at[0, 0].add(jnp.sum(dec).astype(c.dtype) * 1e-12)

        dt = timed_chain(body, x0, rep=24)
        lg = int(np.log2(N))
        n_info = int((~code.frozen_mask).sum())
        # hierarchical deferred permutes: ~1.5 N log2 N rows of
        # [P, B] x [P, P, B] multiply-reduce (2 P^2 B flops/row);
        # f/g tree on [*, P, B] (~4 flops/value); rank-select prunes
        # ([2P, 2P, B] compares + one-hot sums)
        perm_rows = 1.5 * N * lg
        vpu = (perm_rows * 2 * P * P * Bl
               + N * lg * P * Bl * 4
               + n_info * (2 * P) * (2 * P) * Bl * 3)
        # tree tensors materialized r+w once each
        hbm = 2 * (N * lg) * P * Bl * 4
        add("polar_scl8_unrolled N1024 B1024", dt, 0.0, vpu, hbm,
            f"{n_info} sequential rank-select prunes; no scan/cond/"
            "switch dispatch (r5 rewrite, 17x over the scan decoder)")
    guarded(sec_polar_scl)

    # ---- BCH DVB-S2-class outer (n=16200 t=12 GF(2^16), B=256) ----
    def sec_bch_roof():
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
        m, t, n = code.m, code.t, code.n
        D = min(512, code.n_parent)
        n_blocks = -(-code.n_parent // D)
        # syndrome matmul [B,n]@[n,2tm] + Chien scan: n_blocks steps of
        # [B,(t+1)m]@[(t+1)m, D*m] evals (0/1 operands: bf16-exact,
        # DEFAULT 1-pass) — the Chien matmuls dominate
        mxu = (Bb * n * 2 * t * m * 2
               + n_blocks * (Bb * (t + 1) * m * (D * m + (t + 1) * m) * 2))
        vpu = 2 * t * Bb * m * m * 6  # BM scan steps (small, issue-bound)
        hbm = Bb * n * 4 * 2
        add("bch 16200 t12 B256", dt, mxu, vpu, hbm,
            "Chien-search matmuls dominate FLOPs; BM is a 24-step "
            "dependent scan")
    guarded(sec_bch_roof)

    # ---- RS(255,223) t=16, B=2048 (CCSDS shape) ----
    def sec_rs_roof():
        from commpy_tpu.ops.rs import rs_construct, rs_encode, \
            make_rs_decoder

        code = rs_construct(8, 16)
        Br = 2048
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
        m, t, n = code.m, code.t, code.n
        # bit-sliced GF(2^8): syndromes (2t x n Horner, m-plane AND-XOR)
        # + BM (2t dependent steps) + Chien/Forney over n positions
        vpu = (2 * t * n * Br * m * 3 + 2 * t * Br * (t + 1) * m * m * 4
               + n * Br * (t + 1) * m * 3)
        hbm = Br * n * 4 * 2
        add("rs 255,223 B2048", dt, 0.0, vpu, hbm,
            "32-step dependent BM scan is op-count-bound (lanes-major "
            "state, static reduction folds — r4 rewrite)")
    guarded(sec_rs_roof)

    # ---- TPC (31,21)^2 Chase-Pyndiah, 4 iterations, B=64 ----
    def sec_tpc_roof():
        from commpy_tpu.ops.bch import bch_construct
        from commpy_tpu.ops.tpc import make_tpc_decoder, tpc_encode

        code = bch_construct(5, 2)
        Bt = 64
        trng = np.random.default_rng(0)
        data = trng.integers(0, 2, (Bt, code.k, code.k))
        cwp = np.asarray(tpc_encode(code, code, jnp.asarray(data)))
        llr = (1.0 - 2.0 * cwp) * 4.0 + trng.normal(0, 1.4, cwp.shape)
        dec = make_tpc_decoder(code, code, iterations=4, p=4)
        x0 = jnp.asarray(llr.astype(np.float32))

        def body(c):
            d, _ = dec(c)
            return c.at[0, 0, 0].add(jnp.sum(d).astype(c.dtype) * 1e-12)

        dt = timed_chain(body, x0, rep=8)
        n, t, m, p = code.n, code.t, code.m, 4
        half_iters = 8
        rows = Bt * n  # rows (or cols) decoded per half-iteration
        pats = 1 << p
        # per half-iteration: Chase over 2^p test patterns, each a
        # syndrome+BM+Chien on (31,21): ~n*2t*m*3 VPU flops per pattern
        vpu = half_iters * rows * pats * (n * 2 * t * m * 3)
        hbm = half_iters * Bt * n * n * 4 * 2
        add("tpc 31x31 chase4 B64", dt, 0.0, vpu, hbm,
            "8 half-iterations x 16 Chase patterns; per-pattern "
            "algebraic decode on tiny (31,21) tiles")
    guarded(sec_tpc_roof)

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "roofline_latest.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    print("\n| Kernel | ms | MXU TF/s (%) | VPU GF/s (%) | HBM GB/s (%) "
          "| Wall | % of wall |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['kernel']} | {r['ms']} "
              f"| {r['mxu_tflops']} ({r['pct_mxu']}%) "
              f"| {r['vpu_gflops']} ({r['pct_vpu']}%) "
              f"| {r['hbm_gbps']} ({r['pct_hbm']}%) "
              f"| {r['wall']} | {r['pct_wall']}% |")


if __name__ == "__main__":
    main()
