"""Measure the reference (NumPy/CPU) implementation's throughput.

Produces benchmarks/reference_cpu.json, the baseline denominator used by
bench.py.  The reference publishes no performance numbers (BASELINE.md), so
the baseline is measured locally on this machine's CPU.

Run:  python benchmarks/measure_reference.py  [path-to-reference]
"""
import json
import os
import sys
import time

import numpy as np

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
sys.path.insert(0, REF)

import commpy.channelcoding.convcode as cc  # noqa: E402
import commpy.channelcoding.ldpc as ldpc  # noqa: E402
import commpy.channelcoding.turbo as turbo  # noqa: E402
import commpy.channelcoding.interleavers as ilv  # noqa: E402
import commpy.modulation as mod  # noqa: E402


def bench(fn, n=3):
    fn()  # warmup
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    np.random.seed(0)
    out = {}

    # Soft Viterbi, K=7 (133,171) — the wifi80211 decoder
    tr = cc.Trellis(np.array([6]), np.array([[0o133, 0o171]]))
    L = 1000
    msg = np.random.randint(0, 2, L)
    coded = cc.conv_encode(msg, tr, "cont")
    llr = (2.0 * coded - 1) * 4 + np.random.randn(len(coded))
    dt = bench(lambda: cc.viterbi_decode(llr, tr, decoding_type="soft"))
    out["viterbi_k7_soft_bits_per_s"] = L / dt

    # Turbo decode (rate 1/3, 8 iterations)
    trt = cc.Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
    Lt = 256
    inter = ilv.RandInterlv(Lt, 0)
    msg = np.random.randint(0, 2, Lt)
    s, p1, p2 = turbo.turbo_encode(msg, trt, trt, inter)
    sy = 2.0 * s[:Lt] - 1 + np.random.randn(Lt) * 0.7
    py1 = 2.0 * p1[:Lt] - 1 + np.random.randn(Lt) * 0.7
    py2 = 2.0 * p2[:Lt] - 1 + np.random.randn(Lt) * 0.7
    dt = bench(
        lambda: turbo.turbo_decode(sy, py1, py2, trt, 0.49, 8, inter), n=1
    )
    out["turbo_8it_bits_per_s"] = Lt / dt

    # LDPC BP decode (WiMAX 1440.720, MSA, 15 iterations, 4 blocks)
    design = os.path.join(
        REF, "commpy/channelcoding/designs/ldpc/wimax/1440.720.txt"
    )
    params = ldpc.get_ldpc_code_params(design, True)
    blocks = 4
    msgb = np.random.randint(0, 2, 720 * blocks).astype(np.int8)
    codew = ldpc.triang_ldpc_systematic_encode(msgb, params)
    x = 1 - 2.0 * codew.reshape(-1, order="F").astype(float)
    llrs = 2 * (x + np.random.randn(x.size) * 0.7) / 0.49
    dt = bench(
        lambda: ldpc.ldpc_bp_decode(llrs.copy(), params, "MSA", 15), n=1
    )
    out["ldpc_wimax_msa15_info_bits_per_s"] = 720 * blocks / dt

    # LDPC BP decode (IEEE 802.11n 1944 R=1/2, MSA, 15 iterations) — the
    # reference decodes any design file; the 802.11n H is exported from
    # the repo's base matrix so both implementations run the same code.
    import tempfile

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".."))
    from commpy_tpu.ops.qcldpc import IEEE80211N_BASE, expand_base_matrix
    from commpy_tpu.ops.ldpc import write_ldpc_params

    Bm, Z = IEEE80211N_BASE[(1944, "1/2")]
    H = expand_base_matrix(Bm, Z)
    tmpdir = tempfile.mkdtemp()
    design_80211n = os.path.join(tmpdir, "80211n.1944.txt")
    write_ldpc_params(H, design_80211n)
    params_n = ldpc.get_ldpc_code_params(design_80211n)
    x = 1 - 2.0 * np.random.randint(0, 2, 1944).astype(float)
    llrs_n = 2 * (x + np.random.randn(1944) * 0.7) / 0.49
    dt = bench(
        lambda: ldpc.ldpc_bp_decode(llrs_n.copy(), params_n, "MSA", 15),
        n=1,
    )
    out["qcldpc_80211n_1944_msa15_info_bits_per_s"] = 972 / dt
    import shutil
    shutil.rmtree(tmpdir, ignore_errors=True)

    # Modem: 16-QAM exact-LLR soft demod (modulation.py triple loop)
    qam = mod.QAMModem(16)
    nsym = 2000
    bits = np.random.randint(0, 2, nsym * 4)
    y = qam.modulate(bits) + (
        np.random.randn(nsym) + 1j * np.random.randn(nsym)
    ) * 0.2
    dt = bench(lambda: qam.demodulate(y, "soft", 0.08))
    out["qam16_soft_demod_msamples_per_s"] = nsym / dt / 1e6

    # K-best MIMO detection (K=16, 4x4, 16-QAM) — the reference runs one
    # received vector per call (links.py:320-326 loops this in Python).
    qam4x4 = mod.QAMModem(16)
    nvec = 50
    hs = (np.random.randn(nvec, 4, 4) + 1j * np.random.randn(nvec, 4, 4))
    hs /= np.sqrt(2)
    ys = np.random.randn(nvec, 4) + 1j * np.random.randn(nvec, 4)

    def run_kbest():
        for i in range(nvec):
            mod.kbest(ys[i], hs[i], qam4x4.constellation, 16)

    dt = bench(run_kbest, n=1)
    out["kbest16_4x4_16qam_vectors_per_s"] = nvec / dt

    # Merge with previous runs taking the per-key MAX: this machine's
    # CPU throughput drifts ~2x between runs, and the fairest baseline
    # denominator is the FASTEST reference ever observed (a slow
    # baseline would inflate every vs_baseline ratio).
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "reference_cpu.json")
    if os.path.exists(path):
        prev = json.load(open(path))
        for k, v in prev.items():
            out[k] = max(out.get(k, 0.0), v)
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(json.dumps(out, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
