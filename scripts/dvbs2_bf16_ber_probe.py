"""Real-TPU probe: BER parity of the streamed QC BP kernel's bf16
message default at DVB-S2 scale, on real Mosaic.

The r4 default flip (msg_io='auto' -> bf16 on the HBM-streamed kernel)
is BER-parity tested in interpret mode (test_qcldpc.py); Mosaic has
diverged from interpret before (ROADMAP "Environment quirks"), so this
probe decodes real noisy codewords on device with f32 and bf16 message
streams at two operating points and compares error counts + final
syndromes.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from commpy_tpu.ops.dvbs2 import (dvbs2_encode_device, dvbs2_qc_params,
                                  synthetic_address_table)
from commpy_tpu.ops.qcldpc import qc_bp_decode_device


def main():
    assert jax.default_backend() in ("tpu", "axon")
    tab = synthetic_address_table(16200, "1/2", seed=0)
    params = dvbs2_qc_params(tab, 16200, "1/2")
    k = params["k_bits"]
    rng = np.random.RandomState(0)
    B = 64
    msg = rng.randint(0, 2, (B, k)).astype(np.int8)
    cw = np.asarray(dvbs2_encode_device(jnp.asarray(msg), params))
    # decode in the QC domain directly (same domain both variants)
    from commpy_tpu.ops.dvbs2 import _parity_to_qc

    x = 1.0 - 2.0 * cw.astype(np.float32)
    for ebn0 in (0.8, 1.2):
        sigma = float(np.sqrt(1 / (2 * 0.5 * 10 ** (ebn0 / 10))))
        y = x + sigma * rng.randn(*x.shape).astype(np.float32)
        llr = 2.0 * y / sigma**2
        llr_qc = np.concatenate(
            [llr[:, :k],
             np.asarray(_parity_to_qc(jnp.asarray(llr[:, k:]),
                                      params["dvbs2"]["q"], params["Z"]))],
            axis=1,
        )
        cw_qc = np.concatenate(
            [cw[:, :k],
             np.asarray(_parity_to_qc(jnp.asarray(cw[:, k:]),
                                      params["dvbs2"]["q"], params["Z"]))],
            axis=1,
        )
        outs = {}
        for io in ("f32", "bf16"):
            dec, _ = qc_bp_decode_device(
                jnp.asarray(llr_qc), params, "MSA", 25,
                backend="pallas-streamed", schedule="layered", msg_io=io,
            )
            outs[io] = np.asarray(dec)
        errs = {io: int((outs[io] != cw_qc).sum()) for io in outs}
        print(json.dumps({
            "probe": "dvbs2_streamed_bf16_ber",
            "ebn0_db": ebn0, "B": B, "n": 16200,
            "bit_errors_f32": errs["f32"],
            "bit_errors_bf16": errs["bf16"],
            "total_bits": int(cw_qc.size),
            "decisions_differ": int((outs["f32"] != outs["bf16"]).sum()),
        }), flush=True)


if __name__ == "__main__":
    main()
