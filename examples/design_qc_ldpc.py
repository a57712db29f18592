"""Design, audit, export, and decode a custom QC-LDPC code.

Beyond-reference capability tour (the reference can only *load* shipped
design files, ldpc.py:51): synthesize a rate-1/2 quasi-cyclic code at an
802.16e-scale geometry (Z=96, n=2304), certify its girth, export it to
the reference's design-file text format, re-import it through the
generic parser onto the QC decode path, and sweep its BER on the
mesh-sharded Monte-Carlo engine.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/design_qc_ldpc.py
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax

import _cpu_env  # noqa: F401  (examples/_cpu_env.py)
import jax.numpy as jnp

from commpy_tpu.ops.ldpc import get_ldpc_code_params
from commpy_tpu.ops.qcldpc import (
    detect_qc_structure,
    qc_bp_decode_device,
    qc_encode_device,
    qc_export_design,
    qc_girth,
    random_qc_params,
)

# 1. Design: 12x24 base protograph lifted by Z=96 -> (2304, 1152),
#    rejection-sampling away every lifted 4- and 6-cycle (girth >= 8 —
#    the error-floor lever production designs use).
params = random_qc_params(12, 24, 96, col_weight=3, seed=7,
                          target_girth=8, girth_tries=2000)
print(f"designed n={params['n_vnodes']}, k={params['k_bits']}, "
      f"girth={qc_girth(params['base_matrix'], params['Z'])}")

# 2. Export to the reference design-file format and re-import through
#    the generic parser; the QC structure is auto-detected and re-lifted.
with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, "qc2304.txt")
    qc_export_design(params, path)
    generic = get_ldpc_code_params(path, compute_matrix=True)
    relifted = detect_qc_structure(generic, 96)
    assert relifted is not None
    print(f"design file round-trip ok: {os.path.getsize(path)} bytes, "
          "QC structure re-detected")

# 3. Decode sweep at a few Eb/N0 points (IRA dual-diagonal O(n) encode,
#    roll-based QC BP decode, layered schedule).
rng = np.random.RandomState(0)
rate = params["k_bits"] / params["n_vnodes"]
for ebn0 in (1.0, 1.5, 2.0, 2.5):
    sigma = 1.0 / np.sqrt(2 * rate * 10 ** (ebn0 / 10))
    msg = rng.randint(0, 2, (64, params["k_bits"])).astype(np.int8)
    cw = np.asarray(qc_encode_device(jnp.asarray(msg), params))
    x = 1.0 - 2.0 * cw
    llr = 2.0 * (x + rng.randn(*x.shape) * sigma) / sigma**2
    dec, _ = qc_bp_decode_device(
        jnp.asarray(llr.astype(np.float32)), params, "MSA", 15,
        schedule="layered",
    )
    ber = float((np.asarray(dec) != cw).mean())
    print(f"Eb/N0 {ebn0:.1f} dB: BER {ber:.2e}")
