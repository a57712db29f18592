"""5G-NR-style LDPC: one transport block at three code rates.

Encodes one BG2 block, rate-matches it to three different E values
(high-rate puncturing, transmit-all, repetition), and decodes each
through the generic QC BP — including recovering the always-punctured
first 2Z systematic bits.  Synthetic-NR-style shifts (see
ops/nrldpc.py provenance note).

Run on CPU:  python examples/nr_ldpc_rate_matching.py
"""
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))  # repo root: commpy_tpu
sys.path.insert(0, _here)
import _cpu_env  # noqa: E402,F401  (CPU backend for examples)

import numpy as np

import jax.numpy as jnp

from commpy_tpu.ops.nrldpc import (nr_code_params, nr_encode_device,
                                   nr_rate_match, nr_rate_recover,
                                   nr_select_bg)
from commpy_tpu.ops.qcldpc import qc_bp_decode_device

Z = 52
params = nr_code_params(2, Z)
n, k = params["n_vnodes"], params["k_bits"]
print(f"BG{params['bg']} Z={Z}: n={n}, k={k} "
      f"(bg-select rule for K={k}, r=1/2 -> BG{nr_select_bg(k, 0.5)})")

rng = np.random.RandomState(0)
msg = jnp.asarray(rng.randint(0, 2, (8, k)), jnp.int8)
cw = nr_encode_device(msg, params)

sigma = 0.55
for E, label in [(2 * k, "rate ~1/2 (parity punctured)"),
                 (n - 2 * Z, "transmit-all"),
                 (n - 2 * Z + 4 * Z, "with repetition")]:
    tx = np.asarray(nr_rate_match(params, cw, E), np.float32)
    y = (1.0 - 2.0 * tx) + rng.randn(*tx.shape) * sigma
    llr = nr_rate_recover(params, jnp.asarray(2.0 * y / sigma**2), E)
    dec, _ = qc_bp_decode_device(llr, params, "MSA", 25, backend="xla")
    ber = float((np.asarray(dec)[:, :k] != np.asarray(msg)).mean())
    raw = float(((y < 0) != tx).mean())
    print(f"E={E:5d} ({label:28s}): raw BER {raw:.3f} -> "
          f"info BER {ber:.5f}")
