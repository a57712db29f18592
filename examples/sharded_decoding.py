"""Mesh-parallel decoding demos (runs anywhere: CPU fallback included).

Three parallelism axes the reference cannot express (SURVEY §2):

1. frame-parallel Monte-Carlo (the production configuration) — see
   examples/conv_encode_decode.py and commpy_tpu/parallel/montecarlo.py;
2. sequence parallelism: ONE long turbo frame split along time across
   the mesh, BCJR state metrics exchanged as ppermute halos;
3. tensor parallelism: ONE LDPC Tanner graph's edges split across the
   mesh, variable-node sums completed with psum.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      JAX_PLATFORMS=cpu python examples/sharded_decoding.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if "XLA_FLAGS" not in os.environ:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import jax

import _cpu_env  # noqa: F401  (honor JAX_PLATFORMS=cpu; shared preamble)

import jax.numpy as jnp

from commpy_tpu.channelcoding import RandInterlv
from commpy_tpu.ops.ldpc import (
    get_ldpc_code_params,
    ldpc_bp_decode_device,
    ldpc_bp_decode_sharded,
)
from commpy_tpu.ops.stream import sharded_turbo_stream
from commpy_tpu.ops.trellis import Trellis
from commpy_tpu.ops.turbo import turbo_decode_device, turbo_encode_device
from commpy_tpu.parallel import make_mesh

mesh = make_mesh()
D = mesh.devices.size
print(f"mesh: {D} x {jax.devices()[0].platform}")

# --- sequence-sharded turbo: 16k-bit frame across the mesh --------------
L = 512 * D
trellis = Trellis(np.array([2]), np.array([[1, 7]]), 5, "rsc")
interleaver = RandInterlv(L, 0)
rng = np.random.RandomState(1)
msg = rng.randint(0, 2, L).astype(np.int8)
sys_b, par1_b, par2_b = turbo_encode_device(
    msg, trellis, trellis, np.asarray(interleaver.p_array)
)
sigma = 0.9
to_sym = lambda b: (2.0 * np.asarray(b) - 1) + rng.randn(L) * sigma
sys_s, par1_s, par2_s = to_sym(sys_b), to_sym(par1_b), to_sym(par2_b)

dec_sharded = np.asarray(
    sharded_turbo_stream(
        sys_s, par1_s, par2_s, trellis, sigma**2, 6,
        interleaver.p_array, mesh, warmup=64, axis_name="dp",
    )
)
# NII flavor: boundary alpha/beta ride ppermutes between iterations
# instead of warmup halos (2 x S floats per pass, no halo recompute)
dec_nii = np.asarray(
    sharded_turbo_stream(
        sys_s, par1_s, par2_s, trellis, sigma**2, 6,
        interleaver.p_array, mesh, axis_name="dp", boundary_init="nii",
    )
)
dec_serial = np.asarray(
    turbo_decode_device(
        sys_s, par1_s, par2_s, trellis, sigma**2, 6, interleaver.p_array,
        window=(256, 64),
    )
)
print(
    f"turbo {L}-bit frame: sharded BER "
    f"{np.mean(dec_sharded != msg):.4f}, NII BER "
    f"{np.mean(dec_nii != msg):.4f}, serial BER "
    f"{np.mean(dec_serial != msg):.4f}, "
    f"sharded==serial on {np.mean(dec_sharded == dec_serial):.4%} of bits"
)

# --- edge-sharded LDPC: one Tanner graph across the mesh ----------------
design = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "commpy_tpu", "designs", "ldpc", "wimax", "1440.720.txt",
)
params = get_ldpc_code_params(design)
llr = jnp.asarray(rng.randn(8, 1440).astype(np.float32) * 2 + 1.0)
dec_s, _ = ldpc_bp_decode_sharded(llr, params, "MSA", 10, mesh, "dp")
dec_1, _ = ldpc_bp_decode_device(llr, params, "MSA", 10)
print(
    "LDPC(1440,720) edge-sharded over "
    f"{D} devices: decisions identical to single-device: "
    f"{bool(jnp.all(dec_s == dec_1))}"
)

# --- pipeline parallelism: link stages across the mesh ------------------
# One device per stage (GPipe rotation, ppermute handoff); the wire is
# [2, N]: row 0 carries the in-flight signal, row 1 the payload bits.
from commpy_tpu.parallel.pipeline import pipeline_map

D_pp = min(4, D)
mesh_pp = make_mesh(D_pp, axis_name="pp")
stages = [
    lambda w: w.at[0].set(2.0 * w[1] - 1.0),              # BPSK modulate
    lambda w: w.at[0].set(w[0] * 0.8),                     # channel gain
    lambda w: w.at[0].set(2.0 * w[0] / 0.25),              # LLR demap
    lambda w: w.at[0].set((w[0] > 0).astype(w.dtype)),     # hard slice
][:D_pp] + [lambda w: w] * max(0, D_pp - 4)
bits_pp = rng.randint(0, 2, (6, 128)).astype(np.float32)
wire = jnp.asarray(np.stack([np.zeros_like(bits_pp), bits_pp], axis=1))
out = pipeline_map(stages, wire, mesh_pp, axis_name="pp")
print(
    f"pipeline over {D_pp} devices: {wire.shape[0]} microbatches, "
    f"decisions == payload on {np.mean(np.asarray(out[:, 0]) == bits_pp):.0%} of bits"
)

# --- sequence-sharded streams: Viterbi and FIR overlap-save --------------
# A CONTINUOUS coded stream (reference: chunked serial 'cont' encoding +
# windowed traceback, convcode.py:505,644) split along time over the
# mesh; each device decodes its shard plus warmup/lookahead halos from
# its neighbours (ppermute), so the output matches the serial decode.
from commpy_tpu.ops.convcode import conv_encode
from commpy_tpu.ops.fir import fir_filter, sharded_fir_filter
from commpy_tpu.ops.stream import sharded_viterbi_stream
from commpy_tpu.ops.viterbi import viterbi_decode_device

tr_cc = Trellis(np.array([2]), np.array([[5, 7]]))
L_st = 1024 * D
msg_st = rng.randint(0, 2, L_st).astype(np.int8)
coded = conv_encode(msg_st, tr_cc, termination="cont")
llrs = (2.0 * np.asarray(coded) - 1) + rng.randn(coded.shape[-1]) * 0.6
dec_stream = np.asarray(
    sharded_viterbi_stream(
        jnp.asarray(llrs), tr_cc, mesh, decoding_type="unquantized",
        axis_name="dp",
    )
)
dec_ser = np.asarray(
    viterbi_decode_device(jnp.asarray(llrs), tr_cc,
                          decoding_type="unquantized")
)
print(
    f"viterbi stream {L_st} bits over {D} devices: BER "
    f"{np.mean(dec_stream != msg_st):.4f}, sharded == serial: "
    f"{bool(np.array_equal(dec_stream, dec_ser))}"
)

# Overlap-save FIR: the filter tail crossing each shard boundary rides a
# single ppermute to the right neighbour — no full-signal gather.
taps = np.hanning(65).astype(np.float32)
wave = rng.randn(4096 * D).astype(np.float32)
y_sh = np.asarray(sharded_fir_filter(jnp.asarray(wave), taps, mesh, "dp"))
y_ser = np.asarray(fir_filter(jnp.asarray(wave), jnp.asarray(taps), "full"))
err = float(np.max(np.abs(y_sh - y_ser[: wave.shape[0]])))
print(f"sharded FIR overlap-save: max |sharded - serial| = {err:.2e}")
