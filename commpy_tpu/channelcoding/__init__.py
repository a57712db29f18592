"""Reference-compatible channel-coding package (commpy.channelcoding API).

Re-exports the FEC surface exactly as the reference does
(commpy/channelcoding/__init__.py:65-71), backed by the batched TPU
kernels in :mod:`commpy_tpu.ops`.
"""
from ..ops.trellis import Trellis
from ..ops.convcode import conv_encode, puncturing, depuncturing
from ..ops.viterbi import viterbi_decode
from ..ops.interleave import RandInterlv
from ..ops.turbo import turbo_encode, map_decode, turbo_decode
from ..ops.ldpc import (
    build_matrix,
    get_ldpc_code_params,
    ldpc_bp_decode,
    triang_ldpc_systematic_encode,
    write_ldpc_params,
)
from ..ops.galois import GF, polydivide, polymultiply, poly_to_string
from ..ops.algebraic import cyclic_code_genpoly

# Beyond the reference surface: polar + BCH codecs (no CommPy
# counterpart), exposed here so all FEC lives under one namespace.
from ..ops.bch import (  # noqa: F401
    BchCode,
    bch_construct,
    bch_chase_decode,
    bch_decode,
    bch_encode,
)
from ..ops.tpc import tpc_decode, tpc_encode  # noqa: F401
from ..ops.rs import (  # noqa: F401
    RsCode,
    rs_construct,
    rs_decode,
    rs_encode,
    rs_errata_decode,
    rs_gmd_decode,
)
from ..ops.polar import (  # noqa: F401
    PolarCode,
    polar_construct,
    polar_encode,
    polar_sc_decode,
    polar_scl_decode,
)

# Submodules mirroring the reference layout
from . import algcode, convcode, gfields, interleavers, ldpc, turbo  # noqa: F401

__all__ = [
    "Trellis",
    "conv_encode",
    "viterbi_decode",
    "puncturing",
    "depuncturing",
    "RandInterlv",
    "turbo_encode",
    "map_decode",
    "turbo_decode",
    "get_ldpc_code_params",
    "build_matrix",
    "ldpc_bp_decode",
    "triang_ldpc_systematic_encode",
    "write_ldpc_params",
    "BchCode",
    "bch_construct",
    "bch_encode",
    "bch_decode",
    "bch_chase_decode",
    "RsCode",
    "rs_construct",
    "rs_encode",
    "rs_decode",
    "rs_errata_decode",
    "rs_gmd_decode",
    "tpc_encode",
    "tpc_decode",
    "PolarCode",
    "polar_construct",
    "polar_encode",
    "polar_sc_decode",
    "polar_scl_decode",
    "GF",
    "polydivide",
    "polymultiply",
    "poly_to_string",
    "cyclic_code_genpoly",
]
